"""Source readers: format-agnostic normalization to the transcript
schema, with malformed records captured (not dropped, not fatal)."""

from __future__ import annotations

import json
import os

from ocr_spark import fixtures
from ocr_spark.operators.extract import extract
from ocr_spark.sources import (
    read_transcripts_csv,
    read_transcripts_jsonl,
    read_transcripts_parquet,
)


def _reference_rows(spark, n=6):
    df = fixtures.transcripts_df(spark, n)
    return df, sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"])
        for r in df.collect()
    )


def test_jsonl_roundtrip_and_corrupt_capture(spark, tmp_path):
    df, want = _reference_rows(spark)
    path = str(tmp_path / "turns.jsonl")
    with open(path, "w") as fh:
        for r in df.collect():
            fh.write(
                json.dumps(
                    {
                        "conv_id": r["conv_id"],
                        "turn_idx": r["turn_idx"],
                        "role": r["role"],
                        "text": r["text"],
                        "tool": r["tool"],
                        "ts": r["ts"].strftime("%Y-%m-%dT%H:%M:%S"),
                    }
                )
                + "\n"
            )
        fh.write("{not json at all\n")
        fh.write('{"conv_id": "x", "turn_idx": "NOT_AN_INT"}\n')

    good, bad = read_transcripts_jsonl(spark, path)
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"])
        for r in good.collect()
    )
    assert got == want
    bad_rows = [r["raw_line"] for r in bad.collect()]
    assert len(bad_rows) == 2
    assert any("not json" in b for b in bad_rows)

    # downstream operators run unchanged on the normalized frame
    assert extract(good).count() == len(want)


def test_csv_roundtrip_and_corrupt_capture(spark, tmp_path):
    df, want = _reference_rows(spark)
    path = str(tmp_path / "turns_csv")
    os.makedirs(path)
    with open(os.path.join(path, "part.csv"), "w") as fh:
        fh.write("conv_id,turn_idx,role,text,tool,ts\n")
        for r in df.collect():

            def q(s):
                return '"' + str(s).replace('"', '""').replace("\n", " ") + '"'

            fh.write(
                ",".join(
                    [
                        r["conv_id"],
                        str(r["turn_idx"]),
                        r["role"],
                        q(r["text"]),
                        q(r["tool"]),
                        r["ts"].strftime("%Y-%m-%d %H:%M:%S"),
                    ]
                )
                + "\n"
            )
        fh.write("convX,NOT_AN_INT,user,hello,,2026-01-01 00:00:00\n")

    good, bad = read_transcripts_csv(spark, path)
    # CSV flattens newlines (writer policy above); compare per-field with
    # the same normalization
    want_flat = sorted(
        (c, i, ro, t.replace("\n", " "), tl.replace("\n", " "))
        for c, i, ro, t, tl in want
    )
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"] or "")
        for r in good.collect()
    )
    assert got == want_flat
    assert bad.count() == 1


def test_parquet_reader_pins_columns(spark, tmp_path):
    df, want = _reference_rows(spark)
    path = str(tmp_path / "turns_parquet")
    # writer adds an extra column; the reader must still produce exactly
    # the transcript schema in canonical order
    from pyspark.sql import functions as F

    df.withColumn("extra", F.lit(1)).write.parquet(path)
    got_df = read_transcripts_parquet(spark, path)
    assert [f.name for f in got_df.schema.fields] == [
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
    ]
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"])
        for r in got_df.collect()
    )
    assert got == want


def test_read_media_binary_normalizes_files_to_media_schema(spark, tmp_path):
    """binaryFile ingestion: one row per file, kind from extension,
    payload = exact bytes, glob prunes at listing time."""
    from pyspark.sql import functions as F

    from ocr_spark.operators.multimodal import decode_media_meta
    from ocr_spark.sources import read_media_binary

    d = tmp_path / "media" / "nested"
    d.mkdir(parents=True)
    (d / "a.png").write_bytes(b"\x89PNG-fake-bytes")
    (d / "b.wav").write_bytes(b"RIFF-fake-audio")
    (d / "c.mp4").write_bytes(b"ftyp-fake-video")
    (d / "notes.txt").write_bytes(b"not media")

    media = read_media_binary(spark, str(tmp_path / "media"))
    rows = {r["source_path"].split("/")[-1]: r for r in media.collect()}
    assert set(rows) == {"a.png", "b.wav", "c.mp4", "notes.txt"}
    assert rows["a.png"]["kind"] == "image"
    assert rows["b.wav"]["kind"] == "audio"
    assert rows["c.mp4"]["kind"] == "video"
    assert rows["notes.txt"]["kind"] == "binary"
    assert bytes(rows["a.png"]["payload"]) == b"\x89PNG-fake-bytes"
    assert rows["b.wav"]["n_bytes_listed"] == 15
    # media_ids are distinct and stable
    assert media.select("media_id").distinct().count() == 4

    # glob prunes to images only, at listing time
    imgs = read_media_binary(spark, str(tmp_path / "media"), glob="*.png")
    assert [r["kind"] for r in imgs.collect()] == ["image"]

    # feeds the multimodal decode plumbing unchanged
    meta = decode_media_meta(media.filter(F.col("kind") != "binary"))
    got = {r["kind"]: r for r in meta.collect()}
    assert got["image"]["decode_ok"] and got["image"]["width"] is not None
    assert got["audio"]["sample_rate"] is not None
    assert got["video"]["n_frames"] >= 1


def test_orc_roundtrip_matches_parquet(spark, tmp_path):
    """ORC in == parquet in: identical rows, schema, and pushdown-capable
    scan (predicate lands in the ORC reader, column pruned)."""
    from ocr_spark import fixtures
    from ocr_spark.sources import read_transcripts_orc, read_transcripts_parquet

    t = fixtures.transcripts_df(spark, 12)
    pq = str(tmp_path / "t_parquet")
    oc = str(tmp_path / "t_orc")
    t.write.mode("overwrite").parquet(pq)
    t.write.mode("overwrite").orc(oc)

    a = read_transcripts_parquet(spark, pq)
    b = read_transcripts_orc(spark, oc)
    assert a.schema == b.schema
    ka = sorted((r.conv_id, r.turn_idx, r.text) for r in a.collect())
    kb = sorted((r.conv_id, r.turn_idx, r.text) for r in b.collect())
    assert ka == kb

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        b.filter("turn_idx = 0").select("conv_id").explain(mode="formatted")
    p = buf.getvalue()
    assert "PushedFilters:" in p and "EqualTo(turn_idx,0)" in p
    read = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "text" not in read  # pruned to the 2 needed columns


def test_transcript_synth_datasource_matches_fixtures(spark):
    """The formal Python DataSource connector produces byte-identical
    rows to fixtures.transcripts_df, under the source's OWN split
    planning (n_splits option -> that many input partitions)."""
    from ocr_spark import fixtures
    from ocr_spark.sources import register_transcript_source

    register_transcript_source(spark)
    via_source = (
        spark.read.format("transcript_synth")
        .option("n_convs", 12)
        .option("n_splits", 5)
        .load()
    )
    assert via_source.rdd.getNumPartitions() == 5
    a = sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, str(r.ts))
        for r in via_source.collect()
    )
    b = sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, str(r.ts))
        for r in fixtures.transcripts_df(spark, 12).collect()
    )
    assert a == b
