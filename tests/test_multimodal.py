"""Multimodal plumbing tests: binary payload columns, typed metadata,
deterministic fake decode, resize rule, frame sampling.

The decode itself is a stub (no codecs in this container) — what these
tests pin is the Spark-side contract: schemas, Arrow batch shapes,
determinism under repartitioning, and the JVM-side frame slicing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.multimodal import (
    MEDIA_META_SCHEMA,
    decode_media_meta,
    decode_media_real,
    frame_sample,
    media_from_documents,
    resize_plan,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    doc = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return media_from_documents(doc)


def test_media_schema_and_kinds(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_meta_matches_schema_and_is_deterministic(media):
    meta = decode_media_meta(media)
    assert meta.schema == MEDIA_META_SCHEMA
    rows1 = {r.media_id: r for r in meta.collect()}
    # repartitioning must not change any decoded value
    rows2 = {r.media_id: r for r in decode_media_meta(media.repartition(7)).collect()}
    assert rows1 == rows2
    for r in rows1.values():
        assert r.decode_ok
        assert r.n_bytes > 0 and len(r.sha) == 32
        if r.kind == "image":
            assert 64 <= r.width < 1920 and r.channels == 3 and r.n_frames == 1
        elif r.kind == "audio":
            assert r.width is None and 8000 <= r.sample_rate <= 40000
        elif r.kind == "video":
            assert r.n_frames >= 1 and r.channels == 3


def test_decode_real_gated_on_codec_availability(media):
    """The real S4 path activates iff PIL is importable. Without codecs it
    must raise (never silently fake); with codecs it must decode a
    generated PNG to the normalized RGB raster and fail corrupt payloads
    row-level, not task-level."""
    from ocr_spark.operators import multimodal as mm

    if not mm.HAS_PIL:
        with pytest.raises(NotImplementedError):
            decode_media_real(media)
        pytest.skip("PIL not installed: real codec path validated gate-only")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGBA", (8, 4), (10, 20, 30, 0)).save(buf, format="PNG")
    rows = [(1, buf.getvalue()), (2, b"not an image")]
    df = media.sparkSession.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in decode_media_real(df).collect()}
    ok = got[1]
    assert ok.decode_ok and (ok.width, ok.height) == (8, 4)
    # fully-transparent RGBA over the white matte -> pure white raster
    assert ok.pixels == b"\xff\xff\xff" * (8 * 4)
    assert got[2].decode_ok is False and got[2].error


def test_resize_plan_never_upscales(media):
    plan = resize_plan(decode_media_meta(media), max_side=512).collect()
    assert plan  # image+video rows exist
    for r in plan:
        assert max(r.out_width, r.out_height) <= 512
        assert r.out_width <= r.width and r.out_height <= r.height
        if not r.resized:
            assert (r.out_width, r.out_height) == (r.width, r.height)


def test_frame_sample_covers_every_other_frame(media):
    meta = decode_media_meta(media).select("media_id", "kind", "n_frames")
    joined = media.select("media_id", "payload").join(meta, "media_id")
    frames = frame_sample(joined, every_k=2)
    got = frames.groupBy("media_id").agg(
        F.count("*").alias("n"), F.max("frame_idx").alias("max_idx")
    )
    expect = meta.filter(F.col("kind") == "video").select("media_id", "n_frames")
    both = {r.media_id: r for r in got.join(expect, "media_id").collect()}
    assert both
    for r in both.values():
        assert r.n == (r.n_frames + 1) // 2  # ceil(n_frames / 2)
        assert r.max_idx <= r.n_frames - 1
    # frame bytes are non-empty slices
    assert frames.filter(F.length("frame_bytes") == 0).count() == 0


def test_audio_chunks_cover_duration_with_overlap(media):
    from ocr_spark.operators.multimodal import audio_chunks

    meta = decode_media_meta(media).select(
        "media_id", "kind", "n_frames", "sample_rate"
    )
    joined = media.select("media_id", "payload").join(meta, "media_id")
    chunks = audio_chunks(joined, window=4, hop=2)
    got = chunks.groupBy("media_id").agg(
        F.count("*").alias("n"),
        F.min("chunk_start").alias("first_start"),
        F.max("chunk_end").alias("last_end"),
    )
    expect = meta.filter(F.col("kind") == "audio").select("media_id", "n_frames")
    rows = got.join(expect, "media_id").collect()
    assert rows
    for r in rows:
        assert r.first_start == 0  # coverage starts at t=0
        assert r.last_end == r.n_frames  # and reaches the end
        assert r.n == (r.n_frames + 1) // 2  # one chunk per hop=2
    per = chunks.collect()
    for c in per:
        assert 1 <= c.chunk_end - c.chunk_start <= 4  # window-bounded
        assert c.n_samples > 0 and len(c.chunk_bytes) > 0
