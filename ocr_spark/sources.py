"""Transcript source readers: schema-enforced ingestion from the table
formats a transcript lake actually arrives in.

The canonical input is the Iceberg/parquet transcripts table
(``input_hint`` schema: conv_id, turn_idx, role, text, tool, ts), but
upstream producers commonly land JSON-lines (agent frameworks logging
turn events) or CSV exports. These readers normalize all of them to the
one transcript schema so every downstream operator is format-agnostic:

- the schema is ENFORCED, never inferred — schema inference at 100 TB
  is a full extra pass over the data, and a drifting inferred schema is
  a silent pipeline-wide type break;
- malformed records are CAPTURED, not dropped and not fatal
  (PERMISSIVE mode + ``_corrupt_record``), mirroring the per-page error
  isolation of the extraction stage itself (reference:
  ``tasks/pdf_hybrid_tasks.py:189-195``): bad rows surface in a side
  output with the raw line preserved for replay;
- timestamps parse with an explicit format for CSV (no locale/TZ
  guessing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

_COLS = [f.name for f in TRANSCRIPT_SCHEMA.fields]

# the enforced schema plus the PERMISSIVE-mode capture column
_SCHEMA_WITH_CORRUPT = T.StructType(
    TRANSCRIPT_SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType(), True)]
)


def read_transcripts_parquet(spark: SparkSession, path: str) -> DataFrame:
    """The canonical source. Parquet is self-describing; a select pins
    column order and surfaces schema drift as an analysis error here
    rather than deep in a downstream plan."""
    return spark.read.parquet(path).select(*_COLS)


def read_transcripts_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (warehouse interchange: Hive/Trino-era tables arrive
    as ORC; Spark reads it natively with the same pushdown/pruning as
    parquet). Self-describing like parquet — the select pins column
    order and surfaces schema drift here."""
    return spark.read.orc(path).select(*_COLS)


def _bad_lines(
    spark: SparkSession,
    path: str,
    parse_expr,
    skip_header_token: str | None = None,
) -> DataFrame:
    """Malformed-record side output: re-scan the raw TEXT and re-parse
    per line with from_json/from_csv, whose own corrupt-record column is
    an ordinary column — the file-source one is internal and Spark
    rejects any plan that references only it
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), which column pruning makes easy
    to trip (e.g. ``bad.count()``). The extra text scan costs nothing
    unless the bad side is actually consumed (lazy), and malformed rows
    keep their raw line for replay."""
    lines = spark.read.text(path)
    parsed = lines.select("value", parse_expr.alias("r"))
    if skip_header_token is not None:
        # tolerant header skip: a header row (quoted, re-spaced, partial)
        # parses with its first column name as the conv_id value — never a
        # real record, so it must not surface as a phantom corrupt line
        parsed = parsed.filter(
            ~F.col("r.conv_id").eqNullSafe(F.lit(skip_header_token))
        )
    return parsed.filter(F.col("r._corrupt_record").isNotNull()).select(
        F.col("r.conv_id").alias("conv_id"),
        F.col("r.turn_idx").alias("turn_idx"),
        F.col("value").alias("raw_line"),
    )


def read_transcripts_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines source. Returns ``(good, bad)``: well-formed rows in
    transcript schema, and malformed lines with their raw text preserved
    (replayable). Both sides are lazy; ignoring ``bad`` costs nothing."""
    raw = (
        spark.read.schema(_SCHEMA_WITH_CORRUPT)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    good = raw.filter(F.col("_corrupt_record").isNull()).select(*_COLS)
    bad = _bad_lines(
        spark,
        path,
        F.from_json(
            F.col("value"),
            _SCHEMA_WITH_CORRUPT,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    return good, bad


def read_transcripts_csv(
    spark: SparkSession,
    path: str,
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss",
) -> tuple[DataFrame, DataFrame]:
    """CSV source with explicit timestamp format and corrupt capture."""
    raw = (
        spark.read.schema(_SCHEMA_WITH_CORRUPT)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("timestampFormat", timestamp_format)
        .option("multiLine", "false")
        .option("escape", '"')
        .csv(path)
    )
    good = raw.filter(F.col("_corrupt_record").isNull()).select(*_COLS)
    bad = _bad_lines(
        spark,
        path,
        F.from_csv(
            F.col("value"),
            _SCHEMA_WITH_CORRUPT.simpleString(),
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": "_corrupt_record",
                "timestampFormat": timestamp_format,
                "escape": '"',
            },
        ),
        # header rows (exact, quoted, or re-spaced) all parse with the
        # first column name as conv_id — the token filter drops them all
        skip_header_token=_COLS[0],
    )
    return good, bad


# file extension -> media kind for raw binary ingestion
_MEDIA_EXTS = {
    "image": ("jpg", "jpeg", "png", "gif", "bmp", "tiff", "webp"),
    "audio": ("wav", "mp3", "flac", "ogg", "m4a"),
    "video": ("mp4", "avi", "mkv", "mov", "webm"),
}


def read_media_binary(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw media ingestion via Spark's ``binaryFile`` source — the entry
    point for image/audio/video corpora (the reference ingests these as
    HTTP uploads, ``routes/ocr_routes.py``; a lake ingests them as
    files). One row per file, normalized to the media schema the
    multimodal operators consume (``media_id, kind, payload`` — feed
    straight into ``decode_media_meta``/``decode_media_real``), with the
    source path kept for lineage.

    Scale notes: ``pathGlobFilter`` prunes at LISTING time (no data
    read for filtered files); kind is derived from the extension —
    cheap, no content sniffing; ``media_id`` is a content-independent
    xxhash64 of the path (stable across re-ingests, no collision pair
    expected below ~2^32 files). binaryFile caps file size at
    ``spark.sql.sources.binaryFile.maxLength`` (2 GB default) — media
    beyond that should land as chunked objects upstream.
    """
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind = (
        F.when(ext.isin(*_MEDIA_EXTS["image"]), "image")
        .when(ext.isin(*_MEDIA_EXTS["audio"]), "audio")
        .when(ext.isin(*_MEDIA_EXTS["video"]), "video")
        .otherwise("binary")
    )
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        kind.alias("kind"),
        F.col("content").alias("payload"),
        F.col("path").alias("source_path"),
        F.col("length").alias("n_bytes_listed"),
    )


# ---------------------------------------------------------------------------
# Spark 4 Python DataSource: the synthetic transcript corpus as a FORMAL
# connector (spark.read.format("transcript_synth")) — the same deterministic
# rows fixtures.transcripts_df generates, but exposed through the pluggable
# source API so the engine demonstrates the custom-connector surface: typed
# schema, option handling, and conv-range input partitions that put
# generation parallelism under the source's control (a real connector's
# split planning), not the caller's.

try:  # pyspark >= 4 only; gate so older interpreters still import sources
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _ConvRange(InputPartition):
        def __init__(self, start: int, end: int, skew: bool):
            self.start, self.end, self.skew = start, end, skew

    class TranscriptSynthReader(DataSourceReader):
        def __init__(self, options):
            self.n_convs = int(options.get("n_convs", 100))
            self.skew = str(options.get("skew", "true")).lower() == "true"
            self.n_splits = int(
                options.get("n_splits", min(max(2, self.n_convs // 64), 256))
            )

        def partitions(self):
            k = max(1, min(self.n_splits, self.n_convs))
            # balanced split planning: every requested split materializes
            # (first n_convs % k ranges get one extra conversation)
            base, extra = divmod(self.n_convs, k)
            out, lo = [], 0
            for i in range(k):
                hi = lo + base + (1 if i < extra else 0)
                out.append(_ConvRange(lo, hi, self.skew))
                lo = hi
            return out

        def read(self, partition):
            # executor-side expansion, exactly fixtures.conversation_rows
            from ocr_spark.fixtures import conversation_rows

            for conv_seq in range(partition.start, partition.end):
                yield from conversation_rows(conv_seq, skew=partition.skew)

    class TranscriptSynthDataSource(DataSource):
        """``spark.read.format("transcript_synth")
        .option("n_convs", N).load()``"""

        @classmethod
        def name(cls):
            return "transcript_synth"

        def schema(self):
            return (
                "conv_id string, turn_idx int, role string,"
                " text string, tool string, ts timestamp"
            )

        def reader(self, schema):
            return TranscriptSynthReader(self.options)

    def register_transcript_source(spark: SparkSession) -> None:
        """Register the connector on a session (idempotent)."""
        spark.dataSource.register(TranscriptSynthDataSource)

except ImportError:  # pragma: no cover - pyspark < 4

    def register_transcript_source(spark: SparkSession) -> None:
        raise NotImplementedError(
            "python DataSource API requires pyspark >= 4"
        )
