"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's only binary pipeline is image bytes -> PIL normalize ->
OCR (``services/ocr_service/helpers/image_processor.py:64-109``); at
100 TB the same shape generalizes to any media: a ``binary`` payload
column plus a typed metadata struct, decoded/feature-extracted inside
Arrow-batched python UDFs, never row-at-a-time and never through the
driver.

The actual codec work (PIL/ffmpeg/librosa) is NOT available in this
container, so the decode step is STUBBED: ``decode_media_meta`` computes
a *deterministic fake* decode (md5-derived dimensions) so the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — is
real and testable end-to-end, and ``decode_media_real`` marks where the
codec call goes (raises ``NotImplementedError`` unless PIL is present).

Scale notes:
- binary payloads ride Arrow record batches executor-side (never base64
  through a broker, ≙ `utils/encoding.py:10-39` made unnecessary);
- decode is a narrow mapInPandas — zero shuffle;
- resize planning (≙ LANCZOS downscale rule `image_processor.py:100-107`)
  and frame sampling are pure builtin expressions once metadata exists,
  so they stay in whole-stage codegen.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def media_from_documents(doc: DataFrame) -> DataFrame:
    """Adapt the driver's documents table into a media table: payload is
    the utf-8 bytes of ``text`` (deterministic stand-in for real codec
    bytes), kind round-robins image/audio/video."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return doc.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def _fake_decode(kind: str, payload: bytes) -> dict:
    """Deterministic FAKE decode: md5-derived properties.

    Stands in for the codec call so tests pin the plumbing; replace the
    body with PIL/ffmpeg in a real deployment (see decode_media_real).
    """
    digest = hashlib.md5(payload).hexdigest()
    h1 = int(digest[:4], 16)
    h2 = int(digest[4:8], 16)
    meta = {
        "n_bytes": len(payload),
        "sha": digest,
        "width": None,
        "height": None,
        "channels": None,
        "sample_rate": None,
        "n_frames": 1,
        "decode_ok": True,
    }
    if kind == "image":
        meta.update(width=64 + h1 % 1856, height=64 + h2 % 1856, channels=3)
    elif kind == "audio":
        meta.update(sample_rate=8000 + (h1 % 5) * 8000, n_frames=1 + h2 % 16)
    elif kind == "video":
        meta.update(
            width=64 + h1 % 1856, height=64 + h2 % 1856, channels=3,
            n_frames=1 + h2 % 8,
        )
    else:
        meta.update(decode_ok=False)
    return meta


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in MEDIA_META_SCHEMA.fields]
    for pdf in batches:
        out = {name: [] for name in cols}
        kinds = pdf["kind"].to_numpy()
        payloads = pdf["payload"].to_numpy()
        ids = pdf["media_id"].to_numpy()
        for i in range(len(pdf)):
            meta = _fake_decode(kinds[i], bytes(payloads[i]))
            out["media_id"].append(int(ids[i]))
            out["kind"].append(kinds[i])
            for k in cols[2:]:
                out[k].append(meta[k])
        yield pd.DataFrame(out, columns=cols)


def decode_media_meta(media: DataFrame) -> DataFrame:
    """media(media_id, kind, payload) -> typed metadata (narrow, Arrow-batched)."""
    return media.select("media_id", "kind", "payload").mapInPandas(
        _decode_batches, MEDIA_META_SCHEMA
    )


try:  # codec availability gate: activates the real S4 path when present
    from PIL import Image as _PILImage, ImageOps as _PILImageOps

    HAS_PIL = True
except ImportError:  # pragma: no cover - this container has no codecs
    _PILImage = _PILImageOps = None
    HAS_PIL = False

_REAL_MAX_SIDE = 4096  # ≙ image_processor.py:26-27 MAX_WIDTH/MAX_HEIGHT

DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("pixels", T.BinaryType(), True),  # raw RGB, row-major
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def _normalize_image_bytes(data: bytes):  # pragma: no cover - needs PIL
    """The reference normalize rule (`image_processor.py:64-109`), exactly:
    RGBA (and P, upgraded to RGBA first) pastes onto a white background
    with its alpha as mask; LA pastes WITHOUT a mask — dropping its alpha
    — because that is literally what the reference does
    (`image_processor.py:88-90`, the else-branch paste has no mask) and
    byte-parity with the reference beats prettier semantics here. Plain
    RGB convert otherwise, EXIF auto-rotate, then LANCZOS downscale with
    scale = min(4096/w, 4096/h) only when a side exceeds 4096."""
    import io

    img = _PILImage.open(io.BytesIO(data))
    if img.mode in ("RGBA", "LA", "P"):
        if img.mode == "P":
            img = img.convert("RGBA")
        background = _PILImage.new("RGB", img.size, (255, 255, 255))
        if img.mode == "RGBA":
            background.paste(img, mask=img.split()[-1])
        else:
            background.paste(img)
        img = background
    else:
        img = img.convert("RGB")
    img = _PILImageOps.exif_transpose(img)
    width, height = img.size
    if width > _REAL_MAX_SIDE or height > _REAL_MAX_SIDE:
        scale = min(_REAL_MAX_SIDE / width, _REAL_MAX_SIDE / height)
        img = img.resize(
            (int(width * scale), int(height * scale)),
            _PILImage.Resampling.LANCZOS,
        )
    return img


def _real_decode_batches(batches):  # pragma: no cover - needs PIL
    for pdf in batches:
        ids = pdf["media_id"].to_numpy()
        payloads = pdf["payload"].to_numpy()
        rows = {k: [] for k in ("media_id", "width", "height", "pixels", "decode_ok", "error")}
        for i in range(len(pdf)):
            rows["media_id"].append(int(ids[i]))
            try:
                img = _normalize_image_bytes(bytes(payloads[i]))
                rows["width"].append(img.size[0])
                rows["height"].append(img.size[1])
                rows["pixels"].append(img.tobytes())
                rows["decode_ok"].append(True)
                rows["error"].append(None)
            except Exception as exc:  # bad bytes: row-level failure, not job
                rows["width"].append(None)
                rows["height"].append(None)
                rows["pixels"].append(None)
                rows["decode_ok"].append(False)
                rows["error"].append(str(exc)[:200])
        yield pd.DataFrame(rows)


def decode_media_real(media: DataFrame) -> DataFrame:
    """REAL decode path (S4): PIL open -> alpha->white matte -> EXIF
    transpose -> LANCZOS downscale <= 4096^2, per
    `image_processor.py:64-109` — Arrow-batched mapInPandas, narrow,
    per-row error capture (a corrupt payload fails its row, never the
    task). Activates automatically when PIL is importable; raises
    NotImplementedError in codec-free containers (use decode_media_meta,
    the deterministic fake with identical plumbing, instead)."""
    if not HAS_PIL:
        raise NotImplementedError(
            "real media decode requires PIL; use decode_media_meta "
            "(deterministic fake) in this environment"
        )
    return media.select("media_id", "payload").mapInPandas(
        _real_decode_batches, DECODED_IMAGE_SCHEMA
    )


def resize_plan(meta: DataFrame, max_side: int = 4096) -> DataFrame:
    """LANCZOS downscale rule (`image_processor.py:100-107`): scale so the
    longer side is <= max_side, never upscale. Pure builtin expressions."""
    w, h = F.col("width"), F.col("height")
    longer = F.greatest(w, h)
    scale = F.when(longer > max_side, max_side / longer).otherwise(F.lit(1.0))
    return meta.filter(w.isNotNull()).select(
        "media_id",
        "kind",
        "width",
        "height",
        F.floor(w * scale).cast("int").alias("out_width"),
        F.floor(h * scale).cast("int").alias("out_height"),
        (longer > max_side).alias("resized"),
    )


def frame_sample(meta_with_payload: DataFrame, every_k: int = 2) -> DataFrame:
    """Sample every k-th frame of video media as its own row.

    Input needs (media_id, kind, n_frames, payload). The per-frame
    payload slice is a builtin binary substring — the explode and slicing
    stay JVM-side; no python in this path.
    """
    video = meta_with_payload.filter(F.col("kind") == "video")
    frame_len = F.greatest(
        (F.length("payload") / F.col("n_frames")).cast("int"), F.lit(1)
    )
    return (
        video.select(
            "media_id",
            "n_frames",
            frame_len.alias("frame_len"),
            "payload",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
            ).alias("frame_idx"),
        )
        .select(
            "media_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.substring(
                F.col("payload"), F.col("frame_idx") * F.col("frame_len") + 1, frame_len
            ).alias("frame_bytes"),
        )
    )


def audio_chunks(
    meta_with_payload: DataFrame, window: int = 4, hop: int = 2
) -> DataFrame:
    """Overlapping fixed-window segmentation of audio media — the ASR /
    diarization training-prep cut: ``window``-unit chunks every ``hop``
    units (50% overlap at the defaults), where a unit is the fake
    decode's per-frame second (replace with real sample counts when a
    codec is present; the plumbing — explode, byte slicing, schema — is
    identical).

    Input needs (media_id, kind, n_frames, sample_rate, payload). The
    per-chunk byte range is a builtin binary substring, exactly like
    frame_sample: the explode and slicing stay JVM-side, no Python."""
    audio = meta_with_payload.filter(F.col("kind") == "audio")
    unit_len = F.greatest(
        (F.length("payload") / F.col("n_frames")).cast("int"), F.lit(1)
    )
    chunks = audio.select(
        "media_id",
        "n_frames",
        "sample_rate",
        "payload",
        unit_len.alias("unit_len"),
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(hop))
        ).alias("chunk_start"),
    )
    chunk_end = F.least(F.col("chunk_start") + window, F.col("n_frames"))
    n_units = chunk_end - F.col("chunk_start")
    return chunks.select(
        "media_id",
        F.col("chunk_start").cast("int").alias("chunk_start"),
        chunk_end.cast("int").alias("chunk_end"),
        (n_units * F.col("sample_rate")).cast("bigint").alias("n_samples"),
        F.substring(
            F.col("payload"),
            F.col("chunk_start") * F.col("unit_len") + 1,
            n_units * F.col("unit_len"),
        ).alias("chunk_bytes"),
    )
