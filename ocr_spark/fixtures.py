"""Deterministic synthetic transcript generator (FIXTURES.md).

Every row is a pure function of ``(conv_seq, turn_idx)`` — seeded through
md5, no shared RNG state, no wall clock — so the same logical table can
be generated serially on the driver (for oracle goldens) or in parallel
on executors (for scale benchmarks), in any partitioning, and be
byte-identical.

Schema matches ``BASELINE.json: input_hint``:
    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)
"""

from __future__ import annotations

import hashlib
import json
import random
from datetime import datetime, timedelta, timezone

SEED = 42
EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

WORDS = (
    "key agg row scan slow fast table value part hash batch window spark "
    "order data column join filter merge sort group index page block line "
    "text token span byte shard split state stream queue cache plan stage "
    "task chunk frame light house river stone cloud metal paper glass"
).split()

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

ARCHETYPES = (
    [("plain", 40), ("html", 20), ("pdf_blocks", 15), ("ocr_lines", 15),
     ("short", 5), ("malformed", 3), ("dup", 2)]
)
_CUM = []
_acc = 0
for _name, _w in ARCHETYPES:
    _acc += _w
    _CUM.append((_acc, _name))


def _rng(*key) -> random.Random:
    digest = hashlib.md5(("|".join(map(str, key)) + f"|{SEED}").encode()).digest()
    return random.Random(int.from_bytes(digest[:8], "big"))


def conv_length(conv_seq: int, skew: bool = True) -> int:
    """Zipf-ish ladder: mostly short chats, a few long agent traces."""
    r = _rng("len", conv_seq)
    u = r.random() * 100
    if u < 95:
        return r.randint(2, 20)
    if u < 99 or not skew:
        return r.randint(50, 200)
    return r.randint(2000, 10000)


def _archetype(conv_seq: int, turn_idx: int) -> str:
    r = _rng("arch", conv_seq, turn_idx)
    pick = r.randint(0, 99)
    for cum, name in _CUM:
        if pick < cum:
            return name
    return "plain"


def _sentence(r: random.Random, n_words: int) -> str:
    words = [r.choice(WORDS) for _ in range(n_words)]
    # sprinkle stopwords so language-id / quality heuristics have signal
    for i in range(0, len(words), 4):
        words[i] = r.choice(STOPWORDS)
    return " ".join(words).capitalize() + r.choice([".", ".", ".", "!", "?"])


def _plain_text(r: random.Random) -> str:
    sentences = [_sentence(r, r.randint(4, 14)) for _ in range(r.randint(1, 8))]
    out = []
    for s in sentences:
        out.append(s)
        roll = r.random()
        if roll < 0.25:
            out.append(" " * r.randint(2, 6))  # space run -> single space
        elif roll < 0.4:
            out.append("\t" * r.randint(1, 3))
        elif roll < 0.6:
            out.append("\n" * r.randint(3, 5))  # blank-line run -> one blank line
        else:
            out.append(" ")
    return "".join(out)


def _html_text(r: random.Random) -> str:
    nav_links = "".join(
        f'<a href="/{r.choice(WORDS)}">{r.choice(WORDS)}</a> ' for _ in range(r.randint(3, 8))
    )
    paras = "".join(
        f"<p>{_sentence(r, r.randint(8, 20))} {_sentence(r, r.randint(6, 16))}</p>"
        for _ in range(r.randint(1, 4))
    )
    heading = f"<h2>{_sentence(r, r.randint(2, 5))}</h2>" if r.random() < 0.7 else ""
    aside = (
        f'<aside><a href="/x">{r.choice(WORDS)}</a> {r.choice(WORDS)}</aside>'
        if r.random() < 0.5
        else ""
    )
    script = f"<script>var x = {r.randint(0, 99)};</script>" if r.random() < 0.5 else ""
    footer = f'<footer><a href="/about">about</a> <a href="/tos">tos</a></footer>'
    return (
        f"<html><head><style>p {{margin: 0}}</style></head><body>"
        f"<nav>{nav_links}</nav>{script}<header><h1>{r.choice(WORDS)}</h1></header>"
        f"<article>{heading}{paras}</article>{aside}{footer}</body></html>"
    )


def _pdf_blocks_payload(r: random.Random) -> str:
    blocks = []
    n = r.randint(2, 7)
    for i in range(n):
        y0 = round(r.uniform(0, 700), 2)
        x0 = round(r.uniform(0, 400), 2)
        btype = 0 if r.random() < 0.8 else 1
        spans = [{"text": _sentence(r, r.randint(2, 8))} for _ in range(r.randint(1, 3))]
        if r.random() < 0.12:
            spans = [{"text": "   "}]  # whitespace-only block -> skipped
        blocks.append(
            {
                "type": btype,
                "bbox": [x0, y0, x0 + round(r.uniform(50, 200), 2), y0 + 12.0],
                "lines": [{"spans": spans}],
            }
        )
    r.shuffle(blocks)  # deliberately out of reading order
    return json.dumps({"blocks": blocks})


def _ocr_lines_payload(r: random.Random) -> str:
    n = r.randint(2, 10)
    texts, scores, polys = [], [], []
    for _ in range(n):
        if r.random() < 0.1:
            texts.append("")  # blank detection
        else:
            texts.append(_sentence(r, r.randint(1, 6)))
        scores.append(round(r.uniform(0.0, 1.0), 4))
        x, y = round(r.uniform(0, 500), 1), round(r.uniform(0, 500), 1)
        polys.append([[x, y], [x + 80, y], [x + 80, y + 14], [x, y + 14]])
    return json.dumps({"rec_texts": texts, "rec_scores": scores, "dt_polys": polys})


def _malformed_payload(r: random.Random) -> str:
    choice = r.random()
    if choice < 0.4:
        return '{"blocks": [{"type": 0, "bbox": [1, 2'  # truncated JSON
    if choice < 0.7:
        return json.dumps({"unexpected": [1, 2, 3]})  # unknown structure
    return json.dumps(["rec_texts", "nope"])  # wrong top-level type


def _turn_content(conv_seq: int, turn_idx: int):
    """Returns (archetype, text, tool) for one turn."""
    arch = _archetype(conv_seq, turn_idx)
    if arch == "dup" and turn_idx >= 1:
        # exact byte-copy of an earlier turn in the same conversation
        src = max(0, turn_idx - 1 - _rng("dupsrc", conv_seq, turn_idx).randint(0, 2))
        _, text, tool = _turn_content(conv_seq, src)
        return "dup", text, tool
    r = _rng("content", conv_seq, turn_idx)
    if arch == "plain" or arch == "dup":
        return arch, _plain_text(r), ""
    if arch == "html":
        return arch, _html_text(r), ""
    if arch == "pdf_blocks":
        return arch, _sentence(r, r.randint(2, 5)), _pdf_blocks_payload(r)
    if arch == "ocr_lines":
        return arch, _sentence(r, r.randint(2, 5)), _ocr_lines_payload(r)
    if arch == "short":
        return arch, " ".join(r.choice(WORDS) for _ in range(r.randint(1, 3))), ""
    if arch == "malformed":
        return arch, _sentence(r, 3), _malformed_payload(r)
    raise AssertionError(arch)


def conversation_rows(conv_seq: int, skew: bool = True):
    """All transcript rows for one conversation, as plain tuples."""
    conv_id = f"conv{conv_seq:08d}"
    n = conv_length(conv_seq, skew=skew)
    roles = ("user", "assistant", "tool")
    rows = []
    for turn_idx in range(n):
        arch, text, tool = _turn_content(conv_seq, turn_idx)
        role = "tool" if tool else roles[turn_idx % 2]
        ts = EPOCH + timedelta(seconds=conv_seq * 3600 + turn_idx * 7)
        rows.append((conv_id, turn_idx, role, text, tool, ts))
    return rows


def generate_transcripts(n_convs: int, skew: bool = True):
    """Driver-side full materialization (small scales / oracle goldens)."""
    out = []
    for conv_seq in range(n_convs):
        out.extend(conversation_rows(conv_seq, skew=skew))
    return out


TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def transcripts_df(spark, n_convs: int, skew: bool = True, partitions: int | None = None):
    """Distributed generation: parallelize conv seeds, expand on executors.

    The driver ships only ``n_convs`` integers; each executor expands its
    conversations locally via ``conversation_rows`` inside ``mapInPandas``
    (Arrow-batched, no per-row Python at the Spark boundary), so
    generation scales with the cluster rather than the driver.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("tool", T.StringType(), False),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )

    def expand(batches):
        for pdf in batches:
            rows = []
            for conv_seq in pdf["conv_seq"]:
                rows.extend(conversation_rows(int(conv_seq), skew=skew))
            yield pd.DataFrame(rows, columns=TRANSCRIPT_COLUMNS)

    n_parts = partitions or min(max(2, n_convs // 64), 256)
    seeds = spark.range(n_convs).select(F.col("id").alias("conv_seq"))
    return seeds.repartition(n_parts, "conv_seq").mapInPandas(expand, schema)
