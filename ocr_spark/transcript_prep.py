"""Transcript training-prep transforms over the BASELINE table shape
``(conv_id, turn_idx, role, text, tool, ts)``.

These are the production DataFrame -> DataFrame functions behind the
registry's transcript queries (queries.py derives synthetic
role/gap/payload columns from the sandbox documents table and then calls
THESE, so the driver's DuckDB oracle checks the exact code a real
transcripts table runs). Every transform keys its windows on
``conv_id`` ordered by ``turn_idx`` — per-conversation state only, no
global sort — so one hashpartitioning(conv_id) Exchange serves a whole
chain of them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _conv_window() -> Window:
    return Window.partitionBy("conv_id").orderBy("turn_idx")


def sessionize(t: DataFrame, max_gap_s: int = 1800) -> DataFrame:
    """Add a ``session_idx`` column: a new session starts wherever the
    idle gap ``ts - lag(ts)`` exceeds ``max_gap_s`` seconds (web-style
    sessionization applied to agent traces — long multi-day traces must
    be split before context assembly or they blow the context window).

    Shape: lag + running sum over ONE conv-keyed window partitioning;
    first turn of a conversation (lag NULL) never opens a new session.
    Gaps are measured on the timestamp cast to double (fractional epoch
    seconds) — unix_timestamp would truncate sub-second precision and
    silently keep a 1800.9 s gap inside a 1800 s session."""
    w = _conv_window()
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    is_break = F.when(gap > max_gap_s, F.lit(1)).otherwise(F.lit(0))
    return t.withColumn(
        "session_idx",
        F.sum(is_break)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int"),
    )


def session_stats(t: DataFrame, max_gap_s: int = 1800) -> DataFrame:
    """Per-(conversation, session) rollup of ``sessionize``: turn count
    and turn-index range — the partition-of-record for session-scoped
    downstream passes."""
    return (
        sessionize(t, max_gap_s=max_gap_s)
        .groupBy("conv_id", "session_idx")
        .agg(
            F.count("*").cast("bigint").alias("n_turns"),
            F.min("turn_idx").cast("int").alias("first_turn_idx"),
            F.max("turn_idx").cast("int").alias("last_turn_idx"),
        )
    )


def sft_pairs(t: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Mine (prompt, response) SFT pairs: every assistant turn paired
    with the NEAREST PRECEDING user turn in its conversation — not the
    previous row, because agent traces interleave tool turns between the
    user's ask and the assistant's answer.

    Shape: one conditional last_value(ignore nulls) window on the
    conv-keyed partitioning, then a narrow assistant filter — no join.
    ``pair_fp`` (md5 over prompt + 0x1e + response) is the pair identity
    downstream dedup keys on, so full texts never re-shuffle. ``keep``
    names extra columns of ``t`` (e.g. session_idx, context_fp) to carry
    through onto each pair row."""
    w = _conv_window().rowsBetween(Window.unboundedPreceding, -1)
    prompt = F.last(
        F.when(F.col("role") == "user", F.col("text")), ignorenulls=True
    ).over(w)
    return (
        t.withColumn("prompt_text", prompt)
        .filter(F.col("role") == "assistant")
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            "prompt_text",
            F.col("text").alias("response_text"),
            F.md5(
                F.concat(
                    F.coalesce(F.col("prompt_text"), F.lit("")),
                    F.lit("\x1e"),
                    F.col("text"),
                )
            ).alias("pair_fp"),
            *keep,
        )
    )


def assemble_context(t: DataFrame, k: int = 3) -> DataFrame:
    """Attach each turn's replay context: the previous up-to-``k`` turns
    as an array column plus an md5 fingerprint of the '\\n\\n'-joined
    window (the eval-harness / RL-replay view of a transcript).

    Shape: ONE bounded ROWS frame (``k PRECEDING AND 1 PRECEDING``) on
    the conv-keyed partitioning — per-conversation state is k turns
    regardless of trace length, so this survives million-turn traces
    where an unbounded collect would not."""
    w = _conv_window().rowsBetween(-k, -1)
    ctx = F.collect_list("text").over(w)
    return t.withColumn("context", ctx).withColumn(
        "context_fp", F.md5(F.array_join("context", "\n\n"))
    )


def tool_call_stats(t: DataFrame, payload: Column | str = "tool") -> DataFrame:
    """Per-tool telemetry over JSON tool payloads of the form
    ``{"name": ..., "ok": ..., "n_args": ...}``: call volume,
    conversation reach, success rate, arg-count and result-size means —
    the observability rollup an agent-transcript pipeline runs before
    selecting tool traces for training. Turns whose payload doesn't
    parse (no ``$.name``) are excluded.

    Shape: get_json_object is a narrow JVM-side expression (no UDF);
    the only Exchange is the final |tools|-row partial-aggregated
    groupBy."""
    p = F.col(payload) if isinstance(payload, str) else payload
    parsed = t.select(
        "conv_id",
        F.get_json_object(p, "$.name").alias("tool_name"),
        F.get_json_object(p, "$.ok").cast("boolean").alias("ok"),
        F.get_json_object(p, "$.n_args").cast("int").alias("n_args"),
        F.length("text").alias("result_chars"),
    ).filter(F.col("tool_name").isNotNull())
    return parsed.groupBy("tool_name").agg(
        F.count("*").cast("bigint").alias("n_calls"),
        F.countDistinct("conv_id").cast("bigint").alias("n_convs"),
        F.round(F.avg(F.col("ok").cast("double")), 6).alias("success_rate"),
        F.round(F.avg("n_args"), 6).alias("avg_args"),
        F.round(F.avg("result_chars"), 6).alias("avg_result_chars"),
    )


def turn_novelty_mask(t: DataFrame, role: str | None = None) -> DataFrame:
    """Corpus-wide turn-level loss mask: flag each turn as ``novel``
    (first occurrence of its normalized text anywhere in the corpus,
    by (conv_id, turn_idx) order) or repeated. SFT pipelines train on
    novel assistant turns only — canned apologies, templated headers,
    and retried identical responses otherwise dominate the gradient the
    way duplicated documents do in pretraining, but turn-granular
    repeats survive conversation-level dedup.

    ``role`` restricts the mask to one role (production passes
    "assistant"); None masks every turn.

    Shape: one hash-keyed window — partitionBy(md5(turn)) with a
    (conv_id, turn_idx) sort INSIDE each tiny duplicate group, so the
    only shuffle is on the 32-byte hash and no global sort exists. A
    skewed key (one boilerplate turn repeated millions of times) costs
    one hot partition of 32-byte hashes + ids only — never text; if
    even that dominates, swap the row_number for the bounded
    min(struct(conv_id, turn_idx)) + join-back pattern exact dedup
    uses, which partial-aggregates the hot key map-side."""
    src = t if role is None else t.filter(F.col("role") == role)
    h = F.md5(F.trim("text"))
    w = Window.partitionBy("turn_h").orderBy("conv_id", "turn_idx")
    return (
        src.select("conv_id", "turn_idx", h.alias("turn_h"))
        .select(
            "conv_id",
            "turn_idx",
            (F.row_number().over(w) == 1).alias("novel"),
            F.count("*")
            .over(Window.partitionBy("turn_h"))
            .cast("bigint")
            .alias("n_occurrences"),
        )
    )


def context_budget_audit(
    t: DataFrame, budgets: tuple[int, ...] | None = None
) -> DataFrame:
    """Capacity-planning card for context windows: for each budget B,
    how many conversations exceed B whitespace-tokens in total, and what
    head-anchored truncation at B costs — turns dropped from the tail
    and tokens actually kept. The sizing pass a transcript pipeline runs
    before choosing max-sequence-length / truncation policy, over the
    same token convention as ``token_count``.

    Shape: per-turn token counts, ONE conv-keyed cumulative window
    (reuses the adapter/input conv partitioning), one conv-keyed rollup
    with per-budget conditional sums (budgets are plan-time literals —
    no budget x turn row explosion), a 1-row global aggregate, then
    stack() to |budgets| rows. Nothing wide ever moves."""
    from ocr_spark import params

    budgets = tuple(budgets or params.CTX_BUDGETS)
    w = _conv_window().rowsBetween(Window.unboundedPreceding, 0)
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("bigint")
    cum = t.select("conv_id", F.col("turn_idx"), toks.alias("toks")).select(
        "conv_id", "toks", F.sum("toks").over(w).alias("c")
    )
    conv_aggs = [F.sum("toks").alias("conv_tokens")]
    for b in budgets:
        conv_aggs += [
            F.sum(F.when(F.col("c") <= b, F.col("toks")).otherwise(0))
            .alias(f"kept_{b}"),
            F.sum(F.when(F.col("c") > b, 1).otherwise(0)).alias(f"lost_{b}"),
        ]
    conv = cum.groupBy("conv_id").agg(*conv_aggs)
    g_aggs = [
        F.count("*").cast("bigint").alias("n_convs"),
        F.sum("conv_tokens").cast("bigint").alias("tokens_total"),
    ]
    for b in budgets:
        g_aggs += [
            F.sum((F.col("conv_tokens") > b).cast("bigint")).alias(f"over_{b}"),
            F.sum(f"kept_{b}").cast("bigint").alias(f"gkept_{b}"),
            F.sum(f"lost_{b}").cast("bigint").alias(f"glost_{b}"),
        ]
    g = conv.agg(*g_aggs)
    stack_args = ", ".join(
        f"{b}, over_{b}, glost_{b}, gkept_{b}" for b in budgets
    )
    stacked = g.select(
        F.expr(
            f"stack({len(budgets)}, {stack_args})"
            " as (budget, n_convs_over, turns_lost, tokens_kept)"
        ),
        "n_convs",
        "tokens_total",
    )
    return stacked.select(
        F.col("budget").cast("int").alias("budget"),
        "n_convs",
        "n_convs_over",
        F.round(F.col("n_convs_over") / F.col("n_convs"), 6).alias("frac_over"),
        "tokens_total",
        "tokens_kept",
        "turns_lost",
    )


def turn_novelty_vs_corpus(
    batch: DataFrame, corpus: DataFrame, role: str | None = None
) -> DataFrame:
    """Ingest-time twin of ``turn_novelty_mask`` (the continuous-SFT
    case: the frozen corpus is already ingested; only the incoming
    batch needs flags). A batch turn is ``novel`` iff its normalized
    text appears nowhere in the frozen corpus AND it is the first
    occurrence within the batch by (conv_id, turn_idx);
    ``seen_in_corpus`` is reported separately so the caller can
    distinguish corpus repeats from batch-internal repeats.

    Shape: the corpus reduces ONCE to distinct 32-byte turn hashes (one
    partial-aggregated groupBy — materialize it and every future ingest
    reuses it); batch hashes left-join that set on the hash key; the
    within-batch first-occurrence is the same hash-keyed window as the
    batch form. Never batch x corpus; cost per ingest is
    |corpus hashes| + |batch|."""
    bsrc = batch if role is None else batch.filter(F.col("role") == role)
    csrc = corpus if role is None else corpus.filter(F.col("role") == role)
    h = F.md5(F.trim("text"))
    corpus_h = (
        csrc.select(h.alias("turn_h")).distinct().withColumn("in_corpus", F.lit(True))
    )
    w = Window.partitionBy("turn_h").orderBy("conv_id", "turn_idx")
    flagged = bsrc.select("conv_id", "turn_idx", h.alias("turn_h")).select(
        "conv_id",
        "turn_idx",
        "turn_h",
        (F.row_number().over(w) == 1).alias("first_in_batch"),
    )
    return flagged.join(corpus_h, "turn_h", "left").select(
        "conv_id",
        "turn_idx",
        (F.col("first_in_batch") & F.col("in_corpus").isNull()).alias("novel"),
        F.col("in_corpus").isNotNull().alias("seen_in_corpus"),
    )


def tool_arg_schema_drift(
    calls: DataFrame,
    payload: Column | str = "tool",
    day: Column | str = "day",
) -> DataFrame:
    """(tool_name, arg_key, n_calls, call_share, first_day, last_day):
    per tool, which argument keys its stored JSON payloads actually
    carry, how often, and over which observation window — the
    schema-evolution audit an agent-transcript pipeline runs before
    writing parsers/filters against tool payloads (keys appear and
    disappear as tool versions roll out; a parser pinned to last
    month's schema silently drops the new field's traces).

    ``calls`` holds one row per tool call with ``payload`` = the stored
    JSON (shape ``{"name": ..., "args": {...}}``) and ``day`` = the
    observation bucket (production: ``date_trunc('day', ts)`` cast to
    an int day number). ``call_share`` is n_calls for the key over the
    tool's total calls (a key at share 1.0 is required; a low share is
    optional or drifting in/out).

    Distributed shape: name/args extraction and key enumeration are
    narrow JVM expressions (get_json_object + json_object_keys — no
    Python, inside codegen), keys explode row-locally, and the only
    Exchanges are two partial-aggregated groupBys: (tool, key) cells
    and the |tools|-row totals, which broadcast back onto the cells.
    No shuffle carries payload text — only (name, key, day) triples.
    """
    p = F.col(payload) if isinstance(payload, str) else payload
    d = F.col(day) if isinstance(day, str) else day
    parsed = calls.select(
        F.get_json_object(p, "$.name").alias("tool_name"),
        F.get_json_object(p, "$.args").alias("args_json"),
        d.cast("int").alias("day"),
    )
    keys = parsed.select(
        "tool_name",
        "day",
        F.explode(F.json_object_keys("args_json")).alias("arg_key"),
    )
    totals = parsed.groupBy("tool_name").agg(
        F.count("*").cast("bigint").alias("tool_calls")
    )
    cells = keys.groupBy("tool_name", "arg_key").agg(
        F.count("*").cast("bigint").alias("n_calls"),
        F.min("day").cast("int").alias("first_day"),
        F.max("day").cast("int").alias("last_day"),
    )
    return cells.join(F.broadcast(totals), "tool_name").select(
        "tool_name",
        "arg_key",
        "n_calls",
        F.round(F.col("n_calls") / F.col("tool_calls"), 6).alias("call_share"),
        "first_day",
        "last_day",
    )


def tool_schema_diff(
    calls: DataFrame,
    payload: Column | str = "tool",
    day: Column | str = "day",
    split_day: int = 14,
) -> DataFrame:
    """(tool_name, arg_key, old_share, new_share, status): the
    era-over-era schema alert built on :func:`tool_arg_schema_drift` —
    split the observation window at ``split_day``, compute each key's
    call share within its era, and classify: ``added`` (new era only),
    ``removed`` (old era only), ``kept`` (both). This is the diff a
    pipeline fires on when a tool version rolls out: parsers pinned to
    removed keys break silently; added keys carry traces the current
    parser drops.

    Shape: two era-filtered passes of the drift audit (each: narrow
    parse + explode + two partial-aggregated groupBys + broadcast
    totals) full-outer hash-joined on the tiny (tool, key) cell key —
    the join input is |tools| x |keys| rows, never call volume."""
    d = F.col(day) if isinstance(day, str) else day
    old = tool_arg_schema_drift(
        calls.filter(d < split_day), payload, day
    ).select("tool_name", "arg_key", F.col("call_share").alias("old_share"))
    new = tool_arg_schema_drift(
        calls.filter(d >= split_day), payload, day
    ).select("tool_name", "arg_key", F.col("call_share").alias("new_share"))
    j = old.join(new, ["tool_name", "arg_key"], "full_outer")
    return j.select(
        "tool_name",
        "arg_key",
        "old_share",
        "new_share",
        F.when(F.col("old_share").isNull(), F.lit("added"))
        .when(F.col("new_share").isNull(), F.lit("removed"))
        .otherwise(F.lit("kept"))
        .alias("status"),
    )
