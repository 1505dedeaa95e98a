"""Stage 0 — assemble turns into documents.

The analog of the reference's filesystem scan (S1, /root/reference/
dupe_analysis.py:160-232): the unit of dedup becomes one row per conversation
with ``doc_text`` = turn texts concatenated in (turn_idx) order.

Also computes the first two cascade keys right here so one shuffle produces
them all:
  * total_len   — pass-0 size key (H1; dupe_analysis.py:183-186)
  * prefix_sha  — sha1 of the first PREFIX chars (H2 beg_hash; dupe_analysis.py:437-439)
  * exact_sha   — sha1 of the whole doc (H4 full_hash; dupe_analysis.py:445-446)
Unlike the reference, hashing a column is ~free relative to the shuffle, so
we do not lazily defer full hashes; the *cascade* stays (later stages only
process collision groups) but hash computation is single-pass.

Empty docs get the reference's zero_hash treatment (S5;
dupe_analysis.py:31,335-340): all-empty conversations share EMPTY_SHA1 and
short-circuit into one cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduplicate_spark.config import DedupConfig, EMPTY_SHA1

PREFIX_CHARS = 1024  # beg_hash window size analog (dupe_analysis.py:19 chunk=1024)


def apply_excludes(turns: DataFrame, config: DedupConfig) -> DataFrame:
    """Exclusion filter (F1) — the reference compiles fnmatch globs into one
    alternation regex applied in-walk (dupe_analysis.py:29-30, 179-181,
    210-213). Here: role/tool filters + optional conv_id regex, all pushed
    into the scan by Catalyst."""
    out = turns
    if config.exclude_roles:
        out = out.filter(~F.col("role").isin(list(config.exclude_roles)))
    for pfx in config.exclude_tool_prefixes:
        out = out.filter(
            F.col("tool").isNull() | ~F.col("tool").startswith(pfx)
        )
    if config.exclude_conv_regex:
        out = out.filter(~F.col("conv_id").rlike(config.exclude_conv_regex))
    return out


def assemble_docs(turns: DataFrame, config: DedupConfig | None = None) -> DataFrame:
    """turns(conv_id, turn_idx, role, text, tool, ts) -> docs.

    One shuffle (groupBy conv_id); turn order restored via array_sort over
    (turn_idx, text) structs, preserving per-turn text equality under stable
    (conv_id, turn_idx) ordering (the BASELINE invariant).
    """
    config = config or DedupConfig()
    turns = apply_excludes(turns, config)

    assembled = (
        turns.groupBy("conv_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("turn_idx"), F.col("text")))
            ).alias("turns"),
        )
        .select(
            "conv_id",
            F.concat_ws(
                config.turn_separator,
                F.transform(F.col("turns"), lambda t: F.coalesce(t["text"], F.lit(""))),
            ).alias("doc_text"),
            F.size("turns").cast("int").alias("n_turns"),
        )
    )

    return doc_hash_keys(assembled)


def doc_hash_keys(assembled: DataFrame) -> DataFrame:
    """(conv_id, doc_text, n_turns) -> + the cascade key columns. Shared by
    batch assembly and the stateful-streaming sessionizer so both surfaces
    produce BYTE-IDENTICAL keys for the same conversation (pinned by
    tests/test_sessionize.py). Stateless projection — valid on a streaming
    DataFrame."""
    return assembled.select(
        "conv_id",
        "doc_text",
        "n_turns",
        F.length("doc_text").cast("long").alias("total_len"),
        # UTF-8 bytes, not chars: total_len (the H1 size key, reference
        # semantics) counts CHARS, which undercounts bytes up to 4x on
        # non-ASCII text — the measured broadcast-risk gates compare
        # against BYTE thresholds, so they get their own column, computed
        # in this same projection (no extra scan).
        F.octet_length("doc_text").cast("long").alias("total_bytes"),
        F.when(F.length(F.trim(F.col("doc_text"))) == 0, F.lit(EMPTY_SHA1))
        .otherwise(F.sha1(F.encode(F.substring("doc_text", 1, PREFIX_CHARS), "UTF-8")))
        .alias("prefix_sha"),
        F.when(F.length(F.trim(F.col("doc_text"))) == 0, F.lit(EMPTY_SHA1))
        .otherwise(F.sha1(F.encode(F.col("doc_text"), "UTF-8")))
        .alias("exact_sha"),
    )


def empty_conversations(turns: DataFrame, config: DedupConfig | None = None) -> DataFrame:
    """G6 analog (deduplicate.py:533-537; dupe_analysis.py:636-638): the
    reference injects empty dirs as deletable objects. Here: conv_ids whose
    rows are ALL excluded or all-blank — they produce no dedup cluster but
    must still surface in reports as droppable. Returns (conv_id, reason)."""
    config = config or DedupConfig()
    all_ids = turns.select("conv_id").distinct()
    surviving = apply_excludes(turns, config).select("conv_id").distinct()
    fully_excluded = all_ids.join(surviving, "conv_id", "left_anti").select(
        "conv_id", F.lit("all_rows_excluded").alias("reason")
    )
    blank = (
        apply_excludes(turns, config)
        .groupBy("conv_id")
        .agg(F.max(F.length(F.trim(F.coalesce("text", F.lit(""))))).alias("_max_len"))
        .filter(F.col("_max_len") == 0)
        .select("conv_id", F.lit("all_turns_blank").alias("reason"))
    )
    return fully_excluded.unionByName(blank)


def debug_dump(docs: DataFrame) -> DataFrame:
    """S11 analog (dupe_analysis.py:504-530): deterministic ordered dump of
    the docs table for golden-test support."""
    return docs.orderBy("conv_id").select(
        "conv_id", "n_turns", "total_len", "prefix_sha", "exact_sha"
    )


def turns_roundtrip_check(turns: DataFrame, docs: DataFrame, config: DedupConfig) -> int:
    """Invariant check: every (conv_id, turn_idx) text survives assembly in
    order. Returns the number of violating conversations (0 == pass)."""
    config = config or DedupConfig()
    expected = assemble_docs(turns, config).select("conv_id", "doc_text")
    joined = expected.alias("e").join(docs.alias("d"), "conv_id", "inner")
    return joined.filter(F.col("e.doc_text") != F.col("d.doc_text")).count()
