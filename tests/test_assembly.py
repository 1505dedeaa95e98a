from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from deduplicate_spark.config import DedupConfig, EMPTY_SHA1
from deduplicate_spark.operators.assembly import apply_excludes, assemble_docs


def test_turn_order_restored(spark):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering —
    the BASELINE invariant. Turns arrive shuffled; doc must be in-order."""
    rows = [
        ("c1", 2, "user", "third", "", None),
        ("c1", 0, "user", "first", "", None),
        ("c1", 1, "assistant", "second", "", None),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).repartition(3)
    docs = assemble_docs(turns).collect()
    assert docs[0]["doc_text"] == "first\nsecond\nthird"
    assert docs[0]["n_turns"] == 3
    assert docs[0]["total_len"] == len("first\nsecond\nthird")


def test_exact_sha_matches_python_sha1(spark):
    turns = spark.createDataFrame(
        [("c1", 0, "user", "hello world", "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    row = assemble_docs(turns).collect()[0]
    assert row["exact_sha"] == hashlib.sha1(b"hello world").hexdigest()
    assert row["prefix_sha"] == hashlib.sha1(b"hello world").hexdigest()


def test_empty_docs_get_zero_hash(spark):
    """All-empty conversations share EMPTY_SHA1 (the reference zero_hash
    semantics, dupe_analysis.py:31,335-340)."""
    turns = spark.createDataFrame(
        [("e1", 0, "user", "", "", None), ("e2", 0, "user", "", "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    rows = {r["conv_id"]: r for r in assemble_docs(turns).collect()}
    assert rows["e1"]["exact_sha"] == EMPTY_SHA1
    assert rows["e2"]["exact_sha"] == EMPTY_SHA1


def test_excludes(spark):
    turns = spark.createDataFrame(
        [
            ("c1", 0, "user", "keep me", "", None),
            ("c1", 1, "system", "drop me", "", None),
            ("c1", 2, "tool", "drop tool", "@internal", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    cfg = DedupConfig(exclude_roles=("system",), exclude_tool_prefixes=("@",))
    kept = apply_excludes(turns, cfg).collect()
    assert [r["text"] for r in kept] == ["keep me"]


def test_prefix_sha_only_covers_prefix(spark):
    a = "x" * 2000
    b = "x" * 1024 + "y" * 976  # same first 1024 chars, same length
    turns = spark.createDataFrame(
        [("a", 0, "user", a, "", None), ("b", 0, "user", b, "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    rows = {r["conv_id"]: r for r in assemble_docs(turns).collect()}
    assert rows["a"]["prefix_sha"] == rows["b"]["prefix_sha"]
    assert rows["a"]["exact_sha"] != rows["b"]["exact_sha"]


def test_assembly_single_shuffle(spark):
    """Plan check: assembly is one aggregate over one exchange."""
    turns = spark.createDataFrame(
        [("c1", 0, "user", "t", "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    plan = assemble_docs(turns)._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("exchange") <= 1


def test_empty_conversations(spark):
    from deduplicate_spark.operators.assembly import empty_conversations

    turns = spark.createDataFrame(
        [
            ("keep", 0, "user", "real text", "", None),
            ("excl", 0, "system", "only excluded rows", "", None),
            ("blank", 0, "user", "   ", "", None),
            ("blank", 1, "user", "", "", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    from deduplicate_spark.config import DedupConfig

    cfg = DedupConfig(exclude_roles=("system",))
    got = {(r["conv_id"], r["reason"]) for r in empty_conversations(turns, cfg).collect()}
    assert got == {("excl", "all_rows_excluded"), ("blank", "all_turns_blank")}


def test_debug_dump_ordered(spark):
    from deduplicate_spark.operators.assembly import assemble_docs, debug_dump

    turns = spark.createDataFrame(
        [("b", 0, "user", "bb", "", None), ("a", 0, "user", "aa", "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    rows = debug_dump(assemble_docs(turns)).collect()
    assert [r["conv_id"] for r in rows] == ["a", "b"]


def test_bucketed_input_assembly_needs_no_exchange(spark, tmp_path):
    """Production-layout claim (BENCH/BASELINE.md): over a conv_id-BUCKETED
    table (the Iceberg bucket-partitioned transcript layout), assembly's
    groupBy(conv_id) satisfies its clustering requirement from the scan —
    zero Exchange in the plan, so no text byte ever crosses the wire."""
    import pandas as pd

    from deduplicate_spark.schema import TRANSCRIPTS_SCHEMA

    rows = [(f"c{i%7}", i, "user", f"text {i}", "", None) for i in range(50)]
    turns = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]),
        TRANSCRIPTS_SCHEMA,
    )
    spark.sql("DROP TABLE IF EXISTS t_bucketed_asm")
    # managed table in the session warehouse; DROP TABLE below removes files
    (
        turns.write.mode("overwrite")
        .bucketBy(4, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .saveAsTable("t_bucketed_asm")
    )
    bt = spark.table("t_bucketed_asm")
    plan = assemble_docs(bt)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # identical docs to the plain (shuffled) path
    a = {(r.conv_id, r.exact_sha) for r in assemble_docs(bt).collect()}
    b = {(r.conv_id, r.exact_sha) for r in assemble_docs(turns).collect()}
    assert a == b
    spark.sql("DROP TABLE IF EXISTS t_bucketed_asm")
