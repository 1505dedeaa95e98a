"""Canonical schemas.

The ``transcripts`` input schema is fixed by the target contract
(BASELINE.json input_hint): one row per turn of a multi-turn conversation.
It is the analog of the reference's ``files`` table
(/root/reference/dupe_analysis.py:58-68) with conv_id <-> path and the turn
texts <-> file bytes.
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# stage 0 output: one row per conversation (the "file" of the reference)
DOCS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("doc_text", T.StringType(), True),
        T.StructField("n_turns", T.IntegerType(), False),
        T.StructField("total_len", T.LongType(), False),
        T.StructField("prefix_sha", T.StringType(), True),
        T.StructField("exact_sha", T.StringType(), True),
    ]
)

# stage 2 output
SIGNATURES_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("minhash", T.ArrayType(T.LongType()), False),
        T.StructField("simhash", T.LongType(), False),
        T.StructField("n_shingles", T.IntegerType(), False),
    ]
)

# candidate / confirmed pair edge list
PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("a", T.StringType(), False),
        T.StructField("b", T.StringType(), False),
        T.StructField("evidence", T.StringType(), False),
    ]
)

CLUSTERS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("cluster_id", T.StringType(), False),
    ]
)

ACTIONS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("cluster_id", T.StringType(), False),
        T.StructField("canonical_conv_id", T.StringType(), False),
        T.StructField("action", T.StringType(), False),
        T.StructField("freed_len", T.LongType(), False),
    ]
)
