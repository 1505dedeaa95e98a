"""Skew-safe bucket stats: the shared salted helper (operators/skew.py) and
its use in the substring pass (VERDICT r2 #2 — the fp window was the last
unsalted hot-bucket window in the repo)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from deduplicate_spark.config import DedupConfig
from deduplicate_spark.operators.skew import tag_bucket_stats
from deduplicate_spark.operators.substring import substring_pairs


def test_tag_bucket_stats_salted_equals_window(spark):
    rows = [(f"d{i:03d}", (i % 3)) for i in range(30)] + [("solo", 99)]
    df = spark.createDataFrame(rows, "conv_id string, k int")
    salted = tag_bucket_stats(df, "k", salt_buckets=8)
    window = tag_bucket_stats(df, "k", salt_buckets=0)
    snap = lambda d: {  # noqa: E731
        (r.conv_id, r.k, r.bucket_n, r.bucket_rep) for r in d.collect()
    }
    assert snap(salted) == snap(window)
    # collision-only: the singleton bucket never survives
    assert all(n > 1 for _, _, n, _ in snap(salted))
    # no window partition in the salted physical plan (AQE can split joins,
    # not window partitions), and the stats join-back must be sort-merge —
    # never a driver-built broadcast (OOM at scale, measured at 6.5M turns)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan


def _mega_fp_docs(spark, n):
    """n docs sharing one long exact substring (every winnowing fingerprint
    of the shared region is an n-member hot bucket) + unique md5 tails so
    no two docs are exact dups and tails share no 16-char run."""
    shared = "the same boilerplate preamble text block " * 12  # ~500 chars
    rows = []
    for i in range(n):
        tail = "".join(
            hashlib.md5(f"{i}:{j}".encode()).hexdigest() for j in range(3)
        )
        rows.append((f"m{i:06d}", shared + tail))
    return spark.createDataFrame(rows, "conv_id string, doc_text string")


def test_mega_fingerprint_star_edges_no_window_straggler(spark):
    """A fingerprint bucket far above allpairs_max must produce star edges
    to the bucket min, identically under the salted and window stat paths —
    the substring-pass mirror of test_mega_band_star_edges_no_blowup."""
    n = 2000
    docs = _mega_fp_docs(spark, n).repartition(8)
    cfg_s = DedupConfig(enable_substring_pass=True, band_salt_buckets=16)
    cfg_w = DedupConfig(enable_substring_pass=True, band_salt_buckets=0)
    pairs_s = {(r.a, r.b) for r in substring_pairs(docs, cfg_s).collect()}
    pairs_w = {(r.a, r.b) for r in substring_pairs(docs, cfg_w).collect()}
    assert pairs_s == pairs_w
    # the full-membership hot buckets star every doc to the global min;
    # boundary-window subset buckets may add a few extra (verified) stars
    # to their own reps, but the total stays O(n) — never the n^2/2 clique
    rep = f"m{0:06d}"
    assert {(rep, f"m{i:06d}") for i in range(1, n)} <= pairs_s
    assert len(pairs_s) < 3 * n


def test_forced_smj_knob(spark):
    """forced_smj=False restores planner freedom (broadcast allowed on a
    small corpus); the default keeps the SMJ insurance that the plan-shape
    tests above pin."""
    rows = [(f"d{i:03d}", i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "conv_id string, k int")
    free = tag_bucket_stats(df, "k", salt_buckets=8, forced_smj=False)
    snap = lambda d: {  # noqa: E731
        (r.conv_id, r.k, r.bucket_n, r.bucket_rep) for r in d.collect()
    }
    assert snap(free) == snap(tag_bucket_stats(df, "k", salt_buckets=8))
    # AQE's FINAL plan (post-execution) converts the tiny stats join to a
    # broadcast once the hint is gone; with the hint (default) the
    # plan-shape tests above pin SortMergeJoin even here
    plan = free._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan


def test_confirm_attach_never_broadcasts_signatures(spark):
    """The rescue attach carries ~1KB minhash arrays per signature row; a
    planner under-estimate built it as a 1.15 GB driver-side broadcast at
    6.5M turns/local[2] (maxResultSize abort). Default config must pin
    sort-merge on every signature attach."""
    from deduplicate_spark.operators.simhash import confirm_pairs

    cfg = DedupConfig(num_perm=8, lsh_bands=4, lsh_rows=2)
    sigs = spark.createDataFrame(
        [(f"c{i}", i * 7, [int(i)] * 8) for i in range(50)],
        "conv_id string, simhash long, minhash array<long>",
    )
    pairs = spark.createDataFrame(
        [(f"c{i}", f"c{i+1}", "lsh") for i in range(0, 40, 2)],
        "a string, b string, evidence string",
    )
    # confirm_pairs lineage-cuts its attach (the joins execute inside the
    # cut), so pin the join shape on the attach unit itself — both the
    # narrow (hamming) and the wide (minhash-carrying rescue) forms
    from deduplicate_spark.operators.simhash import attach_signatures

    for with_minhash in (False, True):
        plan = (
            attach_signatures(pairs, sigs, with_minhash=with_minhash)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" not in plan, plan
        assert "SortMergeJoin" in plan, plan
    # and the full confirm still produces the right pairs through the cut
    assert confirm_pairs(pairs, sigs, config=cfg).count() == 20


def test_measured_forced_smj_gate():
    """forced_smj=None resolves off MEASURED corpus counts (VERDICT r4 #1):
    small corpora keep planner freedom; any of the three broadcast-risk
    proxies (rows, text bytes, signature bytes) forces the SMJ insurance."""
    from deduplicate_spark.operators.skew import measured_forced_smj

    cfg = DedupConfig()
    assert not measured_forced_smj(5_000, 2_000_000, cfg)  # sf0.1-scale: free
    assert measured_forced_smj(2_000_000, 0, cfg)  # row gate
    assert measured_forced_smj(1_000, 100 * 1024 * 1024, cfg)  # text bytes
    # signature-table bytes: n_docs * num_perm * 8 = 100k * 1 KB > 64 MB —
    # the measured 1.15 GB broadcast class at 6.5M turns trips this proxy
    assert measured_forced_smj(100_000, 0, cfg)


def test_maybe_merge_hint_none_is_scale_safe(spark):
    """An operator called with forced=None (no measurement available) must
    keep the merge hint — None only relaxes via run_pipeline's measured
    resolution, never silently."""
    from deduplicate_spark.operators.skew import maybe_merge_hint

    small = spark.range(10).select(F.col("id").alias("k"))
    big = spark.range(1000).select(F.col("id").alias("k"))
    plan = (
        big.join(maybe_merge_hint(small, None), "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in plan and "BroadcastHashJoin" not in plan


def test_measured_small_corpus_gate():
    """kernel_small_corpus=None resolves off the MEASURED text bytes: tiny
    corpora get the kernel-parallelism floor (AQE's byte-based coalescing
    would hand the CPU-bound kernels 1-4 partitions), big corpora never pay
    the extra text shuffle."""
    from deduplicate_spark.operators.skew import measured_small_corpus

    cfg = DedupConfig()  # shuffle_partitions=32 -> gate at 128 MB
    assert measured_small_corpus(25 * 1024 * 1024, cfg)  # sf0.1-scale text
    assert not measured_small_corpus(1_600 * 1024 * 1024, cfg)  # 6.5M turns


def test_kernel_parallelism_floor_applied_when_small(spark, turns_df):
    """On a measured-small corpus the signature kernel input is spread to
    shuffle_partitions tasks (the checkpointed signatures table carries the
    repartitioned partitioning); pinned False leaves the plan untouched."""
    from deduplicate_spark.pipeline import run_pipeline

    res = run_pipeline(spark, turns_df, DedupConfig())  # auto-resolves small
    assert res.signatures.rdd.getNumPartitions() == DedupConfig().shuffle_partitions
    res_off = run_pipeline(spark, turns_df, DedupConfig(kernel_small_corpus=False))
    assert res_off.signatures.rdd.getNumPartitions() < DedupConfig().shuffle_partitions


def test_measured_text_stats_two_phase_bytes(spark):
    """The byte gates must measure BYTES (VERDICT r5: chars undercount
    UTF-8 up to 4x — a CJK corpus under the char threshold could dodge the
    forced-SMJ insurance on text 4x over it). Far from every threshold the
    cheap chars column decides; inside the [chars, 4*chars] ambiguity band
    the exact octet_length is aggregated."""
    from dataclasses import replace

    from deduplicate_spark.operators.skew import measured_text_stats

    cfg = DedupConfig()
    # 3-byte CJK chars: 40 chars -> 120 bytes per row
    cjk = spark.createDataFrame([("世" * 40,)] * 10, "text string")
    # thresholds far below chars: decided by the cheap phase, lo is enough
    tiny = replace(cfg, forced_smj_min_bytes=100, shuffle_partitions=0)
    n, b = measured_text_stats(cjk, tiny)
    assert (n, b) == (10, 400)  # lower bound, same decision as true 1200
    # threshold inside [400, 1600]: exact bytes required and returned
    mid = replace(cfg, forced_smj_min_bytes=800, shuffle_partitions=0)
    n, b = measured_text_stats(cjk, mid)
    assert (n, b) == (10, 1200)  # true UTF-8 bytes -> 1200 > 800 forces SMJ
    # precomputed chars column is honored in the cheap phase
    withc = cjk.select("text", F.length("text").alias("n_chars"))
    n, b = measured_text_stats(withc, mid, chars_col="n_chars")
    assert (n, b) == (10, 1200)


def test_assembled_docs_carry_true_byte_length(spark):
    """assemble_docs computes total_bytes (UTF-8) beside total_len (chars)
    in the same projection; corpus_stats prefers it, so the pipeline's
    measured gates see bytes even on non-ASCII corpora."""
    import pandas as pd

    from deduplicate_spark.operators.assembly import assemble_docs
    from deduplicate_spark.pipeline import corpus_stats
    from deduplicate_spark.schema import TRANSCRIPTS_SCHEMA

    turns = spark.createDataFrame(
        pd.DataFrame(
            [("c0", 0, "user", "世界" * 5, "", None)],
            columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
        ),
        TRANSCRIPTS_SCHEMA,
    )
    docs = assemble_docs(turns, DedupConfig())
    row = docs.first()
    assert row.total_len == 10 and row.total_bytes == 30
    st = corpus_stats(docs.drop("doc_text"), verify_ids=False)
    assert st.total_bytes == 30
