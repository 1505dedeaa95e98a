from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from deduplicate_spark.config import DedupConfig
from deduplicate_spark.oracle import (
    assemble_docs_pandas,
    oracle_dup_pairs,
    pair_recall,
)
from deduplicate_spark.pipeline import dup_pairs_from_clusters, run_pipeline

CFG = DedupConfig(exclude_roles=("system",), enable_substring_pass=True)


@pytest.fixture(scope="module")
def result(spark, turns_df):
    res = run_pipeline(spark, turns_df, CFG)
    res.clusters = res.clusters.cache()
    res.actions = res.actions.cache()
    return res


@pytest.fixture(scope="module")
def found_pairs(result) -> set[tuple[str, str]]:
    return {(r["a"], r["b"]) for r in dup_pairs_from_clusters(result.clusters).collect()}


def _expected_pairs(manifest: pd.DataFrame, levels: set[str]) -> set[tuple[str, str]]:
    out = set()
    for _, row in manifest.iterrows():
        if row["expected_level"] in levels:
            a, b = sorted([row["conv_a"], row["conv_b"]])
            out.add((a, b))
    return out


def test_planted_exact_recall(found_pairs, manifest):
    expected = _expected_pairs(manifest, {"exact"})
    rec = pair_recall(found_pairs, expected)
    assert rec == 1.0, f"exact recall {rec}: missing {expected - found_pairs}"


def test_planted_near_recall(found_pairs, manifest):
    expected = _expected_pairs(manifest, {"near"})
    rec = pair_recall(found_pairs, expected)
    assert rec >= 0.99, f"near recall {rec}: missing {expected - found_pairs}"


def test_planted_substring_recall(found_pairs, manifest):
    expected = _expected_pairs(manifest, {"substring"})
    rec = pair_recall(found_pairs, expected)
    assert rec >= 0.99, f"substring recall {rec}: missing {expected - found_pairs}"


def test_excluded_dup_not_detected(found_pairs, manifest):
    """The system-role copy is filtered pre-cascade (reference exclude
    semantics) — it must NOT pair with its source."""
    for _, row in manifest[manifest["kind"] == "excluded"].iterrows():
        a, b = sorted([row["conv_a"], row["conv_b"]])
        assert (a, b) not in found_pairs


def test_empty_docs_form_one_cluster(result):
    rows = result.clusters.filter(F.col("conv_id").startswith("empty/")).collect()
    assert len(rows) == 3
    assert len({r["cluster_id"] for r in rows}) == 1


def test_clustering_is_partition(result):
    assert (
        result.clusters.groupBy("conv_id").count().filter("count > 1").count() == 0
    )


def test_recall_vs_pure_python_oracle(spark, corpus, found_pairs):
    """Spark pipeline vs the driver-side reference-semantics oracle at the
    SAME config — the BASELINE recall >= 0.99 gate, both directions."""
    turns_pd, _ = corpus
    docs_pd = assemble_docs_pandas(turns_pd, CFG)
    expected = oracle_dup_pairs(docs_pd, CFG)
    rec = pair_recall(found_pairs, expected)
    prec_proxy = pair_recall(expected, found_pairs)  # reverse containment
    assert rec >= 0.99, f"recall vs oracle {rec}"
    assert prec_proxy >= 0.99, f"oracle containment {prec_proxy}"


def test_actions_one_keep_per_cluster(result):
    keeps = (
        result.actions.filter(F.col("action") == "keep")
        .groupBy("cluster_id")
        .count()
        .filter("count != 1")
        .count()
    )
    assert keeps == 0


def test_actions_canonical_is_member(result):
    bad = result.actions.filter(
        (F.col("conv_id") == F.col("canonical_conv_id"))
        & (F.col("action") != "keep")
    ).count()
    assert bad == 0


def test_report_totals(result):
    rep = result.report.agg(
        F.sum("n_members").alias("m"), F.sum("n_deletes").alias("d")
    ).collect()[0]
    n_members = result.clusters.count()
    n_deletes = result.actions.filter("action = 'delete'").count()
    assert rep["m"] == n_members
    assert rep["d"] == n_deletes


def test_prefix_prefilter_prunes_kernel_but_keeps_shared_prefix_dups(spark):
    """beg_hash cascade stage (reference pass-1, dupe_analysis.py:369-370):
    prefix-distinct singletons never reach the kernel; near-dups that share
    their opening still cluster identically."""
    from deduplicate_spark.config import DedupConfig
    from deduplicate_spark.pipeline import run_pipeline

    # must exceed PREFIX_CHARS=1024 so the differing tails fall outside the
    # beg_hash window
    base = "shared opening paragraph that both variants start with " * 20
    rows = [
        ("v/a", 0, "user", base + "tail alpha variant", "", None),
        ("v/b", 0, "user", base + "tail bravo variant!", "", None),
    ]
    # prefix-distinct singletons: genuinely unrelated content, no dup partner
    solo_texts = [
        "grilled asparagus recipes rarely mention the maillard threshold",
        "quarterly treasury yields inverted before the manufacturing print",
        "the violin luthier reglued the cracked soundpost under tension",
        "orbital mechanics homework: compute the hohmann transfer window",
        "migrating cranes navigate by polarized light and river corridors",
        "the compiler lowered the loop into a single fused multiply add",
    ]
    for i, t in enumerate(solo_texts):
        rows.append((f"solo/{i}", 0, "user", (t + " ") * 6, "", None))
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    res_off = run_pipeline(spark, turns, DedupConfig(prefix_prefilter=False))
    res_on = run_pipeline(spark, turns, DedupConfig(prefix_prefilter=True))
    # kernel input shrinks: only the two shared-prefix variants are signed
    assert res_off.signatures.count() == 8
    assert res_on.signatures.count() == 2
    # and the near-dup cluster is identical
    clus = lambda r: {
        tuple(sorted([x.conv_id for x in r.clusters.collect()]))
    }
    assert clus(res_on) == clus(res_off) == {("v/a", "v/b")}


def test_internal_long_ids_output_identical_to_string_path(spark):
    """internal_long_ids=True runs signatures/LSH/CC on xxhash64 longs (half
    the shuffle width of string ids) but must produce byte-identical public
    outputs: cluster membership, cluster_id = min STRING conv_id, actions."""
    from deduplicate_spark.config import DedupConfig
    from deduplicate_spark.datagen import generate_transcripts
    from deduplicate_spark.pipeline import run_pipeline
    from deduplicate_spark.schema import TRANSCRIPTS_SCHEMA

    turns_pd, _ = generate_transcripts(n_base=40, seed=31)
    turns = spark.createDataFrame(turns_pd, schema=TRANSCRIPTS_SCHEMA)

    def snap(cfg):
        res = run_pipeline(spark, turns, cfg)
        cl = {(r.conv_id, r.cluster_id) for r in res.clusters.collect()}
        ac = {
            (r.conv_id, r.cluster_id, r.canonical_conv_id, r.action)
            for r in res.actions.collect()
        }
        return cl, ac

    for kw in [dict(enable_substring_pass=True), dict(complete_hash=True)]:
        on = snap(DedupConfig(internal_long_ids=True, **kw))
        off = snap(DedupConfig(internal_long_ids=False, **kw))
        assert on == off, f"long-id path diverged for {kw}"
        assert len(on[0]) > 0  # non-vacuous: dups exist in this corpus


def test_relabel_join_never_broadcasts(spark):
    """The id->string relabel join is corpus-sized on BOTH sides for real
    dup rates — it must plan as a sort-merge join, never a driver-built
    broadcast (measured OOM at 6.5M turns when Catalyst broadcast it)."""
    from pyspark.sql import functions as F

    from deduplicate_spark.pipeline import relabel_components

    docs = spark.range(100).select(
        F.concat(F.lit("conv/"), F.col("id")).alias("conv_id")
    )
    comps = spark.range(50).select(
        F.xxhash64(F.concat(F.lit("conv/"), F.col("id"))).alias("conv_id"),
        F.xxhash64(F.concat(F.lit("conv/"), F.col("id") % 10)).alias("cluster_id"),
    )
    out = relabel_components(comps, docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert out.count() == 50


def test_auto_forced_smj_resolution_output_invariant(spark):
    """forced_smj=None (default) resolves from measured corpus size inside
    run_pipeline; on any corpus the resolved plan must produce outputs
    identical to both explicit settings."""
    from deduplicate_spark.config import DedupConfig
    from deduplicate_spark.datagen import generate_transcripts
    from deduplicate_spark.pipeline import run_pipeline
    from deduplicate_spark.schema import TRANSCRIPTS_SCHEMA

    turns_pd, _ = generate_transcripts(n_base=20, seed=61)
    turns = spark.createDataFrame(turns_pd, schema=TRANSCRIPTS_SCHEMA)

    def snap(cfg):
        res = run_pipeline(spark, turns, cfg)
        return (
            {(r.conv_id, r.cluster_id) for r in res.clusters.collect()},
            {
                (r.conv_id, r.canonical_conv_id, r.action)
                for r in res.actions.collect()
            },
        )

    auto = snap(DedupConfig())  # resolves False at this scale
    assert auto == snap(DedupConfig(forced_smj=True, rescue_short_circuit=True))
    assert auto == snap(DedupConfig(forced_smj=False, rescue_short_circuit=False))
    assert len(auto[0]) > 0


def test_collision_guard_distinguishes_defects(spark):
    """ADVICE r4: null conv_id, duplicate conv_id, and a genuine hash
    collision are three different defects — the guard must name the right
    one (the old message always prescribed internal_long_ids=False, which
    only fixes the collision case)."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from deduplicate_spark.pipeline import assert_no_id_collisions

    dup = spark.createDataFrame([("a",), ("a",), ("b",)], "conv_id string")
    with _pytest.raises(ValueError, match="duplicate conv_id"):
        assert_no_id_collisions(dup)
    nulls = spark.createDataFrame([("a",), (None,)], "conv_id string")
    with _pytest.raises(ValueError, match="null conv_id"):
        assert_no_id_collisions(nulls)


def test_long_id_collision_guard(spark):
    """ADVICE r3: the internal_long_ids path must fail loudly when two
    conv_ids collide in xxhash64 (injected here via a constant hash column —
    real 64-bit collisions are unconstructible in a test)."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from deduplicate_spark.pipeline import assert_no_id_collisions

    docs = spark.createDataFrame([("a",), ("b",)], "conv_id string")
    assert_no_id_collisions(docs)  # real hashes: no collision
    with _pytest.raises(ValueError, match="collision"):
        assert_no_id_collisions(docs, hash_col=F.lit(1))


def test_oph_mode_matches_oracle_and_planted(spark, turns_df, corpus, manifest):
    """OPH signature mode: the distributed pipeline must equal the
    pure-Python reference-semantics oracle exactly (both running OPH — the
    recall-gate contract), and planted exact dups are always found. Planted
    NEAR recall is asserted as a floor, not 1.0: one planted prefix pair
    sits at J=0.589, below the confirmation design point (hamming 12 ~
    J 0.7, est-J rescue 0.7); the perm mode catches it only transitively
    through a third variant, which an estimator with different per-pair
    noise is not required to reproduce."""
    from deduplicate_spark.oracle import assemble_docs_pandas, oracle_dup_pairs

    cfg = DedupConfig(minhash_mode="oph")
    res = run_pipeline(spark, turns_df, cfg)
    found = {(r["a"], r["b"]) for r in dup_pairs_from_clusters(res.clusters).collect()}
    turns_pd, _ = corpus
    oracle = oracle_dup_pairs(assemble_docs_pandas(turns_pd, cfg), cfg)
    assert pair_recall(found, oracle) == 1.0, "pipeline missed oracle pairs"
    assert pair_recall(oracle, found) == 1.0, "pipeline found non-oracle pairs"
    assert pair_recall(found, _expected_pairs(manifest, {"exact"})) == 1.0
    assert pair_recall(found, _expected_pairs(manifest, {"near"})) >= 0.85
