from __future__ import annotations

import glob

from pyspark.sql import functions as F

from deduplicate_spark.operators.rollup import group_rollup, prefix_explode, write_report_csv


def test_prefix_explode(spark):
    df = spark.createDataFrame([("a/b/c",), ("x/y",), ("flat",)], "conv_id string")
    rows = sorted(
        (r["conv_id"], r["group_prefix"]) for r in prefix_explode(df).collect()
    )
    assert rows == [
        ("a/b/c", "a"),
        ("a/b/c", "a/b"),
        ("flat", ""),
        ("x/y", "x"),
    ]


def _fixture(spark):
    docs = spark.createDataFrame(
        [
            ("s1/a", 100),
            ("s1/b", 200),
            ("s2/a", 100),
            ("s2/sub/c", 50),
        ],
        "conv_id string, total_len long",
    )
    actions = spark.createDataFrame(
        [
            ("s1/a", "s1/a", "s1/a", "keep", 0),
            ("s2/a", "s1/a", "s1/a", "delete", 100),
        ],
        "conv_id string, cluster_id string, canonical_conv_id string, action string, freed_len long",
    )
    return docs, actions


def test_group_rollup(spark):
    docs, actions = _fixture(spark)
    rows = {r["group_prefix"]: r for r in group_rollup(actions, docs).collect()}
    # s1: 2 members, 1 dupe, 0 deletes
    assert rows["s1"]["n_members"] == 2
    assert rows["s1"]["n_dupes"] == 1
    assert rows["s1"]["n_deletes"] == 0
    assert not rows["s1"]["is_full_dupe"]
    # s2: 2 members (a, sub/c), 1 dupe, 1 delete, 100 reclaimable
    assert rows["s2"]["n_members"] == 2
    assert rows["s2"]["n_deletes"] == 1
    assert rows["s2"]["reclaimable_len"] == 100
    # s2/sub rolls up separately
    assert rows["s2/sub"]["n_members"] == 1
    # full-dupe flag: a prefix whose every member is clustered
    assert rows["s2"]["is_full_dupe"] is False


def test_write_report_csv(spark, tmp_path):
    docs, actions = _fixture(spark)
    out = str(tmp_path / "report_csv")
    write_report_csv(actions, out)
    files = glob.glob(f"{out}/*.csv")
    assert files
    content = "".join(open(f).read() for f in files)
    assert "to_delete" in content
    assert "s2/a" in content


def test_dirs_adjacency_and_dir_info(spark):
    """F4 full analog: the (dirpath, subdir) adjacency table and the
    get_dir_info direct-children query (dupe_analysis.py:70-74, 564-584)."""
    from deduplicate_spark.operators.rollup import dir_info, dirs_adjacency

    docs = spark.createDataFrame(
        [("a/x/1",), ("a/x/2",), ("a/y/3",), ("b/4",), ("root5",)],
        "conv_id string",
    )
    edges = {(r.dirpath, r.subdir) for r in dirs_adjacency(docs).collect()}
    assert edges == {("", "a"), ("", "b"), ("a", "a/x"), ("a", "a/y")}

    info_a = {(r.path, r.kind) for r in dir_info(docs, "a").collect()}
    assert info_a == {("a/x", "subdir"), ("a/y", "subdir")}
    info_ax = {(r.path, r.kind) for r in dir_info(docs, "a/x").collect()}
    assert info_ax == {("a/x/1", "file"), ("a/x/2", "file")}
    info_root = {(r.path, r.kind) for r in dir_info(docs, "").collect()}
    assert info_root == {("root5", "file"), ("a", "subdir"), ("b", "subdir")}
