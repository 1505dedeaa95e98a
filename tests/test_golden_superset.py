"""Verbatim port of the reference's superset e2e goldens
(/root/reference/test_deduplicate.py:241-273, test_superset + test_superset2)
into the transcripts fixture: same file layout, same content rule (content =
basename fragment before '_'), same expected surviving set.

The reference's greedy multi-pass keep/delete (deduplicate.py:269-344)
elects the superset directory; our window election under policy='group'
must produce the identical keep/delete partition."""

from __future__ import annotations

import pytest

from deduplicate_spark.config import DedupConfig
from deduplicate_spark.operators.resolve import actions as make_actions
from deduplicate_spark.pipeline import run_pipeline


def _content(path: str) -> str:
    # reference generate_input: file content = basename fragment before '_'
    return path.rsplit("/", 1)[-1].split("_")[0]


def _run(spark, input_paths):
    rows = [(p, 0, "user", _content(p), "", None) for p in input_paths]
    turns = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    res = run_pipeline(spark, turns, DedupConfig())
    acts = make_actions(res.clusters, res.docs, policy="group")
    deleted = {r.conv_id for r in acts.filter("action = 'delete'").collect()}
    survivors = set(input_paths) - deleted
    return survivors, acts


def test_superset(spark):
    # folder2 is a strict subset of folder1 -> folder2 deleted whole
    input_paths = [
        "folder1/file1",
        "folder1/file2",
        "folder1/file3",
        "folder2/file1",
        "folder2/file2",
    ]
    expected_output = {
        "folder1/file1",
        "folder1/file2",
        "folder1/file3",
    }
    survivors, _ = _run(spark, input_paths)
    assert survivors == expected_output


def test_superset2(spark):
    # mirror case: folder2 holds the extra file -> folder1 deleted whole
    input_paths = [
        "folder1/file1",
        "folder1/file2",
        "folder2/file1",
        "folder2/file2",
        "folder2/file3",
    ]
    expected_output = {
        "folder2/file1",
        "folder2/file2",
        "folder2/file3",
    }
    survivors, _ = _run(spark, input_paths)
    assert survivors == expected_output


def test_simple(spark):
    # test_simple analog (test_deduplicate.py:196-208): two same-content
    # files in one folder collapse to one keeper; the unrelated file stays
    input_paths = ["folder1/file1_a", "folder1/file1_b", "folder2/file2"]
    survivors, acts = _run(spark, input_paths)
    assert "folder2/file2" in survivors
    kept_dupes = survivors & {"folder1/file1_a", "folder1/file1_b"}
    assert len(kept_dupes) == 1
