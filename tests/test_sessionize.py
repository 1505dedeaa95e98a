from __future__ import annotations

import os
import time

import pandas as pd

from deduplicate_spark.config import DedupConfig
from deduplicate_spark.datagen import generate_transcripts
from deduplicate_spark.schema import TRANSCRIPTS_SCHEMA
from deduplicate_spark.streaming.sessionize import assemble_session


class _StubState:
    """Minimal GroupState double: just enough surface for the state fn."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.timeout_ms = None
        self.removed = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        assert self._v is not None
        return self._v

    def update(self, v):
        self._v = v

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms

    def remove(self):
        self._v = None
        self.removed = True


def test_assemble_session_buffers_then_emits_on_timeout():
    st = _StubState()
    # two triggers of turns, out of order across them
    out1 = list(
        assemble_session(
            ("c1",),
            [pd.DataFrame({"turn_idx": [2, 0], "text": ["third", "first"]})],
            st,
            gap_ms=100,
        )
    )
    assert out1 == [] and st.exists and st.timeout_ms == 100
    out2 = list(
        assemble_session(
            ("c1",), [pd.DataFrame({"turn_idx": [1], "text": ["second"]})], st, gap_ms=100
        )
    )
    assert out2 == [] and st.get == ([2, 0, 1], ["third", "first", "second"])

    st.hasTimedOut = True
    rows = list(assemble_session(("c1",), [], st, gap_ms=100))
    assert len(rows) == 1 and st.removed
    row = rows[0].iloc[0]
    # (turn_idx, text) sort order + separator: identical to batch assembly
    assert row.conv_id == "c1"
    assert row.doc_text == "first\nsecond\nthird"
    assert row.n_turns == 3


def test_assemble_session_null_text_joins_as_empty():
    st = _StubState()
    list(
        assemble_session(
            ("c2",), [pd.DataFrame({"turn_idx": [0, 1], "text": [None, "tail"]})], st
        )
    )
    st.hasTimedOut = True
    row = list(assemble_session(("c2",), [], st))[0].iloc[0]
    assert row.doc_text == "\ntail"


def test_assemble_session_null_tiebreak_matches_struct_order():
    """ADVICE r5: two turns sharing a turn_idx, one with null text, must not
    crash the sort (None vs str is unorderable) and must order the null
    FIRST — Spark's array_sort(struct(turn_idx, text)) semantics, i.e. the
    batch path's byte-parity contract."""
    st = _StubState()
    list(
        assemble_session(
            ("c3",),
            [pd.DataFrame({"turn_idx": [0, 0, 1], "text": ["alpha", None, "tail"]})],
            st,
        )
    )
    st.hasTimedOut = True
    row = list(assemble_session(("c3",), [], st))[0].iloc[0]
    # null-at-idx-0 sorts before "alpha" at idx 0 -> "", "alpha", "tail"
    assert row.doc_text == "\nalpha\ntail"
    assert row.n_turns == 3


def test_sessionize_stream_matches_batch_assembly(spark, tmp_path):
    """End-to-end streaming query: documents emitted by the session-window
    operator carry byte-identical cascade keys to batch assemble_docs on
    the same corpus (shared doc_hash_keys projection, shared turn order)."""
    from deduplicate_spark.operators.assembly import assemble_docs
    from deduplicate_spark.streaming.sessionize import sessionize_turns

    turns_pd, _ = generate_transcripts(n_base=8, seed=23)
    src = tmp_path / "turns_in"
    os.makedirs(src)
    cfg = DedupConfig(exclude_roles=("system",))
    spark.createDataFrame(turns_pd, TRANSCRIPTS_SCHEMA).write.parquet(
        str(src / "part0"), mode="overwrite"
    )

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 100)
        .parquet(str(src / "*"))
    )
    docs = sessionize_turns(stream, cfg, gap_ms=500)
    q = (
        docs.writeStream.format("memory")
        .queryName("sess_docs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # With ProcessingTimeTimeout the query keeps firing timer-driven
        # micro-batches on its own (no new files needed — and it never
        # becomes idle, so processAllAvailable() would block forever);
        # poll the sink until every session gap has expired and emitted.
        expected = assemble_docs(
            spark.createDataFrame(turns_pd, TRANSCRIPTS_SCHEMA), cfg
        )
        n_expected = expected.count()
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("sess_docs").count() >= n_expected:
                break
            time.sleep(1.0)
        got = {
            (r.conv_id, r.exact_sha, r.prefix_sha, r.n_turns, r.total_len, r.total_bytes)
            for r in spark.table("sess_docs").collect()
        }
        want = {
            (r.conv_id, r.exact_sha, r.prefix_sha, r.n_turns, r.total_len, r.total_bytes)
            for r in expected.collect()
        }
        assert got == want
    finally:
        q.stop()
