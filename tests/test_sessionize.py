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

    def __init__(self, watermark_ms=0):
        self._v = None
        self.hasTimedOut = False
        self.timeout_ms = None
        self.timeout_ts = None
        self.removed = False
        self._watermark_ms = watermark_ms

    def getCurrentWatermarkMs(self):
        return self._watermark_ms

    def setTimeoutTimestamp(self, ts_ms):
        self.timeout_ts = ts_ms

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


def test_assemble_session_event_time_anchors_timer_on_max_ts():
    """Event-time mode: timer = max event ts + gap, monotone across
    out-of-order triggers; emit on timeout matches the shared sort order."""
    from deduplicate_spark.streaming.sessionize import assemble_session_event_time

    st = _StubState(watermark_ms=0)
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    list(
        assemble_session_event_time(
            ("c1",),
            [pd.DataFrame({"turn_idx": [2, 0],
                           "text": ["third", "first"],
                           "ts": [t0 + pd.Timedelta(seconds=4), t0]})],
            st,
            gap_ms=10_000,
        )
    )
    base_ms = int(t0.value // 1_000_000)
    assert st.timeout_ts == base_ms + 4_000 + 10_000
    # second trigger delivers an OLDER event: timer must not move backwards
    list(
        assemble_session_event_time(
            ("c1",),
            [pd.DataFrame({"turn_idx": [1], "text": ["second"],
                           "ts": [t0 + pd.Timedelta(seconds=1)]})],
            st,
            gap_ms=10_000,
        )
    )
    assert st.timeout_ts == base_ms + 4_000 + 10_000

    st.hasTimedOut = True
    row = list(assemble_session_event_time(("c1",), [], st, gap_ms=10_000))[0].iloc[0]
    assert row.doc_text == "first\nsecond\nthird"
    assert row.n_turns == 3 and st.removed


def test_assemble_session_event_time_clamps_to_watermark():
    """A conversation whose entire buffer is older than the current
    watermark must clamp its timeout to watermark+1 (Spark rejects timeout
    timestamps at or behind the watermark), not raise."""
    from deduplicate_spark.streaming.sessionize import assemble_session_event_time

    t0 = pd.Timestamp("2026-01-01 00:00:00")
    base_ms = int(t0.value // 1_000_000)
    st = _StubState(watermark_ms=base_ms + 3_600_000)  # watermark 1h ahead
    list(
        assemble_session_event_time(
            ("c2",),
            [pd.DataFrame({"turn_idx": [0], "text": ["x"], "ts": [t0]})],
            st,
            gap_ms=10_000,
        )
    )
    assert st.timeout_ts == base_ms + 3_600_000 + 1


def test_sessionize_event_time_stream_matches_batch_and_drops_late(spark, tmp_path):
    """End-to-end event-time session windows: out-of-order turns delivered
    across separate triggers assemble byte-identically to batch
    assemble_docs; a turn arriving BELOW the watermark is dropped at the
    operator boundary (the documented late-drop policy) and never corrupts
    the emitted doc."""
    import pandas as _pd

    from deduplicate_spark.operators.assembly import assemble_docs
    from deduplicate_spark.streaming.sessionize import sessionize_turns

    t0 = _pd.Timestamp("2026-01-01 00:00:00")

    def rows(items):
        return _pd.DataFrame(
            [
                {"conv_id": c, "turn_idx": i, "role": "user", "text": tx,
                 "tool": None, "ts": ts}
                for (c, i, tx, ts) in items
            ]
        )

    src = tmp_path / "et_turns"
    os.makedirs(src)
    cfg = DedupConfig()

    def write(name, pdf):
        spark.createDataFrame(pdf, TRANSCRIPTS_SCHEMA).coalesce(1).write.parquet(
            str(src / name), mode="overwrite"
        )

    # trigger 1: c1 turns 2 and 0, OUT OF ORDER in both idx and event time
    write("f1", rows([
        ("c1", 2, "third", t0 + _pd.Timedelta(seconds=4)),
        ("c1", 0, "first", t0),
    ]))

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    docs = sessionize_turns(stream, cfg, gap_ms=10_000, event_time_watermark="5 seconds")
    q = (
        docs.writeStream.format("memory")
        .queryName("et_docs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "et_ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        # trigger 2: the straggler turn 1 (still within watermark) + a
        # sentinel conv whose ts drags the watermark past c1's gap
        write("f2", rows([
            ("c1", 1, "second", t0 + _pd.Timedelta(seconds=2)),
            ("zz", 0, "sentinel", t0 + _pd.Timedelta(seconds=60)),
        ]))
        q.processAllAvailable()
        # trigger 3: a LATE turn for c1 (ts far below the watermark ->
        # dropped) + a second sentinel so the batch runs and c1's timer
        # (armed against the post-trigger-2 watermark) fires
        write("f3", rows([
            ("c1", 9, "too-late", t0 + _pd.Timedelta(seconds=1)),
            ("zz2", 0, "sentinel2", t0 + _pd.Timedelta(seconds=120)),
        ]))
        q.processAllAvailable()

        deadline = time.time() + 120
        got = None
        while time.time() < deadline:
            hits = spark.table("et_docs").filter("conv_id = 'c1'").collect()
            if hits:
                got = hits[0]
                break
            # keep advancing the watermark until the timer fires
            write(f"adv_{int(time.time()*1000)}", rows([
                ("zz3", 0, "adv", t0 + _pd.Timedelta(seconds=240)),
            ]))
            q.processAllAvailable()
            time.sleep(0.5)
        assert got is not None, "c1 never emitted"

        # batch reference: the three ON-TIME turns only
        expected = assemble_docs(
            spark.createDataFrame(rows([
                ("c1", 2, "third", t0 + _pd.Timedelta(seconds=4)),
                ("c1", 0, "first", t0),
                ("c1", 1, "second", t0 + _pd.Timedelta(seconds=2)),
            ]), TRANSCRIPTS_SCHEMA),
            cfg,
        ).filter("conv_id = 'c1'").collect()[0]
        assert got.exact_sha == expected.exact_sha
        assert got.n_turns == 3
        assert got.total_len == expected.total_len
    finally:
        q.stop()


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
