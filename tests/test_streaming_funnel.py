"""Streaming funnel: strict-order advancement, bounded per-user state,
agreement with the batch funnel on an in-order stream."""

from __future__ import annotations

import pandas as pd

from kubernetes_logs_datalake_spark.streaming.analytics import (
    _funnel_fn,
)

STAGES = ["signup", "view", "click", "purchase"]


class FakeState:
    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None


def _drive(batches, state=None):
    fn = _funnel_fn(STAGES)
    state = state or FakeState()
    rows = []
    for batch in batches:
        pdf = pd.DataFrame(batch, columns=["event_type", "ts_us"])
        for out in fn((7,), iter([pdf]), state):
            rows.extend(out.itertuples(index=False))
    return rows, state


def test_advances_in_strict_order():
    rows, state = _drive(
        [[("signup", 10), ("view", 20), ("click", 30), ("purchase", 40)]]
    )
    assert [(r.stage, r.ts_us) for r in rows] == [
        ("signup", 10), ("view", 20), ("click", 30), ("purchase", 40)
    ]
    assert state.get == (3, 40)


def test_pre_epoch_stage0_starts_funnel():
    # ts_us <= -1 is a legitimate pre-epoch timestamp; the old
    # cur_ts = -1 sentinel silently blocked the funnel from ever
    # starting (the same sentinel class _ewma_alert_fn fixed)
    rows, state = _drive([[("signup", -5), ("view", -3)]])
    assert [(r.stage, r.ts_us) for r in rows] == [
        ("signup", -5), ("view", -3)
    ]
    assert state.get == (1, -3)


def test_pre_epoch_equal_ts_does_not_double_advance():
    # strict-order rule still holds below the epoch: view at the SAME
    # pre-epoch instant as signup must not advance
    rows, _ = _drive([[("signup", -5), ("view", -5)]])
    assert [r.stage for r in rows] == ["signup"]


def test_skipped_stage_blocks_advancement():
    # click before view: only signup fires; the later view then opens
    # the gate within the same replayed batch ordering
    rows, state = _drive([[("signup", 10), ("click", 20), ("purchase", 30)]])
    assert [r.stage for r in rows] == ["signup"]
    assert state.get == (0, 10)


def test_state_carries_across_micro_batches():
    rows1, state = _drive([[("signup", 10), ("view", 20)]])
    rows2, state = _drive([[("click", 30)]], state=state)
    assert [r.stage for r in rows1] == ["signup", "view"]
    assert [r.stage for r in rows2] == ["click"]
    assert state.get == (2, 30)


def test_same_timestamp_does_not_double_advance():
    # strict > : a next-stage event at the SAME µs instant is rejected,
    # matching funnel_counts' strict comparisons
    rows, state = _drive([[("signup", 10), ("view", 10)]])
    assert [r.stage for r in rows] == ["signup"]


def test_in_batch_replay_is_time_ordered():
    # events arrive shuffled within one micro-batch → replay sorts them
    rows, _ = _drive([[("purchase", 40), ("view", 20), ("signup", 10), ("click", 30)]])
    assert [r.stage for r in rows] == STAGES


def test_streaming_matches_batch_funnel(spark, tmp_path):
    """End-to-end: the streaming advances aggregate to the same
    per-stage converted-user counts as the batch funnel report."""
    import json
    import os

    from pyspark.sql import functions as F

    from kubernetes_logs_datalake_spark.operators.funnel import funnel_counts
    from kubernetes_logs_datalake_spark.streaming.analytics import (
        streaming_funnel,
    )

    rows = []
    for u in range(6):
        # user u reaches stage u%5 (0..4 stages deep), in time order
        for si in range(min(u % 5 + 1, 4)):
            rows.append({"user_id": u, "event_type": STAGES[si], "ts_us": 100 * u + si})
    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "events.json"), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    schema = "user_id long, event_type string, ts_us long"
    stream = spark.readStream.schema(schema).json(src)
    q = (
        streaming_funnel(stream, STAGES)
        .writeStream.format("memory")
        .queryName("funnel_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = (
            spark.sql("SELECT stage_idx, count(DISTINCT user_id) c FROM funnel_t GROUP BY stage_idx")
            .collect()
        )
        stream_counts = {r.stage_idx: r.c for r in got}
    finally:
        q.stop()

    batch = funnel_counts(
        spark.createDataFrame([(r["user_id"], r["event_type"], r["ts_us"]) for r in rows], schema),
        "user_id", "event_type", "ts_us", STAGES,
    ).collect()
    # batch reports per-stage converted counts; compare to the
    # distinct users whose streaming advances reached each stage.
    # (the two agree when each user's stream is in time order — the
    # fixture's shape; out-of-order reopening differs by design and is
    # covered by the direct-drive tests above)
    batch_counts = {r.stage_idx: r.n_users for r in batch}
    for si, n in batch_counts.items():
        assert stream_counts.get(si, 0) == n, (si, stream_counts, batch_counts)
