"""Streaming EWMA rate-spike detector: recursive-baseline folding,
gap decay, bounded state, memory-sink end-to-end."""

from __future__ import annotations

import pandas as pd
import pytest

from kubernetes_logs_datalake_spark.streaming.analytics import (
    _ewma_alert_fn,
)

EVERY = 100  # µs buckets for tests


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


def _drive(batches, state=None, **kw):
    args = {"every_us": EVERY, "alpha": 0.5, "spike_factor": 3.0,
            "min_count": 5, "max_gap_folds": 64}
    args.update(kw)
    fn = _ewma_alert_fn(*args.values())
    state = state or FakeState()
    rows = []
    for batch in batches:
        pdf = pd.DataFrame({"ts_us": batch})
        for out in fn(("k",), iter([pdf]), state):
            rows.extend(out.itertuples(index=False))
    return rows, state


def _ts(bucket, n):
    return [bucket * EVERY + i for i in range(n)]


def test_spike_alerts_against_recursive_baseline():
    # buckets: 4, 4, 4, then 20 (spike), then 1 to close the spike
    ts = _ts(0, 4) + _ts(1, 4) + _ts(2, 4) + _ts(3, 20) + _ts(4, 1)
    rows, _ = _drive([ts])
    assert [(r.bucket_us // EVERY, r.n) for r in rows] == [
        (0, 4), (1, 4), (2, 4), (3, 20)
    ]
    # first bucket seeds the baseline: no pre-fold baseline, no alert
    assert rows[0].baseline is None or pd.isna(rows[0].baseline)
    assert not rows[0].alert
    # recursive y: 4 → 4 → 4; spike bucket sees baseline 4.0
    assert rows[3].baseline == pytest.approx(4.0)
    assert rows[3].alert  # 20 > 3*4 and >= min_count
    assert rows[3].ewma == pytest.approx(0.5 * 20 + 0.5 * 4.0)
    # steady buckets never alert
    assert not rows[1].alert and not rows[2].alert


def test_small_counts_never_alert():
    # 1,1,4: 4 > 3*1 but below min_count=5 → suppressed
    ts = _ts(0, 1) + _ts(1, 1) + _ts(2, 4) + _ts(3, 1)
    rows, _ = _drive([ts])
    assert not any(r.alert for r in rows)


def test_gap_buckets_fold_zeros_and_decay():
    # bucket 0 has 8 events, then silence until bucket 4
    ts = _ts(0, 8) + _ts(4, 1)
    rows, _ = _drive([ts])
    got = [(r.bucket_us // EVERY, r.n, r.ewma) for r in rows]
    assert [g[:2] for g in got] == [(0, 8), (1, 0), (2, 0), (3, 0)]
    # baseline decays by (1-alpha) per empty bucket: 8 → 4 → 2 → 1
    assert [g[2] for g in got] == pytest.approx([8.0, 4.0, 2.0, 1.0])


def test_state_carries_across_micro_batches():
    rows1, state = _drive([_ts(0, 4)])
    assert rows1 == []  # bucket 0 still open
    rows2, state = _drive([_ts(1, 20) + _ts(2, 1)], state=state)
    assert [(r.bucket_us // EVERY, r.n, r.alert) for r in rows2] == [
        (0, 4, False), (1, 20, True)
    ]
    # state is exactly five scalars (bucket, cnt, ewma, has, opened)
    assert len(state.get) == 5


def test_late_events_fold_into_open_bucket():
    # a straggler older than the open bucket counts into it (documented
    # at-least-once pragmatics; cross-bucket disorder is watermark land)
    ts = _ts(1, 3) + [5] + _ts(2, 1)  # ts=5 is from bucket 0, arrives late
    rows, _ = _drive([ts])
    # NOTE: in-batch replay sorts, so ts=5 is actually processed first
    # and OPENS bucket 0; this asserts sort-then-replay semantics
    assert [(r.bucket_us // EVERY, r.n) for r in rows] == [(0, 1), (1, 3)]


def test_streaming_rate_alerts_end_to_end(spark, tmp_path):
    import json
    import os

    from kubernetes_logs_datalake_spark.streaming.analytics import (
        streaming_rate_alerts,
    )

    rows = []
    for b, n in [(0, 6), (1, 6), (2, 30), (3, 1)]:
        for i in range(n):
            rows.append({"series_key": "errors", "ts_us": b * 1000 + i})
    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(os.path.join(src, "events.json"), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    stream = spark.readStream.schema("series_key string, ts_us long").json(src)
    q = (
        streaming_rate_alerts(stream, every_us=1000, alpha=0.5)
        .writeStream.format("memory")
        .queryName("rate_alerts_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "SELECT bucket_us, n, alert FROM rate_alerts_t ORDER BY bucket_us"
        ).collect()
    finally:
        q.stop()
    assert [(r.bucket_us, r.n, r.alert) for r in got] == [
        (0, 6, False), (1000, 6, False), (2000, 30, True)
    ]


def test_negative_bucket_ids_are_legitimate():
    # pre-epoch timestamps: bucket ids are negative; the opened flag
    # (not a bstart<0 sentinel) must keep counting correctly
    ts = [-250, -249, -150, -50]  # buckets -3, -2, -1 (EVERY=100)
    rows, state = _drive([ts])
    assert [(r.bucket_us // EVERY, r.n) for r in rows] == [(-3, 2), (-2, 1)]
    assert state.get[0] == -100 and state.get[1] == 1
