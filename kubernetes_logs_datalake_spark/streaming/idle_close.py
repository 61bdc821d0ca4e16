"""Idle-close detection: the reference's close-write flush (T4) as a
custom stateful streaming operator.

The reference patches Fluent Bit to watch inotify ``IN_CLOSE_WRITE`` and
force-flush a terminated container's buffer (reference
``close-write-flush.patch``; behavior asserted in ``test.sh`` 7l: a
pod's logs are queryable ≤30 s after exit). Spark has no inotify, so
the equivalent signal is derived from the stream itself:
**a (namespace, pod, container) key with no new lines for Δ is closed.**

Implementation: ``applyInPandasWithState`` with a processing-time
timeout — the canonical Spark shape for per-key state with timeouts.
Per key the state holds (line count, last event ns); every batch with
data renews the timeout; when the timeout fires the operator emits one
"closed session" record and drops the state. State size is O(live
keys), not O(events) — at cluster scale that is the number of live
containers, trivially small.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CLOSED_SCHEMA = T.StructType(
    [
        T.StructField("namespace", T.StringType()),
        T.StructField("pod", T.StringType()),
        T.StructField("container", T.StringType()),
        T.StructField("n_lines", T.LongType()),
        T.StructField("last_time_ns", T.LongType()),
    ]
)

STATE_SCHEMA = "n_lines long, last_time_ns long"

KEY_COLS = ("namespace", "pod", "container")


def _close_fn(idle_ms: int):
    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            n, last_ns = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "namespace": [key[0]],
                    "pod": [key[1]],
                    "container": [key[2]],
                    "n_lines": [n],
                    "last_time_ns": [last_ns],
                }
            )
            return
        n, last_ns = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                last_ns = max(last_ns, int(pdf["time_ns"].max()))
        state.update((n, last_ns))
        state.setTimeoutDuration(idle_ms)
        yield pd.DataFrame(
            {"namespace": [], "pod": [], "container": [], "n_lines": [], "last_time_ns": []}
        )

    return fn


def closed_sessions(records: DataFrame, idle_seconds: int = 30) -> DataFrame:
    """Stream of per-container close events: one row per key that went
    ``idle_seconds`` without new lines (≈ the container terminated or
    rotated away). Input: the streaming canonical log records."""
    return (
        records.groupBy(*KEY_COLS)
        .applyInPandasWithState(
            _close_fn(idle_seconds * 1000),
            outputStructType=CLOSED_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
