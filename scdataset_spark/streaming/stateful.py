"""Custom stateful streaming operator via ``applyInPandasWithState``.

SURVEY §2.11: watermarked windows cover the declarative cases; a custom
per-key accumulator (running session stats that survive across
micro-batches) needs the arbitrary-state API.  This operator keeps one
running (count, sum, max_ts) per user and emits the updated row each
micro-batch — the streaming analogue of the reference's stateful
per-group bookkeeping.

Works identically on a batch frame in tests by feeding the whole input
as one micro-batch (availableNow).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_ts timestamp"
STATE_SCHEMA = "n bigint, total double, last_ts timestamp"


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running stats with explicit state (streaming frame in →
    streaming frame out).

    The update function is defined function-locally ON PURPOSE: Spark
    pickles it to Python workers, and a module-level function pickles by
    reference — breaking whenever the worker can't import this package
    (driver launched from another cwd).  Local definition → cloudpickle
    serializes by value, fully self-contained.
    """
    import pandas as pd  # captured by value with the closure

    def update_user_state(
        key, pdfs: Iterable["pd.DataFrame"], state: GroupState
    ) -> Iterable["pd.DataFrame"]:
        (user_id,) = key
        n, total, last_ts = (state.get if state.exists else (0, 0.0, None))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            last_ts = mx if last_ts is None else max(last_ts, mx)
        state.update((n, total, last_ts))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [last_ts],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CAPPED_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, duration_us bigint"
)
CAPPED_STATE_SCHEMA = (
    "anchor_us bigint, chunk_idx bigint, start_us bigint, last_us bigint, n bigint"
)


def capped_sessions_stateful(
    events: DataFrame,
    gap_minutes: int = 10,
    cap_minutes: int = 30,
) -> DataFrame:
    """Unbounded-stream twin of ``events.capped_session_stats``: per-user
    session chunks with a gap rule AND a max-duration cap, maintained as
    explicit state across micro-batches.

    Chunk semantics are IDENTICAL to the batch operator: a session
    anchors at its first event; chunk index = (ts - anchor) div cap; a
    chunk CLOSES (and is emitted) when the next event either exceeds the
    gap (new session) or lands in a later chunk of the same session.
    The currently-open chunk lives in state and is emitted only when a
    later event closes it — so emitted rows equal the batch result
    restricted to closed chunks (asserted in tests across checkpointed
    availableNow runs).  Events are sorted by ts within each batch;
    cross-batch ordering is the watermark's job, as with any stateful
    operator.
    """
    gap_us = gap_minutes * 60_000_000
    cap_us = cap_minutes * 60_000_000

    import pandas as pd  # captured by value (see running_user_stats note)

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        anchor, chunk_idx, start, last, n = (
            state.get if state.exists else (None, 0, None, None, 0)
        )
        closed = []

        def emit():
            closed.append((user_id, start, last, n, last - start))

        # concatenate ALL Arrow chunks of this group before sorting:
        # >maxRecordsPerBatch events arrive as multiple pdfs in arbitrary
        # order, and a per-chunk sort would let a later chunk rewind
        # `last` and corrupt the gap/cap decisions
        frames = [pdf for pdf in pdfs]
        if frames:
            all_ts = pd.concat([f["ts"] for f in frames], ignore_index=True)
            ts_us = (all_ts.astype("int64") // 1000).sort_values()
            for t in ts_us:
                t = int(t)
                if anchor is None:
                    anchor, chunk_idx, start, last, n = t, 0, t, t, 1
                elif t - last >= gap_us:
                    emit()
                    anchor, chunk_idx, start, last, n = t, 0, t, t, 1
                else:
                    idx = (t - anchor) // cap_us
                    if idx != chunk_idx:
                        emit()
                        chunk_idx, start, last, n = idx, t, t, 1
                    else:
                        last, n = t, n + 1
        state.update((anchor, chunk_idx, start, last, n))
        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events",
                         "duration_us"],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=CAPPED_OUTPUT_SCHEMA,
            stateStructType=CAPPED_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
