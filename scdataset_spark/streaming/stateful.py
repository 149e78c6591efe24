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
