"""Custom stateful streaming operator via ``applyInPandasWithState``:
per-user sessionization with a gap timeout — the engine's example of
semantics Spark's built-in windowed aggs can't express (session count
depends on arbitrary per-key state carried across micro-batches).

State per user: (last_ts_epoch, n_sessions, n_events). Each batch
folds its (sorted) events into the carried state; output rows are the
updated per-user aggregates. Keys partition across executors — state
scales horizontally; the watermark-equivalent is the state timeout.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, n_sessions bigint"
STATE_SCHEMA = "last_ts double, n_sessions bigint, n_events bigint"

SESSION_GAP_S = 1800.0


def _update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_ts, n_sessions, n_events = state.get
    else:
        last_ts, n_sessions, n_events = None, 0, 0
    for pdf in pdfs:
        for ts in sorted(pdf["ts_epoch"]):
            if last_ts is None or ts - last_ts > SESSION_GAP_S:
                n_sessions += 1
            last_ts = ts
            n_events += 1
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n_events, "n_sessions": n_sessions}]
    )


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """events must carry ``user_id`` and ``ts`` (timestamp); returns a
    streaming DataFrame of per-user totals updated each micro-batch."""
    from pyspark.sql import functions as F

    prepared = events.select("user_id", F.col("ts").cast("double").alias("ts_epoch"))
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
