"""Custom stateful streaming operators (guide: applyInPandasWithState).

The reference has no stateful streaming (SURVEY §2.9); this extends the
engine with the standard Spark pattern for custom per-key state — the
building block for streaming session stats, per-entity counters,
dedup-with-TTL, etc. at 100 TB of events/day: state lives in the state
store (RocksDB on a real cluster), keyed and partitioned by the group
key, never on the driver.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
    ]
)


def _update_user_totals(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Running per-user event count + exact value total (cents)."""
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0
    for pdf in batches:
        n += len(pdf)
        # exact cents (matches the engine-wide integer-money rule)
        total += int(round(float(pdf["value"].sum()) * 100))
    state.update((n, total))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_value_cents": total}]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful per-user running totals; works on a streaming DataFrame
    (update mode). ``events`` needs columns user_id, value."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
