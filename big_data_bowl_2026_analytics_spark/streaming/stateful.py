"""Custom stateful streaming operator via ``applyInPandasWithState``.

Where the built-in windowed aggregates (events.py) cover time-bucketed
state, this is the escape hatch for arbitrary per-key state machines:
the example keeps a running per-user profile (event count, value sum,
max single value) that survives across micro-batches in the state
store and emits an updated row whenever a batch touches the user.

Scale: state is partitioned by the grouping key across the cluster's
state store; each micro-batch only loads/updates the touched keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


def running_user_profile(events: DataFrame) -> DataFrame:
    """Streaming per-user running profile with explicit state."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, total, mx = state.get
        else:
            n, total, mx = 0, 0.0, float("-inf")
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 6)],
                "max_value": [mx],
            }
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class RunningProfileProcessor(StatefulProcessor):
    """``transformWithState`` flavor of the running profile: the same
    per-key state machine expressed against the Spark 4.x arbitrary-
    state API, which adds composite state (value/list/map), timers and
    TTL over what ``applyInPandasWithState`` offers. State lives in the
    (RocksDB-backed) state store partitioned by key; each micro-batch
    touches only the keys it contains.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("profile", _STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues  # noqa: N803
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._state.exists():
            n, total, mx = self._state.get()
        else:
            n, total, mx = 0, 0.0, float("-inf")
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        self._state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 6)],
                "max_value": [mx],
            }
        )

    def close(self) -> None:
        pass


def running_user_profile_tws(events: DataFrame) -> DataFrame:
    """Same running profile via ``transformWithStateInPandas``.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``); the legacy
    HDFS-backed provider does not support transformWithState.
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningProfileProcessor(),
        outputStructType=_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# Pickle this module's functions BY VALUE into UDF closures: Spark's
# Python workers otherwise resolve them by module name, which fails
# whenever the package isn't on the worker's import path (e.g. the
# driver imported the repo by file location from another cwd).
import sys as _sys

try:  # pragma: no cover - exercised via worker round-trips in tests
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass
