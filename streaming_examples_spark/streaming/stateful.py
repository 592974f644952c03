"""Modern stateful processing via ``transformWithStateInPandas``
(Spark 4 StatefulProcessor API) — the SURVEY.md §7.3 mapping for the
reference's keyed process functions (T1 fill-forward here; the same
shape carries A1's per-key document state).

Differences from the ``applyInPandasWithState`` path
(fill_forward.py): typed per-key ValueState with explicit
lifecycle (init/close), TTL support, and multiple state variables per
processor — the API the reference's ``ValueState<String>`` pattern
maps onto directly (DataStreamJob.java:60-102).

Runtime requirements (checked by the test, skipped when absent):
  * ``protobuf`` (the TWS state-server protocol is protobuf-encoded;
    not installed in this container — fill_forward.py is the working
    stateful path here)
  * RocksDB state store provider:
    ``spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from streaming_examples_spark.model.envelope import OP_DELETE, TOAST_SENTINEL

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("event_lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("last_value", T.StringType())])


class FillForwardProcessor(StatefulProcessor):
    """Per-key TOAST backfill: ValueState holds the last real value;
    sentinel rows emit it, deletes clear it."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("last_value", _STATE_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timer_values) -> Iterator[pd.DataFrame]:
        last = self._state.get()[0] if self._state.exists() else None
        for pdf in rows:
            pdf = pdf.sort_values("event_lsn")
            filled = []
            for _, row in pdf.iterrows():
                v, op = row["value"], row["op"]
                if op == OP_DELETE:
                    last, v = None, None
                elif v == TOAST_SENTINEL:
                    v = last
                else:
                    last = v
                filled.append(v)
            out = pdf.copy()
            out["value"] = filled
            yield out[["id", "event_lsn", "op", "value"]]
        if last is None:
            self._state.clear()
        else:
            self._state.update((last,))

    def close(self) -> None:
        pass


def fill_forward_tws(events: DataFrame) -> DataFrame:
    """Fill-forward via transformWithStateInPandas. Input columns:
    id, event_lsn, op, value. Works on streaming frames; batch frames
    run the same processor per key (Spark 4 supports batch TWS)."""
    return events.groupBy("id").transformWithStateInPandas(
        statefulProcessor=FillForwardProcessor(),
        outputStructType=_OUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
