"""Stateful streaming fill-forward — the TOAST backfill in its
DataStream idiom (T1) and PTF idiom (T3/U1).

Reference: postgres-toast-backfill/.../DataStreamJob.java:60-102 — a
``ValueState<String>`` per key: on c/r/u store the column value; on u
carrying the sentinel ``__debezium_unavailable_value`` replace it
from state; on d clear the state. And SqlPtfJob.java:116-185 — the
same as a SQL process table function.

Spark surfaces:
  * ``fill_forward_stream`` — ``applyInPandasWithState`` keyed
    processor for Structured Streaming (true per-key state, bounded
    by the key cardinality, GC'd with the stream's watermark policy).
  * ``ToastBackfillUDTF`` — a Python UDTF with TABLE input, the exact
    analog of Flink's PTF surface: SQL users call
    ``ToastBackfill(TABLE(events) PARTITION BY id ORDER BY lsn)``.
  * batch twin: operators/windows.fill_forward (pure window function).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from streaming_examples_spark.model.envelope import OP_DELETE, TOAST_SENTINEL


def fill_forward_stream(
    events: DataFrame,
    *,
    key_col: str,
    value_col: str,
    op_col: str = "op",
    order_col: str = "event_lsn",
    sentinel: str = TOAST_SENTINEL,
    output_schema: T.StructType | None = None,
):
    """Per-key sentinel replacement with streaming state.

    Input: a flat (normalized) event frame. Output: same rows with
    ``value_col`` backfilled. State per key = last real value. Works
    on a streaming DataFrame (groupBy().applyInPandasWithState) and on
    a batch frame for testing (same function applied per group).
    """
    out_schema = output_schema or T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField(order_col, T.LongType()),
            T.StructField(op_col, T.StringType()),
            T.StructField(value_col, T.StringType()),
        ]
    )
    state_schema = T.StructType([T.StructField("last_value", T.StringType())])

    out_cols = [f.name for f in out_schema.fields]

    def fold(pdf: pd.DataFrame, last: Any) -> tuple[pd.DataFrame, Any]:
        pdf = pdf.sort_values(order_col)
        filled = []
        for _, row in pdf.iterrows():
            v, op = row[value_col], row[op_col]
            if op == OP_DELETE:
                last = None
                v = None
            elif v == sentinel:
                v = last  # backfill from state
            else:
                last = v
            filled.append(v)
        pdf = pdf.copy()
        pdf[value_col] = filled
        return pdf[out_cols], last

    def update(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last: Any = state.get[0] if state.exists else None
        for pdf in pdf_iter:
            out, last = fold(pdf, last)
            yield out
        if last is None:
            state.remove()
        else:
            state.update((last,))

    if events.isStreaming:
        return events.groupBy(key_col).applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    # batch twin: same fold per key group, no cross-batch state needed
    def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out, _ = fold(pdf, None)
        return out

    return events.groupBy(key_col).applyInPandas(batch_fn, schema=out_schema)


class ToastBackfillUDTF:
    """SQL-surface process table function (U1/U2 parity):

        spark.udtf.register("toast_backfill", ToastBackfillUDTF)
        SELECT * FROM toast_backfill(
            TABLE(SELECT id, lsn, op, biography FROM events)
            PARTITION BY id ORDER BY lsn)

    Mirrors SqlPtfJob.java:131-185: per-partition state is the last
    real value; sentinel rows emit the backfilled value.
    """

    def __init__(self):
        self._last: Any = None

    def eval(self, row):
        id_, lsn, op, value = row["id"], row["lsn"], row["op"], row["value"]
        if op == OP_DELETE:
            self._last = None
            yield id_, lsn, op, None
            return
        if value == TOAST_SENTINEL:
            value = self._last
        else:
            self._last = value
        yield id_, lsn, op, value

    def terminate(self):
        return iter(())


def register_toast_backfill_udtf(spark) -> None:
    from pyspark.sql.functions import udtf

    wrapped = udtf(
        ToastBackfillUDTF,
        returnType="id bigint, lsn bigint, op string, value string",
    )
    spark.udtf.register("toast_backfill", wrapped)
