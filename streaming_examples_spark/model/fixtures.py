"""Deterministic CDC event-log builder for tests and demos.

Mirrors the stimulus side of the reference's integration test
(PurchaseOrderJoinerIT.java:139-524): SQL transactions against
orders/order_lines become envelope event sequences + transaction
metadata events. No containers — events are built as rows and loaded
with ``spark.createDataFrame`` against the typed envelope schema.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, types as T

from streaming_examples_spark.model.envelope import (
    data_change_event_schema,
    transaction_event_schema,
)

ORDER_ROW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("order_date", T.IntegerType()),  # epoch-days encoding
        T.StructField("purchaser", T.IntegerType()),
        T.StructField("shipping_address", T.StringType()),
    ]
)

LINE_ROW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("order_id", T.LongType()),
        T.StructField("product_id", T.IntegerType()),
        T.StructField("quantity", T.IntegerType()),
        T.StructField("price", T.StringType()),  # decimal-as-string encoding
    ]
)


@dataclass
class TxLog:
    """Accumulates events across transactions; mimics WAL ordering.

    Each ``tx()`` context assigns a tx_id and, on commit, a commit_lsn
    strictly greater than every event LSN in it. Interleaving is
    modeled by beginning multiple txs before committing (commit order
    ≠ begin order, the poc.md:189-192 case).
    """

    schema_name: str = "public"
    events: list[dict] = field(default_factory=list)
    tx_events: list[dict] = field(default_factory=list)
    _lsn: int = 1000
    _next_tx: int = 500

    def next_lsn(self) -> int:
        self._lsn += 10
        return self._lsn

    def begin(self) -> "_OpenTx":
        self._next_tx += 1
        return _OpenTx(self, self._next_tx)

    def tx(self, *ops) -> int:
        """One-shot transaction: apply ops then commit immediately."""
        t = self.begin()
        for op_fn in ops:
            op_fn(t)
        return t.commit()

    def order_events_df(self, spark: SparkSession) -> DataFrame:
        return self._events_df(spark, "orders", ORDER_ROW_SCHEMA)

    def line_events_df(self, spark: SparkSession) -> DataFrame:
        return self._events_df(spark, "order_lines", LINE_ROW_SCHEMA)

    def tx_events_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.tx_events, transaction_event_schema())

    def _events_df(self, spark: SparkSession, table: str, row_schema) -> DataFrame:
        rows = [e for e in self.events if e["source"]["table"] == table]
        return spark.createDataFrame(rows, data_change_event_schema(row_schema))


class _OpenTx:
    def __init__(self, log: TxLog, tx_id: int):
        self.log = log
        self.tx_id = tx_id
        self.pending: list[dict] = []  # events awaiting commit_lsn

    def _emit(self, table: str, op: str, before, after):
        lsn = self.log.next_lsn()
        self.pending.append(
            {
                "before": before,
                "after": after,
                "source": {
                    "version": "2.5",
                    "connector": "postgresql",
                    "name": "dbserver1",
                    "ts_ms": 1700000000000 + lsn,
                    "snapshot": False,
                    "db": "inventorydb",
                    "sequence": None,
                    "schema": self.log.schema_name,
                    "table": table,
                    "txId": self.tx_id,
                    "lsn": lsn,
                    "xmin": None,
                },
                "op": op,
                "ts_ms": 1700000000000 + lsn,
            }
        )

    # -- orders ---------------------------------------------------------
    def insert_order(self, id, order_date=19700, purchaser=1001, addr="1 Main St"):
        row = {"id": id, "order_date": order_date, "purchaser": purchaser,
               "shipping_address": addr}
        self._emit("orders", "c", None, row)

    def update_order(self, id, **changes):
        before = self._last_image("orders", id)
        after = {**before, **changes}
        self._emit("orders", "u", before, after)

    def delete_order(self, id):
        before = self._last_image("orders", id)
        self._emit("orders", "d", before, None)

    # -- order lines -----------------------------------------------------
    def insert_line(self, id, order_id, product_id=1, quantity=1, price="19.99"):
        row = {"id": id, "order_id": order_id, "product_id": product_id,
               "quantity": quantity, "price": price}
        self._emit("order_lines", "c", None, row)

    def update_line(self, id, **changes):
        before = self._last_image("order_lines", id)
        after = {**before, **changes}
        self._emit("order_lines", "u", before, after)

    def delete_line(self, id):
        before = self._last_image("order_lines", id)
        self._emit("order_lines", "d", before, None)

    def _last_image(self, table: str, id) -> dict:
        for e in reversed(self.pending + self.log.events):
            if e["source"]["table"] != table:
                continue
            img = e["after"] or e["before"]
            if img and img["id"] == id:
                if e["after"] is None:
                    break  # deleted
                return dict(e["after"])
        raise KeyError(f"no live row {table}/{id}")

    def commit(self) -> int:
        commit_lsn = self.log.next_lsn()
        tx_ref = f"{self.tx_id}:{commit_lsn}"
        counts: dict[str, int] = {}
        for e in self.pending:
            e["transaction"] = {"id": tx_ref}
            tbl = f"{self.log.schema_name}.{e['source']['table']}"
            counts[tbl] = counts.get(tbl, 0) + 1
        self.log.events.extend(self.pending)
        for status in ("BEGIN", "END"):
            self.log.tx_events.append(
                {
                    "status": status,
                    "id": tx_ref,
                    "event_count": len(self.pending) if status == "END" else None,
                    "data_collections": [
                        {"data_collection": t, "event_count": c}
                        for t, c in sorted(counts.items())
                    ]
                    if status == "END"
                    else None,
                    "ts_ms": 1700000000000 + commit_lsn,
                }
            )
        self.pending = []
        return commit_lsn
