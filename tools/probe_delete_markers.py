"""Scale probe for the r11 deleted-order marker retention (SCALE_NOTES
"Round-11: deleted-order markers").

The cross-batch tombstone fix keeps a narrow op='d' marker per
ever-deleted order in the rolled-forward ``order_state``. This probe
measures, at generator scale, what that retention actually costs:

  batch 1: N insert transactions (the standard workload)
           → state = N live images
  batch 2: delete DELETE_FRAC·N of those orders (one tx per delete,
           lines deleted first — the FK shape the fixtures use)
           → state must hold exactly (N - D) live + D markers
  batch 3: touch T live orders (one line-update tx each), run TWICE:
           (a) markers retained (default)
           (b) markers GC'd via order_delete_gc_horizon_lsn past the
               delete commits
           → same emissions either way; wall delta = the markers'
             entire steady-state cost for a touch batch

Reported: per-batch walls, state row counts, marker row count, and the
(a) vs (b) delta. The claim under test: markers are O(rows) cold
storage, not a per-batch tax — (a)≈(b) within noise, because the as-of
join only reads the touched orders' versions either way.

Usage: python tools/probe_delete_markers.py [n_txs] [delete_frac] [touch]
       (defaults: 1_000_000 0.2 50_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streaming_examples_spark import get_spark  # noqa: E402
from streaming_examples_spark.operators.txjoin import tx_denormalize  # noqa: E402
from streaming_examples_spark.sources.generator import (  # noqa: E402
    _source,
    generate_workload,
)

ORDER_STRUCT = "struct<id:bigint,order_date:int,purchaser:int,shipping_address:string>"
LINE_STRUCT = "struct<id:bigint,order_id:bigint,product_id:int,quantity:int,price:string>"


def _delete_batch(spark, n_txs: int, n_del: int, partitions: int = 32):
    """Delete txs for orders 0..n_del-1: tx (n_txs+i) deletes order i's
    lines then the order. LSN space sits wholly above the insert
    workload's (tx*100 plan), so commit order is preserved."""
    base_tx, base_lsn = n_txs + 1, (n_txs + 1) * 100
    txs = spark.range(0, n_del, 1, partitions).withColumnRenamed("id", "i")
    i = F.col("i")
    tx = i + base_tx
    n_lines = (i % 4 + 1).cast("int")  # same shape the generator built
    commit_lsn = base_lsn + i * 100 + 99
    tx_ref = F.concat_ws(":", tx, commit_lsn)

    order_events = txs.select(
        F.struct(
            i.alias("id"),
            (F.lit(19000) + (i % 1000).cast("int")).cast("int").alias("order_date"),
            (i % 5000).cast("int").alias("purchaser"),
            F.concat(F.lit("addr-"), i).alias("shipping_address"),
        ).alias("before"),
        F.lit(None).cast(ORDER_STRUCT).alias("after"),
        _source("orders", base_lsn + i * 100 + 50, tx).alias("source"),
        F.lit("d").alias("op"),
        (F.lit(1700000000000) + tx).alias("ts_ms"),
        F.struct(tx_ref.alias("id")).alias("transaction"),
    )
    lines = txs.select("i", F.explode(F.sequence(F.lit(1), n_lines)).alias("ln"))
    ln = F.col("ln")
    ltx = F.col("i") + base_tx
    line_events = lines.select(
        F.struct(
            (F.col("i") * 10 + ln).alias("id"),
            F.col("i").alias("order_id"),
            ((F.col("i") + ln) % 1000).cast("int").alias("product_id"),
            (ln % 10 + 1).cast("int").alias("quantity"),
            F.concat((ln * 7 + 1).cast("string"), F.lit(".99")).alias("price"),
        ).alias("before"),
        F.lit(None).cast(LINE_STRUCT).alias("after"),
        _source("order_lines", base_lsn + F.col("i") * 100 + ln, ltx).alias("source"),
        F.lit("d").alias("op"),
        (F.lit(1700000000000) + ltx).alias("ts_ms"),
        F.struct(F.concat_ws(":", ltx, base_lsn + F.col("i") * 100 + 99).alias("id")).alias("transaction"),
    )
    tx_events = txs.select(
        F.lit("END").alias("status"),
        tx_ref.alias("id"),
        (n_lines + 1).cast("long").alias("event_count"),
        F.array(
            F.struct(F.lit("public.orders").alias("data_collection"),
                     F.lit(1).cast("long").alias("event_count")),
            F.struct(F.lit("public.order_lines").alias("data_collection"),
                     n_lines.cast("long").alias("event_count")),
        ).alias("data_collections"),
        (F.lit(1700000000000) + tx).alias("ts_ms"),
    )
    return order_events, line_events, tx_events, base_lsn + n_del * 100 + 99


def _touch_batch(spark, n_txs: int, n_del: int, n_touch: int, lsn0: int,
                 partitions: int = 32):
    """Line-update txs against LIVE orders (ids n_del..n_del+n_touch-1):
    tx updates line (order*10+1)'s quantity."""
    base_tx = 10 * (n_txs + 1)
    txs = spark.range(0, n_touch, 1, partitions).withColumnRenamed("id", "i")
    i = F.col("i")
    oid = i + n_del
    tx = i + base_tx
    commit_lsn = lsn0 + i * 10 + 9
    tx_ref = F.concat_ws(":", tx, commit_lsn)
    mk_line = lambda q: F.struct(  # noqa: E731
        (oid * 10 + 1).alias("id"),
        oid.alias("order_id"),
        ((oid + 1) % 1000).cast("int").alias("product_id"),
        q.cast("int").alias("quantity"),
        F.lit("8.99").alias("price"),
    )
    line_events = txs.select(
        mk_line(F.lit(2)).alias("before"),
        mk_line(F.lit(9)).alias("after"),
        _source("order_lines", lsn0 + i * 10 + 1, tx).alias("source"),
        F.lit("u").alias("op"),
        (F.lit(1700000000000) + tx).alias("ts_ms"),
        F.struct(tx_ref.alias("id")).alias("transaction"),
    )
    tx_events = txs.select(
        F.lit("END").alias("status"),
        tx_ref.alias("id"),
        F.lit(1).cast("long").alias("event_count"),
        F.array(
            F.struct(F.lit("public.order_lines").alias("data_collection"),
                     F.lit(1).cast("long").alias("event_count")),
        ).alias("data_collections"),
        (F.lit(1700000000000) + tx).alias("ts_ms"),
    )
    return line_events, tx_events


def main() -> int:
    n_txs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.2
    n_touch = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    n_del = int(n_txs * frac)

    spark = get_spark("probe_delete_markers", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    report = {"n_txs": n_txs, "n_del": n_del, "n_touch": n_touch}

    # batch 1: inserts
    o1, l1, x1 = generate_workload(spark, n_txs)
    t0 = time.time()
    res1 = tx_denormalize(o1, l1, x1)
    assert res1.emissions.count() == n_txs
    report["insert_wall_s"] = round(time.time() - t0, 1)
    state_o = res1.order_state.localCheckpoint()
    state_l = res1.line_state.localCheckpoint()
    for f in res1.pinned:
        f.unpersist()

    # batch 2: deletes
    o2, l2, x2, lsn_after = _delete_batch(spark, n_txs, n_del)
    t0 = time.time()
    res2 = tx_denormalize(o2, l2, x2, order_state=state_o, line_state=state_l)
    n_emit2 = res2.emissions.count()
    assert n_emit2 == n_del, n_emit2
    tombs = res2.emissions.filter(F.col("deleted")).count()
    assert tombs == n_del, tombs
    report["delete_wall_s"] = round(time.time() - t0, 1)
    state2_o = res2.order_state.localCheckpoint()
    state2_l = res2.line_state.localCheckpoint()
    for f in res2.pinned:
        f.unpersist()
    markers = state2_o.filter(F.col("op") == "d").count()
    live = state2_o.count() - markers
    assert markers == n_del and live == n_txs - n_del, (markers, live)
    report["state_live_rows"] = live
    report["state_marker_rows"] = markers

    # batch 3: touch live orders — (a) markers RETAINED vs (b) markers
    # GC'd (horizon past all delete commits). Interleaved a,b,b,a and
    # min-of-2 per arm so JIT/pagecache warmup doesn't bias either arm.
    l3, x3 = _touch_batch(spark, n_txs, n_del, n_touch, lsn_after + 1)
    empty_orders = o2.limit(0)
    gc_state = state2_o.filter(
        (F.col("op") != "d") | (F.col("commit_lsn") >= F.lit(lsn_after + 1))
    ).localCheckpoint()
    assert gc_state.count() == live

    def run_touch(order_state):
        t0 = time.time()
        res = tx_denormalize(empty_orders, l3, x3,
                             order_state=order_state, line_state=state2_l)
        n = res.emissions.count()
        assert n == n_touch, n
        for f in res.pinned:
            f.unpersist()
        return time.time() - t0

    walls = {"a": [], "b": []}
    for arm in ("a", "b", "b", "a"):
        walls[arm].append(run_touch(state2_o if arm == "a" else gc_state))
    report["touch_walls_markers_s"] = [round(w, 1) for w in walls["a"]]
    report["touch_walls_gc_s"] = [round(w, 1) for w in walls["b"]]
    report["touch_wall_markers_s"] = round(min(walls["a"]), 1)
    report["touch_wall_gc_s"] = round(min(walls["b"]), 1)
    report["marker_tax_pct"] = round(
        100.0 * (min(walls["a"]) - min(walls["b"]))
        / max(min(walls["b"]), 1e-9), 1,
    )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
