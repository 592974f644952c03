"""Stress the incremental bucketed tx state store: seed a large key
space, then run K small batches and measure per-batch state I/O.

The claim under test (SCALE_NOTES.md): per-batch state write volume is
O(touched keys), not O(total key space). Batch 0 seeds every order at
the chosen SF (one tx per order, via the same envelope synthesis as the
tx_denorm_orders catalog query, LSN-offset per round); batches 1..K
each touch a disjoint ~1% slice of the orders with NEW transactions.

Usage: python tools/stress_state_store.py [sf_dir] [n_batches] [n_buckets] [slice_modulus] [backend]

``backend`` = posix (default) | manifest. Under the manifest backend
the inode accounting degenerates gracefully: carried buckets have NO
local bytes at their logical path (manifest entries), so
``state_written`` counts exactly the new physical files — the same
O(touched) claim, measured object-store-style.
Prints one line per batch: wall time, emissions, bytes written to the
two bucketed state tables, and the bucket count rewritten.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streaming_examples_spark import get_spark  # noqa: E402
from streaming_examples_spark.tables import load_table  # noqa: E402
from streaming_examples_spark.streaming.cdc_stream import TxDenormBatchProcessor  # noqa: E402


def envelopes(spark, sf_dir, *, lsn_offset: int, key_filter=None):
    """Order/line/tx envelope frames for one round; LSNs and tx ids
    shifted by ``lsn_offset`` so every round is a fresh set of
    transactions over the same order keys (an update wave)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    if key_filter is not None:
        orders = orders.filter(key_filter(F.col("o_orderkey")))
        lineitem = lineitem.filter(key_filter(F.col("l_orderkey")))

    off = F.lit(lsn_offset).cast("long")
    okey = F.col("o_orderkey")
    lkey = F.col("l_orderkey")
    tx_ref = lambda key: F.concat_ws(":", key + off, (key + off) * 1000 + 999)  # noqa: E731

    def source(table, lsn, key):
        return F.struct(
            F.lit("2.5").alias("version"),
            F.lit("postgresql").alias("connector"),
            F.lit("stress").alias("name"),
            F.lit(0).cast("long").alias("ts_ms"),
            F.lit(False).alias("snapshot"),
            F.lit("testdb").alias("db"),
            F.lit(None).cast("string").alias("sequence"),
            F.lit("public").alias("schema"),
            F.lit(table).alias("table"),
            (key + off).cast("long").alias("txId"),
            ((key + off) * 1000 + lsn).cast("long").alias("lsn"),
            F.lit(None).cast("long").alias("xmin"),
        )

    order_env = orders.select(
        F.lit(None).cast(
            "struct<id:bigint,order_date:int,purchaser:int,shipping_address:string>"
        ).alias("before"),
        F.struct(
            okey.alias("id"),
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).alias("order_date"),
            F.col("o_custkey").cast("int").alias("purchaser"),
            F.concat(F.lit("wave-"), off.cast("string")).alias("shipping_address"),
        ).alias("after"),
        source("orders", F.lit(0), okey).alias("source"),
        F.lit("c").alias("op"),
        F.lit(0).cast("long").alias("ts_ms"),
        F.struct(tx_ref(okey).alias("id")).alias("transaction"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    numbered = lineitem.withColumn("_rn", F.row_number().over(w))
    line_env = numbered.select(
        F.lit(None).cast(
            "struct<id:bigint,order_id:bigint,product_id:int,quantity:int,price:string>"
        ).alias("before"),
        F.struct(
            (lkey * 100 + F.col("_rn")).alias("id"),
            lkey.alias("order_id"),
            F.col("l_partkey").cast("int").alias("product_id"),
            F.col("l_quantity").cast("int").alias("quantity"),
            F.col("l_extendedprice").cast("decimal(10,2)").cast("string").alias("price"),
        ).alias("after"),
        source("order_lines", F.col("_rn"), lkey).alias("source"),
        F.lit("c").alias("op"),
        F.lit(0).cast("long").alias("ts_ms"),
        F.struct(tx_ref(lkey).alias("id")).alias("transaction"),
    )
    line_counts = lineitem.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    tx_env = (
        orders.join(line_counts, orders["o_orderkey"] == F.col("k"), "left")
        .select(
            F.lit("END").alias("status"),
            tx_ref(okey).alias("id"),
            (F.coalesce(F.col("n_lines"), F.lit(0)) + 1).alias("event_count"),
            # Debezium omits collections with no events — declare
            # order_lines only when the order has lines
            F.when(
                F.col("n_lines").isNotNull(),
                F.array(
                    F.struct(
                        F.lit("public.orders").alias("data_collection"),
                        F.lit(1).cast("long").alias("event_count"),
                    ),
                    F.struct(
                        F.lit("public.order_lines").alias("data_collection"),
                        F.col("n_lines").cast("long").alias("event_count"),
                    ),
                ),
            ).otherwise(
                F.array(
                    F.struct(
                        F.lit("public.orders").alias("data_collection"),
                        F.lit(1).cast("long").alias("event_count"),
                    )
                )
            ).alias("data_collections"),
            F.lit(0).cast("long").alias("ts_ms"),
        )
    )
    return order_env, line_env, tx_env


def dir_stats(path):
    """(total bytes, {relpath: (inode, size)}) for a state frame dir.

    Keys are RELATIVE to the frame root and identity is the inode:
    under the versioned state layout every batch commits a new version
    dir whose untouched buckets are HARDLINKS of the previous files —
    same relpath + same inode = carried over, not written."""
    total, files = 0, {}
    for dirpath, _d, fs in os.walk(path):
        for f in fs:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            total += st.st_size
            files[os.path.relpath(p, path)] = (st.st_ino, st.st_size)
    return total, files


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    slice_mod = int(sys.argv[4]) if len(sys.argv) > 4 else 1000
    backend_name = sys.argv[5] if len(sys.argv) > 5 else "posix"
    spark = get_spark("stress-state")
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    from streaming_examples_spark.streaming.state_backend import (
        LocalPosixBackend,
        ManifestBackend,
    )

    backend = {"posix": LocalPosixBackend, "manifest": ManifestBackend}[backend_name]()
    state_dir = tempfile.mkdtemp(prefix="stress_state_")
    proc = TxDenormBatchProcessor(
        spark, state_dir, n_buckets=n_buckets, backend=backend
    )

    def run(batch_id, lsn_offset, key_filter, label):
        before = {}
        for tbl in ("order_state", "line_state"):
            p = proc._frame_path(tbl)
            before[tbl] = dir_stats(p)[1] if os.path.exists(p) else {}
        t0 = time.time()
        o, l, x = envelopes(spark, sf_dir, lsn_offset=lsn_offset, key_filter=key_filter)
        n = proc.process(o, l, x, batch_id).count()
        dt = time.time() - t0
        written, buckets = 0, set()
        for tbl in ("order_state", "line_state"):
            p = proc._frame_path(tbl)
            _, after = dir_stats(p) if os.path.exists(p) else (0, {})
            for rel, (ino, size) in after.items():
                prev = before[tbl].get(rel)
                if prev is None or prev[0] != ino:  # new file, not a hardlink
                    written += size
                    # backend-internal files (_carry.json manifests,
                    # _SUCCESS markers) don't make a bucket "rewritten"
                    if os.path.basename(rel).startswith("_"):
                        continue
                    part = rel.split("_bucket=")
                    if len(part) > 1:
                        buckets.add((tbl, part[1].split("/")[0]))
        total_state = sum(
            dir_stats(proc._frame_path(t0_))[0]
            if os.path.exists(proc._frame_path(t0_)) else 0
            for t0_ in ("order_state", "line_state"))
        print(
            f"batch {batch_id:2d} [{label:>9}]  {dt:6.1f}s  emissions={n:7d}  "
            f"state_written={written/1e6:8.2f}MB  buckets_rewritten={len(buckets):3d}  "
            f"total_state={total_state/1e6:8.2f}MB",
            flush=True,
        )

    run(0, 0, None, "seed-all")
    for k in range(1, n_batches + 1):
        # touch a disjoint small slice: orders with key % slice_mod == k
        run(k, k * 10**9, (lambda kk: (lambda c: c % slice_mod == kk))(k), f"slice-{k}")


if __name__ == "__main__":
    main()
