"""Scale probe for the flagship tx pipeline (SCALE_NOTES tx table).

Drives `tx_denormalize` over `sources/generator.py` workloads far past
the driver testdata — r4 measured a rising curve to 5 M txs; this tool
extends the curve a decade (20 M txs ≈ 70 M envelope events) and adds
the carry-over shape the earlier probes skipped: a batch whose tail is
cut mid-history (the last 10 % of transactions missing their END and
some data events — the "micro-batch splits transactions" reality,
poc.md:343), followed by the completion batch that drains the carried
events. Reported per size:

  * full-batch wall + events/s (all txs complete — the r4 metric, so
    curves stay comparable round over round);
  * batch-1 wall with a 10 % incomplete tail (emissions = 90 %, carry
    frames materialized the way the streaming processor would persist
    them);
  * batch-2 wall draining the carry-over (must emit exactly the
    remaining 10 % — asserted, not printed-and-hoped).

Usage: python tools/probe_tx_scale.py [--whale K] [n_txs ...]
       (default sizes: 1M 5M 20M)

``--whale K`` adds the skew dimension: each size is ALSO run with one
planted whale transaction — a single order carrying K lines (a hot
order key ~1000× the average) appended by the generator. Joins split
under AQE's skew handling, but the whale's ``collect_list`` into one
nested doc is irreducibly single-task — the probe measures what that
straggler actually costs at each size and asserts the whale doc
emits exactly once with all K lines.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streaming_examples_spark import get_spark  # noqa: E402
from streaming_examples_spark.operators.txgroup import normalize_events  # noqa: E402
from streaming_examples_spark.operators.txjoin import tx_denormalize  # noqa: E402
from streaming_examples_spark.sources.generator import generate_workload  # noqa: E402


def main() -> int:
    argv = list(sys.argv[1:])
    whale = 0
    if "--whale" in argv:
        i = argv.index("--whale")
        whale = int(argv[i + 1])
        del argv[i : i + 2]
    sizes = [int(s) for s in argv] or [1_000_000, 5_000_000, 20_000_000]
    if len(sizes) > 1:
        # one JVM per size: a shared JVM carries the previous sizes'
        # dead gate-broadcast relations until ContextCleaner reaps them
        # (driver GC + py4j ref release — neither promptly forceable),
        # and the 20 M size then OOMs its own broadcast build at the
        # default heap even though it passes alone (122.8 s at 16 g,
        # measured r7). Fresh processes make every size's number a
        # clean, reproducible measurement.
        import subprocess

        for n in sizes:
            args = [sys.executable, os.path.abspath(__file__)]
            if whale:
                args += ["--whale", str(whale)]
            rc = subprocess.run(args + [str(n)]).returncode
            if rc:
                return rc
        return 0
    spark = get_spark("tx-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM + codegen for the pipeline shape
    o, l, x = generate_workload(spark, 10_000)
    tx_denormalize(o, l, x).emissions.write.format("noop").mode("overwrite").save()

    print(f"{'n_txs':>10} {'events':>10} {'mode':<12} {'wall_s':>7} {'ev/s':>9} {'emitted':>10}")
    for n_txs in sizes:
        parts = min(256, max(32, n_txs // 100_000))
        # giant-batch shape: the END cache evicts the heap the gate
        # broadcasts need (r7 A/B: 20M w/ persist OOMs at 16g driver,
        # 379s at 48g; w/o persist 122.8s at 16g) — micro-batches keep
        # the default, backfill-scale batches turn it off
        kw = {"persist_ends": n_txs < 10_000_000}
        o, l, x = generate_workload(spark, n_txs, partitions=parts)
        n_events = n_txs + l.count()  # orders + lines

        # -- full batch, all complete (the r4-comparable number) ------
        t0 = time.time()
        res = tx_denormalize(o, l, x, **kw)
        res.emissions.write.format("noop").mode("overwrite").save()
        n_emit = res.emissions.count()
        wall = time.time() - t0
        for f in res.pinned:
            f.unpersist()
        assert n_emit == n_txs, (n_emit, n_txs)
        print(f"{n_txs:>10} {n_events:>10} {'complete':<12} {wall:>7.1f} "
              f"{n_events / wall:>9.0f} {n_emit:>10}", flush=True)

        # -- sustained 10% incomplete rate: every 10th tx's END is
        # DELAYED to the next batch while its data events arrive now —
        # the shape that actually populates the carry-over path (a
        # batch boundary cut only splits the txs spanning one LSN;
        # delayed metadata is what sustains an incomplete-tx rate)
        tx_id = F.split(F.col("id"), ":").getItem(0).cast("long")
        x1 = x.filter(tx_id % 10 != 0)
        t0 = time.time()
        res1 = tx_denormalize(o, l, x1, **kw)
        res1.emissions.write.format("noop").mode("overwrite").save()
        n_emit1 = res1.emissions.count()
        # carry frames are state: materialize them the way the stream
        # processor persists them (lineage cut, blocks on executors)
        carry_o = res1.carryover_orders.localCheckpoint(eager=True)
        carry_l = res1.carryover_lines.localCheckpoint(eager=True)
        wall1 = time.time() - t0
        for f in res1.pinned:
            f.unpersist()
        print(f"{n_txs:>10} {n_events:>10} {'10%-delayed':<12} {wall1:>7.1f} "
              f"{n_events / wall1:>9.0f} {n_emit1:>10}", flush=True)

        # -- batch 2: only the late ENDs + the carried events ----------
        x2 = x.filter(tx_id % 10 == 0)
        t0 = time.time()
        res2 = tx_denormalize(
            o.limit(0), l.limit(0), x2,
            carryover_orders=carry_o, carryover_lines=carry_l, **kw,
        )
        res2.emissions.write.format("noop").mode("overwrite").save()
        n_emit2 = res2.emissions.count()
        wall2 = time.time() - t0
        for f in res2.pinned:
            f.unpersist()
        assert n_emit1 + n_emit2 == n_txs, (n_emit1, n_emit2, n_txs)
        print(f"{n_txs:>10} {n_events:>10} {'drain-carry':<12} {wall2:>7.1f} "
              f"{n_emit2 * 3.5 / wall2:>9.0f} {n_emit2:>10}", flush=True)
        spark.catalog.clearCache()

        if whale:
            # -- planted hot key: same size + ONE order with `whale`
            # lines. Delta vs 'complete' above = the straggler cost of
            # the irreducible single-task collect_list on that key.
            ow, lw, xw = generate_workload(
                spark, n_txs, partitions=parts, whale_lines=whale
            )
            nw_events = n_events + whale + 1
            t0 = time.time()
            resw = tx_denormalize(ow, lw, xw, **kw)
            resw.emissions.write.format("noop").mode("overwrite").save()
            nw_emit = resw.emissions.count()
            wallw = time.time() - t0
            # verification OUTSIDE the timed window — the baseline run
            # executes write+count only, so the whale delta must too
            wdoc = (
                resw.emissions.filter(F.col("order_key") == n_txs)
                .select(F.size("lines").alias("n"))
                .collect()
            )
            for f in resw.pinned:
                f.unpersist()
            assert nw_emit == n_txs + 1, (nw_emit, n_txs)
            assert len(wdoc) == 1 and wdoc[0]["n"] == whale, wdoc
            print(
                f"{n_txs:>10} {nw_events:>10} {f'whale-{whale}':<12} {wallw:>7.1f} "
                f"{nw_events / wallw:>9.0f} {nw_emit:>10}   "
                f"(+{wallw - wall:.1f}s vs complete)",
                flush=True,
            )
            spark.catalog.clearCache()
    print("OK: every size emitted exactly n_txs across the cut")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
