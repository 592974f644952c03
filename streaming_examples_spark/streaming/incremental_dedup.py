"""Incremental near-duplicate detection over a document stream.

The streaming counterpart of ``operators/dedup.py:minhash_lsh_pairs``:
a corpus grows batch by batch (a crawl, a feed, CDC on a documents
table) and every new document must be checked against EVERYTHING seen
so far — without ever re-scanning old text.

Design (all equi-joins, no pair space, state ∝ unique corpus):

  * The state directory keeps two append-only parquet stores:
      ``bands/``  (band_id, band_key, doc_id)   — the LSH probe index
      ``sigs/``   (doc_id, sig ARRAY<LONG>)     — MinHash signatures
    Only CANONICAL (non-duplicate) docs are stored, so state grows
    with unique content, not with stream length — re-crawled copies
    never inflate it.
  * Per batch: new docs are shingled once (`shingle_base_hashes`, one
    md5 per shingle); candidates come from an equi-join on
    (band_id, band_key) against the store AND a within-batch band
    self-join; similarity is verified on the MinHash signatures
    (matching-position fraction estimates Jaccard) — old TEXT is
    never needed, so the store stays narrow.
  * Replayed doc_ids (at-least-once sources) are dropped against
    ``sigs`` before processing: re-delivery cannot duplicate state or
    flip an earlier verdict.

At 100 TB pass ``bands_buckets=N``: the ``bands`` store becomes an
EXTERNAL BUCKETED table on (band_id, band_key), so the per-batch probe join
shuffles only the (small) batch side to the bucket count — the
corpus-sized store is read in place, never shuffled (plan-asserted in
tests/test_plans.py). The append-only layout is bucket-compatible
(each batch appends one file set per bucket; ``compact`` restores one
file per bucket), and a restart re-registers the table over the
existing location — bucket ids live in the file names, so a fresh
session's catalog recovers full bucket-awareness from DDL alone.
The default (None) keeps plain append-only parquet for
warehouse-free tests.

Reference parity: the reference has no incremental near-dup operator —
this extends its CDC-state patterns (bounded keyed state, replay
dedup: TxAware...Operator.java:357-430) to the training-data domain.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from streaming_examples_spark.functions.hashing import (
    LSH_BANDS,
    LSH_ROWS,
    MERSENNE_P,
    band_keys_from_hashes,
    perm_constants,
    shingle_base_hashes,
    word_shingles,
)

_SIG_SCHEMA = "doc_id long, sig array<long>"
_BAND_SCHEMA = "band_id int, band_key string, doc_id long"


def minhash_signature(hs, n_perms: int) -> F.Column:
    """Full MinHash signature (array of per-permutation minima) over a
    precomputed base-hash array — same hash family as the LSH bands."""
    def perm_min(i: int):
        a, b = perm_constants(i)
        return F.array_min(
            F.transform(hs, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P))
        )

    return F.array(*[perm_min(i) for i in range(n_perms)])


def estimated_jaccard(sig_a, sig_b) -> F.Column:
    """Matching-position fraction of two equal-length MinHash
    signatures — an unbiased estimator of Jaccard similarity."""
    matches = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda a, b: (a == b).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return matches / F.size(sig_a)


class IncrementalNearDup:
    """foreachBatch processor: feed each micro-batch of (doc_id, text)
    to :meth:`process_batch`; it returns the dedup report for the batch
    and folds the batch's canonical docs into the store."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        *,
        threshold: float = 0.7,
        k: int = 3,
        n_perms: int = LSH_BANDS * LSH_ROWS,
        text_col: str = "text",
        id_col: str = "doc_id",
        bands_buckets: int | None = None,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.threshold = threshold
        self.k = k
        self.n_perms = n_perms
        self.text_col = text_col
        self.id_col = id_col
        #: the 100 TB layout the module docstring promises: the probe
        #: index as an EXTERNAL BUCKETED table on (band_id, band_key), so the
        #: per-batch probe join shuffles only the (small) batch side to
        #: the bucket count — the corpus-sized store is read in place,
        #: never shuffled (Exchange elided; plan-asserted in
        #: tests/test_plans.py). None keeps plain append-only parquet
        #: (the no-warehouse test default).
        self.bands_buckets = bands_buckets
        if bands_buckets:
            import hashlib

            self._bands_table = (
                "incdedup_bands_"
                + hashlib.md5(os.path.abspath(state_dir).encode()).hexdigest()[:12]
            )

    # -- state I/O ------------------------------------------------------
    def _bands_path(self) -> str:
        return os.path.join(self.state_dir, "bands")

    def _ensure_bands_table(self) -> None:
        """Re-register the external bucketed table after a restart: a
        fresh session's catalog doesn't know it, but the bucket ids
        live in the file names, so DDL over the existing location
        restores a fully bucket-aware table."""
        if self.spark.catalog.tableExists(self._bands_table):
            return
        if os.path.exists(self._bands_path()):
            self.spark.sql(
                f"CREATE TABLE {self._bands_table} "
                "(band_id INT, band_key STRING, doc_id BIGINT) USING parquet "
                f"CLUSTERED BY (band_id, band_key) SORTED BY (band_id, band_key) "
                f"INTO {self.bands_buckets} BUCKETS "
                f"LOCATION '{self._bands_path()}'"
            )

    def _load_bands(self) -> DataFrame:
        if not self.bands_buckets:
            return self._load("bands", _BAND_SCHEMA)
        self._ensure_bands_table()
        if self.spark.catalog.tableExists(self._bands_table):
            return self.spark.table(self._bands_table)
        return self.spark.createDataFrame([], _BAND_SCHEMA)

    def _append_bands(self, new_bands: DataFrame) -> None:
        if not self.bands_buckets:
            new_bands.write.mode("append").parquet(self._bands_path())
            return
        (
            new_bands.write.mode("append")
            .bucketBy(self.bands_buckets, "band_id", "band_key")
            # sorted buckets: after compact() leaves one file per
            # bucket, the sort-merge probe reads the store pre-sorted
            # and skips its per-batch O(store) sort entirely
            .sortBy("band_id", "band_key")
            .option("path", self._bands_path())
            .saveAsTable(self._bands_table)
        )

    def _load(self, name: str, schema: str) -> DataFrame:
        """Missing store -> empty frame (first batch). A store that
        EXISTS but fails to read must raise: swallowing a corrupted
        parquet would silently reset the dedup state (every known doc
        re-admitted as canonical)."""
        path = os.path.join(self.state_dir, name)
        if not os.path.exists(path):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(path)

    # -- the batch step -------------------------------------------------
    def process_batch(self, docs: DataFrame, batch_id: int) -> DataFrame:
        """Returns (doc_id, is_dup BOOLEAN, dup_of LONG, n_candidates)
        for every doc in the batch (replayed known ids excluded), and
        appends canonical docs' signatures/bands to the store.

        ``dup_of`` is the smallest matching doc_id — from the stored
        corpus if any, else from smaller-id batch peers. Within-batch
        duplicate GROUPS point at the group's canonical only when they
        match it directly (one hop); full transitive closure is the
        batch operator ``dedup_groups``' job, not the stream's.
        """
        sigs_store = self._load("sigs", _SIG_SCHEMA)
        bands_store = self._load_bands()

        # replay protection: a doc_id already folded into the store is
        # a re-delivery — reprocessing could only repeat the verdict
        fresh = docs.select(
            F.col(self.id_col).alias("doc_id"), F.col(self.text_col).alias("text")
        ).join(sigs_store.select("doc_id"), "doc_id", "left_anti")

        hs = shingle_base_hashes(word_shingles(F.col("text"), self.k))
        enriched = (
            fresh.select("doc_id", hs.alias("hs"))
            .withColumn("sig", minhash_signature(F.col("hs"), self.n_perms))
            .withColumn("keys", band_keys_from_hashes(F.col("hs")))
            .withColumn("n_sh", F.size("hs"))
            .drop("hs")
            # feeds probe, self-join, verify, and the store append.
            # localCheckpoint, not persist: the within-batch peer join is
            # a SELF-join on this frame, and self-join disambiguation
            # rewrites attribute ids so a cache lookup can miss — which
            # would re-shingle and re-sign the batch once per consumer
            # (same failure measured in dedup.connected_components)
            .localCheckpoint(eager=True)
        )
        with_bands = enriched.filter(F.col("n_sh") > 0).select(
            "doc_id", "sig", F.posexplode("keys").alias("band_id", "band_key")
        )

        # candidates vs the stored corpus + within the batch itself
        hist = (
            with_bands.join(bands_store.withColumnRenamed("doc_id", "old_id"),
                            ["band_id", "band_key"])
            .select("doc_id", "old_id", "sig")
            .distinct()
            .join(sigs_store.select(F.col("doc_id").alias("old_id"),
                                    F.col("sig").alias("old_sig")), "old_id")
            .select("doc_id", "old_id",
                    estimated_jaccard(F.col("sig"), F.col("old_sig")).alias("j"))
        )
        peer = (
            with_bands.alias("a")
            .join(
                with_bands.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") > F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_id"),
                    F.col("b.doc_id").alias("old_id"),
                    F.col("a.sig").alias("sig"),
                    F.col("b.sig").alias("old_sig"))
            .distinct()
            .select("doc_id", "old_id",
                    estimated_jaccard(F.col("sig"), F.col("old_sig")).alias("j"))
        )
        matches = hist.unionByName(peer).filter(F.col("j") >= self.threshold)
        verdict = matches.groupBy("doc_id").agg(
            F.min("old_id").alias("dup_of"), F.count(F.lit(1)).alias("n_candidates")
        )
        report = (
            enriched.select("doc_id")
            .join(verdict, "doc_id", "left")
            .select(
                "doc_id",
                F.col("dup_of").isNotNull().alias("is_dup"),
                "dup_of",
                F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            )
            # MUST sever lineage before the store append: writing to
            # sigs/bands refreshes those paths and drops any cached plan
            # reading them — a lazily recomputed report would then
            # anti-join the batch's own canonicals away. Eager
            # localCheckpoint pins the pre-append result (and is the
            # output-before-state ordering cdc_stream uses).
            .localCheckpoint(eager=True)
        )

        canon = report.filter(~F.col("is_dup")).select("doc_id")
        new_sigs = enriched.join(canon, "doc_id").select("doc_id", "sig")
        new_bands = (
            enriched.join(canon, "doc_id")
            .filter(F.col("n_sh") > 0)
            .select("doc_id", F.posexplode("keys").alias("band_id", "band_key"))
            .select("band_id", "band_key", "doc_id")
        )
        # bands BEFORE sigs: replay protection keys on sigs, so a crash
        # between the appends must leave the doc absent from sigs (it
        # will be fully reprocessed; duplicate band rows from the retry
        # collapse in the probe's .distinct()). The reverse order would
        # leave a canonical in sigs but invisible to the probe index —
        # permanent recall loss for all its future duplicates.
        self._append_bands(new_bands)
        new_sigs.write.mode("append").parquet(os.path.join(self.state_dir, "sigs"))
        # enriched is a checkpointed RDD; blocks free when the ref drops
        return report

    # -- maintenance ----------------------------------------------------
    def compact(self, target_partitions: int = 4) -> None:
        """Rewrite both stores into ``target_partitions`` files each.

        Append-only parquet accumulates one file-set per batch; after N
        micro-batches the probe join opens O(N) small files. Periodic
        compaction (call it every ~100 batches, or from a maintenance
        job) restores O(1) file count. The rewrite is atomic per store:
        write to a temp dir, then swap — a concurrent reader sees the
        old or the new layout, never a partial one. At 100 TB this is
        the compaction pass of any LSM-ish table format; with the
        bucketed-store variant it rewrites per bucket.
        """
        import shutil

        for name, schema in (("sigs", _SIG_SCHEMA), ("bands", _BAND_SCHEMA)):
            path = os.path.join(self.state_dir, name)
            if name == "bands" and self.bands_buckets:
                # bucketed store: pin the current rows off the files,
                # then rewrite the table in place — one file per bucket
                # again. (Per-bucket incremental rewrite is the 100 TB
                # refinement; whole-store is correct at any size.)
                cur = self._load_bands().localCheckpoint(eager=True)
                self.spark.sql(f"DROP TABLE IF EXISTS {self._bands_table}")
                shutil.rmtree(path, ignore_errors=True)
                self._append_bands(cur)
                continue
            tmp = path + ".compact"
            cur = self._load(name, schema)
            cur.repartition(target_partitions).write.mode("overwrite").parquet(tmp)
            old = path + ".old"
            if os.path.exists(path):
                os.rename(path, old)
            os.rename(tmp, path)
            shutil.rmtree(old, ignore_errors=True)
