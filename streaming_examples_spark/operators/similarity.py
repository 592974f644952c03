"""Similarity search over embedding columns.

  * ``brute_force_topk`` — exact top-k cosine neighbors for a query
    set: broadcast the (small) query side against the corpus, rank
    per query. The corpus is scanned once, never shuffled; ranking
    shuffles only (n_queries × corpus_partition) partial top-ks.
  * ``lsh_ann_topk``     — approximate: random-hyperplane LSH signs
    bucket the corpus; queries probe only their own bucket (and
    optionally multi-probe neighbors). The 100 TB path: turns the
    cross product into an equi-join on bucket keys.

Hyperplanes are derived deterministically from md5 of (plane, dim) —
reproducible across runs and engines, no RNG state to ship.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from streaming_examples_spark.functions.vectors import as_double, cosine


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query vector (cosine).

    Returns (query_id, neighbor_id, rank, cos). Deterministic
    tie-break on neighbor id.
    """
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    scored = (
        corpus.join(F.broadcast(qs), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("cv"), F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos"))
    )


def ivf_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style ANN: partition the corpus into Voronoi cells around
    ``n_centroids`` seed centroids; a query scans only its ``n_probe``
    nearest cells.

    Centroids are the first ``n_centroids`` corpus vectors (a
    deterministic seeding — production would k-means-refine them; the
    cell-assign / probe machinery is identical). Fully deterministic →
    DuckDB oracle runs the same algorithm.

    Scale shape: assignment is a broadcast of k centroids against the
    corpus (one scan, no shuffle of the corpus); the probe is an
    equi-join on cell id. Cost ≈ corpus/k · n_probe per query instead
    of the full corpus.
    """
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    cents = (
        emb.filter(F.col(id_col) < n_centroids)
        .select(F.col(id_col).alias("cid"), as_double(F.col(vec_col)).alias("centv"))
    )
    # cell assignment: nearest centroid (deterministic tie-break on cid)
    w_assign = Window.partitionBy("neighbor_id").orderBy(F.desc("ccos"), F.asc("cid"))
    cells = (
        corpus.join(F.broadcast(cents))
        .withColumn("ccos", cosine(F.col("cv"), F.col("centv")))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("neighbor_id", "cv", "cid")
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("cid"))
    probes = (
        qs.join(F.broadcast(cents))
        .withColumn("qcos", cosine(F.col("qv"), F.col("centv")))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cid")
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        probes.join(cells, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("cv"), F.col("qv")))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos"))
    )


def _hyperplane(plane: int, dim: int) -> float:
    """Deterministic pseudo-random coefficient in [-1, 1) from md5 —
    same value every run, no RNG dependency."""
    import hashlib

    h = int(hashlib.md5(f"{plane}_{dim}".encode()).hexdigest()[:8], 16)
    return (h / float(1 << 31)) - 1.0


def _plane_array(salt: int, dim: int) -> Column:
    """Hyperplane as a literal array<double> — the dot product then
    runs as a zip_with/aggregate fold (a runtime loop), keeping the
    generated code tiny instead of unrolling dim×planes scalar ops
    past the JVM's 64 KB method limit."""
    return F.array(*[F.lit(_hyperplane(salt, d)) for d in range(dim)])


def lsh_bucket(vec: Column, dim: int, n_planes: int = 12, salt_base: int = 0) -> Column:
    """Random-hyperplane signature: bit p = sign(v · h_p). Returns a
    bucket id in [0, 2^n_planes)."""
    from streaming_examples_spark.functions.vectors import dot as vdot

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        d = vdot(vec, _plane_array(salt_base + p, dim))
        bit = F.when(d > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(F.shiftleft(bit, p))
    return bucket


def lsh_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent LSH tables; a
    query's candidates = union of its buckets across tables; exact
    cosine rank within candidates.

    Recall/cost dial: more planes → smaller buckets (fewer candidates,
    lower recall); more tables → higher recall. At corpus scale the
    bucket join replaces the brute-force cross product.
    """
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    def buckets_for(col: Column) -> Column:
        # plane salt t*1000+p → independent hyperplane sets per table
        return F.array(
            *[lsh_bucket(col, dim, n_planes, salt_base=t * 1000) for t in range(n_tables)]
        )

    c_b = corpus.select(
        "neighbor_id", "cv", F.posexplode(buckets_for(F.col("cv"))).alias("tbl", "bkt")
    )
    q_b = qs.select(
        "query_id", "qv", F.posexplode(buckets_for(F.col("qv"))).alias("tbl", "bkt")
    )
    cand = (
        c_b.join(q_b, ["tbl", "bkt"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("cos", cosine(F.col("cv"), F.col("qv")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos"))
    )


def kmeans_centroids(
    emb: DataFrame,
    *,
    k: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Lloyd's k-means over an embedding column, returning k centroids.

    Deterministic: init = the first k vectors by id (no RNG), fixed
    iteration count. Centroids live driver-side (k×dim floats — MLlib
    does the same): the assignment step is then a pure *expression*
    over centroid literals — argmin via array_min over (dist, cid)
    structs — so each iteration costs ONE shuffle (the per-cluster
    per-dimension mean), no join. At 100 TB: assignment is map-only
    over literals; the mean is a map-side-combinable avg of k×dim
    cells. This is the training step for ivf_ann_topk's cell index.
    """
    pts = emb.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    cents = [
        [float(x) for x in r["v"]]
        for r in pts.orderBy("id").limit(k).collect()
    ]
    for _ in range(iters):
        assigned = pts.select(
            "id", "v", _argmin_centroid(F.col("v"), cents).alias("cluster")
        )
        means = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cluster", F.transform("pm", lambda s: s["m"]).alias("c"))
            .collect()
        )
        by_cluster = {r["cluster"]: [float(x) for x in r["c"]] for r in means}
        # empty clusters keep their previous centroid
        cents = [by_cluster.get(j, cents[j]) for j in range(k)]
    return cents


def _argmin_centroid(v: Column, cents: list[list[float]]) -> Column:
    """Index of the nearest centroid (squared L2), ties → lowest id.
    Pure expression over literals: no join, no shuffle."""
    def sqdist(c: list[float]) -> Column:
        carr = F.array(*[F.lit(x) for x in c])
        return F.aggregate(
            F.zip_with(v, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    scored = F.array(
        *[F.struct(sqdist(c).alias("d"), F.lit(j).alias("j")) for j, c in enumerate(cents)]
    )
    return F.array_min(scored)["j"]


def kmeans_assign(
    emb: DataFrame,
    *,
    k: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Final cluster assignment after k-means training: (vec_id,
    cluster, sqdist). The batch form of an IVF index build."""
    cents = kmeans_centroids(emb, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
    pts = emb.select(F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v"))
    cluster = _argmin_centroid(F.col("v"), cents)

    def sqdist_to(j_col: Column) -> Column:
        # recompute distance to the chosen centroid via the same struct array
        scored = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(F.col("v"), F.array(*[F.lit(x) for x in c]),
                                   lambda a, b: (a - b) * (a - b)),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("d"),
                    F.lit(j).alias("j"),
                )
                for j, c in enumerate(cents)
            ]
        )
        return F.array_min(scored)["d"]

    return pts.select(
        "vec_id",
        cluster.alias("cluster"),
        F.round(sqdist_to(cluster), 4).alias("sqdist"),
    )
