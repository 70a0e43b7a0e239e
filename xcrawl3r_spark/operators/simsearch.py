"""Similarity search over embedding columns (array<float>):

- ``cosine_topk``: brute-force cosine top-k — the exact baseline. Dot
  products via ``F.aggregate``/``F.zip_with`` (sequential left-fold in
  doubles: deterministic, engine-portable).
- ``lsh_bucket_topk``: sign-random-projection LSH buckets (deterministic
  ±1 hyperplanes derived from md5 parity — no RNG) -> candidates share a
  bucket -> exact re-rank within bucket. The scale path: the cross join
  becomes a bucket equi-join.
- ``embedding_near_dup``: pairs with cosine >= threshold, LSH-blocked.

Scores are rounded to 6 dp so the DuckDB oracle (same fold order, same
doubles) hashes identically.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 4           # LSH bucket-bit floor (16 buckets)
N_PLANES_MAX = 24      # cap: 16M buckets — enough for 10^9+ vectors
LSH_TARGET_BUCKET = 64  # target expected bucket size for derivation


def derive_n_planes(
    n_rows: int, target_bucket_size: int = LSH_TARGET_BUCKET,
    lo: int = N_PLANES, hi: int = N_PLANES_MAX,
) -> int:
    """Scale the LSH bucket-bit count with corpus size: the smallest p
    with 2^p buckets >= n/target, clamped to [lo, hi]. A fixed p (the r1
    default) leaves ~n²/2^p comparisons per bucket at 10^9 vectors;
    deriving p keeps expected bucket size ~target at any scale. Integer
    arithmetic only (no float log2), so the DuckDB oracle's SQL twin
    derives the identical value at every row count."""
    need = max(1, -(-int(n_rows) // target_bucket_size))  # ceil div
    return max(lo, min(hi, (need - 1).bit_length()))


def _vec_d(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_cols(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def plane_sign(plane: int, dim: int) -> int:
    """Deterministic ±1 hyperplane entry: parity of md5('p<plane>_<dim>').
    Pure function — identical in the SQL oracle."""
    h = hashlib.md5(f"p{plane}_{dim}".encode()).hexdigest()
    return 1 if int(h[-1], 16) % 2 == 1 else -1


def bucket_col(vec: Column, dims: int, n_planes: int = N_PLANES) -> Column:
    """LSH bucket id: bit p = 1 iff sum_j sign(p,j) * v_j > 0."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        signs = [plane_sign(p, j) for j in range(dims)]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(s)) for s in signs]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact brute-force top-k neighbors per query.

    embeddings: (vec_id, embedding); queries: (query_id, q_embedding).
    Broadcast the (small) query side; the corpus streams map-side —
    the canonical exact-ANN baseline at any scale.
    """
    corpus = embeddings.select("vec_id", _vec_d("embedding").alias("v"))
    qs = queries.select("query_id", _vec_d("q_embedding").alias("q"))
    scored = corpus.crossJoin(F.broadcast(qs)).select(
        "query_id",
        "vec_id",
        F.round(cosine_cols(F.col("q"), F.col("v")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def lsh_bucket_topk(
    embeddings: DataFrame, queries: DataFrame, dims: int, k: int = 10,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """LSH-bucketed ANN: exact re-rank within the query's bucket only.
    Recall < 1 by design; the bucket equi-join replaces the cross join."""
    corpus = embeddings.select(
        "vec_id", _vec_d("embedding").alias("v")
    ).withColumn("bucket", bucket_col(F.col("v"), dims, n_planes))
    qs = queries.select(
        "query_id", _vec_d("q_embedding").alias("q")
    ).withColumn("bucket", bucket_col(F.col("q"), dims, n_planes))
    scored = corpus.join(F.broadcast(qs), "bucket").select(
        "query_id",
        "vec_id",
        F.round(cosine_cols(F.col("q"), F.col("v")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def embedding_near_dup(
    embeddings: DataFrame, dims: int, threshold: float = 0.95,
    n_planes: int = N_PLANES,
    max_bucket_df: int | None = None,
    log_dropped: bool = False,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold), LSH-blocked:
    only pairs sharing a bucket are scored (at web scale this is the
    difference between a bucket join and an n^2 cross join).

    ``max_bucket_df`` caps the per-bucket document frequency — the same
    posting-list control as ``dedupops.ngram_jaccard_pairs`` /
    ``simhash_near_dup``. ``derive_n_planes`` keeps the EXPECTED bucket
    size ~64, but a low-entropy corpus (many near-identical vectors —
    exactly the near-dup use case) collapses into few buckets and the
    in-bucket self-join goes quadratic; the cap drops only buckets whose
    df exceeds it (recall < 1 for those, counted and logged via
    ``log_dropped``). The df count is an unbounded window over
    partitionBy(bucket) — the SAME hash shuffle the self-join needs, so
    the cap adds no extra pass; one lazy DISK_ONLY checkpoint serves the
    filter, the drop log, and both join sides (without it the expensive
    bucket projection re-runs per consumer). None = exact within-bucket.
    """
    base = embeddings.select(
        "vec_id", _vec_d("embedding").alias("v")
    ).withColumn("bucket", bucket_col(F.col("v"), dims, n_planes))
    if max_bucket_df is not None:
        from pyspark import StorageLevel

        w = Window.partitionBy("bucket")
        base = base.withColumn("df", F.count("*").over(w)).localCheckpoint(
            eager=False, storageLevel=StorageLevel.DISK_ONLY)
        if log_dropped:
            import logging

            log = logging.getLogger(__name__)
            # an eager count-distinct job at frame-construction time —
            # skip it when INFO is off and the result would be discarded
            # (guide §1.2: don't compute things you throw away)
            if log.isEnabledFor(logging.INFO):
                n_dropped = (
                    base.filter(F.col("df") > max_bucket_df)
                    .agg(F.countDistinct("bucket")).first()[0]
                )
                log.info(
                    "embedding_near_dup: dropped %d buckets with df > %d",
                    n_dropped, max_bucket_df)
        base = base.filter(F.col("df") <= max_bucket_df).drop("df")
    a = base.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "bucket")
    b = base.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b",
            F.round(cosine_cols(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


def embedding_dedup_clusters(
    embeddings: DataFrame, dims: int, threshold: float = 0.95,
    n_planes: int = N_PLANES,
    max_bucket_df: int | None = None,
    max_iters: int = 20,
) -> DataFrame:
    """Embedding-level near-dup REMOVAL decision: the LSH-blocked cosine
    pairs transitively closed into clusters, each cluster keeping its
    min-vec_id canonical — the embedding-space twin of
    ``dedupops.near_dup_clusters`` (semantic dedup in the SemDeDup
    family, Abbas et al. 2023 — public — but with exact in-bucket
    cosine instead of k-means sharding). Raw pair-drop under-removes:
    A~B and B~C without A~C must still collapse to one canonical, which
    only the transitive closure gets right.

    Output: (vec_id, cluster, is_canonical) for EVERY input vector —
    filter ``is_canonical`` to apply the removal. Scale posture: the
    pairs stage is the capped bucket join (see embedding_near_dup); the
    closure is the shared connected-components operator (bounded driver
    union-find for small pair graphs, pointer-jumping loop above the
    threshold); the final join-back is one equi-join on vec_id.
    """
    from xcrawl3r_spark.operators.graph import connected_components

    pairs = embedding_near_dup(
        embeddings, dims, threshold, n_planes, max_bucket_df)
    comp = connected_components(
        pairs, max_iters=max_iters, src="vec_a", dst="vec_b")
    return (
        embeddings.select("vec_id")
        .join(comp.withColumnRenamed("id", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("component", "vec_id").alias("cluster"),
        )
        .withColumn("is_canonical", F.col("vec_id") == F.col("cluster"))
    )


def _centroids(corpus: DataFrame, assign_col: Column, n_centroids: int) -> list:
    """Element-wise mean embedding per cluster id (driver-side list of
    (cid, [floats]) — C x dims doubles, tiny). posexplode keeps the
    aggregation fully native and map-side-combinable."""
    rows = (
        corpus.select(assign_col.alias("cid"), F.posexplode("v"))
        .groupBy("cid", "pos").agg(F.avg("col").alias("m"))
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cid", F.transform("pm", lambda s: s["m"]).alias("centroid"))
        .collect()
    )
    return [(r["cid"], list(r["centroid"])) for r in rows]


def _nearest_cids(vec: Column, centroids: list, n: int) -> Column:
    """Array of the n cluster ids nearest (by cosine) to ``vec`` —
    centroids are broadcast as plan literals (C x dims, small)."""
    scored = F.array(*[
        F.struct(
            cosine_cols(vec, F.array(*[F.lit(float(x)) for x in c])).alias("cos"),
            F.lit(int(cid)).alias("cid"),
        )
        for cid, c in centroids
    ]).cast("array<struct<cos:double,cid:int>>")
    # struct ordering is field-wise: (cos desc, cid desc) via reverse sort
    top = F.slice(F.reverse(F.array_sort(scored)), 1, n)
    return F.transform(top, lambda s: s["cid"])


def ivf_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10,
    n_centroids: int = 16, n_probe: int = 4,
) -> DataFrame:
    """IVF ANN: deterministic coarse quantizer (one k-means refinement
    from a hash-partition init — no RNG, resume-safe), corpus sharded by
    nearest centroid, queries probe their ``n_probe`` nearest shards and
    re-rank exactly within them.

    The scale path vs brute force: the cross join becomes an equi-join on
    cid touching n_probe/n_centroids of the corpus. Centroids are
    C x dims doubles — plan-literal broadcast, never a shuffle.
    """
    corpus = embeddings.select("vec_id", _vec_d("embedding").alias("v"))
    # init: arbitrary-but-deterministic hash partition, then one Lloyd step
    cent0 = _centroids(corpus, F.pmod(F.col("vec_id"), F.lit(n_centroids)), n_centroids)
    assign1 = F.element_at(_nearest_cids(F.col("v"), cent0, 1), 1)
    cent1 = _centroids(corpus, assign1, n_centroids)

    sharded = corpus.withColumn(
        "cid", F.element_at(_nearest_cids(F.col("v"), cent1, 1), 1))
    qs = queries.select("query_id", _vec_d("q_embedding").alias("q")).withColumn(
        "cid", F.explode(_nearest_cids(F.col("q"), cent1, n_probe)))
    scored = sharded.join(F.broadcast(qs), "cid").select(
        "query_id", "vec_id",
        F.round(cosine_cols(F.col("q"), F.col("v")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )
