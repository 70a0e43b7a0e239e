"""Mergeable cardinality sketches for corpus-scale profiling (§2.10
adjunct): approximate distinct counts over 100 TB without a
count-distinct shuffle of raw values.

Built on Spark's native Apache DataSketches HLL functions
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate`` — JVM
aggregates, whole-stage-codegen'd): the map-side partial is a fixed-size
sketch blob, so the shuffle moves kilobytes per group regardless of how
many distinct values feed it. That mergeability is the whole point at
scale — per-partition/per-day/per-source sketches union into exact
global sketches without re-touching the data (the reference has no
analytics tier at all; this is engine-added capability, same posture as
the dedup/curation operators).

Correctness pinning: estimates are approximate, so values can't
hash-match an exact oracle. The driver gate instead checks a BOUND — the
``*_checked`` query emits the exact count plus a boolean
"estimate within rel_err", and the DuckDB oracle produces the same rows
with the boolean literally true; any estimate drifting past the bound
fails the row hash. The union==direct coherence is pytest-pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: DataSketches lgConfigK default: 2^12 registers ~ 0.8% typical relative
#: error; bump for tighter bounds (cost: 2^lg_k bytes per sketch blob).
LG_K = 12


def approx_distinct(
    df: DataFrame, keys: list[str], col: str, lg_k: int = LG_K
) -> DataFrame:
    """(keys..., n_approx): HLL distinct estimate of ``col`` per group.
    One hash-agg with sketch partials — the shuffle carries one
    2^lg_k-byte blob per (partition, group), never the value stream."""
    return (
        df.groupBy(*keys)
        .agg(F.expr(f"hll_sketch_agg({col}, {lg_k})").alias("_sk"))
        .select(*keys,
                F.expr("hll_sketch_estimate(_sk)").alias("n_approx"))
    )


def approx_distinct_rollup(
    df: DataFrame, key: str, col: str, lg_k: int = LG_K
) -> DataFrame:
    """Two-level rollup: per-``key`` sketches UNIONED into one global
    estimate — the mergeable-partial pattern (per-day/per-source blobs
    stored small, rolled up on demand). Output: one row
    (n_groups, global_approx)."""
    per = df.groupBy(key).agg(
        F.expr(f"hll_sketch_agg({col}, {lg_k})").alias("_sk"))
    return per.agg(
        F.count("*").alias("n_groups"),
        F.expr("hll_sketch_estimate(hll_union_agg(_sk))")
        .alias("global_approx"),
    )


def approx_distinct_checked(
    df: DataFrame, keys: list[str], col: str,
    rel_err: float = 0.05, lg_k: int = LG_K,
) -> DataFrame:
    """Gate form: per group, the EXACT distinct count plus a boolean
    asserting the HLL estimate lands within ``rel_err`` of it. Exact
    values + an always-true boolean are what the SQL oracle reproduces,
    so the driver's row hash pins the sketch's accuracy contract. (The
    exact count here is for the gate only — production callers use
    ``approx_distinct`` precisely to avoid it.)"""
    return (
        df.groupBy(*keys)
        .agg(
            F.expr(f"hll_sketch_agg({col}, {lg_k})").alias("_sk"),
            F.countDistinct(col).alias("n_exact"),
        )
        .select(
            *keys,
            "n_exact",
            (F.abs(F.expr("hll_sketch_estimate(_sk)") - F.col("n_exact"))
             <= F.col("n_exact") * rel_err).alias("within_bound"),
        )
    )
