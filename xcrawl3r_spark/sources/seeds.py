"""S1-S3 seed sources: CLI-style URL lists, line files, stdin.

The reference fans three seed sources into one channel
(cmd/xcrawl3r/main.go:185-234): repeated ``--url`` flags (:190-194), a
``--list`` line file (:196-217), and piped stdin (:219-233, pipe detection
internal/input/input.go:5-15), dropping blank lines (:207,225). Here each
source lands in the same ``seeds(seed_id, url)`` DataFrame.

seed_id is the md5 hex of the raw URL string: the reference's dedup scope
is "one fresh collector per seed string" (xcrawl3r.go:52), so the seed's
identity IS the string — a content-derived id keeps that semantic,
distributed-safe and stable across resumes (no zipWithIndex
nondeterminism, no driver loop on large seed lists).
"""

from __future__ import annotations

import sys
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _with_seed_ids(df: DataFrame) -> DataFrame:
    """url -> (seed_id, url), blanks dropped (F5)."""
    return (
        df.select(F.trim("url").alias("url"))
        .filter(F.length("url") > 0)                     # main.go:207,225
        .select(F.md5(F.col("url")).alias("seed_id"), "url")
    )


def seeds_from_urls(spark: SparkSession, urls: Iterable[str]) -> DataFrame:
    """S1: explicit URL list (the repeated/CSV --url flag, main.go:190-194)."""
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return _with_seed_ids(df)


def seeds_from_list_file(spark: SparkSession, path: str) -> DataFrame:
    """S2: one-URL-per-line file (--list, main.go:196-217). Distributed
    read — seed lists can be arbitrarily large."""
    df = spark.read.text(path).withColumnRenamed("value", "url")
    return _with_seed_ids(df)


def seeds_from_stdin(spark: SparkSession) -> DataFrame:
    """S3: piped stdin (main.go:219-233; pipe detection input.go:5-15).
    Driver-side by nature; returns an empty frame when stdin is a tty."""
    if sys.stdin is None or sys.stdin.isatty():
        return spark.createDataFrame([], "seed_id string, url string")
    urls = [ln.strip() for ln in sys.stdin if ln.strip()]
    if not urls:
        return spark.createDataFrame([], "seed_id string, url string")
    return seeds_from_urls(spark, urls)
