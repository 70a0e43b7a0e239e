"""Snapshot table store — Iceberg-style atomic commits + time travel on
plain Parquet, used for checkpointed frontier/seen/edges state.

On a real cluster these tables are Iceberg (`df.writeTo(...).append()` with
snapshot ids per crawl iteration — the north rule's layout); the sandbox
has no Iceberg runtime jars, so this module provides the same contract on
a directory of parquet commits with a JSON manifest:

    <base>/<table>/data/iter=<k>/ part-*.parquet      (one commit per iter)
    <base>/<table>/_manifest.json                      (atomic rename)

Commit protocol: write data dir -> write manifest.tmp -> os.replace()
(atomic on POSIX). A killed run leaves either the old manifest (commit
invisible -> iteration re-runs deterministically) or the new one (commit
visible -> iteration skipped on resume). Combined with a fully
deterministic data plane (no wall clock, no RNG — SURVEY §4.2) resume is
bit-identical.

If an Iceberg catalog IS configured on the session
(spark.sql.catalog.<name> set), `IcebergStore` delegates to real Iceberg
tables with the same interface.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base = base_dir
        os.makedirs(base_dir, exist_ok=True)

    def _tdir(self, table: str) -> str:
        return os.path.join(self.base, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_manifest.json")

    def manifest(self, table: str) -> dict:
        path = self._manifest_path(table)
        if not os.path.exists(path):
            return {"commits": []}
        with open(path) as f:
            return json.load(f)

    def last_iteration(self, table: str) -> int | None:
        commits = self.manifest(table)["commits"]
        return max((c["iter"] for c in commits), default=None)

    def commit(self, df: DataFrame, table: str, iteration: int, meta: dict | None = None) -> None:
        """Atomically append one iteration's rows as a new snapshot."""
        m = self.manifest(table)
        if any(c["iter"] == iteration for c in m["commits"]):
            return  # already committed (resume re-ran the iteration)
        data_dir = os.path.join(self._tdir(table), "data", f"iter={iteration}")
        if os.path.exists(data_dir):
            shutil.rmtree(data_dir)  # torn write from a killed run
        df.write.mode("overwrite").parquet(data_dir)
        m["commits"].append({"iter": iteration, "path": data_dir, "meta": meta or {}})
        tmp = self._manifest_path(table) + ".tmp"
        os.makedirs(self._tdir(table), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path(table))

    def read(self, table: str, upto: int | None = None) -> DataFrame | None:
        """Read the union of committed snapshots (optionally time-traveled
        to iteration <= upto). None if no commits."""
        commits = self.manifest(table)["commits"]
        if upto is not None:
            commits = [c for c in commits if c["iter"] <= upto]
        if not commits:
            return None
        paths = [c["path"] for c in sorted(commits, key=lambda c: c["iter"])]
        return self.spark.read.parquet(*paths)

    def read_iteration(self, table: str, iteration: int) -> DataFrame | None:
        commits = [c for c in self.manifest(table)["commits"] if c["iter"] == iteration]
        if not commits:
            return None
        return self.spark.read.parquet(commits[0]["path"])


class IcebergStore:
    """The SnapshotStore contract on real Iceberg tables.

    Requires an Iceberg catalog configured on the session
    (``spark.sql.catalog.<catalog>`` = org.apache.iceberg.spark.SparkCatalog);
    construction fails fast otherwise. Tables are partitioned by ``iter``
    so each crawl iteration is one Iceberg snapshot-visible partition:
    commit = idempotent append (skipped when the iteration's partition
    already exists — a resumed run re-reaches the same commit point
    deterministically and must not double-append), read = partition-pruned
    scan, time travel = ``iter <= upto`` exactly like the parquet store.

    This sandbox ships no Iceberg runtime jars, so the class is exercised
    for interface parity + fast-fail only (tests/test_config_sources_sinks
    asserts the failure mode); on a cluster it is a drop-in for
    SnapshotStore via ``CrawlConfig.iceberg_catalog``.
    """

    def __init__(self, spark: SparkSession, catalog: str, namespace: str = "crawl"):
        try:
            impl = spark.conf.get(f"spark.sql.catalog.{catalog}")
        except Exception:
            impl = None
        if not impl:
            raise RuntimeError(
                f"no Iceberg catalog configured: set spark.sql.catalog.{catalog} "
                "(sandbox has no Iceberg runtime jars; use SnapshotStore)")
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        spark.sql(f"create namespace if not exists {catalog}.{namespace}")

    def _full(self, table: str) -> str:
        return f"{self.catalog}.{self.namespace}.{table}"

    def _exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._full(table))

    def last_iteration(self, table: str) -> int | None:
        if not self._exists(table):
            return None
        row = self.spark.table(self._full(table)).selectExpr(
            "max(iter) as m").collect()[0]
        return row["m"]

    def commit(self, df: DataFrame, table: str, iteration: int,
               meta: dict | None = None) -> None:
        from pyspark.sql import functions as F

        if "iter" not in df.columns:
            df = df.withColumn("iter", F.lit(iteration))
        if not self._exists(table):
            df.writeTo(self._full(table)).partitionedBy("iter").create()
            return
        done = (
            self.spark.table(self._full(table))
            .filter(F.col("iter") == iteration).limit(1).count()
        )
        if done:
            return  # already committed (resume re-ran the iteration)
        df.writeTo(self._full(table)).append()

    def read(self, table: str, upto: int | None = None) -> DataFrame | None:
        if not self._exists(table):
            return None
        df = self.spark.table(self._full(table))
        if upto is not None:
            from pyspark.sql import functions as F

            df = df.filter(F.col("iter") <= upto)
        return df

    def read_iteration(self, table: str, iteration: int) -> DataFrame | None:
        if not self._exists(table):
            return None
        from pyspark.sql import functions as F

        return self.spark.table(self._full(table)).filter(
            F.col("iter") == iteration)


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Persist a table hash-bucketed on ``bucket_col`` (SURVEY §2.5): two
    tables bucketed the same way join WITHOUT a shuffle — the posture for
    the 10^10-row seen set joined against frontier batches every
    iteration on a real cluster (plan-audited in tests/test_plans.py).

    Uses saveAsTable (bucket metadata lives in the session catalog);
    sort_col additionally sorts within buckets so sort-merge joins skip
    the sort too.
    """
    spark = df.sparkSession
    if not spark.catalog.tableExists(table):
        # a killed run can leave the managed location on disk with no
        # catalog entry; CREATE then fails with LOCATION_ALREADY_EXISTS.
        # Only local-filesystem warehouses can be cleaned here (the
        # sandbox case); remote schemes (hdfs:/s3a:/...) are left alone.
        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        local = wh[len("file:"):] if wh.startswith("file:") else (
            wh if "://" not in wh else None)
        if local:
            loc = os.path.join(local, table.lower())
            if os.path.isdir(loc):
                shutil.rmtree(loc)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)
