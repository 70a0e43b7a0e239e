"""D1-D3: the distributed URL-seen set — partitioned Bloom pre-filter +
exact left-anti join.

The reference's seen set is colly's in-memory FNV-64 hash set per collector
(pkg/xcrawl3r/xcrawl3r.go:31,347,422). At 10^10 URLs that set is ~160 GB of
hashes — too big for one broadcast, fine as a partitioned table. The design
here:

1. the ``seen`` state lives as a DataFrame/table keyed by
   (seed_id, url_hash) — per-seed scope mirrors the reference's fresh
   collector per seed (xcrawl3r.go:52); ``global_dedup`` collapses the key
   to url_hash only;
2. a *partitioned* Bloom filter over ``pmod(url_hash, P)`` hash-ranges is
   built executor-side (mapInPandas -> one bitset per partition, OR-reduced
   per partition id on the driver, broadcast as a dict {pid: bitset}) —
   only bitsets ever cross the wire, never the seen rows;
3. candidates probe their partition's bitset vectorized (numpy) — Bloom
   has no false negatives, so survivors of the NOT-maybe-seen test are
   definitely new; the *maybe-seen* minority goes through the exact
   left-anti hash join to kill false positives.

At bench scale the Bloom pass removes ~99% of the anti-join probe side; at
10^10 scale each partition bitset stays ≤ a few hundred MB and partitions
are probed independently (no single giant broadcast).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bloom_positions(hashes: np.ndarray, bits: int, k: int) -> Iterator[np.ndarray]:
    """k hash positions per input hash via double hashing h1 + i*h2."""
    h = hashes.astype(np.uint64)
    h1 = h % np.uint64(bits)
    h2 = (h >> np.uint64(17) | np.uint64(1)) % np.uint64(bits)
    for i in range(k):
        yield (h1 + np.uint64(i) * h2) % np.uint64(bits)


def _set_bits(bitset: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(bitset, pos >> np.uint64(3),
                     np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)))


def _test_bits(bitset: np.ndarray, pos: np.ndarray) -> np.ndarray:
    return (bitset[pos >> np.uint64(3)]
            >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1) > 0


def build_bloom(
    seen: DataFrame, partitions: int, bits: int, k: int
) -> dict[int, bytes]:
    """Build the partitioned Bloom filter over seen.url_hash.

    Executor-side: each task folds its rows into per-pid bitsets and emits
    (pid, bitset_bytes); driver ORs bitsets per pid. Cross-the-wire volume
    is O(tasks * bits/8), independent of row count.
    """
    nbytes = bits // 8

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local: dict[int, np.ndarray] = {}
        for pdf in batches:
            hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
            pids = (hashes % partitions + partitions) % partitions
            for pid in np.unique(pids):
                bs = local.setdefault(int(pid), np.zeros(nbytes, dtype=np.uint8))
                sub = hashes[pids == pid]
                for pos in _bloom_positions(sub, bits, k):
                    _set_bits(bs, pos)
        yield pd.DataFrame(
            {"pid": list(local), "bitset": [b.tobytes() for b in local.values()]}
        )

    pieces = (
        seen.select("url_hash")
        .mapInPandas(fold, "pid int, bitset binary")
        .collect()
    )
    merged: dict[int, np.ndarray] = {}
    for row in pieces:
        bs = np.frombuffer(row["bitset"], dtype=np.uint8)
        if row["pid"] in merged:
            merged[row["pid"]] = merged[row["pid"]] | bs
        else:
            merged[row["pid"]] = bs
    return {pid: bs.tobytes() for pid, bs in merged.items()}


def merge_blooms(
    dst: dict[int, bytes] | None, src: dict[int, bytes]
) -> dict[int, bytes]:
    """OR ``src`` partition bitsets into ``dst`` (incremental maintenance).

    Bloom filters are monotone — the union of two filters over disjoint
    row sets is the filter over the union — so the crawl loop builds each
    iteration's filter from the NEW seen rows only and folds it in, instead
    of rescanning the whole seen set every iteration (which is quadratic
    over the crawl's lifetime)."""
    if dst is None:
        return dict(src)
    out = dict(dst)
    for pid, raw in src.items():
        if pid in out:
            a = np.frombuffer(out[pid], dtype=np.uint8)
            b = np.frombuffer(raw, dtype=np.uint8)
            out[pid] = (a | b).tobytes()
        else:
            out[pid] = raw
    return out


def bloom_probe_maybe_seen(
    df: DataFrame, bloom: dict[int, bytes], partitions: int, bits: int, k: int,
    key: str = "url_hash",
) -> DataFrame:
    """Add boolean column ``maybe_seen`` by probing the broadcast bitsets.

    Rows with maybe_seen=false are DEFINITELY unseen (no false negatives)
    and can skip the exact anti-join.
    """
    spark = df.sparkSession
    b_bloom = spark.sparkContext.broadcast(bloom)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitsets = {
            pid: np.frombuffer(raw, dtype=np.uint8)
            for pid, raw in b_bloom.value.items()
        }
        for pdf in batches:
            hashes = pdf[key].to_numpy(dtype=np.int64)
            maybe = np.zeros(len(hashes), dtype=bool)
            if len(hashes):
                pids = (hashes % partitions + partitions) % partitions
                for pid in np.unique(pids):
                    bs = bitsets.get(int(pid))
                    mask = pids == pid
                    if bs is None:
                        continue  # empty partition bitset -> definitely unseen
                    sub = hashes[mask]
                    hit = np.ones(len(sub), dtype=bool)
                    for pos in _bloom_positions(sub, bits, k):
                        hit &= _test_bits(bs, pos)
                    maybe[mask] = hit
            out = pdf.copy()
            out["maybe_seen"] = maybe
            yield out

    from pyspark.sql.types import BooleanType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField("maybe_seen", BooleanType())]
    )
    return df.mapInPandas(probe, schema)


def anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame,
    *,
    key: str = "dedup_key",
    bloom: dict[int, bytes] | None = None,
    bloom_partitions: int = 8,
    bloom_bits: int = 1 << 20,
    bloom_hashes: int = 7,
    keys_unique: bool = False,
    filter_kind: str = "bloom",
    stale_keys: DataFrame | None = None,
) -> DataFrame:
    """candidates \\ seen on ``key`` (D1). Per-seed scope (D2) is folded
    into the key upstream: dedup_key = xxhash64(seed_id, url) — the same
    hash-set membership semantics as colly's per-collector FNV-64 storage.

    With a Bloom filter: definitely-new rows bypass the shuffle entirely;
    only maybe-seen rows are anti-joined exactly. Equivalent to the plain
    anti-join by the no-false-negative property (property-tested).

    ``keys_unique``: the crawl loop only ever inserts post-anti-join,
    batch-deduped rows, so seen keys are unique by construction — skip the
    distinct's full-seen shuffle in that case.

    ``stale_keys``: seen keys NOT yet folded into the probabilistic filter
    (the crawl loop defers filter folds across a few iterations to save
    per-iteration jobs). The maybe_seen=false bypass is only sound for
    keys the filter has absorbed, so bypassing rows are exactly
    anti-joined against this (small: a few recent iterations) set.
    """
    if bloom is not None and not bloom:
        # empty filter: every candidate is new EXCEPT keys awaiting their
        # filter fold — skip the Python probe round-trip, keep the (small)
        # exact stale check
        if stale_keys is not None:
            return candidates.join(stale_keys.select(key), key, "left_anti")
        return candidates
    seen_keys = seen.select(key)
    if not keys_unique:
        seen_keys = seen_keys.distinct()
    if bloom is None:
        return candidates.join(seen_keys, key, "left_anti")
    if filter_kind == "cuckoo":
        from xcrawl3r_spark.operators.cuckoo import cuckoo_probe_maybe_seen

        probed = cuckoo_probe_maybe_seen(
            candidates, bloom, bloom_partitions, key=key)
    else:
        probed = bloom_probe_maybe_seen(
            candidates, bloom, bloom_partitions, bloom_bits, bloom_hashes,
            key=key)
    # the fresh/maybe split consumes `probed` in BOTH union branches, and
    # Spark does not share common subplans across branches — without a
    # materialization the Python probe stage executes twice per batch.
    # One lazy DISK_ONLY checkpoint (bounded: one frontier wave) makes it
    # run once; both branches then read the materialized blocks.
    from pyspark import StorageLevel

    probed = probed.localCheckpoint(
        eager=False, storageLevel=StorageLevel.DISK_ONLY)
    fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    checked = maybe.join(seen_keys, key, "left_anti")
    if stale_keys is not None:
        fresh = fresh.join(stale_keys.select(key), key, "left_anti")
    return fresh.unionByName(checked)
