"""End-to-end training-corpus cleaning: the §2.10 operators composed as
one declarative plan — the shape a 100 TB pre-training ingest actually
runs, and proof the pieces compose without materialization barriers.

Stages (all lazy; Catalyst sees ONE plan):
 1. exact dedup  — keep the min-doc_id representative per content hash;
 2. Gopher rules — drop documents failing the Rae et al. 2021 quality
    rules (gopher_quality.passes);
 3. near-dup removal — MinHash+LSH candidate pairs; of each pair the
    larger doc_id is dropped (deterministic keep-smallest rule — the
    cheap stand-in for connected-component clustering, which needs an
    iterative algorithm; documented divergence);
 4. language-ID — annotate survivors with the marker-heuristic lang_pred.

Everything is a composition of already-oracle-checked operators, and the
composite itself is oracle-checked (driver query ``corpus_clean``): the
DuckDB twin assembles the same stages from the same SQL pieces.

Scale posture: stage 1 is one hash shuffle; stage 2 is map-side; stage 3
is the banded LSH join (bounded buckets); stage 4 is map-side. The only
shuffles are the ones the individual operators already pay — composing
them adds two broadcast-able anti-join sides (exact-dup losers and
near-dup drops are both small relative to the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xcrawl3r_spark.functions.hashing import md5_long
from xcrawl3r_spark.operators import dedupops, textops


def corpus_clean(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) -> surviving rows with quality + lang
    annotations. Deterministic: survivors and annotations depend only on
    content."""
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    with_fp = docs.select("doc_id", md5_long(norm).alias("content_fp"))
    keepers = (
        with_fp.groupBy("content_fp").agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    gq = textops.gopher_quality(docs)
    near_drops = (
        dedupops.minhash_lsh_pairs(docs)
        .select(F.col("doc_b").alias("doc_id")).distinct()
    )
    lang = textops.lang_id(docs).select("doc_id", "lang_pred")
    return (
        docs.select("doc_id")
        .join(keepers, "doc_id")                       # exact-dup keepers
        .join(gq.filter(F.col("passes")).select(
            "doc_id", "n_words", "mean_word_len"), "doc_id")
        .join(F.broadcast(near_drops), "doc_id", "left_anti")
        .join(lang, "doc_id")
        .select("doc_id", "n_words", "mean_word_len", "lang_pred")
    )
