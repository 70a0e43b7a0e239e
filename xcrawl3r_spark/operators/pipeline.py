"""End-to-end training-corpus cleaning: the §2.10 operators composed as
one declarative plan — the shape a 100 TB pre-training ingest actually
runs, and proof the pieces compose without materialization barriers.

Stages (one declarative plan, with ONE documented exception: the
near-dup stage's connected-components probe executes a bounded
limit+collect at frame-CONSTRUCTION time — building corpus_clean /
corpus_curate runs the LSH candidate pipeline once to pick the
small-graph strategy; see operators/graph.connected_components):
 1. exact dedup  — keep the min-doc_id representative per content hash;
 2. Gopher rules — drop documents failing the Rae et al. 2021 quality
    rules (gopher_quality.passes);
 3. near-dup removal — MinHash+LSH pairs transitively closed into
    clusters; only each cluster's canonical (min doc_id) survives
    (dedupops.near_dup_clusters — the same removal semantic as
    corpus_curate. CHANGED in r3: earlier versions dropped the larger
    doc_id of each raw pair, which under-removes transitively-connected
    duplicates that never share a bucket; both composites now share the
    principled cluster semantic);
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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xcrawl3r_spark.functions.hashing import md5_long
from xcrawl3r_spark.operators import dedupops, textops


def corpus_clean(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, ...) -> surviving rows with quality + lang
    annotations. Deterministic: survivors and annotations depend only on
    content.

    r6 shape (guide §2.3/§2.4): the exact-dup key, the Gopher features,
    and the language-ID all come from ONE text-bearing scan; keep-min-
    doc_id is a row_number over content_fp instead of a groupBy + join-
    back (one shuffle, no self-join); the near-dup losers stay a
    broadcast anti-join. The r1-r5 formulation joined four separately
    scanned frames on doc_id — three extra corpus scans and three extra
    shuffles for the same rows (proven value-identical vs the unchanged
    DuckDB twin)."""
    norm = textops.norm_text_col()
    gr = textops.gopher_raw_cols()
    ranked = textops.lang_ranked_col()
    flags = docs.select(
        "doc_id",
        md5_long(norm).alias("content_fp"),
        gr["n"].alias("n_words"),
        F.round(gr["mean_wlen"], 6).alias("mean_word_len"),
        textops.gopher_passes_col().alias("_gq"),
        ranked[0]["lang"].alias("lang_pred"),
    )
    # drop = cluster NON-canonicals (the near-dup losers) — the small
    # side at corpus scale (canonicals are ~the whole corpus; their
    # complement is only the docs that lost their cluster), so the
    # anti-join side stays broadcastable
    near_drops = dedupops.near_dup_drops(docs)
    fp_w = Window.partitionBy("content_fp").orderBy("doc_id")
    return (
        flags.withColumn("_rk", F.row_number().over(fp_w))
        .filter((F.col("_rk") == 1) & F.col("_gq"))
        .join(F.broadcast(near_drops), "doc_id", "left_anti")
        .select("doc_id", "n_words", "mean_word_len", "lang_pred")
    )


def corpus_stats(docs: DataFrame) -> DataFrame:
    """Per-source corpus observability — the dashboard row a 100 TB
    ingest watches per snapshot: document/token volume, exact-duplicate
    headroom (distinct content fingerprints vs rows), Gopher-quality
    pass count, and language spread. ONE map-side projection + ONE
    aggregation pass (countDistinct adds its partial-agg expand, still
    a single shuffle on source); every output is an integer, so the
    row is cross-engine exact.

    Output: (source, n_docs, n_tokens, n_distinct_content,
    n_gopher_pass, n_langs)."""
    ranked = textops.lang_ranked_col()
    base = docs.select(
        "source",
        md5_long(textops.norm_text_col()).alias("fp"),
        F.size(textops.tokens_col()).alias("nt"),
        textops.gopher_passes_col().cast("long").alias("gq"),
        ranked[0]["lang"].alias("lang"),
    )
    return base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").cast("long").alias("n_tokens"),
        F.countDistinct("fp").alias("n_distinct_content"),
        F.sum("gq").alias("n_gopher_pass"),
        F.countDistinct("lang").alias("n_langs"),
    )


def token_quantiles(
    docs: DataFrame, qs: tuple[int, ...] = (25, 50, 75, 95)
) -> DataFrame:
    """Per-source token-count DISCRETE quantiles (p25/p50/p75/p95 by
    default) — the length-distribution dashboard row next to
    ``corpus_stats`` (a source whose p95 collapses after a cleaning
    change is the classic over-filtering smell).

    Discrete (type-1) quantiles, not interpolated: the p-th quantile is
    the element at rank ((n-1)*q) div 100 + 1 of the (n_tokens, doc_id)
    ascending order — an ALL-INTEGER selection, so both engines pick the
    identical element and the output is cross-engine exact (interpolated
    quantiles divide floats and can't hash-match; approx_percentile is
    approximate by design — neither survives the oracle gate).

    Scale posture: tokenize is map-side; ranking is ONE window shuffle
    on source (row_number and the per-source count share the partition,
    so one exchange serves both), then a groupBy(source) with
    conditional-max quantile picks that rides the SAME source
    clustering. Per-source row counts are the only memory term."""
    nt = docs.select(
        "source", "doc_id", F.size(textops.tokens_col()).alias("nt"))
    from pyspark.sql import Window

    order_w = Window.partitionBy("source").orderBy("nt", "doc_id")
    ranked = nt.select(
        "source", "nt",
        F.row_number().over(order_w).alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )
    picks = [
        F.max(
            F.when(F.col("rn") == F.expr(f"((n - 1) * {q}) div 100") + 1,
                   F.col("nt"))
        ).cast("long").alias(f"p{q}")
        for q in qs
    ]
    return ranked.groupBy("source").agg(
        F.max("n").alias("n_docs"), *picks)


def corpus_curate(
    docs: DataFrame,
    budget: int = 5000,
    bench_mod: int = 97,
    decon_ngram: int = 3,
    c4_min_sentences: int = 0,
    remove_substrings: bool = False,
    substr_k: int = 8,
) -> DataFrame:
    """The FULL training-corpus assembly pipeline: every map-side gate in
    ONE scan, the three genuinely-shuffling stages as separate branches,
    and a final per-source token-budget pack.

        1. one projection computes content_fp (exact-dup key), Gopher
           quality passes, C4 passes, Gopher repetition passes, token
           count, language-ID, and the pack ordering hash — 6 operators,
           ONE pass over the 100 TB corpus (the naive composition joins
           6 single-operator frames = 6 extra scans + shuffles);
        2. exact dedup = row_number over content_fp (keep min doc_id) —
           one shuffle, no join-back;
        3. near-dup removal = LSH pairs -> connected components -> keep
           cluster canonicals (dedupops.near_dup_clusters);
        4. decontamination vs the deterministic held-out subset
           (doc_id % bench_mod == 0), contaminated rows dropped — note
           the benchmark members drop themselves (full self-overlap);
        5. pack survivors to ``budget`` tokens per source in seeded-hash
           order (curation.pack_token_budget semantics, inlined on the
           already-computed n_tokens/h columns).

    Output: (doc_id, source, lang_pred, n_tokens, cum_tokens).
    Deterministic end-to-end; oracle-checked as ``corpus_curate``.

    ``c4_min_sentences`` defaults to 0 here (vs the paper's 3 in
    ``c4_filters``): the sentence floor assumes punctuated prose, and a
    corpus without terminal punctuation — like the synthetic gate corpus
    — would gate to empty, hiding every downstream stage. The lorem/
    brace boilerplate rules still apply.

    ``remove_substrings=True`` prepends substring-level dedup
    (dedupops.remove_dup_spans, Lee et al. 2021's span cut with
    keep-first): every downstream gate, hash, and token count then sees
    the span-cut text, so boilerplate repeated INSIDE otherwise-unique
    documents stops inflating token budgets and quality stats. Off by
    default — it adds the dense window-hash shuffle, which is the single
    most expensive stage at corpus scale.
    """
    from xcrawl3r_spark.functions.hashing import seeded
    from xcrawl3r_spark.operators import curation

    if remove_substrings:
        cleaned = dedupops.remove_dup_spans(docs, k=substr_k)
        docs = docs.drop("text").join(
            cleaned.select("doc_id", "text"), "doc_id")
    norm = textops.norm_text_col()
    ranked = textops.lang_ranked_col()
    flags = docs.select(
        "doc_id", "source",
        md5_long(norm).alias("content_fp"),
        textops.gopher_passes_col().alias("gq_ok"),
        textops.c4_passes_col(c4_min_sentences).alias("c4_ok"),
        textops.repetition_passes_col().alias("rep_ok"),
        F.size(textops.tokens_col()).alias("n_tokens"),
        ranked[0]["lang"].alias("lang_pred"),
        seeded(F.col("doc_id").cast("string"), "pack").alias("h"),
    )
    fp_w = Window.partitionBy("content_fp").orderBy("doc_id")
    gated = (
        flags.withColumn("_fp_rk", F.row_number().over(fp_w))
        .filter((F.col("_fp_rk") == 1) & F.col("gq_ok") & F.col("c4_ok")
                & F.col("rep_ok"))
        .drop("_fp_rk", "gq_ok", "c4_ok", "rep_ok", "content_fp")
    )
    # r6 shape: both removal decisions attach as BROADCAST ANTI-joins of
    # their (small) drop sets instead of inner joins against full-corpus
    # frames — the gated side is never shuffled for them (guide §3.1;
    # same complement argument as corpus_clean's near_drops). Semantics
    # unchanged: near_dup_clusters covers every doc exactly once, and
    # decontaminate emits one row per doc (explode_outer), so keeping
    # is_canonical / ~contaminated rows == dropping their complements.
    drops = dedupops.near_dup_drops(docs)
    # contaminated = "shares >= 1 benchmark n-gram" — a broadcast
    # SEMI-join of the doc n-gram fan-out against the benchmark hash set
    # plus a distinct over the (tiny) hit set. decontaminate()'s full
    # per-doc aggregation counts every doc's every n-gram to produce
    # n_hits we would only compare against 0; the semi-join prunes the
    # fan-out before any aggregation (guide §2.3 "aggregate before you
    # shuffle" — here: don't aggregate at all). Hit-for-hit identical to
    # decontaminate(...).filter(contaminated) by definition of n_hits.
    bench_ng = F.broadcast(
        docs.filter(F.col("doc_id") % bench_mod == 0)
        .select(F.explode(curation.ngrams_col(decon_ngram)).alias("ng"))
        .select(md5_long(F.col("ng")).alias("bh"))
        .distinct()
    )
    contaminated = (
        docs.select("doc_id",
                    F.explode(curation.ngrams_col(decon_ngram)).alias("ng"))
        .withColumn("ng_hash", md5_long(F.col("ng")))
        .join(bench_ng, F.col("ng_hash") == F.col("bh"), "left_semi")
        .select("doc_id").distinct()
    )
    survivors = (
        gated.join(F.broadcast(drops), "doc_id", "left_anti")
        .join(F.broadcast(contaminated), "doc_id", "left_anti")
    )
    pack_w = (
        Window.partitionBy("source").orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        survivors
        .withColumn("cum_tokens", F.sum("n_tokens").over(pack_w).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "source", "lang_pred", "n_tokens", "cum_tokens")
    )
