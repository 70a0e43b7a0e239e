"""Corpus-curation operators for large-scale training-data pipelines:
benchmark decontamination, stratified sampling, token-budget packing, and
per-source tf-idf vocabulary ranking.

Beyond the reference (xcrawl3r emits URLs only); these are the §2.10-class
operators a 100 TB corpus pipeline runs after the crawl. All native
``pyspark.sql.functions`` (JVM-side, whole-stage codegen) — no Python in
the hot path. Every output value that must match the DuckDB oracle uses
the cross-engine md5 60-bit hash (functions/hashing.py) or integer/
deterministic-double arithmetic; no cross-row float accumulation.

Scale posture (100 TB):
- decontaminate: the benchmark side (a test-set's n-grams) is hashed to
  60-bit longs, distinct'd, and broadcast — the corpus side never
  shuffles its n-grams, only the per-doc aggregation keys. A 10M-ngram
  benchmark broadcasts as ~80 MB of longs; above that pass
  ``broadcast_bench=False`` and the join falls back to shuffle-hash on
  the (narrow) hash column.
- stratified_sample: two-phase salted top-k (same pattern as the
  politeness window) so one giant stratum cannot serialize into a single
  task.
- pack_token_budget: a per-group running sum is inherently sequential
  per group; groups are sources/hosts (bounded cardinality per group at
  crawl scale). The window shuffles once on the group key.
- tfidf_top_terms: two hash aggregations (map-side partials) + one
  broadcast scalar + a per-source top-k window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from xcrawl3r_spark.functions.hashing import md5_long, seeded
from xcrawl3r_spark.operators.textops import tokens_col


def ngrams_col(n: int, text: str = "text"):
    """Word n-grams of ``text`` as an array column (space-joined).
    Documents shorter than ``n`` tokens yield an empty array (Spark's
    ``sequence(1, 0)`` counts DOWN, so the short case must be guarded)."""
    toks = tokens_col(text)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per document, how many of the benchmark
    set's word ``n``-grams it contains.

    The standard pre-training hygiene step: held-out eval sets (the
    ``benchmark`` frame, same schema as ``docs``) must not leak into the
    training corpus. Output: (doc_id, n_ngrams, n_hits, contaminated)
    where n_hits counts DISTINCT benchmark n-grams present in the doc.
    """
    bench_ng = (
        benchmark.select(F.explode(ngrams_col(n)).alias("ng"))
        .select(md5_long(F.col("ng")).alias("bh"))
        .distinct()
    )
    if broadcast_bench:
        bench_ng = F.broadcast(bench_ng)
    doc_ng = docs.select(
        "doc_id", F.explode_outer(ngrams_col(n)).alias("ng")
    ).withColumn("ng_hash", md5_long(F.col("ng")))
    joined = doc_ng.join(bench_ng, doc_ng.ng_hash == bench_ng.bh, "left")
    return joined.groupBy("doc_id").agg(
        F.count("ng_hash").alias("n_ngrams"),
        F.count_distinct(
            F.when(F.col("bh").isNotNull(), F.col("ng_hash"))
        ).alias("n_hits"),
    ).withColumn("contaminated", F.col("n_hits") > 0)


def stratified_sample(
    docs: DataFrame,
    k: int,
    stratum: str = "lang",
    n_salt: int = 16,
    seed: str = "strat",
) -> DataFrame:
    """Deterministic per-stratum top-k sample: within each ``stratum``
    value keep the ``k`` documents with the smallest seeded hash — a
    reproducible uniform sample with exact per-stratum counts (what a
    training-mix spec needs; rate-based Bernoulli can't hit exact counts).

    Two-phase: a salted partial top-k bounds any single task to its salt
    shard before the final per-stratum window — a 10^9-row stratum never
    serializes into one task. Phase 1 is a strict superset of the final
    top-k (each salt shard keeps its own k best), so the result is
    bit-identical to the single-window formulation the oracle uses.
    """
    h = seeded(F.col("doc_id").cast("string"), seed).alias("h")
    base = docs.select("doc_id", stratum, h)
    w1 = Window.partitionBy(
        stratum, F.pmod(F.col("h"), F.lit(n_salt))
    ).orderBy("h", "doc_id")
    survivors = (
        base.withColumn("_prn", F.row_number().over(w1))
        .filter(F.col("_prn") <= k)
        .drop("_prn")
    )
    w2 = Window.partitionBy(stratum).orderBy("h", "doc_id")
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .drop("h")
    )


def pack_token_budget(
    docs: DataFrame,
    budget: int,
    group: str = "source",
    seed: str = "pack",
) -> DataFrame:
    """Token-budget corpus packing: within each ``group``, admit documents
    in deterministic (seeded-hash) order until the group's cumulative
    whitespace-token count would exceed ``budget``.

    The training-mix assembly step: each source contributes at most
    ``budget`` tokens, chosen reproducibly. A document is admitted iff the
    running total INCLUDING it is <= budget (first-fit in hash order, no
    skip-ahead — deterministic and oracle-expressible).
    Output: (doc_id, group, n_tokens, cum_tokens).
    """
    n_tokens = F.size(tokens_col()).alias("n_tokens")
    h = seeded(F.col("doc_id").cast("string"), seed).alias("h")
    base = docs.select("doc_id", group, n_tokens, h)
    w = (
        Window.partitionBy(group)
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
        .drop("h")
    )


def mixture_sample(
    docs: DataFrame,
    total_tokens: int,
    weights,
    group: str = "source",
    seed: str = "mix",
    upsample: bool = False,
    max_epochs: int = 10,
) -> DataFrame:
    """Training-data mixture assembly: split a ``total_tokens`` budget
    across groups proportionally to integer ``weights``, then admit each
    group's documents in seeded-hash order until its allocation is
    filled — the "X% web, Y% books, Z% code" step every pre-training
    recipe runs (weights are the tuned mixture proportions; e.g. the
    Gopher/LLaMA data tables — public).

    ``weights``: a ``(group, weight)`` DataFrame or a ``{group: int}``
    dict. Allocation per group is ``(total_tokens * weight) div
    sum(weights)`` — INTEGER arithmetic, so the split is cross-engine
    exact (float proportions would round differently per engine).
    Groups without a weight row are excluded (weight 0 of the mixture).
    A group short on data simply fills less than its allocation — the
    achieved mix is visible by comparing max(cum_tokens) to
    group_budget per group.

    ``upsample=True`` fills short groups by REPEATING their documents
    (the multi-epoch upsampling every recipe applies to small
    high-quality sources — e.g. Wikipedia seen several times per run):
    each group fans out to ceil(group_budget / group_tokens) epochs
    (capped at ``max_epochs``; integer ceil-div, cross-engine exact)
    and admission orders by (epoch, hash, doc_id), so every document
    appears once per epoch before any document appears again. The fan
    out is a native sequence() explode — rows carry an ``epoch``
    column in this mode.

    Scale posture: the weight table is #groups rows (broadcast both for
    the join and the 1-row weight-sum scalar — no driver collect); the
    admission is one cumulative window per group (the pack_token_budget
    shuffle); upsampling adds a per-group token-sum window on the SAME
    partitioning plus the epoch fan-out (bounded by max_epochs).
    Output: (doc_id, group, [epoch,] n_tokens, cum_tokens,
    group_budget).
    """
    if isinstance(weights, dict):
        rows = sorted((str(g), int(w)) for g, w in weights.items())
        wdf = docs.sparkSession.createDataFrame(
            rows, f"{group} string, weight long")
    else:
        wdf = weights.select(group, F.col("weight").cast("long"))
    tot = wdf.agg(F.sum("weight").alias("_sw"))  # 1-row scalar frame
    n_tokens = F.size(tokens_col()).alias("n_tokens")
    h = seeded(F.col("doc_id").cast("string"), seed).alias("h")
    base = (
        docs.select("doc_id", group, n_tokens, h)
        .join(F.broadcast(wdf), group)
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "group_budget",
            F.expr(f"({total_tokens} * weight) div _sw").cast("long"))
    )
    out_cols = ["doc_id", group, "n_tokens", "cum_tokens", "group_budget"]
    order = ["h", "doc_id"]
    if upsample:
        gtot = F.greatest(
            F.sum("n_tokens").over(Window.partitionBy(group)), F.lit(1))
        base = (
            base.withColumn("_gtot", gtot.cast("long"))
            .withColumn(
                "_ne",
                F.greatest(F.lit(1), F.least(
                    F.lit(max_epochs),
                    F.expr("(group_budget + _gtot - 1) div _gtot"),
                )).cast("int"))
            .withColumn(
                "epoch", F.explode(F.sequence(F.lit(0), F.col("_ne") - 1)))
        )
        order = ["epoch", "h", "doc_id"]
        out_cols = ["doc_id", group, "epoch", "n_tokens", "cum_tokens",
                    "group_budget"]
    w = (
        Window.partitionBy(group)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= F.col("group_budget"))
        .select(*out_cols)
    )


def pack_shards(
    docs: DataFrame,
    shard_tokens: int,
    group: str = "source",
    seed: str = "shard",
) -> DataFrame:
    """Assign documents to size-bounded output shards — the final write
    layout step of a training-data pipeline (each shard is one output
    file/tar of ~shard_tokens tokens, the shape loaders stream).

    Within each ``group``, documents take a deterministic (seeded-hash)
    order; shard_id = start_offset div shard_tokens, where start_offset
    is the running token total BEFORE the document. Documents are never
    split, so a shard can overrun by at most one document (standard
    streaming bin packing); every shard except the last starts exactly at
    a shard_tokens boundary of the running total. Deterministic and
    oracle-expressible end-to-end.

    Scale posture: ONE window shuffle per group key (same as
    pack_token_budget); shard ids are derived arithmetic, no second
    shuffle. Writers then ``repartition(group, shard_id)`` to get one
    task per output shard.
    Output: (doc_id, group, n_tokens, start_offset, shard_id).
    """
    n_tokens = F.size(tokens_col()).alias("n_tokens")
    h = seeded(F.col("doc_id").cast("string"), seed).alias("h")
    base = docs.select("doc_id", group, n_tokens, h)
    w = (
        Window.partitionBy(group)
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn(
            "start_offset",
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long"))
        .withColumn(
            "shard_id",
            F.expr(f"start_offset div {int(shard_tokens)}").cast("long"))
        .drop("h")
    )


def pack_sequences(
    docs: DataFrame,
    seq_tokens: int,
    group: str = "source",
    seed: str = "pack",
) -> DataFrame:
    """Context-window packing WITH document splitting — the loader-facing
    layout: per ``group``, documents concatenate in deterministic
    (seeded-hash) order into one token stream; training sequence i covers
    stream tokens [i*L, (i+1)*L). Each output row is the slice of one
    document landing in one sequence:

        (doc_id, group, seq_id, tok_start, tok_end)

    meaning the document's tokens [tok_start, tok_end) belong to
    sequence seq_id. A document spanning k sequence boundaries fans out
    into k+1 rows natively (``F.sequence`` + explode — no UDF); zero-
    token documents contribute nothing. Unlike ``pack_shards`` (atomic
    docs, shards may overrun), sequences here are EXACTLY ``seq_tokens``
    long by construction (except each group's tail), which is what
    fixed-context training consumption needs.

    Scale: one window shuffle per group key (the cumsum), then map-side
    arithmetic + fan-out. Deterministic and oracle-expressible.
    """
    L = int(seq_tokens)
    n_tokens = F.size(tokens_col()).alias("n_tokens")
    h = seeded(F.col("doc_id").cast("string"), seed).alias("h")
    base = docs.select("doc_id", group, n_tokens, h)
    w = (
        Window.partitionBy(group)
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_start = (
        base.filter(F.col("n_tokens") > 0)
        .withColumn(
            "start",
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long"))
    )
    first_seq = F.expr(f"start div {L}")
    last_seq = F.expr(f"(start + n_tokens - 1) div {L}")
    return (
        with_start
        .withColumn("seq_id", F.explode(F.sequence(first_seq, last_seq)))
        .select(
            "doc_id", group, "seq_id",
            F.greatest(F.col("seq_id") * L - F.col("start"), F.lit(0))
            .cast("long").alias("tok_start"),
            F.least((F.col("seq_id") + 1) * L - F.col("start"),
                    F.col("n_tokens").cast("long"))
            .cast("long").alias("tok_end"),
        )
    )


#: integer hash domain for split assignment (6 decimal digits of the
#: seeded 60-bit hash — uniform enough for corpus-scale fractions)
SPLIT_DOMAIN = 1_000_000


def assign_splits(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    seed: str = "split",
    key: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: split = the interval the
    seeded hash of ``key`` falls into, with INTEGER cutoffs (no float
    comparison ambiguity — cutoff_i = round(cumfrac_i * SPLIT_DOMAIN),
    identical arithmetic in the SQL oracle). Disjoint and complete by
    construction; membership depends only on the key, so re-runs,
    incremental appends, and engines all agree — the property that
    prevents train/test leakage when the corpus is rebuilt.

    Scale: pure map-side projection, zero shuffle.
    Output: (key, split).
    """
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1: {fractions}")
    cutoffs: list[tuple[str, int]] = []
    acc = 0.0
    for name, frac in fractions.items():   # dict order = interval order
        acc += frac
        cutoffs.append((name, round(acc * SPLIT_DOMAIN)))
    h = seeded(F.col(key).cast("string"), seed) % SPLIT_DOMAIN
    # when-chain in interval order: h < cut_0 -> first split, etc.; the
    # last interval is the otherwise-branch (catches rounding remainder)
    expr = None
    for name, cut in cutoffs[:-1]:
        cond = h < F.lit(cut)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (expr.otherwise(cutoffs[-1][0]) if expr is not None
            else F.lit(cutoffs[-1][0]))
    return docs.select(key, expr.alias("split"))


def tfidf_top_terms(docs: DataFrame, k: int = 5, group: str = "source") -> DataFrame:
    """Per-``group`` top-k terms by tf-idf.

    idf uses the RATIONAL form (n_groups + 1) / (df + 1) instead of its
    logarithm: IEEE division of exact integers is correctly rounded and
    therefore bit-identical across engines, while ln() is a libm call
    whose last ulp differs between the JVM and DuckDB — the same
    cross-engine determinism rule as the fixed-point pagerank
    (operators/graph.py). Ranking is (score desc, term asc) — fully
    deterministic. Output: (group, term, tf, df, score, rk).
    """
    from pyspark import StorageLevel

    tok = docs.select(group, F.explode(tokens_col()).alias("term"))
    # tf feeds TWO consumers (the scored join's left side and the dfreq
    # aggregation) and Spark shares no common subplans across them — an
    # unmaterialized tf re-runs the tokenize+explode+hash-agg pass per
    # consumer. One narrow (group, term, tf) row per distinct pair,
    # materialized once (lazy DISK_ONLY, the r6 shared-relation pattern;
    # see plans/crawl._ckpt for the storage-level rationale).
    tf = tok.groupBy(group, "term").agg(
        F.count("*").alias("tf")
    ).localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_groups = docs.select(
        F.count_distinct(group).alias("n_groups")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_groups))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * (F.col("n_groups") + 1) / (F.col("df") + 1), 6
            ),
        )
    )
    w = Window.partitionBy(group).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(group, "term", "tf", "df", "score", "rk")
    )
