"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard. All native Catalyst expressions; hashes are the
cross-engine md5-based 60-bit ints (functions/hashing.py) so the DuckDB
oracles reproduce every value.

Scale notes (100 TB posture):
- exact dedup: one hash-shuffle on the fingerprint — the minimal possible.
- MinHash LSH: signatures are per-doc (narrow, map-side); the only shuffle
  is the band-bucket self-join, whose fan-in is bounded by bucket size.
  Candidate pairs << n^2 by construction.
- SimHash: pure map-side per doc (explode over 60 bits is a narrow op).
- n-gram Jaccard: the shared-shingle equi-join prunes to pairs that share
  at least one shingle; at web scale you'd cap the per-shingle posting
  list (drop ultra-common shingles) — exposed as ``max_shingle_df``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from xcrawl3r_spark.functions.hashing import md5_long
from xcrawl3r_spark.operators import textops

N_BANDS = 8
ROWS_PER_BAND = 4
SHINGLE_K = 3
SIMHASH_BITS = 60  # fits a signed BIGINT in both engines

# MinHash permutation domain: largest prime < 2^31. Shingle hashes are
# folded into [0, P) once; the i-th minhash is min((a_i*h + b_i) mod P).
# a_i, h < 2^31 so a_i*h + b_i < 2^62 — no signed-64 overflow in Spark or
# DuckDB (DuckDB errors on BIGINT overflow rather than wrapping, so this
# bound is load-bearing for the oracle).
MINHASH_PRIME = 2147483629


def minhash_perm(i: int) -> tuple[int, int]:
    """Deterministic affine-permutation params (a_i, b_i) for minhash i —
    plan-time Python constants, identical in the Spark plan and the DuckDB
    oracle SQL."""
    a = int(hashlib.md5(f"mha:{i}".encode()).hexdigest()[:8], 16) % (
        MINHASH_PRIME - 1) + 1
    b = int(hashlib.md5(f"mhb:{i}".encode()).hexdigest()[:8], 16) % MINHASH_PRIME
    return a, b


def shingles_col(text: Column | str = "text", k: int = SHINGLE_K) -> Column:
    """Distinct word k-shingles of the text."""
    toks = F.split(F.trim(F.col(text) if isinstance(text, str) else text), r"\s+")
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    return F.when(
        F.size(toks) >= k,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
        ),
    ).otherwise(F.array().cast("array<string>"))


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup by content hash: keeper = min doc_id per group."""
    norm = textops.norm_text_col()
    return (
        docs.select(md5_long(norm).alias("content_fp"), "doc_id")
        .groupBy("content_fp")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = N_BANDS * ROWS_PER_BAND) -> DataFrame:
    """doc_id -> minhash_i for i in [0, n_hashes).

    Each shingle is md5-hashed ONCE and folded into [0, MINHASH_PRIME);
    the n_hashes signatures are affine permutations (a_i*h + b_i) mod P of
    that one hash — n_hashes times fewer md5 evaluations than hashing per
    (i, shingle). Shape: explode(shingles) -> hash -> groupBy(doc_id) with
    n_hashes ``min`` aggregates. The mins run in a whole-stage-codegen'd
    hash aggregate (array higher-order functions are interpreted, ~5x
    slower), and map-side partial aggregation shrinks the shuffle to one
    row per doc per partition. Docs with zero shingles (< k tokens) have
    no signature (explode drops them).
    """
    hv = (md5_long("sh") % F.lit(MINHASH_PRIME)).alias("hv")
    ex = docs.select(
        "doc_id", F.explode(shingles_col()).alias("sh")
    ).select("doc_id", hv)
    aggs = []
    for i in range(n_hashes):
        a, b = minhash_perm(i)
        aggs.append(
            F.min(
                (F.lit(a) * F.col("hv") + F.lit(b)) % F.lit(MINHASH_PRIME)
            ).alias(f"mh{i}")
        )
    return ex.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame, n_bands: int = N_BANDS, rows_per_band: int = ROWS_PER_BAND
) -> DataFrame:
    """LSH candidate pairs: docs agreeing on all rows of >=1 band.

    band_key = md5_long(band || ':' || concat of the band's minhashes).
    All band keys are computed in ONE projection and exploded (a union of
    per-band projections would re-evaluate the signature plan n_bands
    times).

    r6 shape (guide §2.4): pair generation is ONE hash aggregation on
    (band, band_key) + an ordered-pair fan-out from each bucket's doc
    list — the r1-r5 per-(band, key) SELF-join referenced the signature
    relation on both sides, so the shingle explode + md5 + n_hashes-min
    aggregation (the expensive part of the operator) either executed
    twice per query or had to be materialized to disk (the interim r6
    localCheckpoint, whose build-time planning + write cost exceeded
    the recompute it saved at bench scale — measured in the r6 ABBA).
    The groupBy form executes the signature pipeline exactly ONCE, with
    no materialization, and emits the identical pair set: a bucket's
    ordered doc pairs == the self-join's doc_a < doc_b matches. Memory:
    one bucket's doc list rides one aggregation row — bounded by bucket
    fan-in, the same quantity that bounded the join's fan-out.
    """
    sig = minhash_signatures(docs, n_bands * rows_per_band)
    entries = []
    for b in range(n_bands):
        key = md5_long(
            F.concat_ws(
                ":", F.lit(str(b)),
                *[F.col(f"mh{b * rows_per_band + r}").cast("string")
                  for r in range(rows_per_band)],
            )
        )
        entries.append(
            F.struct(F.lit(b).alias("band"), key.alias("band_key"))
        )
    bands = (
        sig.select("doc_id", F.explode(F.array(*entries)).alias("e"))
        .select("doc_id", "e.band", "e.band_key")
    )
    buckets = bands.groupBy("band", "band_key").agg(
        F.collect_list("doc_id").alias("ids"))
    return (
        buckets.select(F.explode("ids").alias("doc_a"), "ids")
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .distinct()
    )


def minhash_verified_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n_bands: int = N_BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    k: int = SHINGLE_K,
) -> DataFrame:
    """The standard two-stage fuzzy dedup: LSH banding proposes
    candidates, EXACT n-gram Jaccard verifies them (candidates with true
    jaccard < threshold are false positives of the banding and are
    dropped).

    vs ``ngram_jaccard_pairs`` (exact over ALL shared-shingle pairs):
    candidate generation here is the banded bucket join — bounded bucket
    fan-in by construction — instead of the shared-shingle self-join,
    which is quadratic in per-shingle posting-list df and needs the df
    cap at web scale. The verify stage touches only candidate pairs
    (<< n²), joining each side back to its shingle set.
    Output: (doc_a, doc_b, jaccard) with jaccard >= threshold.
    """
    from pyspark import StorageLevel

    pairs = minhash_lsh_pairs(docs, n_bands, rows_per_band)
    # the exploded shingle relation feeds three consumers (sizes + both
    # verify sides) — materialize it once instead of re-hashing every
    # shingle per consumer (lazy DISK_ONLY, as in the capped jaccard path)
    sh = docs.select(
        "doc_id", F.explode(shingles_col(k=k)).alias("sh")
    ).localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    shared = (
        pairs.join(sha, "doc_a")
        .join(shb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        shared.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_shared")
                    / (F.col("na") + F.col("nb") - F.col("n_shared")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def near_dup_clusters(
    docs: DataFrame,
    n_bands: int = N_BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    max_iters: int = 20,
) -> DataFrame:
    """The fuzzy-dedup REMOVAL step: LSH candidate pairs -> connected
    components -> one canonical document per cluster (minimum doc_id).

    Pair queries only surface candidates; an actual pipeline must also
    transitively close them (a~b, b~c => one cluster) and pick which copy
    to keep. Output covers the FULL corpus: (doc_id, cluster,
    is_canonical) — keep iff is_canonical; singletons are their own
    cluster. Deterministic: cluster = min reachable doc_id.

    Scale: the component table only contains docs that appear in a pair
    (the near-dup subset); the final assignment is one equi-join back to
    the corpus, AQE-sized."""
    from xcrawl3r_spark.operators.graph import connected_components

    pairs = minhash_lsh_pairs(docs, n_bands, rows_per_band)
    comp = connected_components(pairs, max_iters=max_iters,
                                src="doc_a", dst="doc_b")
    return (
        docs.select("doc_id")
        .join(comp.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster"),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("cluster"))
    )


def near_dup_drops(
    docs: DataFrame,
    n_bands: int = N_BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    max_iters: int = 20,
) -> DataFrame:
    """Just the REMOVAL side of ``near_dup_clusters``: the doc_ids that
    lost their cluster (non-canonicals). Equals
    ``near_dup_clusters(docs).filter(~is_canonical).select("doc_id")``
    but derived straight from the component table — a doc is
    non-canonical iff its component label (min reachable id) differs
    from its own id, and every such doc appears in the component table,
    so the full-corpus join-back is unnecessary. The cleaning composites
    use this as their broadcast anti-join side: at corpus scale the drop
    set is tiny relative to the corpus and the 100 TB side never
    shuffles for it."""
    from xcrawl3r_spark.operators.graph import connected_components

    pairs = minhash_lsh_pairs(docs, n_bands, rows_per_band)
    comp = connected_components(pairs, max_iters=max_iters,
                                src="doc_a", dst="doc_b")
    return (
        comp.filter(F.col("id") != F.col("component"))
        .select(F.col("id").alias("doc_id"))
    )


def source_similarity(
    docs: DataFrame, k: int = 256, group: str = "source",
    shingle_k: int = SHINGLE_K, n_salt: int = 16,
    materialize: bool = True,
) -> DataFrame:
    """Pairwise content overlap BETWEEN document groups (sources/dumps/
    snapshots) via K-minimum-values sketches — the corpus-level dedup
    question ("how much of source B is already in source A?") answered
    without comparing documents pairwise.

    Sketch: the k smallest distinct shingle hashes per group (KMV,
    Bar-Yossef et al. 2002 — public). Estimate for a pair: take the k
    smallest of the sketch union U; J ≈ |U ∩ Sa ∩ Sb| / |U|.
    DETERMINISTIC (hashes are md5, "k smallest" is order-free), so the
    estimate itself is oracle-checkable exactly — no error-bound gate
    needed, unlike HLL.

    Scale posture: per-group k-min runs two-phase (salted partial top-k
    bounds any task to its salt shard, then the final per-group window —
    the stratified_sample pattern), so a 10^9-shingle group never
    serializes into one task. Both ``row_number <= k`` filters compile
    to WindowGroupLimit (Catalyst's rank-limit pushdown, partial +
    final), so neither window pass materializes more than k rows per
    group beyond the sort — the "bounded-memory fixed-k aggregator" is
    what the optimizer already emits (plan-audited in
    tests/test_plans.py). Sketches are k longs per group; the pairwise
    stage is a broadcast self-join over #groups rows.
    Output: (group_a, group_b, kmv_jaccard) for group_a < group_b.
    """
    hv = (md5_long("sh")).alias("hv")
    distinct_h = (
        docs.select(F.col(group).alias("g"),
                    F.explode(shingles_col(k=shingle_k)).alias("sh"))
        .select("g", hv).distinct()
    )
    w1 = Window.partitionBy("g", F.pmod(F.col("hv"), F.lit(n_salt))) \
        .orderBy("hv")
    part = (
        distinct_h.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k).drop("_rn")
    )
    w2 = Window.partitionBy("g").orderBy("hv")
    sketch = (
        part.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .groupBy("g")
        .agg(F.array_sort(F.collect_list("hv")).alias("sk"))
    )
    if materialize:
        # #groups rows of k longs each — materialize once so the pairwise
        # stage's two sides don't each re-run the distinct + double top-k
        # sketch pipeline (lazy DISK_ONLY; the frame is tiny by
        # construction). materialize=False keeps the sketch pipeline
        # visible in the returned plan — the WindowGroupLimit audit in
        # tests/test_plans.py pins the bounded-memory shape there.
        from pyspark import StorageLevel

        sketch = sketch.localCheckpoint(
            eager=False, storageLevel=StorageLevel.DISK_ONLY)
    a = sketch.select(F.col("g").alias("group_a"), F.col("sk").alias("sa"))
    b = sketch.select(F.col("g").alias("group_b"), F.col("sk").alias("sb"))
    union_k = F.slice(
        F.array_sort(F.array_union(F.col("sa"), F.col("sb"))), 1, k)
    inter = F.array_intersect(F.col("sa"), F.col("sb"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("group_a") < F.col("group_b"))
        .select(
            "group_a", "group_b",
            F.round(
                F.size(F.array_intersect(union_k, inter))
                / F.size(union_k), 6).alias("kmv_jaccard"),
        )
    )


def substring_dup_spans(
    docs: DataFrame, k: int = 8, min_df: int = 2,
) -> DataFrame:
    """Substring-level deduplication (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better" — public): find the
    token spans of each document whose k-token windows also occur
    elsewhere in the corpus, merged into maximal spans. Document-level
    dedup misses boilerplate repeated INSIDE otherwise-unique documents;
    this finds exactly those regions (the paper uses suffix arrays; the
    standard distributed approximation is dense rolling-hash windows,
    which this implements exactly for k-token granularity).

    Dataflow: every token position emits its k-gram window hash (dense,
    so ~n_tokens rows per doc — the honest cost of substring
    granularity); window hashes with corpus df >= ``min_df`` mark their
    positions duplicated; per doc, duplicated positions closer than k
    merge into maximal spans (interval union via the sorted-position
    lag/cumsum island pattern — windows are fixed-length so a running
    max end is just prev_pos + k).

    Scale posture: one hash-agg over window hashes (map-side combinable)
    broadcast-anti-joined back… no — the df table can be corpus-sized,
    so the df count rides a window over partitionBy(hash), the same
    shuffle the position rows need anyway (the ngram cap pattern); the
    island merge is one window per doc_id. Self-inclusive: a k-gram
    repeated twice inside ONE document counts (df counts occurrences,
    not documents) — matching the paper's any-other-occurrence rule.

    Output: (doc_id, span_start, span_end, n_windows) — token range
    [span_start, span_end) duplicated, built from n_windows duplicated
    windows. Remove or keep-first downstream.
    """
    toks = F.split(F.trim("text"), r"\s+")
    pos = docs.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size(toks) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (k - 1)),
                    lambda i: md5_long(
                        F.concat_ws(" ", F.slice(toks, i, k))),
                ),
            ).otherwise(F.array().cast("array<long>"))
        ).alias("pos", "wh"),
    )
    w_df = Window.partitionBy("wh")
    dup_pos = (
        pos.withColumn("df", F.count("*").over(w_df))
        .filter(F.col("df") >= min_df)
        .select("doc_id", "pos")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    islands = dup_pos.withColumn(
        "new_island",
        (F.col("pos") - F.lag("pos", 1).over(w_doc) > k)
        .cast("int"),
    ).withColumn(
        "island",
        F.sum(F.coalesce(F.col("new_island"), F.lit(1))).over(
            w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + k).cast("long").alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_end", "n_windows")
    )


def remove_dup_spans(
    docs: DataFrame, k: int = 8, min_df: int = 2,
) -> DataFrame:
    """Apply substring-level dedup (Lee et al. 2021's actual
    transformation): CUT the duplicated spans from the corpus, keeping
    the corpus-first occurrence of each duplicated window.
    ``substring_dup_spans`` only reports the spans; this consumes them.

    Keep-first rule: for every k-token window hash, the occurrence with
    the smallest (doc_id, pos) is the canonical copy. Every OTHER
    occurrence of a window with corpus df >= ``min_df`` marks its
    positions removable; removable positions merge into maximal spans
    (the same lag/cumsum island pattern as the span report) and those
    token ranges are cut from the text — EXCEPT tokens inside a
    canonical (first-occurrence) window's own span, which are protected.
    Without the protection, a self-overlapping repeat (e.g. a periodic
    "rep rep rep ..." run) would cut the kept copy's tokens too and no
    full copy would survive; with it, exactly one full copy of every
    duplicated run remains — the paper's remove-all-but-one semantic.
    A token claimed by both a protected window of one run and a
    removable span of another keeps (protection wins) — a bounded
    under-removal at run boundaries, never an over-removal.

    Output: (doc_id, text, n_removed) for EVERY input document. The
    returned text is the canonical token-rejoined form (tokens joined by
    single spaces) for all rows — cut and uncut alike — so the transform
    is idempotent and engine-comparable; n_removed counts cut tokens.

    Scale posture: one shuffle on window hash (sorted once; df count and
    the keep-first row_number share the partition sort), one window per
    doc for the island merge, a per-doc spans aggregation, and one
    doc_id equi-join back; the cut itself is a native higher-order
    filter — map-side, no UDF. The spans side of the join is bounded by
    the duplicated-region count, far below corpus scale.
    """
    toks = F.split(F.trim("text"), r"\s+")
    pos = docs.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.size(toks) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (k - 1)),
                    lambda i: md5_long(
                        F.concat_ws(" ", F.slice(toks, i, k))),
                ),
            ).otherwise(F.array().cast("array<long>"))
        ).alias("pos", "wh"),
    )
    # one sort per window-hash partition serves both the df count and the
    # keep-first rank ((doc_id, pos) is a total order: doc_id is unique
    # per document and pos within it)
    w_sorted = Window.partitionBy("wh").orderBy("doc_id", "pos")
    # removable (rn > 1) and protected (rn == 1) positions both read
    # `marked`: materialize the dense window-hash pass once instead of
    # re-running the posexplode + per-hash sort per consumer (lazy
    # DISK_ONLY; bounded by the duplicated-window position count)
    from pyspark import StorageLevel

    marked = pos.withColumn(
        "df",
        F.count("*").over(
            w_sorted.rowsBetween(Window.unboundedPreceding,
                                 Window.unboundedFollowing)),
    ).withColumn("rn", F.row_number().over(w_sorted)).filter(
        F.col("df") >= min_df).localCheckpoint(
        eager=False, storageLevel=StorageLevel.DISK_ONLY)

    def _doc_spans(positions: DataFrame, out_col: str) -> DataFrame:
        w_doc = Window.partitionBy("doc_id").orderBy("pos")
        islands = positions.withColumn(
            "new_island",
            (F.col("pos") - F.lag("pos", 1).over(w_doc) > k).cast("int"),
        ).withColumn(
            "island",
            F.sum(F.coalesce(F.col("new_island"), F.lit(1))).over(
                w_doc.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)),
        )
        return (
            islands.groupBy("doc_id", "island")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + k).alias("span_end"))
            .groupBy("doc_id")
            .agg(F.array_sort(
                F.collect_list(F.struct("span_start", "span_end"))
            ).alias(out_col))
        )

    spans = _doc_spans(
        marked.filter(F.col("rn") > 1).select("doc_id", "pos"), "_spans")
    protected = _doc_spans(
        marked.filter(F.col("rn") == 1).select("doc_id", "pos"), "_prot")
    return (
        docs.join(spans, "doc_id", "left")
        .join(protected, "doc_id", "left")
        .withColumn("_toks", toks)
        .withColumn(
            "_prot",
            F.coalesce(
                F.col("_prot"),
                F.array().cast(
                    "array<struct<span_start:int,span_end:int>>")))
        .withColumn(
            "_kept",
            F.when(F.col("_spans").isNull(), F.col("_toks")).otherwise(
                # islands are disjoint by construction; 0-based lambda
                # index i matches pos (window at pos p starts at token p)
                F.expr(
                    "filter(_toks, (t, i) -> "
                    "not exists(_spans, s -> i >= s.span_start "
                    "and i < s.span_end) "
                    "or exists(_prot, s -> i >= s.span_start "
                    "and i < s.span_end))")),
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("_kept")).alias("text"),
            (F.size("_toks") - F.size("_kept")).cast("long")
            .alias("n_removed"),
        )
    )


def paragraph_dedup(docs: DataFrame) -> DataFrame:
    """Corpus-global PARAGRAPH-level exact dedup (the CCNet / C4-family
    granularity: Wenzek et al. 2019 dedup CommonCrawl by paragraph hash
    before any document-level stage): split each document on newlines,
    hash each paragraph's whitespace/case-normal form, keep only the
    FIRST occurrence corpus-wide (min (doc_id, position) — the same
    keep-first convention as ``remove_dup_spans``), and reassemble each
    document from its surviving paragraphs in original order.

    Output: (doc_id, n_paras, n_kept, text_clean) — one row per input
    document; a document whose every paragraph appeared earlier keeps
    n_kept=0 and text_clean=''. Within-document repeats collapse too
    (only the first copy in the first document survives).

    Scale posture: posexplode is narrow; the keep-first decision is ONE
    row_number window over the paragraph hash (the minimal shuffle any
    global first-occurrence semantic needs — a groupBy-min would still
    shuffle the same rows and then pay a join back); reassembly is one
    groupBy(doc_id) collect_list, bounded by a single document's size;
    the final join back to the full doc list is doc_id-equi on two
    doc_id-clustered sides. All hashes are the cross-engine md5 60-bit
    ints, so the DuckDB twin reproduces every keep/drop decision."""
    paras = F.split(F.col("text"), r"\n")
    exploded = docs.select(
        "doc_id", F.posexplode(paras).alias("idx", "para"))
    norm = F.regexp_replace(F.lower(F.trim(F.col("para"))), r"\s+", " ")
    hashed = exploded.select(
        "doc_id", "idx", "para", md5_long(norm).alias("ph"))
    first_w = Window.partitionBy("ph").orderBy("doc_id", "idx")
    kept = (
        hashed.withColumn("_rk", F.row_number().over(first_w))
        .filter(F.col("_rk") == 1)
    )
    reassembled = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "para"))),
                lambda s: s["para"]),
            "\n").alias("text_clean"),
    )
    return (
        docs.select("doc_id", F.size(paras).cast("long").alias("n_paras"))
        .join(reassembled, "doc_id", "left")
        .select(
            "doc_id", "n_paras",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long")
            .alias("n_kept"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """60-bit SimHash over whitespace tokens: bit i set iff
    sum over tokens of (+1 if bit i of md5_long(token) else -1) > 0."""
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token"),
    ).withColumn("th", md5_long("token"))
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    # shiftright/shiftleft Python wrappers demand literal shift amounts;
    # the SQL expressions accept columns
    contrib = tok.select("doc_id", "th", bit).withColumn(
        "c",
        F.when(F.expr("(shiftright(th, bit) & 1) = 1"), F.lit(1)).otherwise(
            F.lit(-1)),
    )
    return (
        contrib.groupBy("doc_id", "bit")
        .agg(F.sum("c").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0,
                       F.expr("shiftleft(cast(1 as bigint), bit)")
                       ).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )


def simhash_near_dup(
    docs: DataFrame,
    hamming_max: int = 3,
    bits: int = SIMHASH_BITS,
    max_chunk_df: int | None = None,
    log_dropped: bool = False,
) -> DataFrame:
    """SimHash near-duplicate pairs: banded bucket join + exact hamming
    verify — the Manku/Jain/Sarma WWW'07 web-dedup design (public
    knowledge; the reference has no near-dup at all).

    The ``bits``-bit simhash is split into ``hamming_max + 1`` chunks; by
    pigeonhole, any pair within hamming_max agrees on >= 1 whole chunk,
    so the (chunk_idx, chunk_key) equi-join finds EVERY qualifying pair
    (recall 1 by construction) at bucket-join cost instead of the n^2
    cross join. Candidates are then verified with
    bit_count(xor) <= hamming_max — exact, oracle-checkable.

    Scale posture: 60/(h+1)-bit chunks give 2^15 buckets at h=3; at
    10^10 docs a bucket averages ~10^5 docs, so in-bucket pairing is the
    cost driver — ``max_chunk_df`` caps overfull buckets (dropping only
    buckets whose df exceeds it, recall < 1 for those, logged via
    ``log_dropped``), the same posting-list control as ngram_jaccard's.
    The uncapped default is exact.
    """
    # deliberately UNMATERIALIZED (r6, measured): the banded join
    # references sig on both sides, so the 60-bit explode + double
    # aggregation runs twice — and at bench scale that recompute is
    # CHEAPER than either alternative tried this round: a lazy
    # DISK_ONLY localCheckpoint (2.2x cold regression — build-time
    # planning + disk write) or a groupBy+collect_list pair fan-out
    # (slower still; see hamming_near_dup's shape note).
    sig = simhash(docs, bits)
    return hamming_near_dup(
        sig, id_col="doc_id", hash_col="simhash",
        hamming_max=hamming_max, bits=bits,
        max_chunk_df=max_chunk_df, log_dropped=log_dropped)


def hamming_near_dup(
    sig: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    hamming_max: int = 3,
    bits: int = SIMHASH_BITS,
    max_chunk_df: int | None = None,
    log_dropped: bool = False,
) -> DataFrame:
    """Generic banded hamming near-dup join over ANY precomputed
    ``bits``-bit integer signature column — the Manku-style pigeonhole
    bucket join + exact bit_count(xor) verify factored out of
    ``simhash_near_dup`` so image perceptual hashes (phash), audio
    fingerprints, and text simhashes all share one engine path.

    Output: (doc_a, doc_b, hamming) with doc_a < doc_b under the input
    id's ordering — column names stay doc_a/doc_b regardless of
    ``id_col`` (callers alias). Same recall/caps semantics as
    ``simhash_near_dup``: exact (recall 1) uncapped; ``max_chunk_df``
    drops overfull buckets, trading recall in boilerplate buckets for a
    hard bound on pair fan-out.

    Shape note (r6, measured): this engine KEEPS the per-(chunk, key)
    self-join. The groupBy+collect_list pair fan-out that replaced the
    self-joins in the minhash/ngram/winnow engines was tried here too
    and measured SLOWER (image_phash_near_dup cold 1.95x): those
    engines save an expensive fan-out pipeline from executing per join
    side, but this one's signature input is typically a plain table
    column (phash) or a caller-computed frame — re-scanning it for the
    second side is cheaper than funneling every row through an
    ObjectHashAggregate. Callers with an EXPENSIVE signature pipeline
    (text simhash) still execute it twice by design — at bench scale
    that double execution beat both the interim r6 localCheckpoint
    (2.2x cold regression: build-time planning + disk write) and the
    groupBy fan-out."""
    n_chunks = hamming_max + 1
    width = bits // n_chunks
    sig = sig.select(F.col(id_col).alias("doc_id"),
                     F.col(hash_col).alias("simhash"))
    entries = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftright(F.col("simhash"), c * width)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("key"),
        )
        for c in range(n_chunks)
    ]
    bands = (
        sig.select("doc_id", "simhash", F.explode(F.array(*entries)).alias("e"))
        .select("doc_id", "simhash", "e.chunk", "e.key")
    )
    if max_chunk_df is not None:
        full = (
            bands.groupBy("chunk", "key").agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_chunk_df).select("chunk", "key")
        )
        if log_dropped:
            import logging

            log = logging.getLogger(__name__)
            # the count is its own Spark job run at frame-CONSTRUCTION
            # time; don't pay for it when the message would be discarded
            # (root logger defaults to WARNING — guide §1.2)
            if log.isEnabledFor(logging.INFO):
                log.info(
                    "hamming_near_dup: dropped %d buckets with df > %d",
                    full.count(), max_chunk_df)
        bands = bands.join(F.broadcast(full), ["chunk", "key"], "left_anti")
    a = bands.select(F.col("doc_id").alias("doc_a"),
                     F.col("simhash").alias("sh_a"), "chunk", "key")
    b = bands.select(F.col("doc_id").alias("doc_b"),
                     F.col("simhash").alias("sh_b"), "chunk", "key")
    return (
        a.join(b, ["chunk", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int"))
        .filter(F.col("hamming") <= hamming_max)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = SHINGLE_K,
    max_shingle_df: int | None = None,
    log_dropped: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard over shared-shingle candidate pairs.

    jaccard(a,b) = |A ∩ B| / (|A| + |B| - |A ∩ B|), computed from the
    shared-shingle join — only pairs sharing >=1 shingle are scored.

    ``max_shingle_df`` drops shingles appearing in more than that many
    docs (posting-list cap). This is the load-bearing web-scale knob, not
    an optimization: the shared-shingle self-join is quadratic in
    per-shingle document frequency, so one stop-word-like shingle with
    df=10^6 alone yields ~5*10^11 candidate pairs. ``log_dropped``
    additionally counts and logs the dropped shingles (one extra
    action, skipped unless INFO logging is enabled; silent truncation
    reads as "covered everything" when it didn't). None = exact
    all-pairs-sharing-a-shingle.

    r6 shape (guide §2.4): the shingle fan-out — the expensive pass —
    executes exactly ONCE. The posting list is grouped per shingle
    (one hash aggregation), the cap becomes a plain
    ``size(ids) <= max_shingle_df`` filter on that aggregate, per-doc
    sizes ride the exploded capped rows as ONE count window, and pairs
    fan out from each shingle's doc list map-side (ordered-pair
    explode == the old self-join's doc_a < doc_b matches, occurrence
    multiplicity preserved by collect_list). The r1-r5 shape
    re-executed the fan-out per consumer (sizes + both join sides) or
    — interim r6 — materialized it to disk, whose planning + write
    cost exceeded the recompute at bench scale (r6 ABBA). The sizes
    join-back (two shuffle joins) is gone: na/nb ride the pair rows.
    """
    sh = docs.select("doc_id", F.explode(shingles_col(k=k)).alias("sh"))
    if max_shingle_df is None:
        # uncapped: per-doc sizes can be attached BEFORE the posting
        # aggregation (they are unfiltered counts), saving a shuffle
        withn = sh.withColumn(
            "n_sh", F.count("*").over(Window.partitionBy("doc_id")))
        g = withn.groupBy("sh").agg(
            F.collect_list(F.struct("doc_id", "n_sh")).alias("ids"))
    else:
        posting = sh.groupBy("sh").agg(
            F.collect_list("doc_id").alias("ids"))
        if log_dropped:
            import logging

            log = logging.getLogger(__name__)
            # an eager count job at frame-construction time — skip it
            # when INFO is off and the result would be discarded
            # (guide §1.2: don't compute things you throw away)
            if log.isEnabledFor(logging.INFO):
                log.info(
                    "ngram_jaccard: dropped %d shingles with df > %d",
                    posting.filter(
                        F.size("ids") > max_shingle_df).count(),
                    max_shingle_df)
        posting = posting.filter(F.size("ids") <= max_shingle_df)
        # sizes must count the CAPPED occurrence rows per doc (the
        # jaccard denominator the oracle mirrors), so re-expand and
        # count over doc_id before regrouping per shingle
        e = posting.select("sh", F.explode("ids").alias("doc_id"))
        withn = e.withColumn(
            "n_sh", F.count("*").over(Window.partitionBy("doc_id")))
        g = withn.groupBy("sh").agg(
            F.collect_list(F.struct("doc_id", "n_sh")).alias("ids"))
    return (
        g.select(F.explode("ids").alias("x"), "ids")
        .select("x", F.explode("ids").alias("y"))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"))
        .agg(
            F.count("*").alias("n_shared"),
            F.min("x.n_sh").alias("na"),
            F.min("y.n_sh").alias("nb"))
        .withColumn(
            "jaccard",
            F.round(F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
