"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All native ``pyspark.sql.functions`` (JVM-side, whole-stage codegen) — no
Python in the hot path. Each operator has a DuckDB-oracle twin in
``__spark_entry__.oracle_sql`` built from the same constants below, so the
two engines compute identical values by construction.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker tokens per language for the n-gram/stopword language-ID heuristic.
# The heuristic is the operator under test; the lists are arbitrary fixed
# constants shared with the SQL oracle.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "los", "y"),
    "fr": ("le", "la", "les", "et"),
    "zh": ("de", "shi", "le", "he"),
}

STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "of", "to", "in", "is", "it", "that",
)


def tokens_col(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def norm_text_col(text: Column | str = "text") -> Column:
    """Whitespace-collapsed, lowered text — THE canonical content-normal
    form. Exact dedup, document fingerprints, winnowing, and both
    cleaning composites must share this expression bit-for-bit (its
    DuckDB twin is ``_NORM_TEXT_SQL`` in ``__spark_entry__``); a drifted
    copy silently desyncs their keep/drop decisions."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (ceil(chars/4) per
    token, the classic ~4-chars-per-token heuristic) per document."""
    toks = tokens_col()
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"),
            lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
        ).alias("n_subwords"),
    )


def sentence_stats(docs: DataFrame) -> DataFrame:
    """Sentence segmentation + per-document sentence-shape features —
    the Gopher/C4-family signal the per-word gates can't see: prose has
    multi-word sentences with moderate variance, while boilerplate,
    menus, and keyword-stuffed spam segment into floods of 1-2-word
    fragments (or one unbroken run with no terminator at all).

    Segmentation is deliberately RE2-safe (split on ``[.!?]+`` runs
    over the canonical normal form, no lookbehind — Java regex and
    DuckDB RE2 agree bit-for-bit) and all features are integer-exact:
    mean sentence length ships as a x100 fixed-point int, so the
    DuckDB twin matches by hash, not by float luck. One zero-shuffle
    map-side projection; at 100 TB this rides the same scan as every
    other per-doc text gate.

    Returns (doc_id, n_sentences, n_sentence_words,
    mean_sentence_words_x100, max_sentence_words) — the mean/max are
    NULL for documents with no sentence-shaped content."""
    # NB: the lambda must be arity-1 — F.transform(arr, F.trim) feeds
    # trim the (element, index) pair and two-param trim strips CHARS
    pieces = F.filter(
        F.transform(F.split(norm_text_col(), r"[.!?]+"),
                    lambda s: F.trim(s)),
        lambda s: s != "")
    # norm_text_col collapses whitespace to single spaces, so words
    # per piece = split on one literal space
    wc = F.transform(pieces, lambda s: F.size(F.split(s, " ")))
    return docs.select(
        "doc_id",
        F.size(pieces).cast("long").alias("n_sentences"),
        F.aggregate(wc, F.lit(0).cast("long"), lambda acc, x: acc + x)
        .alias("n_sentence_words"),
        F.array_max(wc).cast("long").alias("max_sentence_words"),
    ).select(
        "doc_id", "n_sentences", "n_sentence_words",
        F.expr("case when n_sentences > 0 then "
               "(100 * n_sentence_words) div n_sentences end")
        .alias("mean_sentence_words_x100"),
        "max_sentence_words",
    )


def readability(docs: DataFrame) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade as x1000 fixed-point
    integers — the classic prose-complexity curation signal (both
    formulas are public: Flesch 1948, Kincaid et al. 1975). Syllables
    are approximated as vowel-group runs ``[aeiouy]+`` with a minimum
    of one per word (vowel-less tokens — numbers, acronyms — count 1),
    the standard cheap estimator; all arithmetic is positive-operand
    integer division so the DuckDB twin is bit-identical (the only
    subtraction happens after both divisions).

    flesch_x1000 = 206835 - 1015*W/S - 84600*Syl/W;
    fk_grade_x1000 = 390*W/S + 11800*Syl/W - 15590.

    Zero-shuffle map-side projection. Returns (doc_id, n_sentences,
    n_words, n_syllables, flesch_x1000, fk_grade_x1000) — the two
    scores are NULL when there are no words or no sentences."""
    norm = norm_text_col()
    pieces = F.filter(
        F.transform(F.split(norm, r"[.!?]+"), lambda s: F.trim(s)),
        lambda s: s != "")
    toks = F.filter(F.split(norm, " "), lambda t: t != "")
    base = docs.select(
        "doc_id",
        F.size(pieces).cast("long").alias("n_sentences"),
        F.size(toks).cast("long").alias("n_words"),
        (F.regexp_count(norm, F.lit("[aeiouy]+")).cast("long")
         + F.size(F.filter(toks, lambda t: ~t.rlike("[aeiouy]")))
         .cast("long")).alias("n_syllables"),
    )
    return base.select(
        "doc_id", "n_sentences", "n_words", "n_syllables",
        F.expr("case when n_sentences > 0 and n_words > 0 then "
               "206835 - (1015 * n_words) div n_sentences "
               "- (84600 * n_syllables) div n_words end")
        .alias("flesch_x1000"),
        F.expr("case when n_sentences > 0 and n_words > 0 then "
               "(390 * n_words) div n_sentences "
               "+ (11800 * n_syllables) div n_words - 15590 end")
        .alias("fk_grade_x1000"),
    )


def lexical_diversity(docs: DataFrame) -> DataFrame:
    """Type-token ratio + hapax-legomena ratio — the lexical-diversity
    quality axis (keyword-stuffed spam and template boilerplate have
    pathologically LOW diversity; gibberish/ID dumps pathologically
    HIGH): n_types = distinct tokens, TTR = types/tokens, hapax =
    tokens occurring exactly once, counted over the sorted token array
    as run-of-one elements (array_sort + neighbor compare — O(n log n)
    per row, no explode, no shuffle). try_element_at keeps the
    neighbor reads NULL-safe at the array edges under ANSI mode; the
    OR guards decide first so NULL never leaks into the predicate.
    Ratios ship as x1e6 fixed-point integers (cross-engine exact).

    Returns (doc_id, n_tokens, n_types, ttr_x1e6, hapax_ratio_x1e6) —
    ratios NULL for token-less documents."""
    toks = F.filter(F.split(norm_text_col(), " "), lambda t: t != "")
    s = F.array_sort(toks)
    base = docs.select(
        "doc_id", s.alias("_s"),
        F.size(s).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(s)).cast("long").alias("n_types"),
    )
    n = F.col("n_tokens")
    sc = F.col("_s")
    # sequence(1, 0) would generate a DESCENDING [1, 0] — guard n=0
    idx = F.when(n > 0, F.sequence(F.lit(1).cast("long"), n)) \
        .otherwise(F.array().cast("array<bigint>"))
    hapax = F.size(F.filter(
        idx,
        lambda i: ((i == 1) | (F.try_element_at(sc, i.cast("int"))
                               != F.try_element_at(sc, (i - 1).cast("int"))))
        & ((i == n) | (F.try_element_at(sc, i.cast("int"))
                       != F.try_element_at(sc, (i + 1).cast("int")))),
    ))
    return base.select(
        "doc_id", "n_tokens", "n_types",
        F.expr("case when n_tokens > 0 then "
               "(1000000 * n_types) div n_tokens end")
        .alias("ttr_x1e6"),
        F.when(n > 0, hapax.cast("long")).alias("_hapax"),
    ).selectExpr(
        "doc_id", "n_tokens", "n_types", "ttr_x1e6",
        "case when n_tokens > 0 then (1000000 * _hapax) div n_tokens "
        "end as hapax_ratio_x1e6")


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / mean-word-length / stopword-ratio quality features +
    composite score. Rounded to 6 dp (both engines round identically)."""
    toks = tokens_col()
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    mean_wlen = F.round((F.length(F.trim("text")) - (n - 1)) / n, 6)
    raw_ratio = n_stop / n
    stop_ratio = F.round(raw_ratio, 6)
    # composite uses the UNROUNDED ratio: a pre-rounded term lands the
    # score exactly half-way at the 6th decimal, where engines' rounding
    # modes disagree
    score = F.round(
        F.least(F.lit(1.0), n / F.lit(100.0)) * 0.5
        + F.least(F.lit(1.0), raw_ratio * F.lit(5.0)) * 0.5,
        6,
    )
    return docs.select(
        "doc_id",
        F.col("n_chars").alias("n_chars"),
        n.alias("n_tokens"),
        mean_wlen.alias("mean_word_len"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality"),
    )


def gopher_quality(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wlen: float = 3.0,
    max_mean_wlen: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style document-quality rule filters (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", §A1.1 — public rules, default
    thresholds from the paper): word-count bounds, mean-word-length
    bounds, symbol-to-word ratio (# and ellipsis), fraction of words with
    an alphabetic character, and a minimum stop-word count. Emits the
    per-rule features plus the composite ``passes`` flag, all native
    (single map-side projection, no shuffle — the canonical pre-training
    corpus gate at any scale)."""
    r = gopher_raw_cols()
    passes = gopher_passes_col(
        min_words, max_words, min_mean_wlen, max_mean_wlen,
        max_symbol_ratio, min_alpha_ratio, min_stopwords)
    return docs.select(
        "doc_id",
        r["n"].alias("n_words"),
        F.round(r["mean_wlen"], 6).alias("mean_word_len"),
        F.round(r["symbol_ratio"], 6).alias("symbol_ratio"),
        F.round(r["alpha_ratio"], 6).alias("alpha_word_ratio"),
        r["n_stop"].alias("n_stopwords"),
        passes.alias("passes"),
    )


def gopher_raw_cols() -> dict[str, Column]:
    """The Gopher rule features as raw (unrounded) column expressions over
    a ``text`` column — shared by ``gopher_quality`` and the one-scan
    ``corpus_curate`` composite."""
    toks = tokens_col()
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    mean_wlen = (F.length(F.trim("text")) - (n - 1)) / n
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    n_symbols = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))
        + (F.length("text")
           - F.length(F.replace(F.col("text"), F.lit("...")))) / F.lit(3)
    )
    return {
        "n": n, "n_stop": n_stop, "mean_wlen": mean_wlen,
        "alpha_ratio": n_alpha / n, "symbol_ratio": n_symbols / n,
    }


def gopher_passes_col(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wlen: float = 3.0,
    max_mean_wlen: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> Column:
    r = gopher_raw_cols()
    return (
        (r["n"] >= min_words) & (r["n"] <= max_words)
        & (r["mean_wlen"] >= min_mean_wlen)
        & (r["mean_wlen"] <= max_mean_wlen)
        & (r["symbol_ratio"] <= max_symbol_ratio)
        & (r["alpha_ratio"] >= min_alpha_ratio)
        & (r["n_stop"] >= min_stopwords)
    )


def c4_filters(docs: DataFrame, min_sentences: int = 3) -> DataFrame:
    """C4 cleaning heuristics (Raffel et al. 2020, §2.2 — public):
    per-line terminal-punctuation retention, minimum sentence count,
    boilerplate markers ("lorem ipsum", code-brace '{'). Doc-level flags
    plus the line-retention fraction, all native map-side expressions.

    The reference corpus rule set drops LINES without terminal
    punctuation and DOCS violating the doc-level rules; this operator
    reports both so callers can apply either granularity."""
    r = c4_raw_cols()
    n_lines, kept = r["n_lines"], r["kept_lines"]
    n_sentences, has_lorem, has_brace = (
        r["n_sentences"], r["has_lorem"], r["has_brace"])
    passes = c4_passes_col(min_sentences)
    return docs.select(
        "doc_id",
        n_lines.alias("n_lines"),
        F.round(kept / n_lines, 6).alias("terminal_line_frac"),
        n_sentences.cast("int").alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        passes.alias("passes"),
    )


def c4_raw_cols() -> dict[str, Column]:
    """C4 heuristic features as raw column expressions over ``text`` —
    shared by ``c4_filters`` and the one-scan ``corpus_curate``."""
    lines = F.split(F.col("text"), r"\n")
    return {
        "n_lines": F.size(lines),
        "kept_lines": F.size(F.filter(
            lines, lambda ln: F.trim(ln).rlike(r"""[.!?]["']?$"""))),
        "n_sentences": F.size(F.split(F.col("text"), r"[.!?]")) - 1,
        "has_lorem": F.lower(F.col("text")).contains("lorem ipsum"),
        "has_brace": F.col("text").contains("{"),
    }


def c4_passes_col(min_sentences: int = 3) -> Column:
    r = c4_raw_cols()
    return (~r["has_lorem"] & ~r["has_brace"]
            & (r["n_sentences"] >= min_sentences))


def _run_scan(sorted_arr: Column) -> Column:
    """Scan a SORTED array; returns struct(dupchars, maxchars): total
    chars in elements whose run length > 1 (counted per occurrence) and
    max over runs of run_len * element_len. Single `F.aggregate` pass."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dupchars"),
        F.lit(0).cast("long").alias("maxchars"),
    )

    def step(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        prev_chars = acc["run"] * F.coalesce(
            F.length(acc["prev"]), F.lit(0)).cast("long")
        dup = F.when(~same & (acc["run"] > 1),
                     acc["dupchars"] + prev_chars
                     ).otherwise(acc["dupchars"])
        mx = F.when(~same, F.greatest(acc["maxchars"], prev_chars)
                    ).otherwise(acc["maxchars"])
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(x.alias("prev"), run.alias("run"),
                        dup.alias("dupchars"), mx.alias("maxchars"))

    def finish(acc):
        last_chars = acc["run"] * F.coalesce(
            F.length(acc["prev"]), F.lit(0)).cast("long")
        return F.struct(
            F.when(acc["run"] > 1, acc["dupchars"] + last_chars)
            .otherwise(acc["dupchars"]).alias("dupchars"),
            F.greatest(acc["maxchars"], last_chars).alias("maxchars"),
        )

    return F.aggregate(sorted_arr, init, step, finish)


def repetition_raw_cols() -> dict[str, Column]:
    """The Gopher repetition fractions as raw column expressions over
    ``text`` — shared by ``repetition_filters`` and the one-scan
    ``corpus_curate`` composite."""
    lines = F.split("text", r"\n")
    toks = tokens_col()
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"),
        lambda acc, ln: acc + F.length(ln).cast("long"))
    dup_line_chars = _run_scan(F.array_sort(lines))["dupchars"]
    top2_chars = _run_scan(F.array_sort(grams))["maxchars"]
    dup_line_frac = (
        (F.size(lines) - F.size(F.array_distinct(lines))) / F.size(lines))
    dup_char_frac = F.when(
        line_chars > 0, dup_line_chars / line_chars).otherwise(F.lit(0.0))
    top2_frac = top2_chars / F.length("text")
    return {
        "dup_line_frac": dup_line_frac,
        "dup_char_frac": dup_char_frac,
        "top2_frac": top2_frac,
    }


def repetition_passes_col(
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top2gram_char_frac: float = 0.20,
) -> Column:
    r = repetition_raw_cols()
    return (
        (r["dup_line_frac"] <= max_dup_line_frac)
        & (r["dup_char_frac"] <= max_dup_line_char_frac)
        & (r["top2_frac"] <= max_top2gram_char_frac)
    )


def repetition_filters(
    docs: DataFrame,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top2gram_char_frac: float = 0.20,
) -> DataFrame:
    """Gopher repetition rules (Rae et al. 2021 §A1.1, public): fraction
    of duplicate lines, fraction of characters in duplicate lines, and
    the fraction of characters covered by the single most frequent word
    2-gram.

    Formulated entirely MAP-SIDE: every statistic is within-document, so
    the lines/2-grams of one row are sorted (`array_sort`) and scanned
    with a single `F.aggregate` run-length pass — O(n log n) per doc,
    ZERO shuffles, no joins (vs the naive explode -> groupBy(doc, line)
    -> groupBy(doc) shape, which shuffles the whole corpus twice to
    compute facts that never leave the row). At 100 TB this is
    embarrassingly parallel and bounded by scan bandwidth; a single
    document's line/gram array is the only memory term."""
    r = repetition_raw_cols()
    passes = repetition_passes_col(
        max_dup_line_frac, max_dup_line_char_frac, max_top2gram_char_frac)
    return docs.select(
        "doc_id",
        F.round(r["dup_line_frac"], 6).alias("dup_line_frac"),
        F.round(r["dup_char_frac"], 6).alias("dup_line_char_frac"),
        F.round(r["top2_frac"], 6).alias("top_2gram_char_frac"),
        passes.alias("passes"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language-ID heuristic: predicted language = argmax
    of marker-token counts, ties broken by language code (deterministic)."""
    ranked = lang_ranked_col()
    return docs.select(
        "doc_id",
        "lang",
        ranked[0]["lang"].alias("lang_pred"),
        (-ranked[0]["neg"]).cast("int").alias("marker_hits"),
    )


def lang_ranked_col(text: Column | str = "text") -> Column:
    """The language-ID argmax as a column expression (array of
    (neg_score, lang) structs sorted best-first) — shared by ``lang_id``,
    the one-scan ``corpus_curate`` composite, and the image caption gate
    (which points it at the caption column)."""
    toks = tokens_col(text)
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        cnt = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(F.struct(cnt.alias("score"), F.lit(lang).alias("lang")))
    # argmax with lang-code tie-break: max of (score, reversed-lang) structs
    # won't give lexicographic-smallest lang on ties, so sort desc by score
    # then asc by lang via array_sort on (-score, lang)
    return F.array_sort(
        F.array(*[
            F.struct((-s["score"]).alias("neg"), s["lang"].alias("lang"))
            for s in scores
        ])
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: 60-bit hash of whitespace-normalized lowered
    text (md5-based — matches the DuckDB oracle exactly)."""
    from xcrawl3r_spark.functions.hashing import md5_long

    norm = norm_text_col()
    return docs.select("doc_id", md5_long(norm).alias("fp"))


WINNOW_K = 8   # char k-gram width
WINNOW_W = 16  # positions per winnow bucket


def winnow_fingerprints(docs: DataFrame, k: int = WINNOW_K,
                        w: int = WINNOW_W) -> DataFrame:
    """Winnowing-style rolling-hash fingerprints: hash every char k-gram
    of the normalized text, keep the minimum hash per ``w``-position
    bucket (blocked winnowing — the standard near-dup/plagiarism
    fingerprint, one row per (doc, bucket)).

    Fully native: sequence/explode position fan-out, Column.substr with a
    column start (the per-position "rolling" window), md5-based 60-bit
    hash shared with the DuckDB oracle, codegen'd hash-aggregate min.
    Scale: output is len(text)/w rows per doc (~64x smaller than the
    gram fan-out after map-side partial min)."""
    from xcrawl3r_spark.functions.hashing import md5_long

    norm = norm_text_col()
    n_grams = F.length(norm) - (k - 1)
    positions = F.when(
        n_grams >= 1, F.sequence(F.lit(1), n_grams)
    ).otherwise(F.array().cast("array<int>"))
    g = docs.select(
        "doc_id", norm.alias("norm"), F.explode(positions).alias("pos"))
    gram = F.col("norm").substr(F.col("pos"), F.lit(k))
    return (
        g.select(
            "doc_id",
            F.floor((F.col("pos") - 1) / w).alias("bucket"),
            md5_long(gram).alias("gram_fp"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.min("gram_fp").alias("fp"))
    )


def winnow_pairs(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W,
    min_shared: int = 2, max_fp_df: int | None = None,
) -> DataFrame:
    """Local-similarity document pairs via shared winnowing fingerprints
    — the plagiarism-detection join (Schleimer et al. 2003, "Winnowing:
    Local Algorithms for Document Fingerprinting" — public). Two docs
    pair when they share >= ``min_shared`` distinct fingerprints;
    ``containment`` = shared / min(|fp_a|, |fp_b|), which detects a
    small document embedded inside a large one — exactly the case
    MinHash's symmetric Jaccard under-scores.

    ``max_fp_df`` caps the per-fingerprint posting list (the same
    quadratic-risk control as the ngram/simhash/embedding self-joins):
    a boilerplate fingerprint shared by 10^6 docs would otherwise emit
    10^12 pairs. The df count rides a window over partitionBy(fp) —
    the same shuffle the self-join needs.

    Scale posture: fingerprints are ~len/w rows per doc (map-side
    partial min); pairs fan out from per-fp posting sets bounded by
    the cap. All integer counts + one rounded division — cross-engine
    exact. Output: (doc_a, doc_b, n_shared, containment) for
    doc_a < doc_b.

    r6 shape (guide §2.4): the dense per-char md5 fingerprint fan-out
    — the dominant cost — executes exactly ONCE. collect_set per fp
    folds the (doc, fp) distinct into the posting aggregation, the cap
    becomes a ``size(ds) <= max_fp_df`` filter on that aggregate (no
    separate count window), capped per-doc sizes ride the re-expanded
    rows as ONE count window, and pairs fan out from each fp's doc
    list map-side — identical to the old self-join's doc_a < doc_b
    matches. The r1-r5 shape re-executed the fan-out per consumer
    (sizes + both join sides); the interim r6 localCheckpoint's
    build-time planning + write cost exceeded the recompute it saved
    at bench scale (r6 ABBA). The sizes join-back is gone: na/nb ride
    the pair rows.
    """
    from pyspark.sql import Window as W

    fpb = winnow_fingerprints(docs, k, w)
    sets = fpb.groupBy("fp").agg(F.collect_set("doc_id").alias("ds"))
    if max_fp_df is not None:
        sets = sets.filter(F.size("ds") <= max_fp_df)
    e = sets.select("fp", F.explode("ds").alias("doc_id"))
    withn = e.withColumn(
        "n_fp", F.count("*").over(W.partitionBy("doc_id")))
    g = withn.groupBy("fp").agg(
        F.collect_list(F.struct("doc_id", "n_fp")).alias("ids"))
    return (
        g.select(F.explode("ids").alias("x"), "ids")
        .select("x", F.explode("ids").alias("y"))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"))
        .agg(
            F.count("*").alias("n_shared"),
            F.min("x.n_fp").alias("na"),
            F.min("y.n_fp").alias("nb"))
        .filter(F.col("n_shared") >= min_shared)
        .select(
            "doc_a", "doc_b", "n_shared",
            F.round(F.col("n_shared") / F.least("na", "nb"), 6)
            .alias("containment"),
        )
    )


def winnow_spans(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W,
    min_shared: int = 2, max_fp_df: int | None = None,
) -> DataFrame:
    """Span LOCALIZATION for winnow pairs: for every qualifying pair
    (same candidate semantics as ``winnow_pairs``: >= ``min_shared``
    shared distinct fingerprints, posting lists capped at ``max_fp_df``)
    and each side of it, the contiguous runs of winnow buckets whose
    fingerprint also occurs in the other document — i.e. WHERE the
    shared material sits, not just that it exists. This is the second
    half of the Schleimer et al. 2003 use case (report the matched
    regions), and the piece a reviewer needs before cutting/attributing
    overlap found by ``winnow_pairs``.

    Shape: one row per (doc_a, doc_b, side, island) with the island's
    bucket interval, its bucket count, and the 1-based char interval it
    covers in that side's NORMALIZED text (a bucket holds gram start
    positions [bucket*w+1, bucket*w+w]; a gram spans k chars, so the
    island [s, e] covers chars [s*w+1, (e+1)*w+k-1] — the end is NOT
    clamped to the doc length, by design: clamping would need a join
    against per-doc lengths that buys nothing downstream).

    Scale posture: reuses the capped fingerprint relation of
    ``winnow_pairs`` (the cap bounds every posting list, so the pair
    join and both side joins are fan-out-bounded equi-joins); island
    detection is one window pass per (pair, side) — the partition is a
    single pair's matched buckets, trivially memory-safe. All-integer
    output (plus the 'a'/'b' side tag), cross-engine exact."""
    from pyspark.sql import Window as W

    # r6 shape (guide §2.4): the dense md5 fingerprint fan-out executes
    # exactly ONCE — one aggregation per fp collects both the bucket
    # occurrences (for span positions) and the distinct doc set (for
    # the cap + membership), then every (occurrence x other-doc) match
    # fans out MAP-SIDE with its side tag. The r1-r5 shape referenced
    # fpb twice and fps four times (re-running the fan-out per
    # reference); the interim r6 localCheckpoints' build-time planning
    # + triple materialization exceeded the recompute they saved at
    # bench scale (r6 ABBA). The pair qualification (>= min_shared
    # shared distinct fps) rides the SAME matched relation as a
    # collect_set window — no separate pairs join. One row per
    # (pair, side, bucket) as before: a (doc, bucket) has exactly one
    # fp, and pairs with exactly one other doc per shared fp.
    fpb = winnow_fingerprints(docs, k, w)
    sets = fpb.groupBy("fp").agg(
        F.collect_list(F.struct("doc_id", "bucket")).alias("occ"),
        F.collect_set("doc_id").alias("ds"),
    )
    if max_fp_df is not None:
        sets = sets.filter(F.size("ds") <= max_fp_df)
    x, d = F.col("x"), F.col("d")
    matched = (
        sets.select("fp", F.explode("occ").alias("x"), "ds")
        .select("fp", "x", F.explode("ds").alias("d"))
        .filter(x["doc_id"] != d)
        .select(
            "fp",
            F.when(x["doc_id"] < d, x["doc_id"]).otherwise(d)
            .alias("doc_a"),
            F.when(x["doc_id"] < d, d).otherwise(x["doc_id"])
            .alias("doc_b"),
            F.when(x["doc_id"] < d, F.lit("a")).otherwise(F.lit("b"))
            .alias("side"),
            x["bucket"].alias("bucket"),
        )
    )
    # shared distinct fps per pair as a window over the pair partition
    # (both sides contribute the same fp set); >= min_shared gates the
    # pair exactly as the old pairs join did
    w_pair = W.partitionBy("doc_a", "doc_b")
    matched = (
        matched.withColumn(
            "_ns", F.size(F.collect_set("fp").over(w_pair)))
        .filter(F.col("_ns") >= min_shared)
        .drop("fp", "_ns")
    )
    win = W.partitionBy("doc_a", "doc_b", "side").orderBy("bucket")
    isl = (
        matched
        .withColumn(
            "_new",
            F.when(F.col("bucket") - F.lag("bucket").over(win) <= 1,
                   F.lit(0)).otherwise(F.lit(1)))
        .withColumn(
            "island",
            F.sum("_new").over(
                win.rowsBetween(W.unboundedPreceding, W.currentRow)))
    )
    return (
        isl.groupBy("doc_a", "doc_b", "side", "island")
        .agg(
            F.min("bucket").alias("bucket_start"),
            F.max("bucket").alias("bucket_end"),
            F.count("*").alias("n_buckets"),
        )
        .select(
            "doc_a", "doc_b", "side",
            F.col("island").cast("long").alias("span_id"),
            "bucket_start", "bucket_end", "n_buckets",
            (F.col("bucket_start") * w + 1).alias("char_start"),
            ((F.col("bucket_end") + 1) * w + (k - 1)).alias("char_end"),
        )
    )


def token_topk(docs: DataFrame, k: int = 50) -> DataFrame:
    """Corpus vocabulary heavy-hitters: the top-``k`` whitespace tokens by
    total occurrence count, with document frequency — the "what is my
    corpus made of" observability row (boilerplate tokens dominating the
    head is the classic pre-dedup smell).

    Scale posture: explode → ONE hash aggregation on token (count runs
    map-side partial; countDistinct adds its standard partial-agg
    expand), then ``orderBy().limit(k)`` which Spark compiles to
    TakeOrderedAndProject — per-partition top-k heaps merged on the
    driver, NO global sort shuffle (the plan-audit pins this). Ties
    break deterministically (count desc, token asc)."""
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("token"))
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token"))
        .limit(k)
    )


# PII patterns shared with the DuckDB oracle (both engines use the same
# source strings; constructs are in the RE2-compatible subset DuckDB
# supports, evaluated identically by Java regex)
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+\d[\d\- ]{7,}\d"


def normalize_text(
    docs: DataFrame, form: str = "NFC", text_col: str = "text"
) -> DataFrame:
    """Unicode normalization of ``text_col`` -> ``text_norm`` — the
    canonical first step of any multilingual ingest (composed vs
    decomposed accents, compatibility ligatures/width under NFKC).

    Spark SQL has no normalizer builtin, so this is an Arrow-batched
    pandas UDF (``Series.str.normalize`` — CPython's
    ``unicodedata.normalize`` quick-check returns already-normalized
    strings untouched, so the per-element cost on mostly-NFC corpora is
    one C-level check; everything around it stays relational).
    NOTE (r6, measured): ``pyarrow.compute.utf8_normalize`` is NOT a
    valid replacement on this Arrow build — it emits decomposed output
    regardless of the requested form (é -> e+U+0301 under form="NFC"),
    so the vectorized-C++ swap the optimization guide §4.2 suggests
    would change results. Deterministic: normalization is a pure
    per-row function. The NFC form is oracle-checked against DuckDB's
    ``nfc_normalize`` (``text_normalize`` gate query); NFKC/NFD/NFKD are
    the same code path with no DuckDB twin.
    """
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"bad normalization form: {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    return docs.withColumn("text_norm", _norm(text_col))


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII redaction pass (training-data hygiene): count and replace
    email addresses and international-format phone numbers with typed
    placeholder tokens. Single map-side projection, zero shuffles.

    Counts are consistent with the output by construction: emails count
    on the raw text, phones count on the email-scrubbed intermediate
    (a digit run inside an email — 'user+15551234567@x.org' — would
    otherwise count as a phone yet never appear as a <PHONE> token), so
    n_emails/n_phones always equal the placeholder counts in
    ``scrubbed``."""
    emails_gone = F.regexp_replace("text", PII_EMAIL_RE, "<EMAIL>")
    scrubbed = F.regexp_replace(emails_gone, PII_PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(emails_gone, F.lit(PII_PHONE_RE)).alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )
