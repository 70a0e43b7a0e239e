"""Curation operators: benchmark decontamination, stratified sampling,
token-budget packing, tf-idf top terms (operators/curation.py)."""

from pyspark.sql import functions as F

from xcrawl3r_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")


class TestDecontaminate:
    def test_benchmark_doc_fully_contaminated(self, spark):
        docs = _docs(spark, [
            (0, "alpha beta gamma delta", "en", "s1"),
            (1, "alpha beta gamma delta epsilon", "en", "s1"),
            (2, "zeta eta theta iota", "en", "s1"),
        ])
        bench = docs.filter(F.col("doc_id") == 0)
        got = {r.doc_id: r for r in
               curation.decontaminate(docs, bench).collect()}
        # doc 0 is the benchmark: both its trigrams hit
        assert got[0].n_ngrams == 2 and got[0].n_hits == 2
        assert got[0].contaminated
        # doc 1 contains both benchmark trigrams (plus one clean one)
        assert got[1].n_ngrams == 3 and got[1].n_hits == 2
        # doc 2 shares nothing
        assert got[2].n_hits == 0 and not got[2].contaminated

    def test_short_doc_has_zero_ngrams_but_is_kept(self, spark):
        docs = _docs(spark, [(0, "one two", "en", "s1"),
                             (1, "a b c d", "en", "s1")])
        got = {r.doc_id: r for r in
               curation.decontaminate(docs, docs.limit(0)).collect()}
        assert got[0].n_ngrams == 0 and not got[0].contaminated
        assert got[1].n_hits == 0

    def test_repeated_hit_counted_once(self, spark):
        docs = _docs(spark, [(0, "x y z q x y z", "en", "s1")])
        bench = _docs(spark, [(9, "x y z", "en", "s1")])
        r = curation.decontaminate(docs, bench).collect()[0]
        # "x y z" occurs twice in doc 0 but is ONE distinct benchmark hit
        assert r.n_hits == 1 and r.n_ngrams == 5


class TestStratifiedSample:
    def _corpus(self, spark):
        rows = [(i, f"t {i}", ["en", "de", "fr"][i % 3], "s") for i in range(90)]
        return _docs(spark, rows)

    def test_exact_k_per_stratum(self, spark):
        out = curation.stratified_sample(self._corpus(spark), k=7)
        per = {r.lang: r.n for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert per == {"en": 7, "de": 7, "fr": 7}

    def test_salting_is_semantics_free(self, spark):
        docs = self._corpus(spark)
        a = sorted((r.lang, r.doc_id, r.rk) for r in
                   curation.stratified_sample(docs, k=5, n_salt=1).collect())
        b = sorted((r.lang, r.doc_id, r.rk) for r in
                   curation.stratified_sample(docs, k=5, n_salt=16).collect())
        assert a == b

    def test_small_stratum_returned_whole(self, spark):
        docs = _docs(spark, [(0, "t", "en", "s"), (1, "t", "de", "s")])
        out = curation.stratified_sample(docs, k=10)
        assert out.count() == 2


class TestPackTokenBudget:
    def test_group_totals_within_budget(self, spark):
        rows = [(i, " ".join(["w"] * (5 + i % 7)), "en", f"s{i % 3}")
                for i in range(60)]
        out = curation.pack_token_budget(_docs(spark, rows), budget=40)
        per = out.groupBy("source").agg(F.sum("n_tokens").alias("tot")).collect()
        assert per and all(r.tot <= 40 for r in per)

    def test_admits_prefix_in_hash_order(self, spark):
        rows = [(i, "a b c d e", "en", "s0") for i in range(10)]  # 5 tokens
        out = curation.pack_token_budget(_docs(spark, rows), budget=12)
        got = out.orderBy("cum_tokens").collect()
        # 5-token docs into a 12 budget: exactly 2 admitted, cum 5 then 10
        assert [r.cum_tokens for r in got] == [5, 10]

    def test_doc_larger_than_budget_blocks_group(self, spark):
        # first-fit, no skip-ahead: a huge doc first in hash order with
        # cum > budget excludes itself AND everything after it
        rows = [(i, " ".join(["w"] * 100), "en", "s0") for i in range(3)]
        out = curation.pack_token_budget(_docs(spark, rows), budget=50)
        assert out.count() == 0


class TestMixtureSample:
    def _corpus(self, spark):
        # 3 sources x 10 docs x 10 tokens each = 100 tokens per source
        rows = [(s * 100 + i, " ".join([f"w{s}{i}{j}" for j in range(10)]),
                 "en", f"src{s}")
                for s in range(3) for i in range(10)]
        return _docs(spark, rows)

    def test_integer_allocation_and_fill(self, spark):
        """weights 1:2:3 over total 120 -> allocations 20/40/60; each
        source fills in whole docs (10 tokens each) up to its budget."""
        out = curation.mixture_sample(
            self._corpus(spark), total_tokens=120,
            weights={"src0": 1, "src1": 2, "src2": 3})
        per = {r["source"]: r["n"] for r in out.groupBy("source").agg(
            F.sum("n_tokens").alias("n")).collect()}
        assert per == {"src0": 20, "src1": 40, "src2": 60}
        budgets = {r["source"]: r["group_budget"]
                   for r in out.select("source", "group_budget")
                   .distinct().collect()}
        assert budgets == {"src0": 20, "src1": 40, "src2": 60}

    def test_unweighted_source_excluded_and_shortfall_visible(self, spark):
        """A source absent from the weight table contributes nothing; a
        source short on data fills below its allocation (achieved mix is
        observable, never silently padded)."""
        out = curation.mixture_sample(
            self._corpus(spark), total_tokens=600,
            weights={"src0": 1, "src1": 1})
        srcs = {r["source"] for r in out.select("source").distinct().collect()}
        assert srcs == {"src0", "src1"}               # src2 excluded
        per = {r["source"]: r["n"] for r in out.groupBy("source").agg(
            F.sum("n_tokens").alias("n")).collect()}
        # allocation is 300 each but only 100 tokens exist per source
        assert per == {"src0": 100, "src1": 100}

    def test_deterministic(self, spark):
        docs = self._corpus(spark)
        w = {"src0": 2, "src1": 1, "src2": 1}
        a = sorted(map(tuple, curation.mixture_sample(
            docs, 200, w).collect()))
        b = sorted(map(tuple, curation.mixture_sample(
            docs, 200, w).collect()))
        assert a == b and a

    def test_upsample_repeats_short_source(self, spark):
        """upsample=True fills a short group by whole-epoch repetition:
        every doc appears once per epoch before any repeats, and the
        allocation fills exactly (250 = 2 full 100-token epochs + half
        of a third)."""
        out = curation.mixture_sample(
            self._corpus(spark), total_tokens=500,
            weights={"src0": 1, "src1": 1}, upsample=True)
        per = {r["source"]: r["n"] for r in out.groupBy("source").agg(
            F.sum("n_tokens").alias("n")).collect()}
        assert per == {"src0": 250, "src1": 250}
        cnt = {r["epoch"]: r["n"] for r in
               out.filter(F.col("source") == "src0")
               .groupBy("epoch").agg(F.count("*").alias("n")).collect()}
        assert cnt == {0: 10, 1: 10, 2: 5}

    def test_upsample_epoch_cap_bounds_blowup(self, spark):
        """max_epochs caps repetition: a huge allocation over a tiny
        source stops at the cap instead of exploding the fan-out."""
        out = curation.mixture_sample(
            self._corpus(spark), total_tokens=60_000,
            weights={"src0": 1}, upsample=True, max_epochs=3)
        assert out.agg(F.sum("n_tokens")).first()[0] == 300
        assert out.agg(F.max("epoch")).first()[0] == 2


class TestTfidfTopTerms:
    def test_rare_term_outranks_common(self, spark):
        docs = _docs(spark, [
            (0, "common rare0 common common", "en", "s0"),
            (1, "common rare1 common common", "en", "s1"),
        ])
        out = curation.tfidf_top_terms(docs, k=2)
        top = {r.source: r.term for r in out.filter(F.col("rk") == 1).collect()}
        # tf(common)=3 in every source but df=2 -> 3*3/3=3.0;
        # tf(rareN)=1, df=1 -> 1*3/2=1.5 ... common still wins on tf here
        assert top == {"s0": "common", "s1": "common"}
        r0 = {r.term: r for r in out.filter(F.col("source") == "s0").collect()}
        assert r0["common"].score == 3.0 and r0["rare0"].score == 1.5

    def test_rank_bounded_and_deterministic(self, spark):
        rows = [(i, f"w{i % 5} w{i % 3} tie tie", "en", f"s{i % 4}")
                for i in range(40)]
        out1 = sorted(map(tuple, curation.tfidf_top_terms(
            _docs(spark, rows), k=3).collect()))
        out2 = sorted(map(tuple, curation.tfidf_top_terms(
            _docs(spark, rows), k=3).collect()))
        assert out1 == out2
        assert all(t[-1] <= 3 for t in out1)


class TestPiiScrub:
    def test_counts_and_redaction(self, spark):
        from xcrawl3r_spark.operators.textops import pii_scrub

        docs = _docs(spark, [
            (0, "mail a.b+c@x-site.org or b@y.io, call +1 555 0100 99", "en", "s"),
            (1, "no pii here at all", "en", "s"),
            (2, "+12 3456789 and +1-555-010-0199 twice", "en", "s"),
        ])
        got = {r.doc_id: r for r in pii_scrub(docs).collect()}
        assert got[0].n_emails == 2 and got[0].n_phones == 1
        assert got[0].scrubbed.count("<EMAIL>") == 2
        assert "@" not in got[0].scrubbed
        assert got[1].n_emails == 0 and got[1].scrubbed == "no pii here at all"
        assert got[2].n_phones == 2 and got[2].scrubbed.count("<PHONE>") == 2

    def test_phone_inside_email_counts_once(self, spark):
        """r2 review finding: a digit run inside an email must not count
        as a phone — counts always equal the placeholder tokens."""
        from xcrawl3r_spark.operators.textops import pii_scrub

        docs = _docs(spark, [(0, "write user+15551234567@x.org today", "en", "s")])
        r = pii_scrub(docs).collect()[0]
        assert r.n_emails == 1 and r.n_phones == 0
        assert r.scrubbed == "write <EMAIL> today"
        assert r.scrubbed.count("<PHONE>") == r.n_phones


class TestCorpusCurate:
    def test_stage_invariants(self, spark, sf_dir):
        from xcrawl3r_spark.operators.pipeline import corpus_curate
        from xcrawl3r_spark.operators.textops import gopher_quality

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = corpus_curate(docs, budget=1000).collect()
        assert out, "composite gated the whole corpus to empty"
        # pack invariant: per-source token totals within budget
        per: dict = {}
        for r in out:
            per[r.source] = per.get(r.source, 0) + r.n_tokens
        assert all(tot <= 1000 for tot in per.values())
        # survivors passed the Gopher gate (spot-check one upstream stage)
        ids = {r.doc_id for r in out}
        gq_fail = {r.doc_id for r in gopher_quality(docs).collect()
                   if not r.passes}
        assert not (ids & gq_fail)
        # benchmark members drop themselves (full self-overlap)
        assert not any(i % 97 == 0 for i in ids)

    def test_deterministic(self, spark, sf_dir):
        from xcrawl3r_spark.operators.pipeline import corpus_curate

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = sorted(map(tuple, corpus_curate(docs, budget=800).collect()))
        b = sorted(map(tuple, corpus_curate(docs, budget=800).collect()))
        assert a == b and len(a) > 0


def test_pack_shards_layout(spark, sf_dir):
    """Shard packing: within each source, shards partition the hash order
    contiguously, every shard except the last crosses its shard_tokens
    start boundary exactly once, and docs are never split."""
    from collections import defaultdict

    from xcrawl3r_spark.operators import curation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = curation.pack_shards(docs, shard_tokens=400).collect()
    assert len(rows) == docs.count()          # every doc assigned
    by_src = defaultdict(list)
    for r in rows:
        assert r["shard_id"] == r["start_offset"] // 400
        by_src[r["source"]].append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["start_offset"])
        off = 0
        for r in rs:                          # offsets are a contiguous sum
            assert r["start_offset"] == off
            off += r["n_tokens"]
        sids = [r["shard_id"] for r in rs]
        assert sids == sorted(sids)           # shard ids monotone in order
    again = curation.pack_shards(docs, shard_tokens=400).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_assign_splits_disjoint_complete_and_stable(spark, sf_dir):
    """Splits are disjoint+complete, proportions land near the requested
    fractions, membership is key-only (subset invariance — the
    anti-leakage property), and bad fractions fail fast."""
    import pytest

    from xcrawl3r_spark.operators import curation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = curation.assign_splits(docs).collect()
    assert len(rows) == docs.count()
    by = {}
    for r in rows:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by) <= {"train", "val", "test"}
    n = len(rows)
    assert abs(len(by["train"]) / n - 0.9) < 0.06
    # subset invariance: recomputing on half the corpus assigns the same
    # split to every surviving doc (membership is a pure key function)
    half = curation.assign_splits(docs.filter("doc_id % 2 = 0")).collect()
    for r in half:
        assert r["doc_id"] in by[r["split"]]
    with pytest.raises(ValueError):
        curation.assign_splits(docs, fractions={"a": 0.5, "b": 0.6})


def test_pack_sequences_exact_windows(spark, sf_dir):
    """Sequence packing with splits: per source, every sequence except
    the tail is exactly L tokens of slices; per doc, slices are
    contiguous and cover [0, n_tokens); boundary-spanning docs fan out."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from xcrawl3r_spark.operators import curation
    from xcrawl3r_spark.operators.textops import tokens_col

    L = 256
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = curation.pack_sequences(docs, seq_tokens=L).collect()
    n_tok = {r["doc_id"]: r["n"] for r in docs.select(
        "doc_id", F.size(tokens_col()).alias("n")).collect()}
    per_doc = defaultdict(list)
    per_seq = defaultdict(int)
    for r in rows:
        assert 0 <= r["tok_start"] < r["tok_end"] <= n_tok[r["doc_id"]]
        per_doc[r["doc_id"]].append((r["tok_start"], r["tok_end"]))
        per_seq[(r["source"], r["seq_id"])] += r["tok_end"] - r["tok_start"]
    for d, slices in per_doc.items():      # contiguous full coverage
        slices.sort()
        assert slices[0][0] == 0 and slices[-1][1] == n_tok[d]
        for (_, e0), (s1, _) in zip(slices, slices[1:]):
            assert e0 == s1
    for src in {s for s, _ in per_seq}:    # exact L except the tail
        seqs = sorted(i for s, i in per_seq if s == src)
        for i in seqs[:-1]:
            assert per_seq[(src, i)] == L, (src, i)
    assert any(len(v) > 1 for v in per_doc.values())  # splits happened


class TestCorpusStats:
    def test_per_source_aggregates(self, spark):
        from xcrawl3r_spark.operators.pipeline import corpus_stats

        long_doc = " ".join(["the", "and"] + [f"w{i:02d}xx" for i in range(60)])
        docs = _docs(spark, [
            (1, long_doc, "en", "sa"),          # gopher-passing
            (2, long_doc, "en", "sa"),          # exact dup of 1
            (3, "tiny doc", "en", "sa"),        # gopher fail (too short)
            (4, "eins zwei", "de", "sb"),
        ])
        got = {r["source"]: r for r in corpus_stats(docs).collect()}
        sa, sb = got["sa"], got["sb"]
        assert sa["n_docs"] == 3 and sb["n_docs"] == 1
        assert sa["n_distinct_content"] == 2     # dup pair collapses
        assert sa["n_gopher_pass"] == 2          # both long copies pass
        assert sa["n_tokens"] == 62 * 2 + 2
        assert sb["n_gopher_pass"] == 0 and sb["n_tokens"] == 2

    def test_deterministic(self, spark):
        from xcrawl3r_spark.operators.pipeline import corpus_stats

        docs = _docs(spark, [(i, f"word{i} the and text", "en",
                              f"s{i % 3}") for i in range(30)])
        a = sorted(map(tuple, corpus_stats(docs).collect()))
        b = sorted(map(tuple, corpus_stats(docs).collect()))
        assert a == b and len(a) == 3


class TestTokenQuantiles:
    def test_exact_discrete_ranks(self, spark):
        """p-th quantile = element at rank ((n-1)*q) div 100 + 1 of the
        (n_tokens, doc_id) ascending order — checked against a hand
        computation on a known length multiset."""
        from xcrawl3r_spark.operators.pipeline import token_quantiles

        # source 'a': 10 docs with 1..10 tokens => ranks are the lengths
        rows = [(i, " ".join(["w"] * (i + 1)), "en", "a") for i in range(10)]
        # source 'b': single doc => every quantile is its length
        rows.append((100, "one two three", "en", "b"))
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string")
        got = {r["source"]: r for r in token_quantiles(docs).collect()}
        a = got["a"]
        assert a["n_docs"] == 10
        # n=10: idx(q) = (9*q)//100 + 1 -> p25=rank3, p50=rank5, p75=rank7,
        # p95=rank9 -> lengths 3,5,7,9
        assert (a["p25"], a["p50"], a["p75"], a["p95"]) == (3, 5, 7, 9)
        b = got["b"]
        assert b["n_docs"] == 1
        assert (b["p25"], b["p50"], b["p75"], b["p95"]) == (3, 3, 3, 3)

    def test_tie_break_is_deterministic(self, spark):
        """Equal token counts order by doc_id, so reruns pick the same
        element (subset-stable rank semantics)."""
        from xcrawl3r_spark.operators.pipeline import token_quantiles

        docs = spark.createDataFrame(
            [(i, "x y z", "en", "s") for i in range(7)],
            "doc_id long, text string, lang string, source string")
        a = sorted(map(tuple, token_quantiles(docs).collect()))
        b = sorted(map(tuple, token_quantiles(docs).collect()))
        assert a == b
        assert a[0][2:] == (3, 3, 3, 3)


class TestTokenTopk:
    def test_counts_and_tie_break(self, spark):
        """Occurrence counts aggregate across docs; doc frequency counts
        distinct docs; ties order by token ascending; limit truncates."""
        from xcrawl3r_spark.operators import textops

        docs = spark.createDataFrame(
            [(1, "apple apple banana"),
             (2, "apple cherry banana"),
             (3, "date")],
            "doc_id long, text string")
        rows = textops.token_topk(docs, k=3).collect()
        assert [(r["token"], r["n_occurrences"], r["n_docs"])
                for r in rows] == [
            ("apple", 3, 2), ("banana", 2, 2), ("cherry", 1, 2 - 1)]

    def test_plan_is_take_ordered_not_global_sort(self, spark):
        """The top-k must compile to TakeOrderedAndProject (per-partition
        heaps), not a full sort shuffle — the 100 TB posture."""
        from xcrawl3r_spark.operators import textops

        docs = spark.createDataFrame(
            [(i, f"tok{i % 5} tok{i % 3}") for i in range(50)],
            "doc_id long, text string")
        plan = textops.token_topk(docs, k=5)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Sort [n_occurrences" not in plan
