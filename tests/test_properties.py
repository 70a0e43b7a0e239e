"""Property-based tests (hypothesis) for the r3 pure kernels, ANCHORED to
the real operators: each pure twin used by the hypothesis loops is first
pinned equal to the product code it models (one Spark run over a
generated corpus / a column-expression evaluation), so the hundreds of
driver-side examples genuinely constrain the operators — a twin-only
suite would stay green while the operator drifted."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from __spark_entry__ import _robots_re

# ---------------------------------------------------------------------------
# pack_sequences arithmetic (pure integer form of the column expressions)
# ---------------------------------------------------------------------------


def _sequence_slices(token_counts, L):
    """Driver-side twin of curation.pack_sequences' arithmetic for one
    group (pinned equal to the operator below): [(doc_idx, seq_id,
    tok_start, tok_end)]."""
    out, start = [], 0
    for i, n in enumerate(token_counts):
        if n <= 0:
            continue
        for seq in range(start // L, (start + n - 1) // L + 1):
            out.append((i, seq, max(seq * L - start, 0),
                        min((seq + 1) * L - start, n)))
        start += n
    return out


def test_sequence_twin_matches_operator(spark):
    """Anchor: the pure twin reproduces curation.pack_sequences exactly on
    a seeded random multi-group corpus (one Spark run; the operator's
    hash order is replayed into the twin's input order)."""
    from xcrawl3r_spark.functions.hashing import seeded as seeded_col
    from pyspark.sql import functions as F

    from xcrawl3r_spark.operators import curation

    rng = np.random.RandomState(5)
    rows = []
    did = 0
    for g in range(4):
        for _ in range(rng.randint(5, 30)):
            # n >= 1: the engine's whitespace tokenizer counts "" as ONE
            # token (split of an empty string yields ['']), a corpus-wide
            # convention this anchor doesn't re-litigate
            n = int(rng.randint(1, 40))
            rows.append((did, f"g{g}", " ".join(["w"] * n)))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    L = 17
    got = {(r["doc_id"], r["seq_id"]): (r["tok_start"], r["tok_end"])
           for r in curation.pack_sequences(docs, seq_tokens=L).collect()}
    # replay the operator's deterministic order: (seeded hash, doc_id)
    order = {
        r["doc_id"]: (r["h"], r["doc_id"])
        for r in docs.select(
            "doc_id",
            seeded_col(F.col("doc_id").cast("string"), "pack").alias("h"),
        ).collect()
    }
    want = {}
    text_by_id = {d: t for d, _, t in rows}
    for g in {r[1] for r in rows}:
        members = sorted((d for d, src, _ in rows if src == g),
                         key=lambda d: order[d])
        counts = [len(text_by_id[m].split()) for m in members]
        for i, seq, s, e in _sequence_slices(counts, L):
            want[(members[i], seq)] = (s, e)
    assert got == want


@given(st.lists(st.integers(min_value=0, max_value=400), min_size=1,
                max_size=60),
       st.integers(min_value=1, max_value=300))
@settings(max_examples=200, deadline=None)
def test_sequence_packing_invariants(counts, L):
    rows = _sequence_slices(counts, L)
    per_doc: dict = {}
    per_seq: dict = {}
    for i, seq, s, e in rows:
        assert 0 <= s < e <= counts[i]
        per_doc.setdefault(i, []).append((s, e))
        per_seq[seq] = per_seq.get(seq, 0) + (e - s)
    total = sum(c for c in counts if c > 0)
    # full contiguous coverage of every non-empty doc
    for i, slices in per_doc.items():
        slices.sort()
        assert slices[0][0] == 0 and slices[-1][1] == counts[i]
        assert all(a[1] == b[0] for a, b in zip(slices, slices[1:]))
    # every sequence except the last is exactly L tokens
    if per_seq:
        last = max(per_seq)
        for seq, tok in per_seq.items():
            assert tok == L or (seq == last and tok == total - last * L)


# ---------------------------------------------------------------------------
# assign_splits cutoffs
# ---------------------------------------------------------------------------


def _split_of(h, fractions):
    """Pure twin of curation.assign_splits' when-chain."""
    cutoffs, acc = [], 0.0
    names = list(fractions)
    for name in names:
        acc += fractions[name]
        cutoffs.append(round(acc * 1_000_000))
    for name, cut in zip(names[:-1], cutoffs[:-1]):
        if h < cut:
            return name
    return names[-1]


def test_split_twin_matches_operator(spark):
    """Anchor: the pure twin reproduces curation.assign_splits on real
    hashes for a non-default fraction dict."""
    from pyspark.sql import functions as F

    from xcrawl3r_spark.functions.hashing import seeded as seeded_col
    from xcrawl3r_spark.operators import curation

    docs = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long")
    fr = {"a": 0.6, "b": 0.3, "c": 0.1}
    got = {r["doc_id"]: r["split"]
           for r in curation.assign_splits(docs, fractions=fr).collect()}
    hs = {r["doc_id"]: r["h"] % 1_000_000
          for r in docs.select(
              "doc_id",
              seeded_col(F.col("doc_id").cast("string"), "split").alias("h"),
          ).collect()}
    assert got == {d: _split_of(h, fr) for d, h in hs.items()}
    assert len(set(got.values())) == 3       # all intervals hit at n=500


@given(st.lists(st.floats(min_value=0.01, max_value=1.0), min_size=1,
                max_size=6),
       st.integers(min_value=0, max_value=999_999))
@settings(max_examples=300, deadline=None)
def test_split_assignment_disjoint_complete(raw_fracs, h):
    """Exactly ONE split claims any hash h (complete: the chain always
    returns; disjoint: the chosen interval's lower cutoffs all exclude
    h), and monotone: a larger h never maps to an earlier interval."""
    total = sum(raw_fracs)
    fracs = {f"s{i}": f / total for i, f in enumerate(raw_fracs)}
    name = _split_of(h, fracs)
    assert name in fracs                     # complete
    cutoffs, acc = [], 0.0
    names = list(fracs)
    for n_ in names:
        acc += fracs[n_]
        cutoffs.append(round(acc * 1_000_000))
    idx = names.index(name)
    for i in range(idx):
        assert h >= cutoffs[i]               # earlier intervals exclude h
    if idx < len(names) - 1:
        assert h < cutoffs[idx]              # chosen interval contains h
    if h + 1 <= 999_999:
        nxt = _split_of(h + 1, fracs)
        assert names.index(nxt) >= idx       # monotone in h


# ---------------------------------------------------------------------------
# robots pattern -> regex conversion
# ---------------------------------------------------------------------------

_PATTERNS = ["/", "/a", "/a/b", "/*.pdf$", "/tmp/*", "/x+y/*", "/a$",
             "/(z)/f", "/[b]", "/a|b", "/a^b", "/a\\b", "/end$", "/*mid*"]


def test_robots_regex_column_matches_python_twin(spark):
    """Anchor: the engine's native robots_pattern_regex column produces
    the SAME regex string as the Python twin the oracle embeds
    (__spark_entry__._robots_re) for every fixture pattern."""
    from pyspark.sql import functions as F

    from xcrawl3r_spark.operators.politeness import robots_pattern_regex

    df = spark.createDataFrame([(p,) for p in _PATTERNS], "p string")
    got = {r["p"]: r["rx"]
           for r in df.select(
               "p", robots_pattern_regex(F.col("p")).alias("rx")).collect()}
    assert got == {p: _robots_re(p) for p in _PATTERNS}


_path_chars = st.text(
    alphabet="abz0.+?()[]{}^$|\\/-_", min_size=0, max_size=12)


@given(_path_chars)
@settings(max_examples=300, deadline=None)
def test_robots_literal_pattern_matches_exactly_its_prefixes(body):
    """A pattern without wildcards (and no trailing end-anchor) matches a
    path iff the path starts with it — regex specials stay literal.
    ('$' is stripped too: a trailing '$' is legitimately the RFC end
    anchor, a different contract than prefix matching.)"""
    import re

    pattern = "/" + body.replace("*", "").replace("$", "")
    rx = re.compile(_robots_re(pattern))
    assert rx.search(pattern)                      # matches itself
    assert rx.search(pattern + "/suffix")          # and any extension
    assert not rx.search("Q" + pattern)            # anchored at start


@given(_path_chars, _path_chars)
@settings(max_examples=300, deadline=None)
def test_robots_star_spans_any_middle(prefix, middle):
    import re

    p = "/" + prefix.replace("*", "").replace("$", "")
    rx = re.compile(_robots_re(p + "*end$"))
    assert rx.search(p + middle.replace("\n", "") + "end")
    assert not rx.search(p + middle + "end-with-more")


# ---------------------------------------------------------------------------
# batched image kernels == per-row kernels, arbitrary dims (real code on
# both sides — the anchor and the property in one)
# ---------------------------------------------------------------------------


@given(st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=6),
       st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=60, deadline=None)
def test_batch_kernels_bit_identical(w, h, n, seed0):
    from xcrawl3r_spark.functions.imagecodec import (
        phash64, phash64_batch, synth_pixels, synth_pixels_batch)

    ids = [f"i{seed0}_{j}" for j in range(n)]
    batch = synth_pixels_batch(ids, w, h)
    for j, i in enumerate(ids):
        assert np.array_equal(batch[j], synth_pixels(i, w, h))
    ph = phash64_batch(batch)
    for j in range(n):
        assert int(ph[j]) == phash64(batch[j])
