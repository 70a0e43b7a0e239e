"""Property-based tests (hypothesis) for the r3 pure kernels — driver-side
math whose invariants must hold for ALL inputs, not just fixtures:
split cutoffs, sequence-packing arithmetic, robots pattern conversion,
and the batched image kernels' parity with their per-row forms."""

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# pack_sequences arithmetic (pure integer form of the column expressions)
# ---------------------------------------------------------------------------


def _sequence_slices(token_counts, L):
    """Driver-side twin of curation.pack_sequences' arithmetic for one
    group: [(doc_idx, seq_id, tok_start, tok_end)]."""
    out, start = [], 0
    for i, n in enumerate(token_counts):
        if n <= 0:
            continue
        for seq in range(start // L, (start + n - 1) // L + 1):
            out.append((i, seq, max(seq * L - start, 0),
                        min((seq + 1) * L - start, n)))
        start += n
    return out


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
# assign_splits cutoffs (pure form)
# ---------------------------------------------------------------------------


@given(st.lists(st.floats(min_value=0.01, max_value=1.0), min_size=1,
                max_size=6),
       st.integers(min_value=0, max_value=999_999))
@settings(max_examples=200, deadline=None)
def test_split_cutoffs_disjoint_complete(raw_fracs, h):
    total = sum(raw_fracs)
    fracs = [f / total for f in raw_fracs]
    cutoffs, acc = [], 0.0
    for f in fracs:
        acc += f
        cutoffs.append(round(acc * 1_000_000))
    # the when-chain: first interval whose cutoff exceeds h; else last
    hits = [i for i, c in enumerate(cutoffs[:-1]) if h < c]
    chosen = hits[0] if hits else len(cutoffs) - 1
    # exactly one interval claims each h (disjoint + complete)
    assert 0 <= chosen < len(fracs)
    for i in range(chosen):
        assert h >= cutoffs[i] or i == chosen


# ---------------------------------------------------------------------------
# robots pattern -> regex conversion (Python twin of the column expr)
# ---------------------------------------------------------------------------


def _robots_re(pattern):
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    esc = re.sub(r"([\\.\[\]{}()+?^$|])", r"\\\1", body)
    return "^" + esc.replace("*", ".*") + ("$" if anchored else "")


_path_chars = st.text(
    alphabet="abz0.+?()[]{}^$|\\/-_", min_size=0, max_size=12)


@given(_path_chars)
@settings(max_examples=300, deadline=None)
def test_robots_literal_pattern_matches_exactly_its_prefixes(body):
    """A pattern without wildcards (and no trailing end-anchor) matches a
    path iff the path starts with it — regex specials stay literal.
    ('$' is stripped too: a trailing '$' is legitimately the RFC end
    anchor, a different contract than prefix matching.)"""
    pattern = "/" + body.replace("*", "").replace("$", "")
    rx = re.compile(_robots_re(pattern))
    assert rx.search(pattern)                      # matches itself
    assert rx.search(pattern + "/suffix")          # and any extension
    assert not rx.search("Q" + pattern)            # anchored at start


@given(_path_chars, _path_chars)
@settings(max_examples=300, deadline=None)
def test_robots_star_spans_any_middle(prefix, middle):
    p = "/" + prefix.replace("*", "").replace("$", "")
    rx = re.compile(_robots_re(p + "*end$"))
    assert rx.search(p + middle.replace("\n", "") + "end")
    assert not rx.search(p + middle + "end-with-more")


# ---------------------------------------------------------------------------
# batched image kernels == per-row kernels, arbitrary dims
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
