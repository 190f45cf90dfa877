"""Property-based tests (hypothesis) for the round-11 operators —
driver-side replicas of the exact kernel algebra, thousands of cases
without a Spark job per example (Spark-side integration + oracle
parity live in tests/test_round11_ops.py)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


# ---- budget_select: bin-chunked prefix sum == global prefix sum ----

def _budget_reference(rows, budget):
    # the semantic spec: one global (priority desc nulls-last, id)
    # order, running cumsum, kept while cum <= budget
    order = sorted(rows, key=lambda r: (r[2] is None, -(r[2] or 0.0),
                                        r[0]))
    out, cum = {}, 0
    for rid, toks, _p in order:
        cum += toks
        out[rid] = (cum, cum <= budget)
    return out


def _budget_binned(rows, budget, lo, hi, n_bins):
    # the Spark kernel: fixed-width bins chunk the sort; per-bin
    # cumsums + bin-total prefix offsets (same float algebra as the
    # column expressions)
    w = (hi - lo) / n_bins
    binned: dict[int, list] = {}
    for rid, toks, p in rows:
        if p is None:
            b = n_bins
        else:
            clipped = min(max(p, lo), hi)
            b = min(int(math.floor((hi - clipped) / w)), n_bins - 1)
        binned.setdefault(b, []).append((rid, toks, p))
    out, offset = {}, 0
    for b in sorted(binned):
        local = 0
        for rid, toks, p in sorted(
            binned[b], key=lambda r: (r[2] is None, -(r[2] or 0.0),
                                      r[0])
        ):
            local += toks
            cum = offset + local
            out[rid] = (cum, cum <= budget)
        offset += local
    return out


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 10**6),                       # id
            st.integers(0, 1000),                        # tokens
            st.one_of(st.none(),
                      st.floats(-50.0, 2050.0,           # priority,
                                allow_nan=False)),       # beyond clip
        ),
        max_size=120, unique_by=lambda r: r[0],
    ),
    st.integers(0, 20_000),
    st.integers(1, 64),
)
def test_budget_binned_equals_global(rows, budget, n_bins):
    # the exactness claim budget_select's docstring makes: bins only
    # CHUNK the sort — bins are disjoint descending priority ranges,
    # within-bin order is exact, so the chunked cumsum EQUALS the
    # global one for every input, including priorities outside the
    # clip range (they saturate into the edge bins but still order
    # exactly within them)... for ties the id tiebreak totalizes.
    # CAVEAT the test encodes: ties/exact-order only hold when equal
    # priorities land in the SAME bin, which clipping guarantees
    # (equal p -> equal clipped -> equal bin).
    ref = _budget_reference(rows, budget)
    got = _budget_binned(rows, budget, 0.0, 2000.0, n_bins)
    assert got == ref


# ---- cap_pairs_per_doc: bound + membership rule ---------------------

def _cap_reference(pairs, cap):
    # rank each pair from both endpoints by (weight desc, other asc);
    # keep if either endpoint ranks it within cap
    adj: dict[int, list] = {}
    for a, b, w in pairs:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    kept = set()
    for e, cands in adj.items():
        cands.sort(key=lambda c: (-c[1], c[0]))
        for other, _w in cands[:cap]:
            kept.add((min(e, other), max(e, other)))
    return kept


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40),
                  st.floats(0.0, 1.0, allow_nan=False)),
        max_size=150,
    ),
    st.integers(1, 5),
)
def test_cap_pairs_bound_and_membership(raw, cap):
    # canonicalize: a < b, drop self-pairs, dedup (keep max weight
    # for determinism)
    seen: dict[tuple, float] = {}
    for a, b, w in raw:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        seen[k] = max(seen.get(k, -1.0), w)
    pairs = [(a, b, w) for (a, b), w in seen.items()]
    kept = _cap_reference(pairs, cap)
    docs = {a for a, _b, _w in pairs} | {b for _a, b, _w in pairs}
    # the contractual bound
    assert len(kept) <= 2 * cap * max(len(docs), 1)
    # membership rule: every kept pair is within the top-cap of at
    # least one endpoint; every dropped pair is outside BOTH
    all_pairs = {(a, b) for a, b, _w in pairs}
    assert kept <= all_pairs
    for a, b, w in pairs:
        in_a = _rank_of(pairs, a, (b, w)) <= cap
        in_b = _rank_of(pairs, b, (a, w)) <= cap
        assert ((a, b) in kept) == (in_a or in_b)


def _rank_of(pairs, endpoint, cand):
    cands = []
    for a, b, w in pairs:
        if a == endpoint:
            cands.append((b, w))
        elif b == endpoint:
            cands.append((a, w))
    cands.sort(key=lambda c: (-c[1], c[0]))
    return cands.index(cand) + 1


# ---- curriculum_order: interleave position is injective -------------

@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 10**6),
                       st.floats(0, 1e6, allow_nan=False)),
             max_size=200, unique_by=lambda r: r[0]),
    st.integers(1, 16),
)
def test_curriculum_positions_injective_and_shard_sorted(rows, k):
    # shard by a stand-in hash (id * 2654435761 % 2**32 % k — any
    # deterministic map works for the algebra), rank within shard by
    # (score, id), interleave: positions must be pairwise distinct
    # and within-shard monotone in rank
    by_shard: dict[int, list] = {}
    for rid, score in rows:
        by_shard.setdefault((rid * 2654435761) % (2**32) % k,
                            []).append((rid, score))
    positions = []
    for shard, members in by_shard.items():
        members.sort(key=lambda r: (r[1], r[0]))
        for rank, (rid, _s) in enumerate(members, start=1):
            positions.append((rank - 1) * k + shard)
    assert len(positions) == len(set(positions))


# ---- ul2_plan: S regime span algebra --------------------------------

@settings(max_examples=500, deadline=None)
@given(st.integers(1, 10**4), st.integers(0, 2**52))
def test_ul2_s_span_covers_nonempty_suffix(n, h):
    # start = (h % n) + 1, len = n - (h % n): always a valid,
    # non-empty suffix ending exactly at the last word
    cut = h % n
    start, length = cut + 1, n - cut
    assert 1 <= start <= n
    assert length >= 1
    assert start + length - 1 == n
