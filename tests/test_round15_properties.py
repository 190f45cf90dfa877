"""Property-based tests (hypothesis) for the round-15 evaluation &
calibration algebra — driver-side replicas of the exact
integer/float arithmetic, thousands of cases without a Spark job per
example (Spark-side integration + oracle parity live in
tests/test_round15_ops.py)."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_label = st.sampled_from(["a", "b", "c"])
_score6 = st.integers(min_value=0, max_value=10**6).map(
    lambda k: k / 10**6
)


# ---------------------------------------------------------------------------
# auc: the tie-exact integer rank-sum form == all-pairs brute force
# ---------------------------------------------------------------------------


def _auc_integer(rows):
    """The operator's algebra: per-distinct-score (pos, neg) counts,
    U2 = sum_s pos_s * (2 * neg_below + neg_s), auc = U2/(2*np*nn)."""
    pv = {}
    for y, s in rows:
        pos, neg = pv.get(s, (0, 0))
        pv[s] = (pos + y, neg + (1 - y))
    u2 = bneg = 0
    np_ = nn = 0
    for s in sorted(pv):
        pos, neg = pv[s]
        u2 += pos * (2 * bneg + neg)
        bneg += neg
        np_ += pos
        nn += neg
    if np_ == 0 or nn == 0:
        return np_, nn, None
    return np_, nn, u2 / (2.0 * np_ * nn)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1), _score6),
                min_size=1, max_size=60))
def test_auc_integer_form_equals_all_pairs(rows):
    np_, nn, auc = _auc_integer(rows)
    pos = [s for y, s in rows if y]
    neg = [s for y, s in rows if not y]
    assert (np_, nn) == (len(pos), len(neg))
    if not pos or not neg:
        assert auc is None
        return
    brute = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p in pos for n in neg
    ) / (len(pos) * len(neg))
    # U2 is an exact integer and 2*np*nn exact, so the only float
    # step is one division — brute force sums halves, also exact in
    # binary, so the two are equal to ~1 ulp.
    assert math.isclose(auc, brute, rel_tol=0, abs_tol=1e-12)
    assert 0.0 <= auc <= 1.0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1), _score6),
                min_size=2, max_size=60))
def test_auc_counts_merge_is_chunking_invariant(rows):
    # SUM-merging per-score class counts across any split equals the
    # single-pass count — the streaming maintainer's whole argument.
    def counts(part):
        out = {}
        for y, s in part:
            pos, neg = out.get(s, (0, 0))
            out[s] = (pos + y, neg + (1 - y))
        return out

    whole = counts(rows)
    for cut in (1, len(rows) // 2, len(rows) - 1):
        merged = {}
        for part in (rows[:cut], rows[cut:]):
            for s, (pos, neg) in counts(part).items():
                mp, mn = merged.get(s, (0, 0))
                merged[s] = (mp + pos, mn + neg)
        assert merged == whole


# ---------------------------------------------------------------------------
# mcc: Gorodkin R_K reduces to binary MCC; bounds hold
# ---------------------------------------------------------------------------


def _mcc_sums(pairs):
    counts = Counter(pairs)
    s = sum(counts.values())
    c = sum(n for (a, b), n in counts.items() if a == b)
    t = Counter()
    p = Counter()
    for (a, b), n in counts.items():
        t[a] += n
        p[b] += n
    spt = sum(p[k] * t[k] for k in set(p) & set(t))
    sp2 = sum(v * v for v in p.values())
    st2 = sum(v * v for v in t.values())
    d1, d2 = s * s - sp2, s * s - st2
    if d1 <= 0 or d2 <= 0:
        return None
    return (c * s - spt) / math.sqrt(d1 * d2)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1), st.integers(0, 1)),
                min_size=2, max_size=80))
def test_mcc_multiclass_form_reduces_to_binary(pairs):
    got = _mcc_sums(pairs)
    tp = sum(1 for a, b in pairs if a == 1 and b == 1)
    tn = sum(1 for a, b in pairs if a == 0 and b == 0)
    fp = sum(1 for a, b in pairs if a == 0 and b == 1)
    fn = sum(1 for a, b in pairs if a == 1 and b == 0)
    den = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    if den == 0:
        assert got is None
        return
    want = (tp * tn - fp * fn) / math.sqrt(den)
    assert math.isclose(got, want, rel_tol=1e-12, abs_tol=1e-12)
    assert -1.0 - 1e-12 <= got <= 1.0 + 1e-12


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(_label, _label), min_size=2, max_size=80))
def test_mcc_bounds_and_perfect(pairs):
    got = _mcc_sums(pairs)
    if got is not None:
        assert -1.0 - 1e-12 <= got <= 1.0 + 1e-12
    perfect = _mcc_sums([(a, a) for a, _ in pairs])
    # all-one-class inputs are the degenerate NULL case
    assert perfect is None or math.isclose(perfect, 1.0, abs_tol=1e-12)


# ---------------------------------------------------------------------------
# group_percentile_cuts: the integer reach test picks grid quantiles
# ---------------------------------------------------------------------------


def _cuts(scores, n):
    cnt = Counter(scores)
    uniq = sorted(cnt)
    total = len(scores)
    out = []
    for i in range(1, n):
        cum = 0
        for s in uniq:
            cum += cnt[s]
            if cum * n >= i * total:
                out.append(s)
                break
    return out


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(0, 50).map(lambda k: k / 10.0),
                min_size=1, max_size=60),
       st.integers(2, 12))
def test_cut_reach_property(scores, n):
    cnt = Counter(scores)
    uniq = sorted(cnt)
    total = len(scores)
    cuts = _cuts(scores, n)
    assert len(cuts) == n - 1
    assert cuts == sorted(cuts)
    for i, cut in enumerate(cuts, start=1):
        # inclusive ECDF at the cut reaches i/n ...
        cum = sum(c for s, c in cnt.items() if s <= cut)
        assert cum * n >= i * total
        # ... and the previous distinct score does not (minimality)
        below = [s for s in uniq if s < cut]
        if below:
            cum_prev = sum(c for s, c in cnt.items() if s <= below[-1])
            assert cum_prev * n < i * total


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(0, 50).map(lambda k: k / 10.0),
                min_size=4, max_size=60))
def test_frozen_percentile_threshold_semantics(scores):
    # "keep the top ~30% of the reference" via pctile_frozen >= 0.7
    # keeps exactly the scores >= the 0.7-grid cut — the gate's
    # contract that makes the frozen threshold meaningful.
    n = 10
    cuts = _cuts(scores, n)
    thresh = cuts[6]  # the i=7 (0.7) cut
    for v in scores:
        kept = sum(1 for c in cuts if v >= c)
        assert (kept / n >= 0.7) == (v >= thresh)


# ---------------------------------------------------------------------------
# grouped ECE/Brier: group decomposition identities
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["g1", "g2"]), _label,
                          _label, _score6),
                min_size=1, max_size=60))
def test_brier_grouped_sums_decompose(rows):
    # the grouped op's per-group sums == per-group runs of the
    # ungrouped sums, and the global Brier is the count-weighted
    # mean of the per-group Briers (exact integer algebra).
    def sums(part):
        n = len(part)
        oks = sum(1 for _, a, b, _ in part if a == b)
        sq = sum(((a == b) * 10**4 - round(c * 10**4)) ** 2
                 for _, a, b, c in part)
        return n, oks, sq

    by_g: dict[str, list] = {}
    for r in rows:
        by_g.setdefault(r[0], []).append(r)
    n_all, _, sq_all = sums(rows)
    assert n_all == sum(sums(p)[0] for p in by_g.values())
    assert sq_all == sum(sums(p)[2] for p in by_g.values())
    global_brier = sq_all / (n_all * 1e8)
    weighted = sum(
        (sums(p)[0] / n_all) * (sums(p)[2] / (sums(p)[0] * 1e8))
        for p in by_g.values()
    )
    assert math.isclose(global_brier, weighted, rel_tol=1e-12,
                        abs_tol=1e-12)
