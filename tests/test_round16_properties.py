"""Property-based tests (hypothesis) for the round-16 PR-AUC /
calibration-drift algebra — driver-side replicas of the exact
integer/float arithmetic, thousands of cases without a Spark job per
example (Spark-side integration + oracle parity live in
tests/test_round16_ops.py)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

_score6 = st.integers(min_value=0, max_value=10**6).map(
    lambda k: k / 10**6
)
_rows = st.lists(st.tuples(st.integers(0, 1), _score6),
                 min_size=1, max_size=60)


def _ap_counts(rows):
    """The operator's algebra: per-distinct-score (pos, neg) counts,
    inclusive cumulative TP/FP descending, term = pos*(tp/(tp+fp))
    summed in score-descending order, ap = sum / n_pos."""
    pv = {}
    for y, s in rows:
        pos, neg = pv.get(s, (0, 0))
        pv[s] = (pos + y, neg + (1 - y))
    tp = fp = np_ = nn = 0
    acc = 0.0
    for s in sorted(pv, reverse=True):
        pos, neg = pv[s]
        tp += pos
        fp += neg
        acc += float(pos) * (float(tp) / float(tp + fp))
        np_ += pos
        nn += neg
    return np_, nn, (acc / np_ if np_ else None)


def _ap_rank_brute(rows):
    """AP from first principles: sort by score descending with ties
    grouped (the threshold can only sit BETWEEN distinct scores), sum
    precision-at-cut weighted by the recall step at each cut."""
    by_s = {}
    for y, s in rows:
        p, n = by_s.get(s, (0, 0))
        by_s[s] = (p + y, n + 1 - y)
    npos = sum(y for y, _ in rows)
    if npos == 0:
        return None
    tp = seen = 0
    ap = 0.0
    for s in sorted(by_s, reverse=True):
        p, n = by_s[s]
        tp += p
        seen += p + n
        ap += (p / npos) * (tp / seen)
    return ap


@settings(max_examples=300, deadline=None)
@given(_rows)
def test_pr_auc_counts_form_equals_rank_brute_force(rows):
    np_, nn, ap = _ap_counts(rows)
    assert np_ == sum(y for y, _ in rows)
    assert nn == len(rows) - np_
    brute = _ap_rank_brute(rows)
    if np_ == 0:
        assert ap is None and brute is None
        return
    assert math.isclose(ap, brute, rel_tol=0, abs_tol=1e-12)


@settings(max_examples=300, deadline=None)
@given(_rows)
def test_pr_auc_chunking_invariance(rows):
    # the state contract: counts merged from arbitrary chunkings give
    # the same AP as the single-pass build (exact — integer counts
    # merge exactly, and the final fold sees identical values in
    # identical order).
    whole = _ap_counts(rows)
    for cut in (1, len(rows) // 2, max(len(rows) - 1, 1)):
        a, b = rows[:cut], rows[cut:]
        pv = {}
        for chunk in (a, b):
            for y, s in chunk:
                pos, neg = pv.get(s, (0, 0))
                pv[s] = (pos + y, neg + (1 - y))
        merged_rows = []
        for s, (pos, neg) in pv.items():
            merged_rows += [(1, s)] * pos + [(0, s)] * neg
        assert _ap_counts(merged_rows) == whole


@settings(max_examples=300, deadline=None)
@given(_rows)
def test_pr_auc_invariant_under_monotone_score_transform(rows):
    # AP depends only on the RANKING (with ties): any strictly
    # increasing transform of the scores leaves it unchanged. The
    # transform must preserve distinctness exactly — affine does.
    base = _ap_counts(rows)
    shifted = [(y, 2.0 * s + 1.0) for y, s in rows]
    got = _ap_counts(shifted)
    assert got[0] == base[0] and got[1] == base[1]
    if base[2] is None:
        assert got[2] is None
    else:
        assert math.isclose(got[2], base[2], rel_tol=0, abs_tol=1e-12)


@settings(max_examples=300, deadline=None)
@given(_rows)
def test_pr_auc_bounds_and_degenerates(rows):
    np_, nn, ap = _ap_counts(rows)
    if np_ == 0:
        assert ap is None
        return
    # bounded by (0, 1]; equals 1.0 iff every cut that admits a
    # positive has precision 1 — in particular all-positive inputs
    assert 0.0 < ap <= 1.0
    if nn == 0:
        assert ap == 1.0
    # a single score value for everyone -> AP == prevalence
    one = [(y, 0.5) for y, _ in rows]
    prev = np_ / (np_ + nn)
    assert math.isclose(_ap_counts(one)[2], prev, abs_tol=1e-12)


@settings(max_examples=200, deadline=None)
@given(_rows)
def test_pr_auc_never_below_random_when_ranking_helps(rows):
    # adding the positives ABOVE every negative yields AP 1.0 no
    # matter what the base rows were (perfect-separation sanity on
    # arbitrary tails).
    sep = ([(1, 2.0)] * 3) + [(0, s) for _, s in rows]
    assert _ap_counts(sep)[2] == 1.0


# ---------------------------------------------------------------------------
# calibration drift: delta algebra over two frozen bin states
# ---------------------------------------------------------------------------

_conf = st.integers(min_value=0, max_value=100).map(lambda k: k / 100)
_cal_rows = st.lists(st.tuples(st.integers(0, 1), _conf),
                     min_size=1, max_size=40)


def _ece(rows, n_bins=10):
    bins = {}
    for ok, c in rows:
        b = min(max(int(c * n_bins), 0), n_bins - 1)
        nb, oks, c6 = bins.get(b, (0, 0, 0))
        bins[b] = (nb + 1, oks + ok, c6 + round(c * 1e6))
    n = sum(nb for nb, _, _ in bins.values())
    ece = 0.0
    for b in sorted(bins):
        nb, oks, c6 = bins[b]
        ece += (nb / n) * abs(oks / nb - c6 / (nb * 1e6))
    return round(ece, 6), n


@settings(max_examples=200, deadline=None)
@given(_cal_rows, _cal_rows)
def test_calibration_drift_delta_symmetry_and_identity(ref, cur):
    ece_a, _ = _ece(ref)
    ece_b, _ = _ece(cur)
    d_ab = round(abs(ece_b - ece_a), 6)
    d_ba = round(abs(ece_a - ece_b), 6)
    # |delta| is symmetric in snapshot order, zero on identity
    assert d_ab == d_ba
    assert round(abs(ece_a - ece_a), 6) == 0.0
    # classification thresholds are exclusive at the literal cuts
    level = ("stable" if d_ab < 0.02 else
             "moderate" if d_ab < 0.05 else "shifted")
    assert level in ("stable", "moderate", "shifted")
