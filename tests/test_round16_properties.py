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


# ---------------------------------------------------------------------------
# r16 third wave: rank-correlation contingency algebra
# ---------------------------------------------------------------------------

_ab_rows = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 5)),
    min_size=1, max_size=70,
)


def _rankcorr_cells_algebra(rows):
    """Driver-side replica of rankcorr_from_counts: densified-grid
    dominance sweep for P/Q, doubled tie terms, doubled average
    ranks, and the exact final float expressions."""
    from collections import Counter

    cells = Counter(rows)
    das = sorted({a for a, _ in cells})
    dbs = sorted({b for _, b in cells})
    n_by = {(a, b): cells.get((a, b), 0) for a in das for b in dbs}
    # cb_lt/cb_gt per a-row, then prefix over a per b-column
    p_sum = q_sum = 0
    for bi, b in enumerate(dbs):
        acc_lt = acc_gt = 0
        for a in das:
            row = [n_by[(a, bb)] for bb in dbs]
            cb_lt = sum(row[:bi])
            cb_gt = sum(row[bi + 1:])
            p_sum += n_by[(a, b)] * acc_lt
            q_sum += n_by[(a, b)] * acc_gt
            acc_lt += cb_lt
            acc_gt += cb_gt
    n = sum(cells.values())
    ra = Counter(a for a, _ in rows)
    rb = Counter(b for _, b in rows)
    da2 = n * (n - 1) - sum(r * (r - 1) for r in ra.values())
    db2 = n * (n - 1) - sum(r * (r - 1) for r in rb.values())

    def dranks(marg, keys):
        out, below = {}, 0
        for k in keys:
            out[k] = 2 * below + marg[k] + 1
            below += marg[k]
        return out

    dra = dranks(ra, das)
    drb = dranks(rb, dbs)
    s1 = sa = sb = saa = sbb = sab = 0
    for (a, b), c in cells.items():
        s1 += c
        sa += c * dra[a]
        sb += c * drb[b]
        saa += c * dra[a] * dra[a]
        sbb += c * drb[b] * drb[b]
        sab += c * dra[a] * drb[b]
    if da2 <= 0 or db2 <= 0:
        return n, None, None
    tau = (2.0 * (float(p_sum) - float(q_sum))
           / (math.sqrt(float(da2)) * math.sqrt(float(db2))))
    rho = ((float(s1) * float(sab) - float(sa) * float(sb))
           / (math.sqrt(float(s1) * float(saa)
                        - float(sa) * float(sa))
              * math.sqrt(float(s1) * float(sbb)
                          - float(sb) * float(sb))))
    return n, tau, rho


def _rankcorr_pair_brute(rows):
    """tau-b by O(n^2) pair loop; Spearman by average ranks +
    Pearson — first principles, no contingency table."""
    n = len(rows)
    a = [x for x, _ in rows]
    b = [y for _, y in rows]
    p = q = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (a[i] - a[j]) * (b[i] - b[j])
            if s > 0:
                p += 1
            elif s < 0:
                q += 1
    from collections import Counter

    da2 = n * (n - 1) - sum(r * (r - 1) for r in Counter(a).values())
    db2 = n * (n - 1) - sum(r * (r - 1) for r in Counter(b).values())
    if da2 <= 0 or db2 <= 0:
        return n, None, None
    tau = 2.0 * (p - q) / math.sqrt(da2 * db2)

    def ranks(xs):
        order = sorted(range(n), key=lambda i: xs[i])
        out = [0.0] * n
        i = 0
        while i < n:
            j = i
            while j < n and xs[order[j]] == xs[order[i]]:
                j += 1
            for k in range(i, j):
                out[order[k]] = (i + j - 1) / 2.0 + 1.0
            i = j
        return out

    ra, rb = ranks(a), ranks(b)
    ma, mb = sum(ra) / n, sum(rb) / n
    cov = sum((x - ma) * (y - mb) for x, y in zip(ra, rb))
    va = sum((x - ma) ** 2 for x in ra)
    vb = sum((y - mb) ** 2 for y in rb)
    rho = cov / math.sqrt(va * vb)
    return n, tau, rho


@settings(max_examples=400, deadline=None)
@given(_ab_rows)
def test_rankcorr_algebra_matches_pair_brute_force(rows):
    n1, t1, r1 = _rankcorr_cells_algebra(rows)
    n2, t2, r2 = _rankcorr_pair_brute(rows)
    assert n1 == n2
    if t2 is None:
        assert t1 is None and r1 is None
    else:
        assert math.isclose(t1, t2, rel_tol=0, abs_tol=1e-9)
        assert math.isclose(r1, r2, rel_tol=0, abs_tol=1e-9)
        assert -1.0 - 1e-9 <= t1 <= 1.0 + 1e-9
        assert -1.0 - 1e-9 <= r1 <= 1.0 + 1e-9


@settings(max_examples=200, deadline=None)
@given(_ab_rows, _ab_rows)
def test_rankcorr_cell_state_is_merge_associative(rows_a, rows_b):
    # The streaming contract driver-side: cells(batch0) + cells(
    # batch1) summed per key == cells(union) — and therefore the
    # final statistics agree however the stream was chunked.
    from collections import Counter

    merged = Counter(rows_a)
    merged.update(rows_b)
    assert merged == Counter(rows_a + rows_b)
    assert (_rankcorr_cells_algebra(rows_a + rows_b)
            == _rankcorr_cells_algebra(list(rows_a) + list(rows_b)))


@settings(max_examples=300, deadline=None)
@given(_ab_rows)
def test_rankcorr_invariant_under_monotone_transforms(rows):
    # The defining property of RANK statistics: strictly monotone
    # re-scaling of either axis (here x -> 3x + 1 and y -> y^3 on
    # non-negative ints, both strictly increasing) changes neither
    # tau-b nor Spearman rho — value-sensitive Pearson would move.
    base = _rankcorr_cells_algebra(rows)
    warped = _rankcorr_cells_algebra(
        [(3 * a + 1, b ** 3) for a, b in rows]
    )
    n1, t1, r1 = base
    n2, t2, r2 = warped
    assert n1 == n2
    if t1 is None:
        assert t2 is None and r2 is None
    else:
        assert math.isclose(t1, t2, rel_tol=0, abs_tol=1e-12)
        assert math.isclose(r1, r2, rel_tol=0, abs_tol=1e-12)
