"""Property-based tests (hypothesis) for the round-14 evaluation &
drift statistics — driver-side replicas of the exact integer/float
algebra, thousands of cases without a Spark job per example
(Spark-side integration + oracle parity live in
tests/test_round14_ops.py)."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_label = st.sampled_from(["a", "b", "c", "d"])


# ---------------------------------------------------------------------------
# classification_report: the F1 identity that keeps the module rule
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(_label, _label), min_size=1, max_size=80))
def test_f1_integer_identity_equals_harmonic_mean(pairs):
    # F1 = 2*TP/(n_pred + n_true) (one division over integer sums —
    # what the operator computes) must equal the textbook harmonic
    # mean of precision and recall wherever the latter is defined.
    n_true = Counter(a for a, _ in pairs)
    n_pred = Counter(b for _, b in pairs)
    tp = Counter(a for a, b in pairs if a == b)
    for cls in set(n_true) | set(n_pred):
        nt, np_, t = n_true[cls], n_pred[cls], tp[cls]
        f1_int = 2.0 * t / (np_ + nt)  # np_ + nt >= 1 by membership
        if np_ > 0 and nt > 0 and t > 0:
            p, r = t / np_, t / nt
            f1_hm = 2 * p * r / (p + r)
            assert math.isclose(f1_int, f1_hm, rel_tol=0, abs_tol=1e-12)
        elif t == 0:
            assert f1_int == 0.0


# ---------------------------------------------------------------------------
# expected_calibration_error: quantized-integer algebra == float def
# ---------------------------------------------------------------------------


def _ece_quantized(rows, n_bins=10):
    """The operator's algebra: 6-dp-quantized confidences summed as
    scaled integers; per-bin mean = ratio of integer sums."""
    bins: dict[int, list[int]] = {}
    for lab, pred, conf in rows:
        b = min(int(conf * n_bins), n_bins - 1)
        nb, ok, c6 = bins.get(b, (0, 0, 0))
        bins[b] = (nb + 1, ok + (lab == pred),
                   c6 + round(conf * 10**6))
    n = sum(v[0] for v in bins.values())
    ece = mx = 0.0
    for b in sorted(bins):
        nb, ok, c6 = bins[b]
        gap = abs(ok / nb - c6 / (nb * 1e6))
        ece += (nb / n) * gap
        mx = max(mx, gap)
    return ece, mx


def _ece_direct(rows, n_bins=10):
    bins: dict[int, list] = {}
    for lab, pred, conf in rows:
        b = min(int(conf * n_bins), n_bins - 1)
        bins.setdefault(b, []).append((lab == pred, conf))
    n = len(rows)
    ece = mx = 0.0
    for b, xs in bins.items():
        acc = sum(1 for ok, _ in xs if ok) / len(xs)
        cavg = sum(c for _, c in xs) / len(xs)
        gap = abs(acc - cavg)
        ece += (len(xs) / n) * gap
        mx = max(mx, gap)
    return ece, mx


_conf6 = st.integers(0, 10**6).map(lambda i: i / 10**6)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(_label, _label, _conf6),
                min_size=1, max_size=60))
def test_ece_quantized_integer_algebra_equals_float_definition(rows):
    # confidences already 6-dp: the scaled-integer per-bin sums must
    # reproduce the float-mean definition (to summation noise), and
    # the invariants 0 <= ece <= max_gap <= 1 must hold.
    eq, mq = _ece_quantized(rows)
    ed, md = _ece_direct(rows)
    assert math.isclose(eq, ed, rel_tol=0, abs_tol=1e-9)
    assert math.isclose(mq, md, rel_tol=0, abs_tol=1e-9)
    assert -1e-12 <= eq <= mq + 1e-12 <= 1 + 1e-12


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 9), min_size=10, max_size=60))
def test_ece_zero_for_perfectly_calibrated_bins(bin_choices):
    # Construct per-bin data whose accuracy EQUALS its mean
    # confidence: in bin b, use conf = (b + 0.5) / 10 for every row
    # and make exactly that fraction correct where possible — here
    # via 2 rows per chosen bin with conf c and one correct iff
    # c == 0.5, else skew with 4 rows (2c correct of 2 needs 2c int);
    # simplest exact construction: conf 0.5, one right, one wrong.
    rows = []
    for _ in bin_choices:
        rows.append(("a", "a", 0.5))
        rows.append(("a", "b", 0.5))
    ece, mx = _ece_quantized(rows)
    assert ece < 1e-9 and mx < 1e-9


# ---------------------------------------------------------------------------
# krippendorff_alpha: the S/C2 shortcut == coincidence definition
# ---------------------------------------------------------------------------


def _alpha_from_sums(units):
    N = len(units)
    R = len(units[0])
    S = sum(c * c for u in units for c in Counter(u).values())
    tot = Counter(l for u in units for l in u)
    C2 = sum(c * c for c in tot.values())
    ntot = N * R
    d_o = (N * R * R - S) / ((R - 1) * ntot)
    d_e = (ntot * ntot - C2) / (ntot * (ntot - 1))
    return d_o, (None if d_e == 0 else 1.0 - d_o / d_e)


def _alpha_coincidence(units):
    """Krippendorff's textbook nominal alpha via the coincidence
    matrix: o_ck = sum_u n_uc * n_uk / (r_u - 1) for c != k."""
    R = len(units[0])
    n_tot = sum(len(u) for u in units)
    o_off = 0.0
    for u in units:
        cnt = Counter(u)
        for c in cnt:
            for k in cnt:
                if c != k:
                    o_off += cnt[c] * cnt[k] / (R - 1)
    d_o = o_off / n_tot
    tot = Counter(l for u in units for l in u)
    d_e = sum(
        tot[c] * tot[k]
        for c in tot for k in tot if c != k
    ) / (n_tot * (n_tot - 1))
    if d_e == 0:
        return d_o, None
    return d_o, 1.0 - d_o / d_e


@settings(max_examples=300, deadline=None)
@given(st.integers(2, 4).flatmap(
    lambda r: st.lists(st.lists(_label, min_size=r, max_size=r),
                       min_size=1, max_size=25)))
def test_krippendorff_sums_equal_coincidence_definition(units):
    do_s, a_s = _alpha_from_sums(units)
    do_c, a_c = _alpha_coincidence(units)
    assert math.isclose(do_s, do_c, rel_tol=0, abs_tol=1e-12)
    if a_s is None or a_c is None:
        assert a_s is None and a_c is None
    else:
        assert math.isclose(a_s, a_c, rel_tol=0, abs_tol=1e-12)
    # perfect agreement (every unit unanimous) with >= 2 labels
    # observed overall must score exactly 1
    if all(len(set(u)) == 1 for u in units) and len(
            {u[0] for u in units}) >= 2:
        assert a_s == 1.0


# ---------------------------------------------------------------------------
# psi_drift: symmetry, nonnegativity, zero at equality
# ---------------------------------------------------------------------------


def _psi(ca, cb, s=0.5):
    B = len(ca)
    na, nb = sum(ca), sum(cb)
    out = 0.0
    for x, y in zip(ca, cb):
        p = (x + s) / (na + s * B)
        q = (y + s) / (nb + s * B)
        out += (p - q) * math.log(p / q)
    return out


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)),
                min_size=2, max_size=20))
def test_psi_symmetric_nonnegative_zero_at_equal(bins):
    ca = [a for a, _ in bins]
    cb = [b for _, b in bins]
    p_ab = _psi(ca, cb)
    p_ba = _psi(cb, ca)
    assert math.isclose(p_ab, p_ba, rel_tol=0, abs_tol=1e-12)
    assert p_ab >= -1e-12  # each term (p-q)ln(p/q) >= 0
    assert math.isclose(_psi(ca, ca), 0.0, abs_tol=1e-15)


# ---------------------------------------------------------------------------
# chao1: lower-bound property of the bias-corrected form
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(1, 8), min_size=1, max_size=60))
def test_chao1_at_least_observed_richness(term_counts):
    d = len(term_counts)
    f1 = sum(1 for c in term_counts if c == 1)
    f2 = sum(1 for c in term_counts if c == 2)
    chao1 = d + (f1 * (f1 - 1)) / (2.0 * (f2 + 1))
    assert chao1 >= d
    if f1 <= 1:
        assert chao1 == d  # no singleton pair evidence -> no unseen mass


# ---------------------------------------------------------------------------
# single-mine recall audit: minimal co-location rank == per-level mine
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.integers(2, 4).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.lists(  # per point: its ranked top-n cell ids
            st.lists(st.integers(0, 5), min_size=n, max_size=n,
                     unique=True),
            min_size=2, max_size=10))))
def test_min_colocation_rank_equals_per_level_membership(args):
    n_max, cells = args
    # _colev(pair) = min over shared cells of max(rank_a, rank_b)
    # (1-based); the level-n mine catches a pair iff both points
    # hold a COMMON cell within their top-n lists.
    def colev(a, b):
        best = None
        for ra, ca in enumerate(a, 1):
            for rb, cb in enumerate(b, 1):
                if ca == cb:
                    lev = max(ra, rb)
                    best = lev if best is None else min(best, lev)
        return best

    for i in range(len(cells)):
        for j in range(i + 1, len(cells)):
            cv = colev(cells[i], cells[j])
            for n in range(1, n_max + 1):
                mined = bool(set(cells[i][:n]) & set(cells[j][:n]))
                assert mined == (cv is not None and cv <= n)


# ---------------------------------------------------------------------------
# brier_score: integer squared-gap algebra == float definition
# ---------------------------------------------------------------------------


_conf4 = st.integers(0, 10**4).map(lambda i: i / 10**4)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.booleans(), _conf4),
                min_size=1, max_size=80))
def test_brier_integer_algebra_equals_float_definition(rows):
    # confidences already 4-dp: sum of integer squared gaps over
    # 1e8*n must equal the float mean of (ok - conf)^2 exactly
    # (each term is exactly representable), and 0 <= brier <= 1.
    n = len(rows)
    sq = sum((int(ok) * 10**4 - round(c * 10**4)) ** 2
             for ok, c in rows)
    b_int = sq / (n * 1e8)
    b_flt = sum((int(ok) - c) ** 2 for ok, c in rows) / n
    assert math.isclose(b_int, b_flt, rel_tol=0, abs_tol=1e-9)
    assert -1e-12 <= b_int <= 1 + 1e-12
