"""Property-based tests (hypothesis) for the round-13 statistics —
driver-side replicas of the exact integer/float algebra, thousands of
cases without a Spark job per example (Spark-side integration +
oracle parity live in tests/test_round13_ops.py)."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from awskinesisconsumer_spark.operators.evaluation import (
    KS_COEF_05, POISSON1_CDF,
)

_label = st.integers(0, 4)


def _kappa_spark_algebra(pairs):
    """cohen_kappa's exact decomposition: po and pe as ratios of
    integer sums (agree count; sum over labels of marginal products),
    floats only at the end."""
    n = len(pairs)
    if n == 0:
        return None
    agree = sum(1 for a, b in pairs if a == b)
    ca = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    s_ab = sum(ca[l] * cb[l] for l in ca if l in cb)
    po = agree / n
    pe = s_ab / (n * n)
    if pe >= 1.0:
        return (po, pe, None)
    return (po, pe, (po - pe) / (1.0 - pe))


def _kappa_direct(pairs):
    """Cohen's kappa straight from the confusion-matrix definition."""
    n = len(pairs)
    cm = Counter(pairs)
    po = sum(c for (a, b), c in cm.items() if a == b) / n
    ra = Counter(a for a, _ in pairs)
    rb = Counter(b for _, b in pairs)
    pe = sum((ra[l] / n) * (rb[l] / n) for l in set(ra) | set(rb))
    if pe >= 1.0 - 1e-12:
        return (po, pe, None)
    return (po, pe, (po - pe) / (1.0 - pe))


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(_label, _label), min_size=1, max_size=60))
def test_cohen_kappa_integer_sum_algebra_equals_definition(pairs):
    po_s, pe_s, k_s = _kappa_spark_algebra(pairs)
    po_d, pe_d, k_d = _kappa_direct(pairs)
    assert po_s == po_d
    assert math.isclose(pe_s, pe_d, rel_tol=0, abs_tol=1e-12)
    if k_s is None or k_d is None:
        assert k_s is None and k_d is None
    else:
        assert math.isclose(k_s, k_d, rel_tol=0, abs_tol=1e-9)
        assert -1.0 - 1e-9 <= k_s <= 1.0 + 1e-9


@settings(max_examples=300, deadline=None)
@given(
    st.integers(1, 20),          # items
    st.integers(2, 6),           # raters per item
    st.data(),
)
def test_fleiss_kappa_sum_decomposition_equals_per_item_mean(N, n, data):
    # fleiss_kappa computes P_bar = (S - N*n) / (N*n*(n-1)) from the
    # single integer S = sum of n_ij^2; the textbook form is the mean
    # over items of P_i = (sum_j n_ij^2 - n) / (n*(n-1)). Algebraic
    # identity — must hold exactly for every ratings table.
    ratings = [
        [data.draw(_label) for _ in range(n)] for _ in range(N)
    ]
    S = sum(
        c * c for row in ratings for c in Counter(row).values()
    )
    p_bar_sum_form = (S - N * n) / (N * n * (n - 1))
    p_is = [
        (sum(c * c for c in Counter(row).values()) - n) / (n * (n - 1))
        for row in ratings
    ]
    p_bar_item_form = sum(p_is) / N
    assert math.isclose(
        p_bar_sum_form, p_bar_item_form, rel_tol=0, abs_tol=1e-12
    )
    assert 0.0 <= p_bar_sum_form <= 1.0 + 1e-12


def test_poisson1_cdf_literals_are_the_true_cumulative_masses():
    # The shared inverse-CDF ladder must BE Poisson(1)'s cumulative
    # masses: CDF[k] = e^-1 * sum_{i<=k} 1/i! — the literals are
    # copied into SQL twins, so a typo would silently skew every
    # bootstrap weight on both engines equally and never be caught
    # by parity.
    acc = 0.0
    for k, lit in enumerate(POISSON1_CDF):
        acc += math.exp(-1.0) / math.factorial(k)
        assert math.isclose(lit, acc, rel_tol=0, abs_tol=1e-15), k
    assert POISSON1_CDF[-1] > 0.999998  # ladder covers the tail


@settings(max_examples=500, deadline=None)
@given(st.floats(min_value=0.0, max_value=1.0, exclude_max=True))
def test_poisson_ladder_draw_is_the_inverse_cdf(u):
    # bootstrap_ci's WHEN-fold: w = k iff CDF[k-1] <= u < CDF[k],
    # with u past the last threshold drawing len(ladder).
    w = len(POISSON1_CDF)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        if u < POISSON1_CDF[k]:
            w = k
    lo = POISSON1_CDF[w - 1] if w > 0 else 0.0
    hi = POISSON1_CDF[w] if w < len(POISSON1_CDF) else 1.0
    assert lo <= u < hi


@settings(max_examples=300, deadline=None)
@given(
    st.floats(min_value=0.5, max_value=0.999),
    st.integers(2, 2000),
)
def test_bootstrap_rank_bounds(conf, B):
    # The normalized tail mass must give ranks inside [1, B] with
    # lo <= hi for every (conf, replicate count) — the rank math the
    # Spark side and the SQL twin both evaluate.
    alpha = round((1.0 - conf) / 2.0, 9)
    lo = max(math.ceil(alpha * B), 1)
    hi = math.ceil((1.0 - alpha) * B)
    assert 1 <= lo <= hi <= B


def _ks_direct(xs, ys):
    """Two-sample KS straight from the definition: sup over observed
    points of |ECDF_a - ECDF_b|."""
    d = 0.0
    for v in sorted(set(xs) | set(ys)):
        fa = sum(1 for x in xs if x <= v) / len(xs)
        fb = sum(1 for y in ys if y <= v) / len(ys)
        d = max(d, abs(fa - fb))
    return d


def _ks_cumulative_algebra(xs, ys):
    """ks_statistic's decomposition: per DISTINCT value, cumulative
    integer counts over value order, gap as a ratio of exact ints."""
    ca = Counter(xs)
    cb = Counter(ys)
    na, nb = len(xs), len(ys)
    cum_a = cum_b = 0
    d = 0.0
    for v in sorted(set(ca) | set(cb)):
        cum_a += ca.get(v, 0)
        cum_b += cb.get(v, 0)
        d = max(d, abs(cum_a / na - cum_b / nb))
    return d


_vals = st.integers(-50, 50)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(_vals, min_size=1, max_size=80),
    st.lists(_vals, min_size=1, max_size=80),
)
def test_ks_cumulative_counts_equal_definition(xs, ys):
    d_alg = _ks_cumulative_algebra(xs, ys)
    d_def = _ks_direct(xs, ys)
    assert math.isclose(d_alg, d_def, rel_tol=0, abs_tol=1e-12)
    assert 0.0 <= d_alg <= 1.0 + 1e-12
    # identical samples -> 0; disjoint supports -> 1
    assert _ks_cumulative_algebra(xs, xs) == 0.0
    ys_disjoint = [y + 200 for y in ys]
    assert _ks_cumulative_algebra(xs, ys_disjoint) == 1.0


def test_ks_critical_coefficient_literal():
    # c(0.05) = sqrt(-ln(0.025) / 2), shared with the SQL twins.
    assert math.isclose(
        KS_COEF_05, math.sqrt(-math.log(0.025) / 2.0),
        rel_tol=0, abs_tol=1e-15,
    )


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(0, 10 ** 9), min_size=1, max_size=100),
    st.integers(1, 6),
    st.data(),
)
def test_minhash_min_of_mins_is_global_min(hashes, n_shards, data):
    # minhash_sketch_merge's exact identity, per permutation
    # component: min over per-shard mins == min over the union —
    # for EVERY way the rows land on shards.
    shard_of = [data.draw(st.integers(0, n_shards - 1)) for _ in hashes]
    shards: dict[int, list[int]] = {}
    for h, s in zip(hashes, shard_of):
        shards.setdefault(s, []).append(h)
    merged = min(min(v) for v in shards.values())
    assert merged == min(hashes)
