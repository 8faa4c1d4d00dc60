"""Regression-tree MLLR (am/regtree.py — RegressionTree +
RegtreeMllrDiagGmm role, src/transform/regression-tree.h)."""

import numpy as np
import pytest

from kaldi_tpu.am.gmm import AmDiagGmm
from kaldi_tpu.am.regtree import (RegressionTree, RegtreeMllr,
                                  RegtreeMllrAccs)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_two_group_am(rng, D=4):
    """4 pdfs × 2 mixtures: pdfs 0-1 cluster near -5, pdfs 2-3 near +5
    (well-separated so a 2-class tree splits them cleanly)."""
    P, M = 4, 2
    means = np.zeros((P, M, D))
    for p in range(P):
        base = -5.0 if p < 2 else 5.0
        # mixtures well separated (vs var 0.25) so mixture posteriors
        # are crisp — mean recovery is only testable without heavy
        # soft-assignment bias
        means[p] = base + 3.0 * rng.standard_normal((M, D))
    weights = np.full((P, M), 0.5)
    variances = np.full((P, M, D), 0.25)
    return AmDiagGmm(weights, means, variances)


def sample_speaker_data(rng, am, shifts, T=600):
    """Draw frames from the SHIFTED model: group g of pdfs gets its
    means moved by shifts[g] (the planted per-class corruption)."""
    P, M, D = am.means.shape
    ali = rng.integers(0, P, T).astype(np.int32)
    feats = np.empty((T, D), np.float32)
    for t, p in enumerate(ali):
        m = int(rng.integers(M))
        mu = am.means[p, m] + shifts[0 if p < 2 else 1]
        feats[t] = mu + rng.standard_normal(D) * np.sqrt(am.vars[p, m])
    return feats, ali


def avg_loglike(am, feats, ali):
    lls = np.asarray(am.loglikes(feats))
    return float(lls[np.arange(len(ali)), ali].mean())


def adapt(am, feats, ali, num_classes, min_count=10.0):
    tree = RegressionTree.build(am, num_base_classes=num_classes)
    accs = RegtreeMllrAccs(tree, am.means.shape[2])
    accs.accumulate(am, feats, ali)
    return accs.estimate(min_count=min_count)


def adapt_em(am, feats, ali, num_classes, iters=2):
    """Two MLLR EM passes (re-accumulate posteriors under the adapted
    model) — converged by the second, like the shell recipes' repeated
    est_mllr."""
    cur = am
    for _ in range(iters):
        cur = adapt(cur, feats, ali, num_classes).transform_model(cur)
    return cur


def test_regtree_recovers_per_class_shifts(rng):
    am = make_two_group_am(rng)
    shifts = np.array([[2.0, -1.0, 0.5, 0.0],
                       [-1.5, 2.5, 0.0, 1.0]])
    feats, ali = sample_speaker_data(rng, am, shifts, T=2400)
    base = avg_loglike(am, feats, ali)

    adapted = adapt_em(am, feats, ali, num_classes=2)
    post = avg_loglike(adapted, feats, ali)
    assert post > base + 5.0, (base, post)

    # the recovered transform moves each group's means close to the
    # planted shifted means
    for p in (0, 3):
        g = 0 if p < 2 else 1
        got = adapted.means[p]
        want = am.means[p] + shifts[g]
        assert np.abs(got - want).max() < 0.5


def test_two_classes_beat_global_when_shifts_differ(rng):
    am = make_two_group_am(rng)
    shifts = np.array([[3.0, 0.0, 0.0, 0.0],
                       [-3.0, 0.0, 0.0, 0.0]])   # opposite shifts
    feats, ali = sample_speaker_data(rng, am, shifts, T=2400)
    base = avg_loglike(am, feats, ali)
    l1 = avg_loglike(adapt_em(am, feats, ali, 1), feats, ali)
    l2 = avg_loglike(adapt_em(am, feats, ali, 2), feats, ali)
    # both adapt massively vs the unadapted model...
    assert l1 > base + 10.0 and l2 > base + 10.0, (base, l1, l2)
    # ...but a single global mean-MLLR must act as identity on the
    # within-group mean subspaces (they jointly span R^D), so it can
    # only compromise between the opposite per-group shifts; the
    # 2-class tree expresses both exactly
    assert l2 > l1 + 0.3, (l1, l2)


def test_min_count_gating_falls_back_to_ancestor(rng):
    am = make_two_group_am(rng)
    shifts = np.zeros((2, 4))
    feats, ali = sample_speaker_data(rng, am, shifts, T=80)
    tree = RegressionTree.build(am, num_base_classes=2)
    accs = RegtreeMllrAccs(tree, am.means.shape[2])
    accs.accumulate(am, feats, ali)
    # absurd min_count: nothing estimable → identity everywhere
    mllr = accs.estimate(min_count=1e9)
    np.testing.assert_allclose(mllr.transform_model(am).means, am.means,
                               atol=1e-9)
    # min_count above every LEAF's occupancy but at most the root's
    # summed total → leaves inherit the root transform (accs.beta is
    # per-leaf; estimate() sums bottom-up internally)
    mc = float(accs.beta.max()) + 1.0
    assert mc <= accs.beta.sum()
    mllr = accs.estimate(min_count=mc)
    W = mllr.W
    for n, ch in enumerate(tree.children):
        if ch is None and n != 0:
            np.testing.assert_allclose(W[n], W[0])


def test_accs_merge_equals_joint(rng):
    am = make_two_group_am(rng)
    shifts = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0]])
    f1, a1 = sample_speaker_data(rng, am, shifts, T=200)
    f2, a2 = sample_speaker_data(rng, am, shifts, T=200)
    tree = RegressionTree.build(am, num_base_classes=2)
    D = am.means.shape[2]
    joint = RegtreeMllrAccs(tree, D)
    joint.accumulate(am, np.concatenate([f1, f2]),
                     np.concatenate([a1, a2]))
    parts = RegtreeMllrAccs(tree, D)
    parts.accumulate(am, f1, a1)
    other = RegtreeMllrAccs(tree, D)
    other.accumulate(am, f2, a2)
    parts.merge(other)
    np.testing.assert_allclose(parts.K, joint.K, rtol=1e-8)
    np.testing.assert_allclose(parts.beta, joint.beta, rtol=1e-8)
