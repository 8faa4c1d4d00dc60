"""Transform estimation tests with statistical oracles.

LDA must recover the discriminative subspace of planted data; MLLT must
improve the diagonal-GMM objective (its own objf is the certificate);
fMLLR must recover a planted affine corruption (applying the estimated
transform must raise the GMM log-likelihood back)."""

import math

import numpy as np
import pytest

from kaldi_tpu.am.gmm import AmDiagGmm
from kaldi_tpu.am.transforms import (
    FmllrAccs,
    LdaEstimate,
    MlltAccs,
    accumulate_fmllr_for_utt,
    apply_transform,
)


def test_lda_recovers_discriminative_dims(rng):
    # 3 classes separated ONLY in dims 2 and 5 of a 8-dim space
    D, N = 8, 3000
    centers = np.zeros((3, D))
    centers[0, 2], centers[1, 2], centers[2, 2] = -4, 0, 4
    centers[0, 5], centers[1, 5], centers[2, 5] = 3, -3, 0
    est = LdaEstimate(3, D)
    classes = rng.integers(0, 3, N)
    feats = centers[classes] + rng.standard_normal((N, D))
    est.accumulate_batch(feats, classes)
    lda = est.estimate(2)
    assert lda.shape == (2, D + 1)
    # projection should be dominated by dims 2 and 5
    energy = np.abs(lda[:, :D]).sum(axis=0)
    top2 = set(np.argsort(energy)[-2:])
    assert top2 == {2, 5}
    # projected class means should be well separated vs within-class std
    proj = apply_transform(feats, lda)
    means = [proj[classes == c].mean(axis=0) for c in range(3)]
    within = np.mean([proj[classes == c].std(axis=0) for c in range(3)])
    d01 = np.linalg.norm(means[0] - means[1])
    assert d01 > 3 * within


def test_mllt_improves_on_correlated_data(rng):
    """Data with correlated dims: MLLT should find a rotation with
    positive objf improvement; on already-diagonal data impr ≈ 0."""
    D, T, M = 4, 4000, 1
    A = np.eye(D) + 0.5 * rng.standard_normal((D, D)) * (1 - np.eye(D))
    lat = rng.standard_normal((T, D))
    feats = lat @ A.T                     # correlated
    mean = feats.mean(0)
    var = feats.var(0)
    accs = MlltAccs(D)
    post = np.ones((T, M))
    means = np.tile(mean, (T, M, 1))
    inv_vars = np.tile(1.0 / var, (T, M, 1))
    accs.accumulate(post, feats, means, inv_vars)
    Mmat, impr = accs.update()
    assert impr > 0.05
    # transform is invertible, roughly volume-preserving is NOT required,
    # but applying it must decorrelate: off-diag of cov shrinks
    tf = apply_transform(feats - mean, Mmat)
    c = np.corrcoef(tf.T)
    off = np.abs(c - np.diag(np.diag(c))).max()
    c0 = np.corrcoef((feats - mean).T)
    off0 = np.abs(c0 - np.diag(np.diag(c0))).max()
    assert off < off0 * 0.5


def test_fmllr_recovers_affine_corruption(rng):
    """GMM trained on clean data; speaker features = A x + b corrupted.
    The fMLLR transform must map them back (loglike recovers)."""
    D, P, M, T = 5, 3, 2, 3000
    weights = rng.dirichlet(np.ones(M), size=P)
    means = rng.standard_normal((P, M, D)) * 3
    variances = 0.5 + rng.random((P, M, D))
    am = AmDiagGmm(weights, means, variances)
    pdf_ali = rng.integers(0, P, T).astype(np.int32)
    comp = rng.integers(0, M, T)
    clean = (means[pdf_ali, comp]
             + np.sqrt(variances[pdf_ali, comp]) * rng.standard_normal((T, D)))
    # speaker corruption
    A = np.eye(D) * 1.3
    b = np.full(D, 2.0)
    corrupted = clean @ A.T + b

    def avg_ll(x):
        ll = np.asarray(am.loglikes(x.astype(np.float32)))
        return float(ll[np.arange(T), pdf_ali].mean())

    ll_clean = avg_ll(clean)
    ll_corr = avg_ll(corrupted)
    assert ll_corr < ll_clean - 1.0

    accs = FmllrAccs(D)
    accumulate_fmllr_for_utt(accs, am, corrupted.astype(np.float32), pdf_ali)
    W, impr = accs.update()
    assert impr > 0.5
    fixed = apply_transform(corrupted, W)
    ll_fixed = avg_ll(fixed)
    assert ll_fixed > ll_corr + 1.0
    assert ll_fixed > ll_clean - 0.5     # nearly full recovery


def test_fmllr_min_count_identity(rng):
    accs = FmllrAccs(4)
    W, impr = accs.update(min_count=500.0)
    np.testing.assert_array_equal(W[:, :4], np.eye(4))
    assert impr == 0.0


def test_apply_transform_shapes(rng):
    x = rng.standard_normal((10, 4)).astype(np.float32)
    lin = rng.standard_normal((3, 4))
    aff = rng.standard_normal((3, 5))
    assert apply_transform(x, lin).shape == (10, 3)
    y = apply_transform(x, aff)
    assert y.shape == (10, 3)
    np.testing.assert_allclose(y, x @ aff[:, :4].T + aff[:, 4], rtol=1e-5)
