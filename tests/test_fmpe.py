"""fMPE feature-space discriminative transform (transform/fmpe.{h,cc}).

Oracles: identity at zero projection, the smoothing operator's true
adjoint (gradient correctness), planted-objective improvement over
update rounds, serialization round-trip.
"""

import numpy as np
import pytest

from kaldi_tpu.am.fmpe import (Fmpe, FmpeAccs, _smooth,
                               _smooth_transpose, accumulate_fmpe,
                               apply_fmpe, fmpe_init, fmpe_offsets,
                               fmpe_update, read_fmpe, write_fmpe)
from kaldi_tpu.am.gmm import AmDiagGmm


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _ubm(rng, G=8, D=3):
    return AmDiagGmm(rng.dirichlet(np.ones(G))[None, :],
                     rng.standard_normal((1, G, D)),
                     0.5 + rng.random((1, G, D)))


def test_zero_proj_is_identity(rng):
    fm = fmpe_init(_ubm(rng))
    x = rng.standard_normal((20, 3)).astype(np.float32)
    np.testing.assert_allclose(apply_fmpe(fm, x), x, atol=1e-6)


def test_smooth_adjoint(rng):
    """<smooth(a), b> == <a, smooth_transpose(b)> — the adjoint the
    gradient accumulation relies on."""
    for C in (1, 2, 3):
        a = rng.standard_normal((11, 4))
        b = rng.standard_normal((11, 4))
        lhs = float((_smooth(a, C) * b).sum())
        rhs = float((a * _smooth_transpose(b, C)).sum())
        assert lhs == pytest.approx(rhs, rel=1e-10)


def test_fmpe_learns_planted_offset(rng):
    """Two pdfs at ±a; frames at the origin; diff posteriors pull each
    frame toward its true pdf — the trained offsets must move frames
    toward the correct means, raising the correct-pdf loglike."""
    D = 2
    a = 1.5
    am = AmDiagGmm(np.ones((2, 1)),
                   np.stack([np.full((1, D), -a), np.full((1, D), a)]),
                   np.ones((2, 1, D)))
    ubm = _ubm(rng, G=6, D=D)
    fm = fmpe_init(ubm, gselect_n=3, context=1)
    T = 60
    labels = (np.arange(T) // 10) % 2
    x = (0.3 * rng.standard_normal((T, D))).astype(np.float32)
    diff_post = [[(int(l), 1.0), (int(1 - l), -1.0)] for l in labels]

    def objf(feats):
        ll = np.asarray(am.loglikes(feats))
        return float(ll[np.arange(T), labels].mean()
                     - ll[np.arange(T), 1 - labels].mean())

    before = objf(x)
    for _ in range(20):
        accs = FmpeAccs.zeros(fm.num_gauss, fm.dim)
        accumulate_fmpe(fm, am, apply_fmpe(fm, x), diff_post, accs)
        step = fmpe_update(fm, accs, learning_rate=0.5)
        assert step > 0
    after = objf(apply_fmpe(fm, x))
    # the (pos−neg)/(pos+neg) rule bounds each element's step by lr,
    # so gains accrue across rounds (Kaldi runs ~8 outer iterations)
    assert after > before + 0.3, (before, after)
    # offsets point in the right direction per label
    off = fmpe_offsets(fm, x)
    signs = np.where(labels[:, None] == 0, -1.0, 1.0)
    assert (off * signs).mean() > 0


def test_fmpe_serialization_roundtrip(tmp_path, rng):
    fm = fmpe_init(_ubm(rng), gselect_n=4, context=2)
    fm.proj = rng.standard_normal(fm.proj.shape)
    p = str(tmp_path / "f.fmpe")
    write_fmpe(p, fm)
    fm2 = read_fmpe(p)
    assert fm2.gselect_n == 4 and fm2.context == 2
    np.testing.assert_allclose(fm2.proj, fm.proj)
    np.testing.assert_allclose(fm2.ubm.means, fm.ubm.means)
    x = rng.standard_normal((15, fm.dim)).astype(np.float32)
    np.testing.assert_allclose(apply_fmpe(fm2, x), apply_fmpe(fm, x),
                               atol=1e-6)
