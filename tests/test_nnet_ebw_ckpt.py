"""Tests: xent NN training, EBW/MMI GMM update, chain checkpoint/resume."""

import numpy as np
import pytest

from kaldi_tpu.am.ebw import (
    accumulate_den_stats,
    ebw_update,
    raw_lattice_pdf_posteriors,
)
from kaldi_tpu.am.gmm import AmDiagGmm, GmmAccs, accumulate_stats
from kaldi_tpu.am.tdnn import TdnnConfig
from kaldi_tpu.lattice.lattice import Lattice, LatticeArc
from kaldi_tpu.pipelines.nnet import XentTrainConfig, XentTrainer


def test_xent_learns_separable_classes(rng):
    P, D, T = 6, 8, 400
    proto = rng.standard_normal((P, D)).astype(np.float32) * 2
    ali = rng.integers(0, P, T).astype(np.int32)
    feats = proto[ali] + 0.2 * rng.standard_normal((T, D)).astype(np.float32)
    cfg = TdnnConfig(feat_dim=D, num_pdfs=P, hidden_dim=32, bottleneck_dim=8,
                     num_layers=2, frame_subsampling_factor=1)
    tr = XentTrainer(cfg, XentTrainConfig(num_epochs=40, chunk_size=32,
                                          batch_size=8, learning_rate=3e-3))
    out = tr.train({"u1": feats}, {"u1": ali})
    assert out["frame_acc"] > 0.85
    # pseudo-loglikes rank the right pdf first on clean prototypes
    f = tr.loglikes_fn()
    ll = np.asarray(f(proto.astype(np.float32)))
    assert (np.argmax(ll, axis=1) == np.arange(P)).mean() > 0.8


def test_raw_lattice_pdf_posteriors():
    """Two-path frame lattice: posteriors split by path weight and sum
    to 1 per frame."""
    lat = Lattice()
    s = [lat.add_state() for _ in range(4)]
    lat.start = s[0]
    # frame 0: tid 1 (pdf 0) cost 0 vs tid 2 (pdf 1) cost 1
    lat.arcs[s[0]].append(LatticeArc(1, 0, 0.0, 0.0, s[1]))
    lat.arcs[s[0]].append(LatticeArc(2, 0, 1.0, 0.0, s[2]))
    # frame 1: both continue with tid 3 (pdf 2)
    lat.arcs[s[1]].append(LatticeArc(3, 0, 0.0, 0.0, s[3]))
    lat.arcs[s[2]].append(LatticeArc(3, 0, 0.0, 0.0, s[3]))
    lat.set_final(s[3])
    tid_to_pdf = np.array([0, 0, 1, 2])
    post = raw_lattice_pdf_posteriors(lat, 2, tid_to_pdf, 3)
    p0 = 1.0 / (1.0 + np.exp(-1.0))
    np.testing.assert_allclose(post[0, 0], p0, atol=1e-6)
    np.testing.assert_allclose(post[0, 1], 1 - p0, atol=1e-6)
    np.testing.assert_allclose(post[1, 2], 1.0, atol=1e-6)
    np.testing.assert_allclose(post.sum(axis=1), 1.0, atol=1e-6)


def test_ebw_update_improves_mmi(rng):
    """Numerator = true alignment; denominator = confusable posteriors.
    After EBW the correct pdf's loglike margin must grow."""
    P, M, D, T = 3, 2, 5, 600
    am = AmDiagGmm(rng.dirichlet(np.ones(M), size=P),
                   rng.standard_normal((P, M, D)) * 2.0,
                   0.8 + 0.4 * rng.random((P, M, D)))
    ali = rng.integers(0, P, T).astype(np.int32)
    comp = rng.integers(0, M, T)
    feats = (am.means[ali, comp]
             + np.sqrt(am.vars[ali, comp]) * rng.standard_normal((T, D))
             ).astype(np.float32)

    def margin():
        ll = np.asarray(am.loglikes(feats))
        correct = ll[np.arange(T), ali]
        other = np.where(np.eye(P)[ali].astype(bool), -np.inf, ll).max(1)
        return float((correct - other).mean())

    m0 = margin()
    num = GmmAccs.zeros(P, M, D)
    accumulate_stats(am, feats, ali, num)
    # denominator: smeared posteriors (competitors get mass)
    ll = np.asarray(am.loglikes(feats))
    post = np.exp(0.5 * (ll - ll.max(1, keepdims=True)))
    post /= post.sum(1, keepdims=True)
    den = GmmAccs.zeros(P, M, D)
    accumulate_den_stats(am, feats, post, den)
    ebw_update(am, num, den)
    m1 = margin()
    assert m1 > m0 + 0.05
    assert np.all(am.vars > 0)


def test_chain_checkpoint_resume(tmp_path, rng):
    from kaldi_tpu.am.chain import make_denominator_graph
    from kaldi_tpu.am.topology import HmmTopology
    from kaldi_tpu.am.tree import MonophoneContextDependency
    from kaldi_tpu.pipelines.chain import ChainEgs, ChainTrainConfig, \
        ChainTrainer

    phones = [1, 2]
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    den = make_denominator_graph([[1, 2], [2, 1]], tree, topo)
    cfg = TdnnConfig(feat_dim=6, num_pdfs=tree.num_pdfs, hidden_dim=8,
                     bottleneck_dim=4, num_layers=2,
                     frame_subsampling_factor=3)
    B, T = 4, 12
    egs = ChainEgs(
        feats=rng.standard_normal((B, T, 6)).astype(np.float32),
        pdf_ali=rng.integers(0, tree.num_pdfs, (B, T // 3)).astype(np.int32),
        mask=np.ones((B, T // 3), bool))
    t1 = ChainTrainer(cfg, den, ChainTrainConfig(num_epochs=2, batch_size=B),
                      seed=3)
    t1.train(egs, log_every=100, ckpt_dir=str(tmp_path / "ck"))

    t2 = ChainTrainer(cfg, den, ChainTrainConfig(num_epochs=2, batch_size=B),
                      seed=99)   # different init
    step = t2.restore(str(tmp_path / "ck"))
    assert step == 2
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(t1.params),
                    jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
