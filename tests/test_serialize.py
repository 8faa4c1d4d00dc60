"""Model serialization round-trip tests (.mdl, tree, topology)."""

import numpy as np
import pytest

from kaldi_tpu.am import HmmTopology, MonophoneContextDependency, TransitionModel
from kaldi_tpu.am.gmm import AmDiagGmm
from kaldi_tpu.am.serialize import read_mdl, write_mdl
from kaldi_tpu.am.tree import GaussStats, build_tree


def test_mdl_roundtrip_mono(tmp_path, rng):
    phones = [1, 2, 3]
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    tm.log_probs = rng.standard_normal(tm.num_transition_ids + 1).astype(
        np.float32)
    P, M, D = tree.num_pdfs, 4, 6
    am = AmDiagGmm(rng.dirichlet(np.ones(M), size=P),
                   rng.standard_normal((P, M, D)),
                   0.5 + rng.random((P, M, D)))
    path = str(tmp_path / "final.mdl")
    write_mdl(path, tm, am)

    tm2, am2 = read_mdl(path)
    assert tm2.num_transition_ids == tm.num_transition_ids
    np.testing.assert_allclose(tm2.log_probs, tm.log_probs, rtol=1e-6)
    np.testing.assert_array_equal(tm2.tid_to_pdf_array, tm.tid_to_pdf_array)
    np.testing.assert_allclose(am2.weights, am.weights, rtol=1e-6)
    np.testing.assert_allclose(am2.means, am.means, rtol=1e-6)
    np.testing.assert_allclose(am2.vars, am.vars, rtol=1e-6)
    # loglikes agree
    x = rng.standard_normal((5, D)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(am2.loglikes(x)),
                               np.asarray(am.loglikes(x)), atol=1e-4)


def test_mdl_roundtrip_tree(tmp_path, rng):
    phones = [1, 2, 3, 4]
    topo = HmmTopology.chain(phones)
    stats = {}
    for ph in phones:
        for left in [0, 1, 2]:
            for pc in range(2):
                g = GaussStats(3)
                for _ in range(4):
                    g.accumulate(ph + rng.standard_normal(3))
                stats[((left, ph, 0), pc)] = g
    questions = [frozenset([p]) for p in phones] + [frozenset([1, 2])]
    tree = build_tree(stats, questions, 3, 1, max_leaves=10)
    tm = TransitionModel(topo, tree)
    P, M, D = tree.num_pdfs, 2, 3
    am = AmDiagGmm(rng.dirichlet(np.ones(M), size=P),
                   rng.standard_normal((P, M, D)), 0.5 + rng.random((P, M, D)))
    path = str(tmp_path / "tri.mdl")
    write_mdl(path, tm, am)
    tm2, am2 = read_mdl(path)
    # tree lookups must agree on arbitrary windows
    for w in [(0, 1, 0), (1, 2, 3), (2, 4, 1), (0, 3, 0)]:
        for pc in range(2):
            assert tm2.tree.compute(w, pc) == tm.tree.compute(w, pc)
    assert len(tm2.tuples) == len(tm.tuples)
