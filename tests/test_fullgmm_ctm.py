"""Full-covariance GMM EM + CTM word-alignment tests."""

import numpy as np
import pytest

from kaldi_tpu.am.full_gmm import AccumFullGmm, FullGmm, mle_full_gmm_update
from kaldi_tpu.am import HmmTopology, MonophoneContextDependency, TransitionModel
from kaldi_tpu.lattice.ctm import best_path_ctm
from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
from kaldi_tpu.fst.fst import SymbolTable


def test_full_gmm_em_learns_correlated_clusters(rng):
    D, M, N = 3, 2, 4000
    # two correlated clusters
    A1 = np.array([[1.0, 0.8, 0.0], [0.8, 1.0, 0.0], [0.0, 0.0, 0.3]])
    A2 = np.array([[0.5, -0.3, 0.0], [-0.3, 0.5, 0.2], [0.0, 0.2, 0.8]])
    mu1, mu2 = np.array([3.0, 0, 0]), np.array([-3.0, 0, 0])
    x1 = rng.multivariate_normal(mu1, A1, N // 2)
    x2 = rng.multivariate_normal(mu2, A2, N // 2)
    x = np.concatenate([x1, x2])
    rng.shuffle(x)

    gmm = FullGmm.from_diag(np.ones(M) / M,
                            np.stack([mu1 + 0.5, mu2 - 0.5]),
                            np.ones((M, D)))
    ll_prev = None
    for it in range(8):
        accs = AccumFullGmm(M, D)
        ll = accs.accumulate(gmm, x) / N
        if ll_prev is not None:
            assert ll >= ll_prev - 1e-6     # EM monotonicity
        ll_prev = ll
        mle_full_gmm_update(gmm, accs)
    # learned covariances must capture the correlation sign
    m_for_mu1 = int(np.argmin(np.linalg.norm(gmm.means - mu1, axis=1)))
    assert gmm.covars[m_for_mu1][0, 1] > 0.3
    # full-cov model beats the diagonal one on this data
    diag = FullGmm.from_diag(gmm.weights, gmm.means,
                             np.stack([np.diag(c) for c in gmm.covars]))
    assert gmm.loglikes(x).mean() > diag.loglikes(x).mean() + 0.05


def test_best_path_ctm():
    phones = [1, 2, 3]   # 1 = SIL
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)

    def tids_for(phone, frames):
        window = [phone]
        pdf = tree.compute(window, 0)
        ts = tm.tuple_to_transition_state(phone, 0, pdf, pdf)
        fwd = [t for t in range(tm.state2id[ts], tm.state2id[ts + 1])
               if not tm.is_self_loop(t)][0]
        slf = tm.self_loop_of(ts)
        return (fwd,) + (slf,) * (frames - 1)

    words = SymbolTable.from_list(["<eps>", "HELLO", "WORLD"])
    c = CompactLattice()
    s = [c.add_state() for _ in range(3)]
    c.start = s[0]
    # word 1: 3 sil frames + 10 speech frames; word 2: 8 speech + 2 sil
    c.arcs[s[0]].append(CompactArc(
        1, 0.0, 0.0, tids_for(1, 3) + tids_for(2, 10), s[1]))
    c.arcs[s[1]].append(CompactArc(
        2, 0.0, 0.0, tids_for(3, 8) + tids_for(1, 2), s[2]))
    c.finals[s[2]] = (0.0, 0.0, ())
    # lexicon-based realignment (the word-align-lattice path)
    prons = {1: [[2]], 2: [[3]]}
    ctm = best_path_ctm(c, tm, words, "utt1", silence_phones={1},
                        prons=prons)
    assert len(ctm) == 2
    assert ctm[0].word == "HELLO"
    assert abs(ctm[0].begin - 0.03) < 1e-9      # skips 3 sil frames
    assert abs(ctm[0].duration - 0.10) < 1e-9
    assert ctm[1].word == "WORLD"
    assert abs(ctm[1].begin - 0.13) < 1e-9
    assert abs(ctm[1].duration - 0.08) < 1e-9   # trailing sil trimmed
    line = str(ctm[0])
    assert line.startswith("utt1 1 0.03 0.10 HELLO")
    # fallback (no prons) still produces 2 entries with trimmed edges
    ctm2 = best_path_ctm(c, tm, words, "utt1", silence_phones={1})
    assert len(ctm2) == 2 and ctm2[0].word == "HELLO"
