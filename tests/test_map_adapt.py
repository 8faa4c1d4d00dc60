"""MAP adaptation (am/gmm.map_update + gmm-adapt-map CLI): prior
interpolation semantics and adaptation gains on shifted data."""

import numpy as np
import pytest

from kaldi_tpu.am.gmm import (AmDiagGmm, GmmAccs, accumulate_stats,
                              map_update)


def _model_and_data(rng, shift=1.5):
    D, P = 4, 3
    am = AmDiagGmm.flat_start(P, np.zeros(D), np.ones(D), perturb=0.3,
                              seed=0)
    ali = np.repeat(np.arange(P), 60).astype(np.int32)
    feats = (am.means[ali, 0] + shift
             + 0.3 * rng.standard_normal((len(ali), D))
             ).astype(np.float32)
    return am, feats, ali


def test_map_interpolates_toward_prior():
    """τ → ∞ keeps the prior means; τ = 0⁺ ≈ the ML estimate; the
    update is exactly the Gauvain–Lee convex combination."""
    rng = np.random.default_rng(0)
    am, feats, ali = _model_and_data(rng)
    accs = GmmAccs.zeros(3, am.means.shape[1], 4)
    accumulate_stats(am, feats, ali, accs)
    prior = am.means.copy()
    ml = accs.mean_acc / np.maximum(accs.occ, 1e-10)[..., None]

    import copy
    big = copy.deepcopy(am)
    map_update(big, accs, mean_tau=1e9)
    np.testing.assert_allclose(big.means, prior, atol=1e-4)

    small = copy.deepcopy(am)
    map_update(small, accs, mean_tau=1e-6)
    np.testing.assert_allclose(small.means[accs.occ > 0],
                               ml[accs.occ > 0], atol=1e-3)

    mid = copy.deepcopy(am)
    tau = 20.0
    map_update(mid, accs, mean_tau=tau)
    occ = accs.occ[..., None]
    expect = (occ * ml + tau * prior) / (occ + tau)
    np.testing.assert_allclose(mid.means[accs.occ > 0],
                               expect[accs.occ > 0], atol=1e-4)


def test_map_improves_loglike_on_shifted_data():
    rng = np.random.default_rng(1)
    am, feats, ali = _model_and_data(rng, shift=1.5)

    def avg_ll(m):
        ll = np.asarray(m.loglikes(feats))
        return float(ll[np.arange(len(ali)), ali].mean())

    before = avg_ll(am)
    accs = GmmAccs.zeros(3, am.means.shape[1], 4)
    accumulate_stats(am, feats, ali, accs)
    map_update(am, accs, mean_tau=10.0)
    assert avg_ll(am) > before + 0.5


def test_cli_gmm_adapt_map(tmp_path):
    from kaldi_tpu.am.serialize import read_mdl, write_mdl
    from kaldi_tpu.am.topology import HmmTopology
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.am.tree import MonophoneContextDependency
    from kaldi_tpu.cli import TOOLS
    from kaldi_tpu.core.table import TableWriter

    rng = np.random.default_rng(2)
    phones = [1, 2]
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(4), np.ones(4),
                              perturb=0.2, seed=1)
    mdl_in = str(tmp_path / "in.mdl")
    mdl_out = str(tmp_path / "out.mdl")
    write_mdl(mdl_in, tm, am)
    # tid alignment + shifted feats
    tid_of = {}
    for tid in range(1, tm.num_transition_ids + 1):
        if not tm.is_self_loop(tid):
            tid_of.setdefault(tm.transition_id_to_phone(tid), tid)
    tids = np.asarray([tid_of[1]] * 20 + [tid_of[2]] * 20, np.int32)
    pdfs = tm.tid_to_pdf_array[tids]
    feats = (am.means[pdfs, 0] + 1.0
             + 0.2 * rng.standard_normal((40, 4))).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u0"] = feats
    with TableWriter(f"ark:{tmp_path}/a.ark", holder="ivec") as w:
        w["u0"] = tids
    rc = TOOLS["gmm-adapt-map"](
        ["--mean-tau=5.0", mdl_in, f"ark:{tmp_path}/f.ark",
         f"ark:{tmp_path}/a.ark", mdl_out])
    assert rc == 0
    _, adapted = read_mdl(mdl_out)
    moved = np.abs(adapted.means - am.means).max()
    assert moved > 0.3        # means moved toward the shifted data