"""Chain egs archives (pipelines/egs_io.py) — round-trip through the
ark/scp table layer, training-from-disk equivalence, and the
get/copy/shuffle CLI tools."""

import numpy as np
import pytest

from kaldi_tpu.am.chain import make_denominator_graph
from kaldi_tpu.am.topology import HmmTopology
from kaldi_tpu.am.tree import MonophoneContextDependency
from kaldi_tpu.core.table import SequentialTableReader
from kaldi_tpu.pipelines.chain import make_chain_egs
from kaldi_tpu.pipelines.egs_io import read_egs_ark, write_egs_ark


@pytest.fixture
def tiny_egs():
    rng = np.random.default_rng(0)
    phones = [1, 2]
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    den = make_denominator_graph([[1, 2, 1], [2, 1, 2]], tree, topo)
    runs = {"u0": [(1, 12), (2, 12), (1, 12)],
            "u1": [(2, 15), (1, 9), (2, 12)]}
    D = 5
    feats = {u: rng.standard_normal(
        (sum(d for _, d in rr), D)).astype(np.float32)
        for u, rr in runs.items()}
    return make_chain_egs(feats, runs, tree, topo, chunk_size=18,
                          subsample=3, den=den), den, tree, topo


def test_egs_ark_roundtrip(tiny_egs, tmp_path):
    egs, _, _, _ = tiny_egs
    ark = str(tmp_path / "egs.ark")
    scp = str(tmp_path / "egs.scp")
    n = write_egs_ark(f"ark,scp:{ark},{scp}", egs)
    assert n == egs.feats.shape[0]
    back = read_egs_ark(f"ark:{ark}")
    np.testing.assert_allclose(back.feats, egs.feats, atol=1e-6)
    np.testing.assert_array_equal(back.pdf_ali, egs.pdf_ali)
    np.testing.assert_array_equal(back.mask, egs.mask)
    np.testing.assert_array_equal(back.num_segs, egs.num_segs)
    # segment arrays equal up to each chunk's true length (padding
    # beyond num_segs is not part of the contract)
    for i in range(n):
        s = int(egs.num_segs[i])
        np.testing.assert_array_equal(back.entry_pdf[i, :s],
                                      egs.entry_pdf[i, :s])
        np.testing.assert_allclose(back.entry_w[i, :s],
                                   egs.entry_w[i, :s], atol=1e-6)
        np.testing.assert_allclose(back.self_w[i, :s],
                                   egs.self_w[i, :s], atol=1e-6)
    np.testing.assert_allclose(back.init_w, egs.init_w, atol=1e-6)
    np.testing.assert_allclose(back.final_w, egs.final_w, atol=1e-6)
    # scp random access works too
    keys = [k for k, _ in SequentialTableReader(f"scp:{scp}",
                                                holder="ceg")]
    assert len(keys) == n


def test_train_from_disk_equals_memory(tiny_egs, tmp_path):
    """First-step loss from archive-loaded egs == from in-memory egs
    (the egs stage boundary is lossless where it matters)."""
    from kaldi_tpu.am.tdnn import TdnnConfig
    from kaldi_tpu.pipelines.chain import ChainTrainConfig, ChainTrainer
    egs, den, tree, topo = tiny_egs
    ark = str(tmp_path / "egs.ark")
    write_egs_ark(f"ark:{ark}", egs)
    back = read_egs_ark(f"ark:{ark}")

    def first_loss(e):
        cfg = TdnnConfig(feat_dim=e.feats.shape[-1],
                         num_pdfs=tree.num_pdfs, hidden_dim=8,
                         bottleneck_dim=4, num_layers=2,
                         frame_subsampling_factor=3)
        tr = ChainTrainer(cfg, den, ChainTrainConfig(
            num_epochs=1, batch_size=e.feats.shape[0],
            learning_rate=0.0), seed=3)
        return tr.train(e, log_every=1)["loss"]

    assert first_loss(back) == pytest.approx(first_loss(egs), abs=1e-4)


def test_cli_get_copy_shuffle(tmp_path):
    """nnet3-chain-get-egs from .mdl + feats + tid alignments on disk,
    then copy --n and shuffle preserve entries."""
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.am.serialize import write_mdl
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.cli import TOOLS
    from kaldi_tpu.core.table import TableWriter

    rng = np.random.default_rng(1)
    phones = [1, 2]
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(5), np.ones(5))
    mdl = str(tmp_path / "final.mdl")
    write_mdl(mdl, tm, am)

    # fabricate tid alignments: chain topology = forward tid then
    # self-loop tids for each phone occurrence
    fwd_tid, self_tid = {}, {}
    for tid in range(1, tm.num_transition_ids + 1):
        ph = tm.transition_id_to_phone(tid)
        if tm.is_self_loop(tid):
            self_tid.setdefault(ph, tid)
        else:
            fwd_tid.setdefault(ph, tid)

    def tids_for(phone_runs):
        out = []
        for ph, dur in phone_runs:
            out.extend([fwd_tid[ph]] + [self_tid[ph]] * (dur - 1))
        return np.asarray(out, np.int32)

    runs = {"u0": [(1, 9), (2, 9)], "u1": [(2, 9), (1, 9)]}
    ali_ark = str(tmp_path / "ali.ark")
    feat_ark = str(tmp_path / "feats.ark")
    with TableWriter(f"ark:{ali_ark}", holder="ivec") as w:
        for u, rr in runs.items():
            w[u] = tids_for(rr)
    with TableWriter(f"ark:{feat_ark}", holder="mat") as w:
        for u, rr in runs.items():
            w[u] = rng.standard_normal(
                (sum(d for _, d in rr), 5)).astype(np.float32)

    egs_ark = str(tmp_path / "egs.ark")
    rc = TOOLS["nnet3-chain-get-egs"](
        ["--chunk-size=18", mdl, f"ark:{feat_ark}", f"ark:{ali_ark}",
         f"ark:{egs_ark}"])
    assert rc == 0
    full = read_egs_ark(f"ark:{egs_ark}")
    assert full.feats.shape[1] == 18

    one = str(tmp_path / "one.ark")
    assert TOOLS["nnet3-chain-copy-egs"](
        ["--n=1", f"ark:{egs_ark}", f"ark:{one}"]) == 0
    assert read_egs_ark(f"ark:{one}").feats.shape[0] == 1

    shuf = str(tmp_path / "shuf.ark")
    assert TOOLS["nnet3-chain-shuffle-egs"](
        ["--srand=7", f"ark:{egs_ark}", f"ark:{shuf}"]) == 0
    a = read_egs_ark(f"ark:{shuf}")
    assert a.feats.shape == full.feats.shape
    assert a.feats.sum() == pytest.approx(full.feats.sum(), rel=1e-5)
