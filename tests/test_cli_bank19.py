"""CLI bank 19: nnet1 (Karel) + nnet2 (Dan) binary families."""

import numpy as np
import pytest

from kaldi_tpu.cli import TOOLS
from kaldi_tpu.core.table import SequentialTableReader, TableWriter


@pytest.fixture
def rng():
    return np.random.default_rng(19)


@pytest.fixture
def frames_setup(tmp_path, rng):
    """Separable 3-class frames + alignments on disk."""
    D, P, T = 5, 3, 120
    mu = 3.0 * rng.standard_normal((P, D))
    feats, alis = {}, {}
    for k in ("u1", "u2"):
        a = rng.integers(0, P, T).astype(np.int32)
        feats[k] = (mu[a] + 0.3 * rng.standard_normal((T, D))
                    ).astype(np.float32)
        alis[k] = a
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        for k, v in feats.items():
            w[k] = v
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        for k, v in alis.items():
            w[k] = v
    return {"tmp": tmp_path, "D": D, "P": P, "feats": feats,
            "alis": alis}


def test_nnet1_pipeline(frames_setup, capsys):
    """rbm-train → convert → concat? → train-frmshuff → forward: the
    nnetbin pretraining + fine-tuning flow, accuracy-checked."""
    t = frames_setup["tmp"]
    D, P = frames_setup["D"], frames_setup["P"]
    assert TOOLS["rbm-train-cd1-frmshuff"](
        ["--hid-dim=16", "--num-epochs=2", f"ark:{t}/feats.ark",
         str(t / "rbm1")]) == 0
    assert TOOLS["rbm-convert-to-nnet"](
        [str(t / "rbm1"), str(t / "layer1")]) == 0
    assert TOOLS["nnet-info"]([str(t / "layer1")]) == 0
    out = capsys.readouterr().out
    assert f"input-dim {D}" in out and "dim 16" in out

    # the pretrained layer's output head is a dummy: --num-pdfs
    # re-initializes it to the target count (the nnet-initialize role)
    assert TOOLS["nnet-train-frmshuff"](
        ["--num-epochs=15", "--learning-rate=0.5", f"--num-pdfs={P}",
         "--minibatch-size=64",
         str(t / "layer1"), f"ark:{t}/feats.ark", f"ark:{t}/ali.ark",
         str(t / "final.nnet")]) == 0
    from kaldi_tpu.am.nnet1 import load_nnet1
    params, hid, np_, priors = load_nnet1(str(t / "final.nnet"))
    assert np_ == P and priors is not None

    assert TOOLS["nnet-forward"](
        ["--divide-by-priors=true", str(t / "final.nnet"),
         f"ark:{t}/feats.ark", f"ark:{t}/post.ark"]) == 0
    post = dict(SequentialTableReader(f"ark:{t}/post.ark",
                                      holder="mat"))
    acc = (post["u1"].argmax(1) == frames_setup["alis"]["u1"]).mean()
    assert acc > 0.8


def test_nnet1_copy_concat(frames_setup):
    t = frames_setup["tmp"]
    assert TOOLS["rbm-train-cd1-frmshuff"](
        ["--hid-dim=8", "--num-epochs=1", f"ark:{t}/feats.ark",
         str(t / "a.rbm")]) == 0
    assert TOOLS["nnet-copy"]([str(t / "a.rbm"),
                               str(t / "b.rbm")]) == 0
    from kaldi_tpu.am.nnet1 import load_nnet1
    pa, ha, _na, _ = load_nnet1(str(t / "a.rbm"))
    pb, hb, _nb, _ = load_nnet1(str(t / "b.rbm"))
    np.testing.assert_allclose(pa["hidden1"]["kernel"],
                               pb["hidden1"]["kernel"])
    assert TOOLS["nnet-concat"](
        ["--drop-output=true", str(t / "a.rbm"), str(t / "b.rbm"),
         str(t / "cat.nnet")]) == 0
    _pc, hc, _nc, _ = load_nnet1(str(t / "cat.nnet"))
    assert tuple(hc) == (8, 8)


def test_cmvn_to_nnet(frames_setup):
    t = frames_setup["tmp"]
    from kaldi_tpu.core import io as kio
    assert TOOLS["compute-cmvn-stats"](
        [f"ark:{t}/feats.ark", f"ark:{t}/cmvn.ark"]) == 0
    # global stats: sum per-utt stats
    stats = None
    for _k, m in SequentialTableReader(f"ark:{t}/cmvn.ark",
                                       holder="mat"):
        stats = np.asarray(m) if stats is None else stats + np.asarray(m)
    with kio.open_wxfilename(str(t / "g.cmvn")) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, stats)
    assert TOOLS["cmvn-to-nnet"](
        [str(t / "g.cmvn"), str(t / "norm.mat")]) == 0
    assert TOOLS["transform-feats"](
        [str(t / "norm.mat"), f"ark:{t}/feats.ark",
         f"ark:{t}/norm.ark"]) == 0
    normed = np.concatenate(
        [np.asarray(m) for _k, m in
         SequentialTableReader(f"ark:{t}/norm.ark", holder="mat")])
    np.testing.assert_allclose(normed.mean(0), 0.0, atol=1e-3)
    np.testing.assert_allclose(normed.std(0), 1.0, atol=1e-2)


def test_nnet2_pipeline(frames_setup, capsys):
    """init → train-simple per job → average → compute: the nnet2
    parallel-SGD-with-averaging flow via binaries."""
    t = frames_setup["tmp"]
    D, P = frames_setup["D"], frames_setup["P"]
    assert TOOLS["nnet-am-init"](
        [f"--feat-dim={D}", f"--num-pdfs={P}",
         "--num-hidden-layers=2", "--pnorm-input-dim=32",
         "--pnorm-output-dim=8", str(t / "0.nnet2")]) == 0
    assert TOOLS["nnet-am-info"]([str(t / "0.nnet2")]) == 0
    out = capsys.readouterr().out
    assert f"feat-dim {D}" in out and f"num-pdfs {P}" in out

    # two "jobs" train from the same start on different utterances
    for job, utt in ((1, "u1"), (2, "u2")):
        with TableWriter(f"ark:{t}/f{job}.ark", holder="mat") as w:
            w[utt] = frames_setup["feats"][utt]
        with TableWriter(f"ark:{t}/a{job}.ark", holder="ivec") as w:
            w[utt] = frames_setup["alis"][utt]
        assert TOOLS["nnet-train-simple"](
            ["--learning-rate=0.05", str(t / "0.nnet2"),
             f"ark:{t}/f{job}.ark", f"ark:{t}/a{job}.ark",
             str(t / f"{job}.nnet2")]) == 0
    assert TOOLS["nnet-am-average"](
        [str(t / "avg.nnet2"), str(t / "1.nnet2"),
         str(t / "2.nnet2")]) == 0
    assert TOOLS["nnet2-am-copy"](
        [str(t / "avg.nnet2"), str(t / "final.nnet2")]) == 0

    # more passes to convergence from the average
    cur = "final.nnet2"
    for it in range(8):
        assert TOOLS["nnet-train-simple"](
            ["--learning-rate=0.1", str(t / cur),
             f"ark:{t}/feats.ark", f"ark:{t}/ali.ark",
             str(t / f"it{it}.nnet2")]) == 0
        cur = f"it{it}.nnet2"
    assert TOOLS["nnet2-compute"](
        [str(t / cur), f"ark:{t}/feats.ark",
         f"ark:{t}/logp.ark"]) == 0
    logp = dict(SequentialTableReader(f"ark:{t}/logp.ark",
                                      holder="mat"))
    acc = (logp["u1"].argmax(1) == frames_setup["alis"]["u1"]).mean()
    assert acc > 0.75


def test_nnet2_latgen(tmp_path, rng):
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.am.serialize import write_mdl
    from kaldi_tpu.am.topology import HmmTopology
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.am.tree import MonophoneContextDependency
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    lex = Lexicon(entries=[("GO", ["g"]), ("NO", ["n"])])
    lang = Lang(lex)
    topo = HmmTopology.three_state(lang.phone_list())
    tree = MonophoneContextDependency(lang.phone_list(), topo)
    tm = TransitionModel(topo, tree)
    D, P = 4, tree.num_pdfs
    am = AmDiagGmm.flat_start(P, np.zeros(D), np.ones(D))
    mdl = str(tmp_path / "final.mdl")
    write_mdl(mdl, tm, am)
    HCLG = mkgraph(lang, tm, arpa_to_fst(ArpaModel.parse(
        make_unigram_arpa({"GO": 1.0, "NO": 1.0})), lang.words))
    HCLG.write_text(str(tmp_path / "HCLG.txt"))
    assert TOOLS["nnet-am-init"](
        [f"--feat-dim={D}", f"--num-pdfs={P}",
         "--num-hidden-layers=1", "--pnorm-input-dim=16",
         "--pnorm-output-dim=4", str(tmp_path / "m.nnet2")]) == 0
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        w["u"] = rng.standard_normal((20, D)).astype(np.float32)
    assert TOOLS["nnet-latgen-faster"](
        ["--acoustic-scale=0.5", mdl, str(tmp_path / "m.nnet2"),
         str(tmp_path / "HCLG.txt"), f"ark:{tmp_path}/feats.ark",
         f"ark:{tmp_path}/lat.ark"]) == 0
    lats = dict(SequentialTableReader(f"ark:{tmp_path}/lat.ark",
                                      holder="clat"))
    assert "u" in lats and np.isfinite(lats["u"].best_path()[2])
