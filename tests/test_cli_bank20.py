"""CLI bank 20: logistic regression, global-GMM tail, transform
utilities, batched nnet3 decode, OpenFst utility tail."""

import numpy as np
import pytest

from kaldi_tpu.cli import TOOLS
from kaldi_tpu.core.table import SequentialTableReader, TableWriter


@pytest.fixture
def rng():
    return np.random.default_rng(20)


def test_logistic_regression_cycle(tmp_path, rng):
    D = 4
    mu = {0: np.array([2.0, 0, 0, 0]), 1: np.array([-2.0, 0, 0, 0])}
    with TableWriter(f"ark:{tmp_path}/iv.ark", holder="vec") as w, \
            TableWriter(f"ark,t:{tmp_path}/cls.txt",
                        holder="text") as c:
        for i in range(40):
            y = i % 2
            w[f"u{i}"] = (mu[y] + 0.3 * rng.standard_normal(D)
                          ).astype(np.float32)
            c[f"u{i}"] = [str(y)]
    assert TOOLS["logistic-regression-train"](
        ["--num-steps=150", f"ark:{tmp_path}/iv.ark",
         f"ark,t:{tmp_path}/cls.txt", str(tmp_path / "lr.mdl")]) == 0
    assert TOOLS["logistic-regression-eval"](
        [str(tmp_path / "lr.mdl"), f"ark:{tmp_path}/iv.ark",
         f"ark:{tmp_path}/lp.ark"]) == 0
    lps = dict(SequentialTableReader(f"ark:{tmp_path}/lp.ark",
                                     holder="vec"))
    correct = sum(1 for i in range(40)
                  if int(np.argmax(lps[f"u{i}"])) == i % 2)
    assert correct >= 38


def test_gmm_global_est_fmllr(tmp_path, rng):
    D = 3
    feats = rng.standard_normal((200, D)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = feats
    assert TOOLS["gmm-global-init-from-feats"](
        ["--num-gauss=2", "--num-iters=3", f"ark:{tmp_path}/f.ark",
         str(tmp_path / "ubm")]) == 0
    assert TOOLS["gmm-global-est-fmllr"](
        [str(tmp_path / "ubm"), f"ark:{tmp_path}/f.ark",
         f"ark:{tmp_path}/trans.ark"]) == 0
    W = dict(SequentialTableReader(f"ark:{tmp_path}/trans.ark",
                                   holder="mat"))["u"]
    assert W.shape == (D, D + 1)
    # data drawn from the UBM's own training distribution → transform
    # close to identity
    np.testing.assert_allclose(W[:, :D], np.eye(D), atol=0.3)


def test_gmm_global_gselect_to_post(tmp_path, rng):
    D = 3
    feats = rng.standard_normal((20, D)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = feats
    assert TOOLS["gmm-global-init-from-feats"](
        ["--num-gauss=4", "--num-iters=3", f"ark:{tmp_path}/f.ark",
         str(tmp_path / "ubm")]) == 0
    assert TOOLS["gmm-gselect"](
        ["--n=2", str(tmp_path / "ubm"), f"ark:{tmp_path}/f.ark",
         f"ark:{tmp_path}/gs.ark"]) == 0
    assert TOOLS["gmm-global-gselect-to-post"](
        [str(tmp_path / "ubm"), f"ark:{tmp_path}/f.ark",
         f"ark:{tmp_path}/gs.ark", f"ark:{tmp_path}/post.ark"]) == 0
    post = dict(SequentialTableReader(f"ark:{tmp_path}/post.ark",
                                      holder="post"))["u"]
    assert len(post) == 20
    for frame in post:
        assert len(frame) <= 2
        assert sum(w for _i, w in frame) == pytest.approx(1.0,
                                                          abs=1e-4)


def test_extend_transform_dim(tmp_path):
    from kaldi_tpu.core import io as kio
    # affine (3, 4): 3-dim input, 3-dim output (cols == rows + 1,
    # the same inference rule the reference binary uses)
    mat = np.asarray([[1, 2, 3, 9], [4, 5, 6, 8],
                      [7, 8, 9, 7]], np.float32)
    with kio.open_wxfilename(str(tmp_path / "t.mat")) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, mat)
    assert TOOLS["extend-transform-dim"](
        ["--new-dimension=5", str(tmp_path / "t.mat"),
         str(tmp_path / "t2.mat")]) == 0
    with kio.open_rxfilename(str(tmp_path / "t2.mat")) as f:
        kio.init_kaldi_input_stream(f)
        out = np.asarray(kio.read_matrix(f))
    assert out.shape == (5, 6)
    np.testing.assert_allclose(out[:3, :3], mat[:, :3])
    np.testing.assert_allclose(out[:3, 5], mat[:, 3])   # offset col
    np.testing.assert_allclose(out[3:, 3:5], np.eye(2))


def test_fstprune_and_closure(tmp_path, rng):
    from kaldi_tpu.fst.fst import Arc, VectorFst
    fst = VectorFst()
    s0, s1, s2 = (fst.add_state() for _ in range(3))
    fst.set_start(s0)
    fst.add_arc(s0, Arc(1, 1, 0.0, s1))     # good path cost 0
    fst.add_arc(s0, Arc(2, 2, 50.0, s2))    # bad path cost 50
    fst.set_final(s1, 0.0)
    fst.set_final(s2, 0.0)
    fst.write_text(str(tmp_path / "in.fst"))
    assert TOOLS["fstprune"](
        ["--weight=10", str(tmp_path / "in.fst"),
         str(tmp_path / "pruned.fst")]) == 0
    from kaldi_tpu.cli.tools_extra import _load_fst
    pruned = _load_fst(str(tmp_path / "pruned.fst"))
    assert pruned.num_states == 2           # bad branch dropped
    assert TOOLS["fstclosure"](
        [str(tmp_path / "pruned.fst"), str(tmp_path / "cl.fst")]) == 0
    cl = _load_fst(str(tmp_path / "cl.fst"))
    # start is now final and a back-arc exists
    assert cl.final(cl.start) != float("inf")
    assert any(a.nextstate == cl.start
               for s in range(cl.num_states) for a in cl.arcs[s])


def test_nnet3_latgen_faster_batch(tmp_path, rng):
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
    D, P = 6, tree.num_pdfs
    am = AmDiagGmm.flat_start(P, np.zeros(D), np.ones(D))
    mdl = str(tmp_path / "final.mdl")
    write_mdl(mdl, tm, am)
    HCLG = mkgraph(lang, tm, arpa_to_fst(ArpaModel.parse(
        make_unigram_arpa({"GO": 1.0, "NO": 1.0})), lang.words))
    HCLG.write_text(str(tmp_path / "HCLG.txt"))
    assert TOOLS["nnet3-init"](
        [f"--feat-dim={D}", f"--num-pdfs={P}", "--hidden-dim=16",
         "--bottleneck-dim=8", "--num-layers=2",
         str(tmp_path / "m.raw")]) == 0
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        for i in range(3):
            w[f"u{i}"] = rng.standard_normal((24 + 3 * i, D)).astype(
                np.float32)
    assert TOOLS["nnet3-latgen-faster-batch"](
        ["--acoustic-scale=0.5", "--batch-size=2", mdl,
         str(tmp_path / "m.raw"), str(tmp_path / "HCLG.txt"),
         f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/lat.ark"]) == 0
    lats = dict(SequentialTableReader(f"ark:{tmp_path}/lat.ark",
                                      holder="clat"))
    assert sorted(lats) == ["u0", "u1", "u2"]
    for lat in lats.values():
        assert np.isfinite(lat.best_path()[2])
