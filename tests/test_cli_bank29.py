"""CLI bank 29: nnetbin multistream/learnrate, sgmm2bin tail,
nnet3bin dense/simple/image egs + looped/grammar latgen + batched
x-vectors."""

import numpy as np
import pytest

from kaldi_tpu.am.gmm import AmDiagGmm
from kaldi_tpu.am.serialize import write_mdl
from kaldi_tpu.am.topology import HmmTopology
from kaldi_tpu.am.transitions import TransitionModel
from kaldi_tpu.am.tree import MonophoneContextDependency
from kaldi_tpu.cli import TOOLS, main
from kaldi_tpu.core.table import SequentialTableReader, TableWriter


@pytest.fixture
def rng():
    return np.random.default_rng(29)


# ---------------------------------------------------------------------------
# nnetbin tail


def _nnet1(tmp_path, rng, name="m.nnet", D=4, P=5):
    proto = (f"<AffineTransform> <InputDim> {D} <OutputDim> 8\n"
             f"<AffineTransform> <InputDim> 8 <OutputDim> {P}\n")
    (tmp_path / "p").write_text(proto)
    assert main(["nnet-initialize", str(tmp_path / "p"),
                 str(tmp_path / name)]) == 0
    return str(tmp_path / name)


def _nnet1_data(tmp_path, rng, n_utt=4, T=20, D=4, P=5):
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        for i in range(n_utt):
            w[f"u{i}"] = rng.standard_normal((T, D)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/a.ark", holder="ivec") as w:
        for i in range(n_utt):
            w[f"u{i}"] = rng.integers(0, P, T).astype(np.int32)
    return f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/a.ark"


def test_nnet_train_multistream(tmp_path, rng):
    from kaldi_tpu.am.nnet1 import load_nnet1
    mdl = _nnet1(tmp_path, rng)
    feats, ali = _nnet1_data(tmp_path, rng)
    for tool_name, out in (("nnet-train-multistream", "ms.nnet"),
                           ("nnet-train-multistream-perutt",
                            "pu.nnet")):
        assert main([tool_name, "--num-streams=2",
                     "--learning-rate=0.3", mdl, feats, ali,
                     str(tmp_path / out)]) == 0
        p0, _h, _n, _pr = load_nnet1(mdl)
        p1, _h1, _n1, _pr1 = load_nnet1(str(tmp_path / out))
        assert not np.allclose(p0["hidden1"]["kernel"],
                               p1["hidden1"]["kernel"])


def test_train_transitions(tmp_path, rng):
    from kaldi_tpu.am.serialize import (read_transition_model,
                                        write_transition_model)
    from kaldi_tpu.core import io as kio
    topo = HmmTopology.three_state([1, 2])
    tree = MonophoneContextDependency([1, 2], topo)
    tm = TransitionModel(topo, tree)
    with kio.open_wxfilename(str(tmp_path / "t.mdl")) as f:
        kio.init_kaldi_output_stream(f)
        write_transition_model(f, tm)
    with TableWriter(f"ark:{tmp_path}/a.ark", holder="ivec") as w:
        w["u"] = rng.integers(1, tm.num_transition_ids + 1,
                              50).astype(np.int32)
    assert main(["train-transitions", str(tmp_path / "t.mdl"),
                 f"ark:{tmp_path}/a.ark",
                 str(tmp_path / "t2.mdl")]) == 0
    with kio.open_rxfilename(str(tmp_path / "t2.mdl")) as f:
        kio.init_kaldi_input_stream(f)
        tm2 = read_transition_model(f)
    assert not np.allclose(tm2.log_probs, tm.log_probs)


def test_nnet_set_learnrate_freezes_layer(tmp_path, rng):
    from kaldi_tpu.am.nnet1 import load_nnet1, load_nnet1_full
    mdl = _nnet1(tmp_path, rng)
    feats, ali = _nnet1_data(tmp_path, rng)
    # freeze hidden1, train only the output layer
    assert main(["nnet-set-learnrate", "--coefs=0:1", mdl,
                 str(tmp_path / "fr.nnet")]) == 0
    _p, _h, _n, _pr, lr = load_nnet1_full(str(tmp_path / "fr.nnet"))
    np.testing.assert_allclose(lr, [0.0, 1.0])
    assert main(["nnet-train-frmshuff", "--num-epochs=2",
                 str(tmp_path / "fr.nnet"), feats, ali,
                 str(tmp_path / "tr.nnet")]) == 0
    p0, _h0, _n0, _pr0 = load_nnet1(mdl)
    p1, _h1, _n1, _pr1 = load_nnet1(str(tmp_path / "tr.nnet"))
    np.testing.assert_allclose(p0["hidden1"]["kernel"],
                               p1["hidden1"]["kernel"], atol=1e-7)
    assert not np.allclose(p0["output_affine"]["kernel"],
                           p1["output_affine"]["kernel"])


# ---------------------------------------------------------------------------
# sgmm2bin tail


def _sgmm2_system(tmp_path, rng, D=3, spk=False):
    from kaldi_tpu.am.sgmm2 import init_sgmm, write_sgmm2
    from kaldi_tpu.am.serialize import write_mdl as _wm
    topo = HmmTopology.three_state([1, 2])
    tree = MonophoneContextDependency([1, 2], topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(D), np.ones(D),
                              perturb=0.2)
    mdl = str(tmp_path / "trans.mdl")
    _wm(mdl, tm, am)
    model = init_sgmm(tree.num_pdfs, D, 3, 2, np.zeros(D),
                      np.ones(D), spk_subspace=2 if spk else 0,
                      seed=0)
    sp = str(tmp_path / "0.sgmm2")
    write_sgmm2(sp, model)
    return mdl, sp, tm, model


def test_sgmm2_acc_stats2_and_est_ebw(tmp_path, rng):
    from kaldi_tpu.am.sgmm2 import read_sgmm2
    from kaldi_tpu.cli.tools_bank11 import _read_sgmm2_accs
    mdl, sp, tm, model = _sgmm2_system(tmp_path, rng)
    T = 30
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = rng.standard_normal((T, 3)).astype(np.float32)
    # signed tid posteriors: + for num, - for den
    post = [[(1, 1.0), (4, -0.5)] for _ in range(T)]
    with TableWriter(f"ark:{tmp_path}/p.ark", holder="post") as w:
        w["u"] = post
    assert main(["sgmm2-acc-stats2", mdl, sp, f"ark:{tmp_path}/f.ark",
                 f"ark:{tmp_path}/p.ark", str(tmp_path / "num.acc"),
                 str(tmp_path / "den.acc")]) == 0
    num = _read_sgmm2_accs(str(tmp_path / "num.acc"), model.num_pdfs)
    den = _read_sgmm2_accs(str(tmp_path / "den.acc"), model.num_pdfs)
    assert num.gamma.sum() == pytest.approx(T, abs=1e-3)
    assert den.gamma.sum() == pytest.approx(0.5 * T, abs=1e-3)
    assert main(["sgmm2-est-ebw", sp, str(tmp_path / "num.acc"),
                 str(tmp_path / "den.acc"),
                 str(tmp_path / "ebw.sgmm2")]) == 0
    out = read_sgmm2(str(tmp_path / "ebw.sgmm2"))
    assert not np.allclose(out.V, model.V)
    assert np.allclose(out.c.sum(axis=1), 1.0)


def test_sgmm2_comp_prexform(tmp_path, rng):
    from kaldi_tpu.core import io as kio
    _mdl, sp, _tm, model = _sgmm2_system(tmp_path, rng)
    assert main(["sgmm2-comp-prexform", sp,
                 str(tmp_path / "pre.mat")]) == 0
    with kio.open_rxfilename(str(tmp_path / "pre.mat")) as f:
        kio.init_kaldi_input_stream(f)
        X = kio.read_matrix(f)
    D = model.dim
    assert X.shape == (D, D + 1)
    A, b = X[:, :D], X[:, D]
    # transformed global stats: mean 0, cov I (recompute directly)
    w = np.exp(model.log_weights())
    p = (model.c[:, :, None] * w) / model.num_pdfs
    p = p / p.sum()
    mu = model.means()
    mbar = np.einsum("jki,jkid->d", p, mu)
    np.testing.assert_allclose(A @ mbar + b, 0.0, atol=1e-6)
    pi = p.sum(axis=(0, 1))
    W = (np.einsum("i,id->d", pi, model.var) * np.eye(D)
         + np.einsum("jki,jkid,jkie->de", p, mu, mu)
         - np.outer(mbar, mbar))
    np.testing.assert_allclose(A @ W @ A.T, np.eye(D), atol=1e-5)


def test_sgmm2_project(tmp_path, rng):
    from kaldi_tpu.am.sgmm2 import read_sgmm2
    from kaldi_tpu.core import io as kio
    _mdl, sp, _tm, model = _sgmm2_system(tmp_path, rng)
    T = rng.standard_normal((2, 3))
    with kio.open_wxfilename(str(tmp_path / "T.mat")) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, T)
    assert main(["sgmm2-project", sp, str(tmp_path / "T.mat"),
                 str(tmp_path / "proj.sgmm2")]) == 0
    out = read_sgmm2(str(tmp_path / "proj.sgmm2"))
    assert out.dim == 2
    np.testing.assert_allclose(
        out.means(), np.einsum("ed,jkid->jkie", T, model.means()),
        atol=1e-5)


def test_sgmm2_est_fmllr(tmp_path, rng):
    mdl, sp, tm, _model = _sgmm2_system(tmp_path, rng)
    T = 40
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = rng.standard_normal((T, 3)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/a.ark", holder="ivec") as w:
        w["u"] = rng.integers(1, tm.num_transition_ids + 1,
                              T).astype(np.int32)
    assert main(["sgmm2-est-fmllr", mdl, sp, f"ark:{tmp_path}/f.ark",
                 f"ark:{tmp_path}/a.ark",
                 f"ark:{tmp_path}/trans.ark"]) == 0
    W = dict(SequentialTableReader(f"ark:{tmp_path}/trans.ark",
                                   holder="mat"))["u"]
    assert W.shape == (3, 4) and np.isfinite(W).all()


def test_sgmm2_est_spkvecs_gpost_matches_ali_variant(tmp_path, rng):
    mdl, sp, tm, model = _sgmm2_system(tmp_path, rng, spk=True)
    T = 30
    feats = rng.standard_normal((T, 3)).astype(np.float32)
    tids = rng.integers(1, tm.num_transition_ids + 1, T).astype(
        np.int32)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = feats
    with TableWriter(f"ark:{tmp_path}/a.ark", holder="ivec") as w:
        w["u"] = tids
    # tid post → sgmm2 gpost → gpost spkvecs
    with TableWriter(f"ark:{tmp_path}/p.ark", holder="post") as w:
        w["u"] = [[(int(t), 1.0)] for t in tids]
    assert main(["sgmm2-post-to-gpost", mdl, sp,
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/p.ark",
                 f"ark:{tmp_path}/gp.ark"]) == 0
    assert main(["sgmm2-est-spkvecs-gpost", sp,
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/gp.ark",
                 f"ark:{tmp_path}/v1.ark"]) == 0
    v1 = dict(SequentialTableReader(f"ark:{tmp_path}/v1.ark",
                                    holder="vec"))["u"]
    assert v1.shape == (2,) and np.isfinite(v1).all()
    # ali-based variant should land close (one MAP iteration each)
    from kaldi_tpu.am.sgmm2 import estimate_speaker_vector
    pdf_ali = tm.tid_to_pdf_array[tids.astype(np.int64)]
    v_ref = estimate_speaker_vector(model, feats, pdf_ali,
                                    num_iters=1)
    np.testing.assert_allclose(v1, v_ref, atol=0.2)


def test_sgmm2_latgen_faster_parallel(tmp_path, rng):
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    from kaldi_tpu.am.sgmm2 import init_sgmm, write_sgmm2
    lex = Lexicon(entries=[("GO", ["G", "OW"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(3), np.ones(3))
    mdl = str(tmp_path / "trans.mdl")
    write_mdl(mdl, tm, am)
    model = init_sgmm(tree.num_pdfs, 3, 3, 2, np.zeros(3),
                      np.ones(3), spk_subspace=0, seed=1)
    sp = str(tmp_path / "m.sgmm2")
    write_sgmm2(sp, model)
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"GO": 1.0, "NO": 1.0})),
        lang.words))
    HCLG.write_text(str(tmp_path / "HCLG.txt"))
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        for i in range(2):
            w[f"u{i}"] = rng.standard_normal((15, 3)).astype(np.float32)
    assert main(["sgmm2-latgen-faster-parallel", "--num-threads=2",
                 mdl, sp, str(tmp_path / "HCLG.txt"),
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/lat.ark"
                 ]) == 0
    lats = dict(SequentialTableReader(f"ark:{tmp_path}/lat.ark",
                                      holder="clat"))
    assert set(lats) == {"u0", "u1"}


def test_init_ubm(tmp_path, rng):
    from kaldi_tpu.cli.tools_bank5 import _read_global_gmm
    from kaldi_tpu.core import io as kio
    topo = HmmTopology.three_state([1, 2])
    tree = MonophoneContextDependency([1, 2], topo)
    tm = TransitionModel(topo, tree)
    P, M, D = tree.num_pdfs, 2, 3
    am = AmDiagGmm(rng.dirichlet(np.ones(M), size=P),
                   rng.standard_normal((P, M, D)) * 2,
                   0.5 + rng.random((P, M, D)))
    mdl = str(tmp_path / "final.mdl")
    write_mdl(mdl, tm, am)
    occs = rng.random(P) * 100
    with kio.open_wxfilename(str(tmp_path / "occs")) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_vector(f, occs.astype(np.float32))
    assert main(["init-ubm", "--ubm-num-gauss=4", mdl,
                 str(tmp_path / "occs"), str(tmp_path / "ubm")]) == 0
    ubm = _read_global_gmm(str(tmp_path / "ubm"))
    assert ubm.num_pdfs == 1 and ubm.max_mix == 4
    assert ubm.weights.sum() == pytest.approx(1.0, abs=1e-5)
    assert (ubm.vars > 0).all()


# ---------------------------------------------------------------------------
# nnet3bin tail


def test_dense_targets_egs_roundtrip(tmp_path, rng):
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = rng.standard_normal((20, 4)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/t.ark", holder="mat") as w:
        w["u"] = rng.standard_normal((20, 3)).astype(np.float32)
    assert main(["nnet3-get-egs-dense-targets", "--chunk-size=8",
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/t.ark",
                 f"ark:{tmp_path}/egs.ark"]) == 0
    egs = dict(SequentialTableReader(f"ark:{tmp_path}/egs.ark",
                                     holder="dteg"))
    assert len(egs) == 2
    for eg in egs.values():
        assert eg.feats.shape == (8, 4)
        assert eg.targets.shape == (8, 3)


def test_simple_and_image_egs(tmp_path, rng):
    feats = rng.standard_normal((12, 6)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = feats
    with TableWriter(f"ark:{tmp_path}/a.ark", holder="ivec") as w:
        w["u"] = rng.integers(0, 3, 12).astype(np.int32)
    assert main(["nnet3-get-egs-simple", f"ark:{tmp_path}/f.ark",
                 f"ark:{tmp_path}/a.ark", f"ark:{tmp_path}/egs.ark"
                 ]) == 0
    egs = dict(SequentialTableReader(f"ark:{tmp_path}/egs.ark",
                                     holder="xeg"))
    assert egs["u"].feats.shape == (1, 12, 6)
    # augment: flip always, no shift
    assert main(["nnet3-egs-augment-image", "--horizontal-shift=0",
                 "--horizontal-flip-prob=1.0",
                 f"ark:{tmp_path}/egs.ark", f"ark:{tmp_path}/aug.ark"
                 ]) == 0
    aug = dict(SequentialTableReader(f"ark:{tmp_path}/aug.ark",
                                     holder="xeg"))["u"]
    np.testing.assert_allclose(aug.feats[0], feats[:, ::-1], atol=1e-6)
    assert main(["nnet3-egs-to-image", f"ark:{tmp_path}/aug.ark",
                 f"ark:{tmp_path}/img.ark"]) == 0
    img = dict(SequentialTableReader(f"ark:{tmp_path}/img.ark",
                                     holder="mat"))["u"]
    np.testing.assert_allclose(img, feats[:, ::-1], atol=1e-6)


def test_latgen_faster_looped_matches_offline(tmp_path, rng):
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    lex = Lexicon(entries=[("GO", ["G", "OW"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(4), np.ones(4))
    mdl = str(tmp_path / "trans.mdl")
    write_mdl(mdl, tm, am)
    assert main(["nnet3-init", "--feat-dim=4",
                 f"--num-pdfs={tree.num_pdfs}", "--hidden-dim=8",
                 "--bottleneck-dim=4", "--num-layers=2",
                 str(tmp_path / "m.raw")]) == 0
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"GO": 1.0, "NO": 1.0})),
        lang.words))
    HCLG.write_text(str(tmp_path / "HCLG.txt"))
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = rng.standard_normal((40, 4)).astype(np.float32)
    common = ["--frame-subsampling-factor=1", "--acoustic-scale=0.5",
              mdl, str(tmp_path / "m.raw"), str(tmp_path / "HCLG.txt"),
              f"ark:{tmp_path}/f.ark"]
    assert main(["nnet3-latgen-faster-looped", "--chunk-frames=16",
                 "--extra-context=12"] + common
                + [f"ark:{tmp_path}/loop.lats"]) == 0
    assert main(["nnet3-latgen-faster"] + common
                + [f"ark:{tmp_path}/off.lats"]) == 0
    loop = dict(SequentialTableReader(f"ark:{tmp_path}/loop.lats",
                                      holder="clat"))["u"]
    off = dict(SequentialTableReader(f"ark:{tmp_path}/off.lats",
                                     holder="clat"))["u"]
    lw, _lt, lc = loop.best_path()
    ow, _ot, oc = off.best_path()
    assert lw == ow
    assert lc == pytest.approx(oc, abs=0.05)


def test_nnet3_latgen_grammar(tmp_path, rng):
    """Grammar latgen equals plain latgen on the pre-expanded FST."""
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    lex = Lexicon(entries=[("GO", ["G", "OW"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(4), np.ones(4))
    mdl = str(tmp_path / "trans.mdl")
    write_mdl(mdl, tm, am)
    assert main(["nnet3-init", "--feat-dim=4",
                 f"--num-pdfs={tree.num_pdfs}", "--hidden-dim=8",
                 "--bottleneck-dim=4", "--num-layers=2",
                 str(tmp_path / "m.raw")]) == 0
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"GO": 1.0, "NO": 1.0})),
        lang.words))
    # top graph: replace everything with nonterminal 999 → sub = HCLG
    from kaldi_tpu.fst.fst import Arc, VectorFst
    top = VectorFst()
    a, b = top.add_state(), top.add_state()
    top.start = a
    top.add_arc(a, Arc(999, 0, 0.0, b))
    top.set_final(b, 0.0)
    _save_fst(str(tmp_path / "top.fst"), top)
    HCLG.write_text(str(tmp_path / "sub.txt"))
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = rng.standard_normal((20, 4)).astype(np.float32)
    assert main(["nnet3-latgen-grammar",
                 "--frame-subsampling-factor=1", "--acoustic-scale=0.5",
                 mdl, str(tmp_path / "m.raw"), str(tmp_path / "top.fst"),
                 "999", str(tmp_path / "sub.txt"),
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/g.lats"
                 ]) == 0
    assert main(["nnet3-latgen-faster",
                 "--frame-subsampling-factor=1", "--acoustic-scale=0.5",
                 mdl, str(tmp_path / "m.raw"), str(tmp_path / "sub.txt"),
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/p.lats"
                 ]) == 0
    g = dict(SequentialTableReader(f"ark:{tmp_path}/g.lats",
                                   holder="clat"))["u"]
    p = dict(SequentialTableReader(f"ark:{tmp_path}/p.lats",
                                   holder="clat"))["u"]
    assert g.best_path()[0] == p.best_path()[0]


def test_xvector_compute_batched_matches_chunk_mean(tmp_path, rng):
    from kaldi_tpu.am.xvector import (XvectorConfig, extract_xvector,
                                      save_xvector_model,
                                      train_xvector)
    D = 4
    feats = {f"u{i}": rng.standard_normal((40, D)).astype(np.float32)
             for i in range(3)}
    u2s = {u: ("a" if i % 2 else "b")
           for i, u in enumerate(sorted(feats))}
    cfg = XvectorConfig(feat_dim=D, hidden_dim=8, embed_dim=4,
                        contexts=((-1, 0, 1), (0,)))
    variables, model, spks = train_xvector(feats, u2s, cfg,
                                           num_epochs=1, batch_size=2,
                                           chunk=20)
    save_xvector_model(str(tmp_path / "xv.raw"), variables,
                       model.config, spks)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        for k, v in feats.items():
            w[k] = v
    assert main(["nnet3-xvector-compute-batched", "--chunk-size=20",
                 "--batch-size=4", str(tmp_path / "xv.raw"),
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/e.ark"
                 ]) == 0
    embs = dict(SequentialTableReader(f"ark:{tmp_path}/e.ark",
                                      holder="vec"))
    assert len(embs) == 3
    # equals the mean of per-chunk single extractions
    want = np.mean([extract_xvector(variables, model,
                                    feats["u0"][lo:lo + 20])
                    for lo in (0, 20)], axis=0)
    np.testing.assert_allclose(embs["u0"], want, atol=1e-4)
