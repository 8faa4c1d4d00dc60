"""CLI bank 18: upgraded SGMM2 binaries + cross-family tail."""

import numpy as np
import pytest

from kaldi_tpu.am.gmm import AmDiagGmm
from kaldi_tpu.am.serialize import write_mdl
from kaldi_tpu.am.topology import HmmTopology
from kaldi_tpu.am.transitions import TransitionModel
from kaldi_tpu.am.tree import MonophoneContextDependency
from kaldi_tpu.cli import TOOLS
from kaldi_tpu.core.table import SequentialTableReader, TableWriter
from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice


@pytest.fixture
def rng():
    return np.random.default_rng(18)


@pytest.fixture
def sgmm_setup(tmp_path, rng):
    """Trans model + trained SGMM2 (with speaker subspace) + data."""
    from kaldi_tpu.am.sgmm2 import train_sgmm, write_sgmm2
    phones = [1, 2]
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    J, D = tree.num_pdfs, 4
    protos = 3.0 * rng.standard_normal((J, D))
    feats, alis, u2s = {}, {}, {}
    offs = {"sA": np.array([1.0, -1.0, 0.5, 0.0]),
            "sB": np.array([-1.0, 1.0, -0.5, 0.0])}
    for i in range(4):
        spk = "sA" if i < 2 else "sB"
        a = rng.integers(0, J, 60).astype(np.int32)
        feats[f"u{i}"] = (protos[a] + offs[spk]
                          + 0.3 * rng.standard_normal((60, D))
                          ).astype(np.float32)
        alis[f"u{i}"] = a
        u2s[f"u{i}"] = spk
    model, _likes = train_sgmm(feats, alis, num_pdfs=J, num_gauss=4,
                               subspace=3, num_iters=4, seed=0,
                               spk_subspace=2, utt2spk=u2s)
    mdl = str(tmp_path / "trans.mdl")
    am = AmDiagGmm.flat_start(J, np.zeros(D), np.ones(D), perturb=0.1)
    write_mdl(mdl, tm, am)
    sg = str(tmp_path / "final.sgmm2")
    write_sgmm2(sg, model)
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        for k, v in feats.items():
            w[k] = v
    # tid-level alignments for est-spkvecs are pdf alis here (the tool
    # takes pdf alignments)
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        for k, v in alis.items():
            w[k] = v
    (tmp_path / "spk2utt").write_text("sA u0 u1\nsB u2 u3\n")
    return {"tmp": tmp_path, "mdl": mdl, "sg": sg, "tm": tm, "J": J,
            "model": model}


def test_sgmm2_mixup_grows_substates(sgmm_setup):
    t = sgmm_setup["tmp"]
    assert TOOLS["sgmm2-acc-stats"](
        [sgmm_setup["sg"], f"ark:{t}/feats.ark", f"ark:{t}/ali.ark",
         str(t / "accs")]) == 0
    assert TOOLS["sgmm2-mixup"](
        [f"--num-substates={2 * sgmm_setup['J']}", sgmm_setup["sg"],
         str(t / "accs"), str(t / "split.sgmm2")]) == 0
    from kaldi_tpu.am.sgmm2 import read_sgmm2
    m2 = read_sgmm2(str(t / "split.sgmm2"))
    assert (m2.c > 0).sum() == 2 * sgmm_setup["J"]
    # split model still scores (finite, near the original)
    x = np.zeros((5, 4), np.float32)
    ll = np.asarray(m2.loglikes(x))
    assert np.isfinite(ll).all()


def test_sgmm2_est_spkvecs(sgmm_setup):
    t = sgmm_setup["tmp"]
    assert TOOLS["sgmm2-est-spkvecs"](
        [f"--spk2utt=ark,t:{t}/spk2utt", sgmm_setup["sg"],
         f"ark:{t}/feats.ark", f"ark:{t}/ali.ark",
         f"ark:{t}/vecs.ark"]) == 0
    vecs = dict(SequentialTableReader(f"ark:{t}/vecs.ark",
                                      holder="vec"))
    assert sorted(vecs) == ["sA", "sB"]
    assert np.linalg.norm(np.asarray(vecs["sA"])
                          - np.asarray(vecs["sB"])) > 0.1


def test_sgmm2_latgen_and_align(sgmm_setup, rng):
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    t = sgmm_setup["tmp"]
    tm = sgmm_setup["tm"]
    # graph over two one-phone words (phones 1, 2 = a, b)
    lex = Lexicon(entries=[("A", ["a"]), ("B", ["b"])])
    lang = Lang(lex)
    topo = HmmTopology.three_state(lang.phone_list())
    tree2 = MonophoneContextDependency(lang.phone_list(), topo)
    tm2 = TransitionModel(topo, tree2)
    am = AmDiagGmm.flat_start(tree2.num_pdfs, np.zeros(4), np.ones(4),
                              perturb=0.1)
    mdl2 = str(t / "trans2.mdl")
    write_mdl(mdl2, tm2, am)
    HCLG = mkgraph(lang, tm2, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"A": 1.0, "B": 1.0})),
        lang.words))
    HCLG.write_text(str(t / "HCLG.txt"))
    # SGMM over tree2's pdfs
    from kaldi_tpu.am.sgmm2 import train_sgmm, write_sgmm2
    J = tree2.num_pdfs
    protos = 3.0 * rng.standard_normal((J, 4))
    feats = {"x": None}
    a = np.repeat(rng.integers(0, J, 12), 4).astype(np.int32)
    feats = {"x": (protos[a] + 0.2 * rng.standard_normal(
        (len(a), 4))).astype(np.float32)}
    model, _ = train_sgmm(feats, {"x": a}, num_pdfs=J, num_gauss=4,
                          subspace=3, num_iters=4, seed=1)
    sg2 = str(t / "m2.sgmm2")
    write_sgmm2(sg2, model)
    with TableWriter(f"ark:{t}/dec.ark", holder="mat") as w:
        w["x"] = feats["x"]
    assert TOOLS["sgmm2-latgen-faster"](
        ["--acoustic-scale=1.0", mdl2, sg2, str(t / "HCLG.txt"),
         f"ark:{t}/dec.ark", f"ark:{t}/lat.ark"]) == 0
    lats = dict(SequentialTableReader(f"ark:{t}/lat.ark",
                                      holder="clat"))
    assert "x" in lats and np.isfinite(lats["x"].best_path()[2])

    # align against compiled graphs
    lexp = t / "lex.txt"
    lexp.write_text("A a\nB b\n")
    with TableWriter(f"ark:{t}/text.ark", holder="text") as w:
        w["x"] = ["A"]
    assert TOOLS["compile-train-graphs"](
        [str(lexp), mdl2, f"ark:{t}/text.ark",
         f"ark:{t}/graphs.ark"]) == 0
    assert TOOLS["sgmm2-align-compiled"](
        [mdl2, sg2, f"ark:{t}/graphs.ark", f"ark:{t}/dec.ark",
         f"ark:{t}/out_ali.ark"]) == 0
    ali = dict(SequentialTableReader(f"ark:{t}/out_ali.ark",
                                     holder="ivec"))["x"]
    assert len(ali) == len(feats["x"])


def test_sgmm2_gpost_cycle(sgmm_setup):
    t = sgmm_setup["tmp"]
    tm = sgmm_setup["tm"]
    # tid-level posteriors from the pdf alignments
    alis = dict(SequentialTableReader(f"ark:{t}/ali.ark",
                                      holder="ivec"))
    tid_of_pdf = {}
    for tid in range(1, tm.num_transition_ids + 1):
        tid_of_pdf.setdefault(tm.transition_id_to_pdf(tid), tid)
    with TableWriter(f"ark:{t}/post.ark", holder="post") as w:
        for k, a in alis.items():
            w[k] = [[(tid_of_pdf[int(p)], 1.0)] for p in a]
    assert TOOLS["sgmm2-post-to-gpost"](
        [sgmm_setup["mdl"], sgmm_setup["sg"], f"ark:{t}/feats.ark",
         f"ark:{t}/post.ark", f"ark:{t}/gpost.ark"]) == 0
    assert TOOLS["sgmm2-acc-stats-gpost"](
        [sgmm_setup["sg"], f"ark:{t}/feats.ark", f"ark:{t}/gpost.ark",
         str(t / "gaccs")]) == 0
    from kaldi_tpu.cli.tools_bank11 import _read_sgmm2_accs
    accs = _read_sgmm2_accs(str(t / "gaccs"), sgmm_setup["J"])
    # total posterior mass ≈ total frames
    assert accs.gamma.sum() == pytest.approx(4 * 60, rel=0.01)


def test_arpa_const_arpa_roundtrip(tmp_path):
    from kaldi_tpu.cli.tools_bank18 import read_const_arpa
    from kaldi_tpu.fst import make_unigram_arpa
    from kaldi_tpu.fst.arpa import ArpaModel
    arpa_txt = make_unigram_arpa({"FOO": 0.6, "BAR": 0.4})
    p = tmp_path / "lm.arpa"
    p.write_text(arpa_txt)
    assert TOOLS["arpa-to-const-arpa"](
        [str(p), str(tmp_path / "const.lm")]) == 0
    got = read_const_arpa(str(tmp_path / "const.lm"))
    ref = ArpaModel.parse(arpa_txt)
    assert got.order == ref.order
    for o in range(ref.order):
        assert set(got.ngrams[o]) == set(ref.ngrams[o])
        for k in ref.ngrams[o]:
            assert got.ngrams[o][k] == pytest.approx(ref.ngrams[o][k])


def test_logprob_to_post(tmp_path):
    lp = np.log(np.asarray([[0.7, 0.25, 0.05],
                            [0.001, 0.499, 0.5]], np.float64))
    with TableWriter(f"ark:{tmp_path}/lp.ark", holder="mat") as w:
        w["u"] = lp.astype(np.float32)
    assert TOOLS["logprob-to-post"](
        ["--min-post=0.1", f"ark:{tmp_path}/lp.ark",
         f"ark:{tmp_path}/post.ark"]) == 0
    post = dict(SequentialTableReader(f"ark:{tmp_path}/post.ark",
                                      holder="post"))["u"]
    assert [i for i, _ in post[0]] == [0, 1]
    assert [i for i, _ in post[1]] == [1, 2]
    assert sum(v for _, v in post[1]) == pytest.approx(1.0)


def test_transform_vec(tmp_path, rng):
    from kaldi_tpu.core import io as kio
    with TableWriter(f"ark:{tmp_path}/v.ark", holder="vec") as w:
        w["u"] = np.asarray([2.0, 3.0], np.float32)
    mat = np.asarray([[1.0, 1.0, 10.0]], np.float32)   # affine
    with kio.open_wxfilename(str(tmp_path / "m.mat")) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, mat)
    assert TOOLS["transform-vec"](
        [str(tmp_path / "m.mat"), f"ark:{tmp_path}/v.ark",
         f"ark:{tmp_path}/o.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/o.ark",
                                     holder="vec"))["u"]
    assert out.tolist() == [15.0]


def test_get_silence_probs(tmp_path):
    sil = np.asarray([[0.0], [-10.0]], np.float32)
    nonsil = np.asarray([[-10.0], [0.0]], np.float32)
    with TableWriter(f"ark:{tmp_path}/sil.ark", holder="mat") as w:
        w["u"] = sil
    with TableWriter(f"ark:{tmp_path}/ns.ark", holder="mat") as w:
        w["u"] = nonsil
    assert TOOLS["get-silence-probs"](
        [f"ark:{tmp_path}/sil.ark", f"ark:{tmp_path}/ns.ark",
         f"ark:{tmp_path}/p.ark"]) == 0
    p = dict(SequentialTableReader(f"ark:{tmp_path}/p.ark",
                                   holder="vec"))["u"]
    assert p[0] > 0.99 and p[1] < 0.01


def test_compile_graph(tmp_path, rng):
    from kaldi_tpu.fst import ArpaModel, Lang, Lexicon, arpa_to_fst, \
        make_unigram_arpa
    from kaldi_tpu.fst.openfst_io import read_fst_path, write_vector_fst
    lexp = tmp_path / "lex.txt"
    lexp.write_text("GO g o\nNO n o\n")
    lex = Lexicon(entries=[("GO", ["g", "o"]), ("NO", ["n", "o"])])
    lang = Lang(lex)
    topo = HmmTopology.three_state(lang.phone_list())
    tree = MonophoneContextDependency(lang.phone_list(), topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(3), np.ones(3))
    mdl = str(tmp_path / "final.mdl")
    write_mdl(mdl, tm, am)
    G = arpa_to_fst(ArpaModel.parse(make_unigram_arpa(
        {"GO": 1.0, "NO": 1.0})), lang.words)
    with open(tmp_path / "G.fst", "wb") as f:
        write_vector_fst(f, G)
    assert TOOLS["compile-graph"](
        [str(lexp), mdl, str(tmp_path / "G.fst"),
         str(tmp_path / "HCLG.fst")]) == 0
    HCLG = read_fst_path(str(tmp_path / "HCLG.fst"))
    assert HCLG.num_states > 5


def test_build_tree_two_level(tmp_path, rng):
    from kaldi_tpu.core import io as kio
    # reuse the acc-tree-stats flow from bank5's fixture shape
    phones = [1, 2, 3]
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(3), np.ones(3))
    mdl = str(tmp_path / "0.mdl")
    write_mdl(mdl, tm, am)
    feats, alis = {}, {}
    for k, ph in enumerate([[1, 2], [2, 3], [3, 1]]):
        tids = []
        for p in ph:
            for st in range(3):
                pdf = tm.tree.compute([p], st)
                ts = tm.tuple_to_transition_state(p, st, pdf, pdf)
                tids.append(tm.pair_to_transition_id(ts, 0))
        phs = [tm.transition_id_to_phone(t) for t in tids]
        feats[f"u{k}"] = np.stack(
            [np.full(3, p, np.float32)
             + 0.1 * rng.standard_normal(3) for p in phs])
        alis[f"u{k}"] = np.asarray(tids, np.int32)
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        for k, v in feats.items():
            w[k] = v
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        for k, v in alis.items():
            w[k] = v
    assert TOOLS["acc-tree-stats"](
        [mdl, f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/ali.ark",
         str(tmp_path / "tacc")]) == 0
    assert TOOLS["cluster-phones"](
        [str(tmp_path / "tacc"), str(tmp_path / "sets.txt")]) == 0
    assert TOOLS["compile-questions"](
        [str(tmp_path / "sets.txt"), str(tmp_path / "q.txt")]) == 0
    assert TOOLS["build-tree-two-level"](
        ["--max-leaves=9", "--num-clusters=3", str(tmp_path / "tacc"),
         str(tmp_path / "q.txt"), str(tmp_path / "tree"),
         str(tmp_path / "leafmap")]) == 0
    with kio.open_rxfilename(str(tmp_path / "leafmap")) as f:
        kio.init_kaldi_input_stream(f)
        leafmap = kio.read_int_vector(f)
    assert len(set(leafmap.tolist())) <= 3
    assert len(leafmap) >= 3


def test_nnet3_compute_from_egs(tmp_path, rng):
    assert TOOLS["nnet3-init"](
        ["--feat-dim=4", "--num-pdfs=3", "--hidden-dim=8",
         "--bottleneck-dim=4", "--num-layers=2",
         str(tmp_path / "m.raw")]) == 0
    from kaldi_tpu.pipelines.egs_io import XentEg
    with TableWriter(f"ark:{tmp_path}/egs.ark", holder="xeg") as w:
        w["e0"] = XentEg(
            feats=rng.standard_normal((1, 10, 4)).astype(np.float32),
            pdfs=np.zeros((1, 10), np.int32))
    assert TOOLS["nnet3-compute-from-egs"](
        ["--apply-exp=true", str(tmp_path / "m.raw"),
         f"ark:{tmp_path}/egs.ark", f"ark:{tmp_path}/out.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/out.ark",
                                     holder="mat"))["e0"]
    assert out.shape == (10, 3)
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-4)


def test_rnnlm_get_word_embedding(tmp_path):
    with TableWriter(f"ark:{tmp_path}/text.ark", holder="text") as w:
        w["s0"] = ["3", "4", "3"]
        w["s1"] = ["4", "3"]
    assert TOOLS["rnnlm-train"](
        ["--vocab-size=6", "--embed-dim=5", "--hidden-dim=7",
         "--num-epochs=1", f"ark:{tmp_path}/text.ark",
         str(tmp_path / "rnnlm")]) == 0
    assert TOOLS["rnnlm-get-word-embedding"](
        [str(tmp_path / "rnnlm"), str(tmp_path / "emb.mat")]) == 0
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(str(tmp_path / "emb.mat")) as f:
        kio.init_kaldi_input_stream(f)
        emb = kio.read_matrix(f)
    assert emb.ndim == 2


def test_lattice_to_ctm_conf(tmp_path, rng):
    clat = CompactLattice()
    s0, s1, s2 = (clat.add_state() for _ in range(3))
    clat.start = s0
    clat.arcs[s0].append(CompactArc(7, 0.0, 0.0, (1, 1, 1), s1))
    clat.arcs[s1].append(CompactArc(9, 0.0, 0.0, (1, 1), s2))
    clat.finals[s2] = (0.0, 0.0, ())
    with TableWriter(f"ark:{tmp_path}/l.ark", holder="clat") as w:
        w["u"] = clat
    assert TOOLS["lattice-to-ctm-conf"](
        [f"ark:{tmp_path}/l.ark", str(tmp_path / "out.ctm")]) == 0
    lines = open(tmp_path / "out.ctm").read().splitlines()
    assert len(lines) == 2
    parts = lines[0].split()
    assert parts[0] == "u" and parts[4] == "7"
    assert float(parts[5]) == pytest.approx(1.0, abs=0.05)


def test_interpolate_pitch(tmp_path):
    m = np.asarray([[0.9, 100.0], [0.01, 0.0], [0.9, 120.0]],
                   np.float32)
    with TableWriter(f"ark:{tmp_path}/p.ark", holder="mat") as w:
        w["u"] = m
    assert TOOLS["interpolate-pitch"](
        [f"ark:{tmp_path}/p.ark", f"ark:{tmp_path}/o.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/o.ark",
                                     holder="mat"))["u"]
    assert out[1, 1] == pytest.approx(110.0)


def test_copy_feats_to_sphinx(tmp_path, rng):
    import struct
    m = rng.standard_normal((4, 3)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["utt1"] = m
    assert TOOLS["copy-feats-to-sphinx"](
        [f"--output-dir={tmp_path}/sph", f"ark:{tmp_path}/f.ark"]) == 0
    raw = open(f"{tmp_path}/sph/utt1.mfc", "rb").read()
    n = struct.unpack(">i", raw[:4])[0]
    assert n == 12
    vals = np.frombuffer(raw[4:], dtype=">f4").reshape(4, 3)
    np.testing.assert_allclose(vals, m, atol=1e-6)


def test_ivector_adapt_plda(tmp_path, rng):
    from kaldi_tpu.am.ivector import Plda, read_plda, write_plda
    D = 3
    plda = Plda(np.zeros(D), np.eye(D), 0.5 * np.eye(D))
    write_plda(str(tmp_path / "plda"), plda)
    vecs = 4.0 * rng.standard_normal((50, D))
    with TableWriter(f"ark:{tmp_path}/iv.ark", holder="vec") as w:
        for i, v in enumerate(vecs):
            w[f"u{i}"] = v.astype(np.float32)
    assert TOOLS["ivector-adapt-plda"](
        [str(tmp_path / "plda"), f"ark:{tmp_path}/iv.ark",
         str(tmp_path / "plda2")]) == 0
    p2 = read_plda(str(tmp_path / "plda2"))
    # adaptation data has much larger variance → covariances grow
    assert np.trace(p2.within) > np.trace(plda.within)
    assert np.trace(p2.between) > np.trace(plda.between)
    np.testing.assert_allclose(p2.mean, vecs.mean(0), atol=1e-4)
