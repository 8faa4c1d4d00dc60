"""CLI bank 9: training binaries, RNNLM, SGMM2, n-best plumbing,
transform estimation."""

import numpy as np
import pytest

from kaldi_tpu.am.gmm import AmDiagGmm
from kaldi_tpu.am.serialize import write_mdl
from kaldi_tpu.am.topology import HmmTopology
from kaldi_tpu.am.transitions import TransitionModel
from kaldi_tpu.am.tree import MonophoneContextDependency
from kaldi_tpu.cli import TOOLS
from kaldi_tpu.core.table import SequentialTableReader, TableWriter


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def mono_setup(tmp_path, rng):
    phones = [1, 2, 3]
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    D = 5
    am = AmDiagGmm(rng.dirichlet(np.ones(2), size=tree.num_pdfs),
                   rng.standard_normal((tree.num_pdfs, 2, D)),
                   0.5 + rng.random((tree.num_pdfs, 2, D)))
    mdl = str(tmp_path / "final.mdl")
    write_mdl(mdl, tm, am)
    return mdl, tm, am


def test_convert_ali_identity(tmp_path, mono_setup):
    mdl, tm, _ = mono_setup
    # a legal tid path for phone 1 through the 3-state topology
    fwd = {}
    slf = {}
    for tid in range(1, tm.num_transition_ids + 1):
        key = (tm.transition_id_to_phone(tid),
               tm.transition_id_to_hmm_state(tid))
        (slf if tm.is_self_loop(tid) else fwd).setdefault(key, tid)
    tids = []
    for st in range(3):
        tids.extend([fwd[(1, st)], slf[(1, st)]])
    with TableWriter(f"ark:{tmp_path}/a.ark", holder="ivec") as w:
        w["u"] = np.asarray(tids, np.int32)
    # same model both sides (+ kaldi arity with a tree arg) → identity
    assert TOOLS["convert-ali"](
        [mdl, mdl, "unused-tree", f"ark:{tmp_path}/a.ark",
         f"ark:{tmp_path}/o.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/o.ark",
                                     holder="ivec"))["u"]
    np.testing.assert_array_equal(out, tids)


def test_gmm_decode_faster(tmp_path, rng, mono_setup):
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    from kaldi_tpu.fst.fst import VectorFst
    lex = Lexicon(entries=[("A", ["a1"]), ("B", ["b1", "b2"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"A": 1.0, "B": 1.0})),
        lang.words))
    D = 7
    am = AmDiagGmm(rng.dirichlet(np.ones(2), size=tree.num_pdfs),
                   rng.standard_normal((tree.num_pdfs, 2, D)),
                   0.5 + rng.random((tree.num_pdfs, 2, D)))
    mdl = tmp_path / "m.mdl"
    write_mdl(str(mdl), tm, am)
    fstp = tmp_path / "HCLG.fst"
    HCLG.write_text(str(fstp))
    feats = rng.standard_normal((20, D)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = feats
    assert TOOLS["gmm-decode-faster"](
        ["--acoustic-scale=0.5", str(mdl), str(fstp),
         f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/w.ark",
         f"ark:{tmp_path}/ali.ark"]) == 0
    words = dict(SequentialTableReader(f"ark:{tmp_path}/w.ark",
                                       holder="text"))["u"]
    ali = dict(SequentialTableReader(f"ark:{tmp_path}/ali.ark",
                                     holder="ivec"))["u"]
    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=16.0, acoustic_scale=0.5))
    ref_tids, ref_ols, _ = dec.decode(np.asarray(am.loglikes(feats)))
    assert words == [str(o) for o in ref_ols]
    np.testing.assert_array_equal(ali, ref_tids)


def test_acc_est_lda(tmp_path, mono_setup, rng):
    mdl, tm, _ = mono_setup
    D = 5
    # features whose mean depends on the aligned pdf → LDA must find a
    # projection separating the classes
    tid_a = 1
    pdf_a = tm.transition_id_to_pdf(tid_a)
    tid_b = next(t for t in range(1, tm.num_transition_ids + 1)
                 if tm.transition_id_to_pdf(t) != pdf_a)
    T = 60
    tids = np.array([tid_a if t % 2 else tid_b for t in range(T)])
    mu = {tid_a: np.full(D, 3.0), tid_b: np.full(D, -3.0)}
    feats = np.stack([mu[t] + 0.1 * rng.standard_normal(D)
                      for t in tids]).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = feats
    with TableWriter(f"ark:{tmp_path}/p.ark", holder="post") as w:
        w["u"] = [[(int(t), 1.0)] for t in tids]
    acc = tmp_path / "lda.acc"
    assert TOOLS["acc-lda"]([mdl, f"ark:{tmp_path}/f.ark",
                             f"ark:{tmp_path}/p.ark", str(acc)]) == 0
    out = tmp_path / "lda.mat"
    assert TOOLS["est-lda"](["--dim=2", str(out), str(acc)]) == 0
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(str(out)) as f:
        assert kio.init_kaldi_input_stream(f)
        mat = kio.read_matrix(f)
    assert mat.shape == (2, D + 1)
    pa = mat[:, :D] @ mu[tid_a] + mat[:, D]
    pb = mat[:, :D] @ mu[tid_b] + mat[:, D]
    assert np.linalg.norm(pa - pb) > 1.0      # classes separated


def test_acc_est_mllt(tmp_path, mono_setup, rng):
    mdl, tm, am = mono_setup
    D = am.dim
    T = 40
    tids = np.array([1 + (t % tm.num_transition_ids) for t in range(T)])
    feats = rng.standard_normal((T, D)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = feats
    with TableWriter(f"ark:{tmp_path}/a.ark", holder="ivec") as w:
        w["u"] = tids.astype(np.int32)
    acc = tmp_path / "mllt.acc"
    assert TOOLS["gmm-acc-mllt"]([mdl, f"ark:{tmp_path}/f.ark",
                                  f"ark:{tmp_path}/a.ark", str(acc)]) == 0
    out = tmp_path / "mllt.mat"
    assert TOOLS["est-mllt"]([str(out), str(acc)]) == 0
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(str(out)) as f:
        assert kio.init_kaldi_input_stream(f)
        mat = kio.read_matrix(f)
    assert mat.shape == (D, D)
    assert abs(np.linalg.det(mat)) > 1e-6     # invertible transform


def test_make_h_transducer(tmp_path, mono_setup):
    from kaldi_tpu.cli.tools_extra import _load_fst
    mdl, tm, _ = mono_setup
    out = tmp_path / "Ha.fst"
    dsyms = tmp_path / "disambig.int"
    assert TOOLS["make-h-transducer"](
        [f"--disambig-syms-out={dsyms}", "-", mdl, str(out)]) == 0
    ha = _load_fst(str(out))
    assert ha.num_states > 0
    ilabels = {a.ilabel for arcs in ha.arcs for a in arcs if a.ilabel}
    assert ilabels and min(ilabels) >= 1


def test_nbest_plumbing(tmp_path):
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    clat = CompactLattice()
    s0, s1, s2 = (clat.add_state() for _ in range(3))
    clat.start = s0
    clat.arcs[s0].append(CompactArc(7, 1.0, 2.0, (1, 2), s1))
    clat.arcs[s0].append(CompactArc(8, 4.0, 3.0, (3,), s1))
    clat.arcs[s1].append(CompactArc(9, 0.5, 0.5, (4,), s2))
    clat.finals[s2] = (0.25, 0.25, (5,))
    with TableWriter(f"ark:{tmp_path}/l.ark", holder="clat") as w:
        w["u"] = clat
    assert TOOLS["lattice-to-nbest"](
        ["--n=2", f"ark:{tmp_path}/l.ark", f"ark:{tmp_path}/nb.ark"]) == 0
    nb = dict(SequentialTableReader(f"ark:{tmp_path}/nb.ark",
                                    holder="clat"))
    assert set(nb) == {"u-1", "u-2"}
    w1, _, c1 = nb["u-1"].best_path()
    w2, _, c2 = nb["u-2"].best_path()
    assert w1 == [7, 9] and w2 == [8, 9]
    assert c1 == pytest.approx(4.5) and c2 == pytest.approx(8.5)
    # → linear tables and back
    assert TOOLS["nbest-to-linear"](
        [f"ark:{tmp_path}/nb.ark", f"ark:{tmp_path}/ali.ark",
         f"ark:{tmp_path}/w.ark", f"ark:{tmp_path}/lm.ark",
         f"ark:{tmp_path}/ac.ark"]) == 0
    words = dict(SequentialTableReader(f"ark:{tmp_path}/w.ark",
                                       holder="text"))
    assert words["u-1"] == ["7", "9"]
    ali = dict(SequentialTableReader(f"ark:{tmp_path}/ali.ark",
                                     holder="ivec"))
    np.testing.assert_array_equal(ali["u-1"], [1, 2, 4, 5])
    assert TOOLS["linear-to-nbest"](
        [f"ark:{tmp_path}/ali.ark", f"ark:{tmp_path}/w.ark",
         f"ark:{tmp_path}/lm.ark", f"ark:{tmp_path}/ac.ark",
         f"ark:{tmp_path}/nb2.ark"]) == 0
    nb2 = dict(SequentialTableReader(f"ark:{tmp_path}/nb2.ark",
                                     holder="clat"))
    rw, rt, rc = nb2["u-1"].best_path()
    assert rw == [7, 9] and rc == pytest.approx(4.5) and rt == [1, 2, 4, 5]
    # lattice-to-fst keeps path structure
    assert TOOLS["lattice-to-fst"](
        ["--lm-scale=1.0", "--acoustic-scale=1.0",
         f"ark:{tmp_path}/l.ark", f"ark:{tmp_path}/fst.ark"]) == 0
    fst = dict(SequentialTableReader(f"ark:{tmp_path}/fst.ark",
                                     holder="fst"))["u"]
    assert fst.num_states == 3 and len(fst.arcs[0]) == 2
    assert fst.arcs[0][0].weight == pytest.approx(3.0)


def test_ivector_extract_online(tmp_path, rng):
    from kaldi_tpu.am.ivector import (IvectorExtractor,
                                      write_ivector_extractor)
    G, D, IV = 4, 6, 3
    ex = IvectorExtractor(rng.standard_normal((G, D)),
                          0.5 + rng.random((G, D)),
                          np.full(G, 1.0 / G), IV)
    exf = tmp_path / "final.ie"
    write_ivector_extractor(str(exf), ex)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = rng.standard_normal((25, D)).astype(np.float32)
    assert TOOLS["ivector-extract-online"](
        ["--ivector-period=10", str(exf), f"ark:{tmp_path}/f.ark",
         f"ark:{tmp_path}/iv.ark"]) == 0
    iv = np.asarray(dict(SequentialTableReader(
        f"ark:{tmp_path}/iv.ark", holder="mat"))["u"])
    assert iv.shape == (3, IV)                 # ceil(25/10) rows
    assert np.isfinite(iv).all()
    # estimates evolve as stats accumulate
    assert not np.allclose(iv[0], iv[2])


def test_nnet3_train_cli(tmp_path, rng):
    from kaldi_tpu.am.nnet3_io import read_nnet3
    T, D, P = 24, 6, 4
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w, \
            TableWriter(f"ark:{tmp_path}/a.ark", holder="ivec") as aw:
        for u in range(3):
            w[f"u{u}"] = rng.standard_normal((T, D)).astype(np.float32)
            aw[f"u{u}"] = rng.integers(0, P, T).astype(np.int32)
    out = tmp_path / "final.raw"
    assert TOOLS["nnet3-train"](
        [f"--num-pdfs={P}", "--hidden-dim=16", "--bottleneck-dim=8",
         "--num-layers=2", "--num-epochs=1",
         f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/a.ark",
         str(out)]) == 0
    with open(out, "rb") as f:
        assert f.read(2) == b"\0B"
        model = read_nnet3(f)
    assert model.components


def test_nnet3_chain_train_cli(tmp_path, rng):
    from kaldi_tpu.am.nnet3_io import write_raw_model
    from kaldi_tpu.am.tdnn import TdnnChain, TdnnConfig
    from kaldi_tpu.pipelines.chain import ChainEgs
    from kaldi_tpu.pipelines.egs_io import write_egs_ark
    import jax
    phones = [1, 2]
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    P = tree.num_pdfs
    D = 6
    am = AmDiagGmm.flat_start(P, np.zeros(D), np.ones(D))
    mdl = tmp_path / "final.mdl"
    write_mdl(str(mdl), tm, am)
    cfg = TdnnConfig(feat_dim=D, num_pdfs=P, hidden_dim=16,
                     bottleneck_dim=8, num_layers=2,
                     frame_subsampling_factor=3)
    net = TdnnChain(cfg)
    variables = net.init(jax.random.PRNGKey(0), np.zeros((2, 12, D)),
                         train=False)
    raw_in = tmp_path / "0.raw"
    write_raw_model(str(raw_in), variables["params"],
                    variables.get("batch_stats", {}), cfg)
    # phone sequences + egs
    with TableWriter(f"ark:{tmp_path}/ph.ark", holder="ivec") as w:
        for u in range(4):
            w[f"u{u}"] = np.asarray(
                rng.choice(phones, size=6), np.int32)
    N, T = 4, 24
    feats = rng.standard_normal((N, T, D)).astype(np.float32)
    pdf_ali = rng.integers(0, P, (N, T // 3)).astype(np.int32)
    mask = np.ones((N, T // 3), bool)
    egs = ChainEgs(feats=feats, pdf_ali=pdf_ali, mask=mask)
    write_egs_ark(f"ark:{tmp_path}/egs.ark", egs)
    raw_out = tmp_path / "1.raw"
    assert TOOLS["nnet3-chain-train"](
        ["--num-epochs=1", str(mdl), str(raw_in),
         f"ark:{tmp_path}/ph.ark", f"ark:{tmp_path}/egs.ark",
         str(raw_out)]) == 0
    assert raw_out.exists()
    # diagnostics tool runs on the trained model
    assert TOOLS["nnet3-chain-compute-prob"](
        [str(mdl), str(raw_out), f"ark:{tmp_path}/ph.ark",
         f"ark:{tmp_path}/egs.ark"]) == 0


def test_rnnlm_tools(tmp_path, capsys):
    V = 10
    with TableWriter(f"ark:{tmp_path}/t.ark", holder="text") as w:
        for u in range(6):
            w[f"u{u}"] = [str(3 + (u + i) % 4) for i in range(4)]
    out = tmp_path / "final.rnnlm"
    assert TOOLS["rnnlm-train"](
        [f"--vocab-size={V}", "--embed-dim=4", "--hidden-dim=4",
         "--num-epochs=2", f"ark:{tmp_path}/t.ark", str(out)]) == 0
    assert TOOLS["rnnlm-compute-prob"](
        [str(out), f"ark:{tmp_path}/t.ark"]) == 0
    ppl = float(capsys.readouterr().out.strip())
    assert 1.0 < ppl < V * 10
    # rescoring: costs change, path set preserved
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    words_txt = tmp_path / "words.txt"
    words_txt.write_text(
        "<eps> 0\n<s> 1\n</s> 2\n" +
        "".join(f"w{i} {i}\n" for i in range(3, V)))
    clat = CompactLattice()
    s0, s1 = clat.add_state(), clat.add_state()
    clat.start = s0
    clat.arcs[s0].append(CompactArc(3, 0.5, 1.0, (1,), s1))
    clat.arcs[s0].append(CompactArc(4, 0.5, 1.2, (2,), s1))
    clat.finals[s1] = (0.0, 0.0, ())
    with TableWriter(f"ark:{tmp_path}/l.ark", holder="clat") as w:
        w["u"] = clat
    assert TOOLS["lattice-lmrescore-kaldi-rnnlm"](
        [str(out), str(words_txt), f"ark:{tmp_path}/l.ark",
         f"ark:{tmp_path}/r.ark"]) == 0
    res = dict(SequentialTableReader(f"ark:{tmp_path}/r.ark",
                                     holder="clat"))["u"]
    assert {w for w, _ in res.paths()} == {(3,), (4,)}
    base = {w: c for w, c in clat.paths()}
    got = {w: c for w, c in res.paths()}
    assert any(abs(got[w] - base[w]) > 1e-4 for w in got)


def test_sgmm2_tools(tmp_path, rng, capsys):
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = rng.standard_normal((30, 5)).astype(np.float32)
    out = tmp_path / "0.sgmm2"
    assert TOOLS["sgmm2-init"](
        ["--num-pdfs=6", "--num-gauss=3", "--subspace-dim=2",
         f"ark:{tmp_path}/f.ark", str(out)]) == 0
    assert TOOLS["sgmm2-info"]([str(out)]) == 0
    info = capsys.readouterr().out
    assert "num-pdfs 6" in info and "subspace-dim 2" in info
    cp = tmp_path / "1.sgmm2"
    assert TOOLS["sgmm2-copy"]([str(out), str(cp)]) == 0
    from kaldi_tpu.am.sgmm2 import read_sgmm2
    a, b = read_sgmm2(str(out)), read_sgmm2(str(cp))
    np.testing.assert_allclose(a.M, b.M)


def test_matrix_sum_vector_scale(tmp_path, rng):
    m1 = rng.standard_normal((3, 4)).astype(np.float32)
    m2 = rng.standard_normal((3, 4)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/a.ark", holder="mat") as w:
        w["u"] = m1
    with TableWriter(f"ark:{tmp_path}/b.ark", holder="mat") as w:
        w["u"] = m2
    assert TOOLS["matrix-sum"](
        [f"ark:{tmp_path}/a.ark", f"ark:{tmp_path}/b.ark",
         f"ark:{tmp_path}/s.ark"]) == 0
    got = dict(SequentialTableReader(f"ark:{tmp_path}/s.ark",
                                     holder="mat"))["u"]
    np.testing.assert_allclose(got, m1 + m2, rtol=1e-6)
    # single-table reduction → one matrix file
    out = tmp_path / "sum.mat"
    assert TOOLS["matrix-sum"]([f"ark:{tmp_path}/a.ark", str(out)]) == 0
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(str(out)) as f:
        assert kio.init_kaldi_input_stream(f)
        np.testing.assert_allclose(kio.read_matrix(f), m1, rtol=1e-6)
    v = rng.standard_normal(6).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/v.ark", holder="vec") as w:
        w["u"] = v
    assert TOOLS["vector-scale"](
        ["--scale=2.5", f"ark:{tmp_path}/v.ark",
         f"ark:{tmp_path}/vs.ark"]) == 0
    got = dict(SequentialTableReader(f"ark:{tmp_path}/vs.ark",
                                     holder="vec"))["u"]
    np.testing.assert_allclose(got, 2.5 * v, rtol=1e-6)
