"""CLI bank 22: fMPE family + gmmbin adaptation/decode tail."""

import numpy as np
import pytest

from kaldi_tpu.am import (HmmTopology, MonophoneContextDependency,
                          TransitionModel)
from kaldi_tpu.am.gmm import AmDiagGmm
from kaldi_tpu.am.serialize import read_mdl, write_mdl
from kaldi_tpu.cli import TOOLS, main
from kaldi_tpu.core.table import SequentialTableReader, TableWriter


@pytest.fixture
def rng():
    return np.random.default_rng(22)


def _mdl(tmp_path, rng, D=3, M=2, name="0.mdl"):
    topo = HmmTopology.three_state([1, 2])
    tree = MonophoneContextDependency([1, 2], topo)
    tm = TransitionModel(topo, tree)
    P = tree.num_pdfs
    am = AmDiagGmm(rng.dirichlet(np.ones(M), size=P),
                   rng.standard_normal((P, M, D)),
                   0.5 + rng.random((P, M, D)))
    path = str(tmp_path / name)
    write_mdl(path, tm, am)
    return path, tm, am


def test_fmpe_cli_cycle(tmp_path, rng):
    D = 3
    mdl, tm, am = _mdl(tmp_path, rng, D=D)
    feats = {f"u{i}": rng.standard_normal((12, D)).astype(np.float32)
             for i in range(4)}
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        for k, v in feats.items():
            w[k] = v
    assert main(["gmm-global-init-from-feats", "--num-gauss=4",
                 "--num-iters=3", f"ark:{tmp_path}/f.ark",
                 str(tmp_path / "ubm")]) == 0
    assert main(["fmpe-init", "--gselect-n=3", "--context=1",
                 str(tmp_path / "ubm"), str(tmp_path / "0.fmpe")]) == 0
    # differenced posteriors: pull toward tid 1's pdf, away from the
    # highest tid's pdf
    t_hi = tm.num_transition_ids
    with TableWriter(f"ark:{tmp_path}/post.ark", holder="post") as w:
        for k, v in feats.items():
            w[k] = [[(1, 1.0), (t_hi, -1.0)] for _ in range(len(v))]
    # two shards + sum (the gmm-sum-accs contract)
    assert main(["fmpe-acc-stats", mdl, str(tmp_path / "0.fmpe"),
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/post.ark",
                 str(tmp_path / "a1.accs")]) == 0
    assert main(["gmm-fmpe-acc-stats", mdl, str(tmp_path / "0.fmpe"),
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/post.ark",
                 str(tmp_path / "a2.accs")]) == 0
    assert main(["fmpe-sum-accs", str(tmp_path / "sum.accs"),
                 str(tmp_path / "a1.accs"),
                 str(tmp_path / "a2.accs")]) == 0
    assert main(["fmpe-est", "--learning-rate=0.2",
                 str(tmp_path / "0.fmpe"), str(tmp_path / "sum.accs"),
                 str(tmp_path / "1.fmpe")]) == 0
    assert main(["fmpe-apply-transform", str(tmp_path / "1.fmpe"),
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/ft.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/ft.ark",
                                     holder="mat"))
    from kaldi_tpu.am.fmpe import apply_fmpe, read_fmpe
    fm = read_fmpe(str(tmp_path / "1.fmpe"))
    assert np.abs(fm.proj).max() > 0          # training moved it
    for k, v in feats.items():
        assert np.abs(out[k] - v).max() > 1e-5
        np.testing.assert_allclose(out[k], apply_fmpe(fm, v),
                                   atol=1e-5)
    # copy round-trips
    assert main(["fmpe-copy", str(tmp_path / "1.fmpe"),
                 str(tmp_path / "2.fmpe")]) == 0
    fm2 = read_fmpe(str(tmp_path / "2.fmpe"))
    np.testing.assert_allclose(fm2.proj, fm.proj)


def test_gmm_acc_stats_twofeats(tmp_path, rng):
    from kaldi_tpu.am.gmm import (GmmAccs, accumulate_stats_twofeats,
                                  mle_update)
    import copy
    D = 3
    mdl, tm, am = _mdl(tmp_path, rng, D=D)
    T = 40
    f1 = rng.standard_normal((T, D)).astype(np.float32)
    f2 = rng.standard_normal((T, D)).astype(np.float32)
    tids = rng.integers(1, tm.num_transition_ids + 1, T).astype(np.int32)
    with TableWriter(f"ark:{tmp_path}/f1.ark", holder="mat") as w:
        w["u"] = f1
    with TableWriter(f"ark:{tmp_path}/f2.ark", holder="mat") as w:
        w["u"] = f2
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        w["u"] = tids
    assert main(["gmm-acc-stats-twofeats", mdl,
                 f"ark:{tmp_path}/f1.ark", f"ark:{tmp_path}/f2.ark",
                 f"ark:{tmp_path}/ali.ark",
                 str(tmp_path / "tf.accs")]) == 0
    assert main(["gmm-est", mdl, str(tmp_path / "tf.accs"),
                 str(tmp_path / "ali.mdl")]) == 0
    _tm2, got = read_mdl(str(tmp_path / "ali.mdl"))
    # oracle: direct library call
    ref = copy.deepcopy(am)
    accs = GmmAccs.zeros(am.num_pdfs, am.max_mix, am.dim)
    accumulate_stats_twofeats(am, f1, f2,
                              tm.tid_to_pdf_array[tids], accs)
    mle_update(ref, accs)
    np.testing.assert_allclose(got.means, ref.means, atol=1e-4)


def _mini_graph(tmp_path, rng):
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    from kaldi_tpu.fst.openfst_io import write_fst_path
    lex = Lexicon(entries=[("A", ["Y"]), ("B", ["N"])])
    lang = Lang(lex)
    topo = HmmTopology.three_state(lang.phone_list())
    tree = MonophoneContextDependency(lang.phone_list(), topo)
    tm = TransitionModel(topo, tree)
    P, M, D = tree.num_pdfs, 1, 2
    am = AmDiagGmm(np.ones((P, M)), rng.standard_normal((P, M, D)),
                   np.ones((P, M, D)))
    mdl = str(tmp_path / "g.mdl")
    write_mdl(mdl, tm, am)
    HCLG = mkgraph(lang, tm, arpa_to_fst(ArpaModel.parse(
        make_unigram_arpa({"A": 1.0, "B": 1.0})), lang.words))
    fst_path = str(tmp_path / "hclg.fst")
    write_fst_path(fst_path, HCLG)
    return mdl, tm, am, fst_path


def test_gmm_decode_simple_matches_faster(tmp_path, rng):
    mdl, tm, am, fst_path = _mini_graph(tmp_path, rng)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        for i in range(3):
            w[f"u{i}"] = rng.standard_normal((10, am.dim)
                                             ).astype(np.float32)
    assert main(["gmm-decode-simple", mdl, fst_path,
                 f"ark:{tmp_path}/f.ark",
                 f"ark,t:{tmp_path}/w1.txt"]) == 0
    assert main(["gmm-decode-faster", mdl, fst_path,
                 f"ark:{tmp_path}/f.ark",
                 f"ark,t:{tmp_path}/w2.txt"]) == 0
    a = dict(SequentialTableReader(f"ark,t:{tmp_path}/w1.txt",
                                   holder="text"))
    b = dict(SequentialTableReader(f"ark,t:{tmp_path}/w2.txt",
                                   holder="text"))
    assert a == b


def test_regtree_decode_tools(tmp_path, rng):
    mdl, tm, am, fst_path = _mini_graph(tmp_path, rng)
    D = am.dim
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        for i in range(2):
            w[f"u{i}"] = rng.standard_normal((8, D)).astype(np.float32)
    # identity transforms → same words as plain decode
    ident = np.concatenate([np.eye(D), np.zeros((D, 1))],
                           axis=1).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/t.ark", holder="mat") as w:
        w["u0"] = ident
        w["u1"] = ident
    for name in ("gmm-decode-faster-regtree-fmllr",
                 "gmm-decode-faster-regtree-mllr"):
        assert main([name, mdl, fst_path, f"ark:{tmp_path}/t.ark",
                     f"ark:{tmp_path}/f.ark",
                     f"ark,t:{tmp_path}/wr.txt"]) == 0
        assert main(["gmm-decode-faster", mdl, fst_path,
                     f"ark:{tmp_path}/f.ark",
                     f"ark,t:{tmp_path}/wp.txt"]) == 0
        a = dict(SequentialTableReader(f"ark,t:{tmp_path}/wr.txt",
                                       holder="text"))
        b = dict(SequentialTableReader(f"ark,t:{tmp_path}/wp.txt",
                                       holder="text"))
        assert a == b


def test_gmm_est_fmllr_global_alias(tmp_path, rng):
    D = 3
    feats = rng.standard_normal((200, D)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = feats
    assert main(["gmm-global-init-from-feats", "--num-gauss=2",
                 "--num-iters=3", f"ark:{tmp_path}/f.ark",
                 str(tmp_path / "ubm")]) == 0
    assert main(["gmm-est-fmllr-global", str(tmp_path / "ubm"),
                 f"ark:{tmp_path}/f.ark",
                 f"ark:{tmp_path}/trans.ark"]) == 0
    W = dict(SequentialTableReader(f"ark:{tmp_path}/trans.ark",
                                   holder="mat"))["u"]
    assert W.shape == (D, D + 1)


def test_gmm_latgen_map(tmp_path, rng):
    mdl, tm, am, fst_path = _mini_graph(tmp_path, rng)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u0"] = rng.standard_normal((9, am.dim)).astype(np.float32)
    # first pass alignment from plain decode
    assert main(["gmm-decode-faster", mdl, fst_path,
                 f"ark:{tmp_path}/f.ark", f"ark,t:{tmp_path}/w.txt",
                 f"ark:{tmp_path}/ali.ark"]) == 0
    assert main(["gmm-latgen-map", "--mean-tau=5.0", mdl, fst_path,
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/ali.ark",
                 f"ark:{tmp_path}/lat.ark"]) == 0
    lat = dict(SequentialTableReader(f"ark:{tmp_path}/lat.ark",
                                     holder="clat"))["u0"]
    assert lat.num_arcs > 0
    words, _tids, cost = lat.best_path()   # decodes to a valid path
    assert np.isfinite(cost)


def test_gmm_transform_means_global(tmp_path, rng):
    from kaldi_tpu.cli.tools_bank5 import (_read_global_gmm,
                                           _write_global_gmm)
    from kaldi_tpu.core import io as kio
    D = 3
    am = AmDiagGmm(np.ones((1, 2)) / 2, rng.standard_normal((1, 2, D)),
                   np.ones((1, 2, D)))
    _write_global_gmm(str(tmp_path / "g.ubm"), am)
    mat = np.concatenate([2.0 * np.eye(D), np.ones((D, 1))],
                         axis=1).astype(np.float32)
    with kio.open_wxfilename(str(tmp_path / "t.mat")) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, mat)
    assert main(["gmm-transform-means-global", str(tmp_path / "t.mat"),
                 str(tmp_path / "g.ubm"), str(tmp_path / "g2.ubm")]) == 0
    out = _read_global_gmm(str(tmp_path / "g2.ubm"))
    np.testing.assert_allclose(out.means, 2.0 * am.means + 1.0,
                               atol=1e-5)


def test_gmm_init_biphone(tmp_path, rng):
    from kaldi_tpu.am.serialize import read_topology, read_tree, \
        write_topology
    from kaldi_tpu.core import io as kio
    topo = HmmTopology.chain([1, 2, 3])
    with kio.open_wxfilename(str(tmp_path / "topo")) as f:
        kio.init_kaldi_output_stream(f)
        write_topology(f, topo)
    assert main(["gmm-init-biphone", str(tmp_path / "topo"), "4",
                 str(tmp_path / "bi.mdl"), str(tmp_path / "tree")]) == 0
    tm, am = read_mdl(str(tmp_path / "bi.mdl"))
    with kio.open_rxfilename(str(tmp_path / "tree")) as f:
        kio.init_kaldi_input_stream(f)
        tree = read_tree(f)
    assert tree.context_width == 2 and tree.central_position == 1
    # distinct left context → distinct pdf; same window → same pdf
    assert tree.compute([1, 2], 0) != tree.compute([3, 2], 0)
    assert tree.compute([0, 2], 0) != tree.compute([1, 2], 0)
    assert am.num_pdfs == tree.num_pdfs and am.dim == 4
    # shared-phones merges left classes
    (tmp_path / "shared").write_text("1 2 3\n")
    assert main(["gmm-init-biphone",
                 f"--shared-phones={tmp_path}/shared",
                 str(tmp_path / "topo"), "4",
                 str(tmp_path / "bi2.mdl"), str(tmp_path / "tree2")]) == 0
    with kio.open_rxfilename(str(tmp_path / "tree2")) as f:
        kio.init_kaldi_input_stream(f)
        tree2 = read_tree(f)
    assert tree2.compute([1, 2], 0) == tree2.compute([3, 2], 0)
    assert tree2.num_pdfs < tree.num_pdfs
