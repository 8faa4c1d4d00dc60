"""CLI bank 12: bin/featbin/gmmbin/fstbin long tail."""

import numpy as np
import pytest

from kaldi_tpu.cli import TOOLS
from kaldi_tpu.core.table import SequentialTableReader, TableWriter


@pytest.fixture
def rng():
    return np.random.default_rng(12)


@pytest.fixture
def mdl(tmp_path, rng):
    """A small monophone model + matching feats/ali/posts on disk."""
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.am.serialize import write_mdl
    from kaldi_tpu.am.topology import HmmTopology
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.am.tree import MonophoneContextDependency
    topo = HmmTopology.three_state([1, 2])
    tree = MonophoneContextDependency([1, 2], topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(4), np.ones(4),
                              perturb=0.1)
    path = tmp_path / "final.mdl"
    write_mdl(str(path), tm, am)
    T = 12
    feats = rng.normal(size=(T, 4)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        w["u1"] = feats
    ali = np.ones(T, np.int32)          # tid 1 throughout
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        w["u1"] = ali
    post = [[(1, 0.6), (2, 0.4)] for _ in range(T)]
    with TableWriter(f"ark:{tmp_path}/post.ark", holder="post") as w:
        w["u1"] = post
    return {"mdl": str(path), "tmp": tmp_path, "tm": tm, "am": am,
            "feats": feats}


def test_hmm_info_and_copy_tm(mdl, capsys):
    assert TOOLS["hmm-info"]([mdl["mdl"]]) == 0
    out = capsys.readouterr().out
    assert "number of pdfs 6" in out
    tm_out = mdl["tmp"] / "trans.mdl"
    assert TOOLS["copy-transition-model"]([mdl["mdl"], str(tm_out)]) == 0
    from kaldi_tpu.am.serialize import read_transition_model
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(str(tm_out)) as f:
        assert kio.init_kaldi_input_stream(f)
        tm2 = read_transition_model(f)
    assert tm2.num_transition_ids == mdl["tm"].num_transition_ids


def test_analyze_counts(mdl, tmp_path):
    out = tmp_path / "counts.txt"
    assert TOOLS["analyze-counts"](
        [f"ark:{mdl['tmp']}/ali.ark", str(out)]) == 0
    txt = open(out).read()
    assert txt.startswith("[") and "12" in txt


def test_post_algebra(mdl, tmp_path):
    tp = mdl["tmp"]
    # get-post-on-ali: weight of tid 1 = 0.6 each frame
    assert TOOLS["get-post-on-ali"](
        [f"ark:{tp}/post.ark", f"ark:{tp}/ali.ark",
         f"ark:{tmp_path}/conf.ark"]) == 0
    conf = dict(SequentialTableReader(f"ark:{tmp_path}/conf.ark",
                                      holder="vec"))["u1"]
    assert np.allclose(conf, 0.6)
    # weight-post by 0.5
    with TableWriter(f"ark:{tmp_path}/w.ark", holder="vec") as w:
        w["u1"] = np.full(12, 0.5, np.float32)
    assert TOOLS["weight-post"](
        [f"ark:{tp}/post.ark", f"ark:{tmp_path}/w.ark",
         f"ark:{tmp_path}/wpost.ark"]) == 0
    wpost = dict(SequentialTableReader(f"ark:{tmp_path}/wpost.ark",
                                       holder="post"))["u1"]
    assert wpost[0][0][1] == pytest.approx(0.3)
    # post-to-feats
    assert TOOLS["post-to-feats"](
        ["--post-dim=30", f"ark:{tp}/post.ark",
         f"ark:{tmp_path}/pf.ark"]) == 0
    pf = dict(SequentialTableReader(f"ark:{tmp_path}/pf.ark",
                                    holder="mat"))["u1"]
    assert pf.shape == (12, 30) and pf[0, 1] == pytest.approx(0.6)


def test_est_pca_and_wer_bootci(mdl, tmp_path, rng, capsys):
    tp = mdl["tmp"]
    pca = tmp_path / "pca.mat"
    assert TOOLS["est-pca"](
        ["--dim=2", f"ark:{tp}/feats.ark", str(pca)]) == 0
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(str(pca)) as f:
        assert kio.init_kaldi_input_stream(f)
        T = kio.read_matrix(f)
    assert T.shape == (2, 5)           # affine: D+1 columns
    # rows orthonormal (before mean column)
    assert np.allclose(T[:, :4] @ T[:, :4].T, np.eye(2), atol=1e-4)

    with TableWriter(f"ark:{tmp_path}/ref.ark", holder="text") as w:
        w["a"] = ["x", "y", "z"]
        w["b"] = ["x", "y"]
    with TableWriter(f"ark:{tmp_path}/hyp.ark", holder="text") as w:
        w["a"] = ["x", "y", "z"]
        w["b"] = ["x", "q"]
    assert TOOLS["compute-wer-bootci"](
        ["--replications=200", f"ark:{tmp_path}/ref.ark",
         f"ark:{tmp_path}/hyp.ark"]) == 0
    out = capsys.readouterr().out
    assert "%WER 20.00" in out and "Conf Interval" in out


def test_pdf_to_tid_and_draw_tree(mdl, tmp_path, capsys):
    from kaldi_tpu.cli.tools_extra import _load_fst
    out = tmp_path / "pdf2tid.fst"
    assert TOOLS["make-pdf-to-tid-transducer"]([mdl["mdl"], str(out)]) == 0
    fst = _load_fst(str(out))
    assert fst.num_states == 1
    assert fst.num_arcs == mdl["tm"].num_transition_ids
    tm = mdl["tm"]
    for a in fst.arcs[0]:
        assert a.ilabel == tm.transition_id_to_pdf(a.olabel) + 1

    # draw-tree on a monophone tree file
    from kaldi_tpu.am.serialize import write_tree
    from kaldi_tpu.core import io as kio
    from kaldi_tpu.am.tree import MonophoneContextDependency
    from kaldi_tpu.am.topology import HmmTopology
    topo = HmmTopology.three_state([1, 2])
    tree = MonophoneContextDependency([1, 2], topo)
    tpath = tmp_path / "tree"
    with kio.open_wxfilename(str(tpath)) as f:
        kio.init_kaldi_output_stream(f)
        write_tree(f, tree)
    assert TOOLS["draw-tree"]([str(tpath), "-"]) == 0
    dot = capsys.readouterr().out
    assert dot.startswith("digraph") and "pdf" in dot


def test_feature_surgery(mdl, tmp_path, rng):
    tp = mdl["tmp"]
    with TableWriter(f"ark:{tmp_path}/ivec.ark", holder="vec") as w:
        w["u1"] = np.arange(3, dtype=np.float32)
    assert TOOLS["append-vector-to-feats"](
        [f"ark:{tp}/feats.ark", f"ark:{tmp_path}/ivec.ark",
         f"ark:{tmp_path}/av.ark"]) == 0
    av = dict(SequentialTableReader(f"ark:{tmp_path}/av.ark",
                                    holder="mat"))["u1"]
    assert av.shape == (12, 7) and np.allclose(av[5, 4:], [0, 1, 2])

    assert TOOLS["append-post-to-feats"](
        ["--post-dim=3", f"ark:{tp}/feats.ark", f"ark:{tp}/post.ark",
         f"ark:{tmp_path}/ap.ark"]) == 0
    ap = dict(SequentialTableReader(f"ark:{tmp_path}/ap.ark",
                                    holder="mat"))["u1"]
    assert ap.shape == (12, 7) and ap[0, 5] == pytest.approx(0.6)

    # HTK round-trip
    assert TOOLS["copy-feats-to-htk"](
        [f"--output-dir={tmp_path}/htk", f"ark:{tp}/feats.ark"]) == 0
    import struct
    raw = open(f"{tmp_path}/htk/u1.fea", "rb").read()
    ns, sp, ss, pk = struct.unpack(">iihh", raw[:12])
    assert (ns, ss, pk) == (12, 16, 9)
    body = np.frombuffer(raw[12:], dtype=">f4").reshape(12, 4)
    assert np.allclose(body, mdl["feats"], atol=1e-6)

    # extract-rows
    ranges = tmp_path / "ranges"
    ranges.write_text("seg1 u1 2 5\n")
    assert TOOLS["extract-rows"](
        [str(ranges), f"ark:{tp}/feats.ark",
         f"ark:{tmp_path}/rows.ark"]) == 0
    seg = dict(SequentialTableReader(f"ark:{tmp_path}/rows.ark",
                                     holder="mat"))["seg1"]
    assert np.allclose(seg, mdl["feats"][2:5])


def test_modify_cmvn_stats(mdl, tmp_path):
    tp = mdl["tmp"]
    assert TOOLS["compute-cmvn-stats"](
        [f"ark:{tp}/feats.ark", f"ark:{tmp_path}/cmvn.ark"]) == 0
    assert TOOLS["modify-cmvn-stats"](
        [f"ark:{tmp_path}/cmvn.ark", f"ark:{tmp_path}/cmvn2.ark"]) == 0
    from kaldi_tpu.features.cmvn import apply_cmvn
    st = dict(SequentialTableReader(f"ark:{tmp_path}/cmvn2.ark",
                                    holder="mat"))["u1"]
    out = apply_cmvn(mdl["feats"], st, norm_vars=True)
    # variance-norm is now a no-op: out = x - mean
    assert np.allclose(out, mdl["feats"] - mdl["feats"].mean(0),
                       atol=1e-4)


def test_gmm_acc_stats_posts_vs_ali(mdl, tmp_path):
    """Posterior accumulation with weight 1 on the aligned tid must
    equal gmm-acc-stats-ali."""
    tp = mdl["tmp"]
    with TableWriter(f"ark:{tmp_path}/p1.ark", holder="post") as w:
        w["u1"] = [[(1, 1.0)] for _ in range(12)]
    assert TOOLS["gmm-acc-stats"](
        [mdl["mdl"], f"ark:{tp}/feats.ark", f"ark:{tmp_path}/p1.ark",
         f"{tmp_path}/acc1"]) == 0
    assert TOOLS["gmm-acc-stats-ali"](
        [mdl["mdl"], f"ark:{tp}/feats.ark", f"ark:{tp}/ali.ark",
         f"{tmp_path}/acc2"]) == 0
    from kaldi_tpu.cli.tools_extra import read_gmm_accs
    a1 = read_gmm_accs(f"{tmp_path}/acc1")
    a2 = read_gmm_accs(f"{tmp_path}/acc2")
    assert np.allclose(a1.occ, a2.occ, atol=1e-4)
    assert np.allclose(a1.mean_acc, a2.mean_acc, atol=1e-3)
    assert np.allclose(a1.var_acc, a2.var_acc, atol=1e-3)


def test_gmm_acc_algebra_and_ebw(mdl, tmp_path, rng):
    tp = mdl["tmp"]
    assert TOOLS["gmm-acc-stats-ali"](
        [mdl["mdl"], f"ark:{tp}/feats.ark", f"ark:{tp}/ali.ark",
         f"{tmp_path}/num"]) == 0
    assert TOOLS["gmm-scale-accs"](
        ["0.5", f"{tmp_path}/num", f"{tmp_path}/den"]) == 0
    from kaldi_tpu.cli.tools_extra import read_gmm_accs
    num = read_gmm_accs(f"{tmp_path}/num")
    den = read_gmm_accs(f"{tmp_path}/den")
    assert np.allclose(den.occ, 0.5 * num.occ)

    assert TOOLS["gmm-ismooth-stats"](
        ["--tau=10", mdl["mdl"], f"{tmp_path}/num",
         f"{tmp_path}/smoothed"]) == 0
    sm = read_gmm_accs(f"{tmp_path}/smoothed")
    assert np.all(sm.occ >= num.occ)

    assert TOOLS["gmm-est-gaussians-ebw"](
        [mdl["mdl"], f"{tmp_path}/num", f"{tmp_path}/den",
         f"{tmp_path}/ebw.mdl"]) == 0
    assert TOOLS["gmm-est-weights-ebw"](
        [f"{tmp_path}/ebw.mdl", f"{tmp_path}/num", f"{tmp_path}/den",
         f"{tmp_path}/ebw2.mdl"]) == 0
    from kaldi_tpu.am.serialize import read_mdl
    _, am2 = read_mdl(f"{tmp_path}/ebw2.mdl")
    w = am2.weights
    assert np.allclose(w.sum(axis=1), 1.0)
    assert (w >= 0).all()


def test_gmm_transform_means(mdl, tmp_path):
    from kaldi_tpu.core import io as kio
    T = np.hstack([2.0 * np.eye(4), np.ones((4, 1))]).astype(np.float32)
    with kio.open_wxfilename(f"{tmp_path}/t.mat") as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, T)
    assert TOOLS["gmm-transform-means"](
        [f"{tmp_path}/t.mat", mdl["mdl"], f"{tmp_path}/tx.mdl"]) == 0
    from kaldi_tpu.am.serialize import read_mdl
    _, am2 = read_mdl(f"{tmp_path}/tx.mdl")
    assert np.allclose(am2.means, 2.0 * mdl["am"].means + 1.0)


def test_gmm_make_regtree_and_flat_init(mdl, tmp_path):
    assert TOOLS["gmm-make-regtree"](
        ["--max-leaves=2", mdl["mdl"], f"{tmp_path}/regtree"]) == 0
    from kaldi_tpu.am.regtree import read_regtree
    rt = read_regtree(f"{tmp_path}/regtree")
    assert rt.num_pdfs == 6

    # flat init from tree+topo files
    from kaldi_tpu.am.serialize import write_tree, write_topology
    from kaldi_tpu.am.topology import HmmTopology
    from kaldi_tpu.am.tree import MonophoneContextDependency
    from kaldi_tpu.core import io as kio
    topo = HmmTopology.three_state([1, 2])
    tree = MonophoneContextDependency([1, 2], topo)
    with kio.open_wxfilename(f"{tmp_path}/tree") as f:
        kio.init_kaldi_output_stream(f)
        write_tree(f, tree)
    with kio.open_wxfilename(f"{tmp_path}/topo") as f:
        kio.init_kaldi_output_stream(f)
        write_topology(f, topo)
    assert TOOLS["gmm-init-model-flat"](
        ["--dim=4", f"{tmp_path}/tree", f"{tmp_path}/topo",
         f"{tmp_path}/flat.mdl"]) == 0
    from kaldi_tpu.am.serialize import read_mdl
    _, am = read_mdl(f"{tmp_path}/flat.mdl")
    assert am.num_pdfs == 6 and am.dim == 4


def test_gmm_global_tools(mdl, tmp_path, rng, capsys):
    tp = mdl["tmp"]
    # build a tiny global gmm via the existing init tool
    assert TOOLS["gmm-global-init-from-feats"](
        ["--num-gauss=2", "--num-iters=3", f"ark:{tp}/feats.ark",
         f"{tmp_path}/ubm"]) == 0
    assert TOOLS["gmm-global-acc-stats"](
        [f"{tmp_path}/ubm", f"ark:{tp}/feats.ark",
         f"{tmp_path}/ga1"]) == 0
    assert TOOLS["gmm-global-sum-accs"](
        [f"{tmp_path}/gsum", f"{tmp_path}/ga1", f"{tmp_path}/ga1"]) == 0
    from kaldi_tpu.cli.tools_extra import read_gmm_accs
    a = read_gmm_accs(f"{tmp_path}/ga1")
    s = read_gmm_accs(f"{tmp_path}/gsum")
    assert np.allclose(s.occ, 2 * a.occ)
    assert TOOLS["gmm-global-copy"](
        [f"{tmp_path}/ubm", f"{tmp_path}/ubm2"]) == 0
    assert TOOLS["gmm-global-info"]([f"{tmp_path}/ubm2"]) == 0
    out = capsys.readouterr().out
    assert "feature dimension 4" in out


def test_gmm_post_to_gpost(mdl, tmp_path):
    tp = mdl["tmp"]
    assert TOOLS["gmm-post-to-gpost"](
        [mdl["mdl"], f"ark:{tp}/feats.ark", f"ark:{tp}/post.ark",
         f"ark:{tmp_path}/gpost.ark"]) == 0
    gp = dict(SequentialTableReader(f"ark:{tmp_path}/gpost.ark",
                                    holder="post"))["u1"]
    # per frame the gaussian-level weights sum to the tid weights (1.0)
    tot = sum(w for _, w in gp[0])
    assert tot == pytest.approx(1.0, abs=1e-4)


def _linear_fst(labels, weight=0.0):
    from kaldi_tpu.fst.fst import Arc, VectorFst
    f = VectorFst()
    s = f.add_state()
    f.set_start(s)
    for il, ol in labels:
        n = f.add_state()
        f.arcs[s].append(Arc(il, ol, weight, n))
        s = n
    f.set_final(s, 0.0)
    return f


def test_fst_long_tail(tmp_path):
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    f = _linear_fst([(1, 5), (2, 0)])
    _save_fst(f"{tmp_path}/a.fst", f)
    assert TOOLS["fstcopy"]([f"{tmp_path}/a.fst",
                             f"{tmp_path}/b.fst"]) == 0
    g = _load_fst(f"{tmp_path}/b.fst")
    assert g.num_states == f.num_states and g.num_arcs == f.num_arcs

    assert TOOLS["fstdeterminize"]([f"{tmp_path}/a.fst",
                                    f"{tmp_path}/det.fst"]) == 0
    assert _load_fst(f"{tmp_path}/det.fst").num_states > 0

    # self-loops at final state + the state with the nonzero olabel arc
    (tmp_path / "ins").write_text("7\n")
    (tmp_path / "outs").write_text("8\n")
    assert TOOLS["fstaddselfloops"](
        [f"{tmp_path}/ins", f"{tmp_path}/outs", f"{tmp_path}/a.fst",
         f"{tmp_path}/sl.fst"]) == 0
    sl = _load_fst(f"{tmp_path}/sl.fst")
    loops = [(s, a) for s in range(sl.num_states)
             for a in sl.arcs[s] if a.nextstate == s]
    assert len(loops) == 2
    assert all(a.ilabel == 7 and a.olabel == 8 for _, a in loops)

    assert TOOLS["fstaddsubsequentialloop"](
        ["99", f"{tmp_path}/a.fst", f"{tmp_path}/sub.fst"]) == 0
    sub = _load_fst(f"{tmp_path}/sub.fst")
    assert sub.num_states == f.num_states + 1

    assert TOOLS["fstrandgen"](
        ["--seed=3", f"{tmp_path}/a.fst", f"{tmp_path}/rand.fst"]) == 0
    r = _load_fst(f"{tmp_path}/rand.fst")
    assert [a.ilabel for s in range(r.num_states)
            for a in r.arcs[s]] == [1, 2]


def test_fstphicompose_backoff(tmp_path):
    """fst1 emits word 3, fst2 only matches it from the backoff
    state reached via phi — composition must accumulate the phi
    weight."""
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.fst import Arc, VectorFst
    f1 = _linear_fst([(3, 3)])
    # fst2: state0 --phi(0.7)--> state1 --3:3(0.2)--> state2(final)
    f2 = VectorFst()
    s0, s1, s2 = f2.add_state(), f2.add_state(), f2.add_state()
    f2.set_start(s0)
    f2.arcs[s0].append(Arc(100, 100, 0.7, s1))
    f2.arcs[s0].append(Arc(4, 4, 0.0, s2))       # non-matching direct
    f2.arcs[s1].append(Arc(3, 3, 0.2, s2))
    f2.set_final(s2, 0.1)
    _save_fst(f"{tmp_path}/f1.fst", f1)
    _save_fst(f"{tmp_path}/f2.fst", f2)
    assert TOOLS["fstphicompose"](
        ["100", f"{tmp_path}/f1.fst", f"{tmp_path}/f2.fst",
         f"{tmp_path}/out.fst"]) == 0
    out = _load_fst(f"{tmp_path}/out.fst")
    from kaldi_tpu.fst.ops import shortest_path
    arcs, cost = shortest_path(out)
    assert [a.olabel for a in arcs if a.olabel] == [3]
    assert cost == pytest.approx(0.7 + 0.2 + 0.1, abs=1e-5)
