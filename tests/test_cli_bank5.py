"""CLI tool bank 5 (cli/tools_bank5.py) + lattice/ops.py: tree
building, posterior algebra, global GMMs, lattice structural ops —
driven through `main([...])` with real files, oracled against direct
library calls and exhaustive path enumeration."""

import math

import numpy as np
import pytest

from kaldi_tpu.am.gmm import AmDiagGmm
from kaldi_tpu.am.serialize import write_mdl
from kaldi_tpu.am.topology import HmmTopology
from kaldi_tpu.am.transitions import TransitionModel
from kaldi_tpu.am.tree import MonophoneContextDependency
from kaldi_tpu.cli import main
from kaldi_tpu.core.table import SequentialTableReader, TableWriter
from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
from kaldi_tpu.lattice.ops import (enumerate_paths, interp_lattices,
                                   lattice_confidence, lattice_union,
                                   lattices_equivalent, push_lattice)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _mono_model(tmp_path, rng, D=4, M=2, name="0.mdl"):
    phones = [1, 2]
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    P = tree.num_pdfs
    am = AmDiagGmm(rng.dirichlet(np.ones(M), size=P),
                   rng.standard_normal((P, M, D)),
                   0.5 + rng.random((P, M, D)))
    path = str(tmp_path / name)
    write_mdl(path, tm, am)
    return path, tm, am


def _clat_a():
    c = CompactLattice()
    s = [c.add_state() for _ in range(4)]
    c.start = s[0]
    c.arcs[s[0]].append(CompactArc(7, 1.0, 2.0, (3, 4), s[1]))
    c.arcs[s[0]].append(CompactArc(8, 1.5, 2.5, (5, 6), s[1]))
    c.arcs[s[1]].append(CompactArc(9, 0.5, 0.5, (3,), s[2]))
    c.arcs[s[1]].append(CompactArc(0, 0.2, 0.1, (), s[3]))  # ε word
    c.arcs[s[3]].append(CompactArc(9, 0.1, 0.2, (4,), s[2]))
    c.finals[s[2]] = (0.0, 0.0, ())
    return c


def _clat_b():
    c = CompactLattice()
    s = [c.add_state() for _ in range(3)]
    c.start = s[0]
    c.arcs[s[0]].append(CompactArc(7, 0.4, 0.6, (3,), s[1]))
    c.arcs[s[1]].append(CompactArc(9, 1.0, 1.0, (4,), s[2]))
    c.finals[s[2]] = (0.3, 0.2, ())
    return c


# ---------------------------------------------------------------------------
# lattice ops
# ---------------------------------------------------------------------------

def test_lattice_union_paths():
    u = lattice_union(_clat_a(), _clat_b())
    pa, pb = enumerate_paths(_clat_a()), enumerate_paths(_clat_b())
    pu = enumerate_paths(u)
    assert set(pu) == set(pa) | set(pb)
    for w in pu:
        expected = min(pa.get(w, math.inf), pb.get(w, math.inf))
        assert abs(pu[w] - expected) < 1e-9


def test_lattice_push_preserves_paths():
    a = _clat_a()
    p = push_lattice(a)
    assert lattices_equivalent(a, p)
    # after pushing, the best total cost from the true start's successor
    # states to final is 0 — i.e. the best full path leaves the start
    # with its full cost already accounted
    best = min(enumerate_paths(a).values())
    start_arcs = p.arcs[p.start]
    assert len(start_arcs) >= 1
    # potential re-entry arc carries the whole best-path cost
    assert abs(min(enumerate_paths(p).values()) - best) < 1e-9


def test_lattice_interp_scores():
    a, b = _clat_a(), _clat_b()
    out = interp_lattices(a, b, alpha=0.25)
    assert out is not None
    pa, pb = enumerate_paths(a), enumerate_paths(b)
    po = enumerate_paths(out)
    # shared word sequences only
    shared = set(pa) & set(pb)
    assert set(po) == shared
    for w in shared:
        assert abs(po[w] - (0.25 * pa[w] + 0.75 * pb[w])) < 1e-9
    # disjoint lattices -> None
    c = CompactLattice()
    s0, s1 = c.add_state(), c.add_state()
    c.start = s0
    c.arcs[s0].append(CompactArc(99, 0.0, 0.0, (), s1))
    c.finals[s1] = (0.0, 0.0, ())
    assert interp_lattices(a, c) is None


def test_lattice_confidence_gap():
    a = _clat_a()
    paths = sorted(enumerate_paths(a).items(), key=lambda kv: kv[1])
    gap = paths[1][1] - paths[0][1]
    assert abs(lattice_confidence(a) - gap) < 1e-9
    # single-path lattice -> inf
    assert lattice_confidence(_clat_b()) == math.inf


def test_lattice_tools_cli(tmp_path):
    ark_a, ark_b = str(tmp_path / "a.ark"), str(tmp_path / "b.ark")
    with TableWriter(f"ark:{ark_a}", holder="clat") as w:
        w["u0"] = _clat_a()
    with TableWriter(f"ark:{ark_b}", holder="clat") as w:
        w["u0"] = _clat_b()
    out = str(tmp_path / "u.ark")
    assert main(["lattice-union", f"ark:{ark_a}", f"ark:{ark_b}",
                 f"ark:{out}"]) == 0
    got = dict(SequentialTableReader(f"ark:{out}", holder="clat"))
    assert set(enumerate_paths(got["u0"])) == \
        set(enumerate_paths(_clat_a())) | set(enumerate_paths(_clat_b()))

    pushed = str(tmp_path / "p.ark")
    assert main(["lattice-push", f"ark:{ark_a}", f"ark:{pushed}"]) == 0
    # push preserves equivalence -> lattice-equivalent exits 0
    assert main(["lattice-equivalent", f"ark:{ark_a}",
                 f"ark:{pushed}"]) == 0
    assert main(["lattice-equivalent", f"ark:{ark_a}",
                 f"ark:{ark_b}"]) == 1

    conf = str(tmp_path / "conf.txt")
    assert main(["lattice-confidence", f"ark:{ark_a}",
                 f"ark,t:{conf}"]) == 0
    assert "u0" in open(conf).read()

    interp = str(tmp_path / "i.ark")
    assert main(["lattice-interp", "--alpha=0.5", f"ark:{ark_a}",
                 f"ark:{ark_b}", f"ark:{interp}"]) == 0


def test_lattice_to_phone_lattice_cli(tmp_path, rng):
    mdl, tm, _ = _mono_model(tmp_path, rng)
    # build a clat whose tid strings are real tid sequences of the model
    # phone 1, three emitting states: initial tids of each hmm state
    tids = []
    for hmm_state in range(3):
        ts = tm.tuple_to_transition_state(
            1, hmm_state,
            tm.tree.compute([1], hmm_state), tm.tree.compute([1], hmm_state))
        tids.append(tm.pair_to_transition_id(ts, 0))
        sl = tm.self_loop_of(ts)
        if sl:
            tids.append(sl)
    c = CompactLattice()
    s0, s1 = c.add_state(), c.add_state()
    c.start = s0
    c.arcs[s0].append(CompactArc(5, 1.0, 2.0, tuple(tids), s1))
    c.finals[s1] = (0.0, 0.0, ())
    ark = str(tmp_path / "l.ark")
    with TableWriter(f"ark:{ark}", holder="clat") as w:
        w["u0"] = c
    out = str(tmp_path / "ph.ark")
    assert main(["lattice-to-phone-lattice", mdl, f"ark:{ark}",
                 f"ark:{out}"]) == 0
    got = dict(SequentialTableReader(f"ark:{out}", holder="clat"))["u0"]
    words = list(enumerate_paths(got))
    assert words == [(1,)]  # one phone run labeled with phone 1
    # costs preserved
    assert abs(min(enumerate_paths(got).values()) - 3.0) < 1e-9


# ---------------------------------------------------------------------------
# posterior tools
# ---------------------------------------------------------------------------

def test_post_tools(tmp_path, rng):
    mdl, tm, _ = _mono_model(tmp_path, rng)
    post = [[(1, 0.75), (2, 0.25)], [(3, 1.0)]]
    ark = str(tmp_path / "post.ark")
    with TableWriter(f"ark:{ark}", holder="post") as w:
        w["u0"] = post
    out = str(tmp_path / "o.ark")
    assert main(["copy-post", "--scale=2.0", f"ark:{ark}",
                 f"ark:{out}"]) == 0
    got = dict(SequentialTableReader(f"ark:{out}", holder="post"))["u0"]
    assert got[0][0][1] == pytest.approx(1.5)

    assert main(["sum-post", f"ark:{ark}", f"ark:{ark}",
                 f"ark:{out}"]) == 0
    got = dict(SequentialTableReader(f"ark:{out}", holder="post"))["u0"]
    assert dict(got[0])[1] == pytest.approx(1.5)

    assert main(["post-to-pdf-post", mdl, f"ark:{ark}",
                 f"ark:{out}"]) == 0
    got = dict(SequentialTableReader(f"ark:{out}", holder="post"))["u0"]
    expect0 = {}
    for i, wt in post[0]:
        p = tm.transition_id_to_pdf(i)
        expect0[p] = expect0.get(p, 0.0) + wt
    assert dict(got[0]) == pytest.approx(expect0)

    assert main(["post-to-phone-post", mdl, f"ark:{ark}",
                 f"ark:{out}"]) == 0
    got = dict(SequentialTableReader(f"ark:{out}", holder="post"))["u0"]
    assert all(ph in (1, 2) for ph, _ in got[0])

    # prob-to-post
    mat = np.array([[0.9, 0.05, 0.05], [0.2, 0.5, 0.3]], np.float32)
    m_ark = str(tmp_path / "m.ark")
    with TableWriter(f"ark:{m_ark}", holder="mat") as w:
        w["u0"] = mat
    assert main(["prob-to-post", "--min-post=0.1", f"ark:{m_ark}",
                 f"ark:{out}"]) == 0
    got = dict(SequentialTableReader(f"ark:{out}", holder="post"))["u0"]
    assert [i for i, _ in got[0]] == [0]
    assert dict(got[1])[1] == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# tree-building pipeline through the CLI
# ---------------------------------------------------------------------------

def test_tree_build_cli_pipeline(tmp_path, rng):
    from kaldi_tpu.am.serialize import write_topology
    from kaldi_tpu.core import io as kio

    mdl, tm, am = _mono_model(tmp_path, rng, D=3)
    topo_path = str(tmp_path / "topo")
    with kio.open_wxfilename(topo_path) as f:
        kio.init_kaldi_output_stream(f)
        write_topology(f, tm.topo)

    def phone_tids(phone, loops=1):
        """Valid tid run through the 3 emitting states of `phone`."""
        out = []
        for hmm_state in range(3):
            pdf = tm.tree.compute([phone], hmm_state)
            ts = tm.tuple_to_transition_state(phone, hmm_state, pdf, pdf)
            out.append(tm.pair_to_transition_id(ts, 0))
            sl = tm.self_loop_of(ts)
            for _ in range(loops):
                if sl:
                    out.append(sl)
        return out

    # synthetic utterances: phone-colored features over valid alignments
    feats, alis = {}, {}
    for k, phones_seq in enumerate([[1, 2], [2, 1], [1, 1]]):
        tids = [t for p in phones_seq for t in phone_tids(p, loops=k % 2)]
        phones = [tm.transition_id_to_phone(t) for t in tids]
        feats[f"u{k}"] = np.stack(
            [np.full(3, p, np.float32)
             + 0.1 * rng.standard_normal(3) for p in phones])
        alis[f"u{k}"] = np.asarray(tids, np.int32)

    feats_ark = str(tmp_path / "feats.ark")
    ali_ark = str(tmp_path / "ali.ark")
    with TableWriter(f"ark:{feats_ark}", holder="mat") as w:
        for k, v in feats.items():
            w[k] = v
    with TableWriter(f"ark:{ali_ark}", holder="ivec") as w:
        for k, v in alis.items():
            w[k] = v

    accs1 = str(tmp_path / "1.tacc")
    accs2 = str(tmp_path / "2.tacc")
    assert main(["acc-tree-stats", mdl, f"ark:{feats_ark}",
                 f"ark:{ali_ark}", accs1]) == 0
    assert main(["acc-tree-stats", mdl, f"ark:{feats_ark}",
                 f"ark:{ali_ark}", accs2]) == 0
    summed = str(tmp_path / "sum.tacc")
    assert main(["sum-tree-stats", summed, accs1, accs2]) == 0
    from kaldi_tpu.am.tree import read_tree_stats
    st1 = read_tree_stats(accs1)
    st = read_tree_stats(summed)
    assert set(st) == set(st1)
    key = next(iter(st))
    assert st[key].count == pytest.approx(2 * st1[key].count)

    qsets = str(tmp_path / "phone_sets.txt")
    assert main(["cluster-phones", summed, qsets]) == 0
    questions = str(tmp_path / "questions.txt")
    assert main(["compile-questions", qsets, questions]) == 0

    tree_out = str(tmp_path / "tree")
    assert main(["build-tree", "--max-leaves=10", summed, questions,
                 tree_out]) == 0
    model_out = str(tmp_path / "final.mdl")
    assert main(["gmm-init-model", tree_out, summed, topo_path,
                 model_out]) == 0
    from kaldi_tpu.am.serialize import read_mdl
    tm2, am2 = read_mdl(model_out)
    assert am2.num_pdfs >= tm.num_pdfs  # at least as many leaves as mono
    assert am2.dim == 3

    # gmm-init-mono from the same features
    mono_out = str(tmp_path / "mono.mdl")
    mono_tree = str(tmp_path / "mono.tree")
    assert main(["gmm-init-mono", f"--train-feats=ark:{feats_ark}",
                 topo_path, "3", mono_out, mono_tree]) == 0
    tm3, am3 = read_mdl(mono_out)
    assert am3.num_pdfs == tm.num_pdfs

    # gmm-compute-likes matches am.loglikes
    likes = str(tmp_path / "likes.ark")
    assert main(["gmm-compute-likes", model_out, f"ark:{feats_ark}",
                 f"ark:{likes}"]) == 0
    got = dict(SequentialTableReader(f"ark:{likes}", holder="mat"))
    ref = np.asarray(am2.loglikes(feats["u0"]))
    assert np.allclose(got["u0"], ref, atol=1e-4)


# ---------------------------------------------------------------------------
# global GMM + ivector + feat tools
# ---------------------------------------------------------------------------

def test_gmm_global_tools(tmp_path, rng):
    feats_ark = str(tmp_path / "feats.ark")
    # two clear clusters
    X = np.concatenate([rng.standard_normal((80, 3)) + 4,
                        rng.standard_normal((80, 3)) - 4])
    with TableWriter(f"ark:{feats_ark}", holder="mat") as w:
        w["u0"] = X.astype(np.float32)
    gmm = str(tmp_path / "ubm")
    assert main(["gmm-global-init-from-feats", "--num-gauss=2",
                 "--num-iters=8", f"ark:{feats_ark}", gmm]) == 0
    from kaldi_tpu.cli.tools_bank5 import _read_global_gmm
    am = _read_global_gmm(gmm)
    assert am.num_gauss() == 2
    centers = sorted(float(am.means[0, m].mean()) for m in range(2))
    assert centers[0] < -3 and centers[1] > 3

    accs = str(tmp_path / "acc")
    assert main(["gmm-global-acc-stats", gmm, f"ark:{feats_ark}",
                 accs]) == 0
    gmm2 = str(tmp_path / "ubm2")
    assert main(["gmm-global-est", gmm, accs, gmm2]) == 0

    post = str(tmp_path / "post.ark")
    assert main(["gmm-global-get-post", "--n=1", gmm2,
                 f"ark:{feats_ark}", f"ark:{post}"]) == 0
    got = dict(SequentialTableReader(f"ark:{post}", holder="post"))["u0"]
    assert all(len(fr) == 1 and fr[0][1] == pytest.approx(1.0)
               for fr in got)
    # frames from cluster 1 pick the + center, cluster 2 the - center
    first = {i for i, _ in (fr[0] for fr in [got[:80]][0])}
    second = {i for i, _ in (fr[0] for fr in [got[80:]][0])}
    assert first.isdisjoint(second)


def test_ivector_and_feat_tools(tmp_path, rng):
    ivecs = {f"u{i}": rng.standard_normal(8).astype(np.float32)
             for i in range(6)}
    ark = str(tmp_path / "ivec.ark")
    with TableWriter(f"ark:{ark}", holder="vec") as w:
        for k, v in ivecs.items():
            w[k] = v
    out = str(tmp_path / "norm.ark")
    assert main(["ivector-normalize-length", f"ark:{ark}",
                 f"ark:{out}"]) == 0
    got = dict(SequentialTableReader(f"ark:{out}", holder="vec"))
    for k, v in got.items():
        assert np.linalg.norm(v) == pytest.approx(np.sqrt(8), rel=1e-4)

    assert main(["ivector-subtract-global-mean", f"ark:{ark}",
                 f"ark:{out}"]) == 0
    got = dict(SequentialTableReader(f"ark:{out}", holder="vec"))
    assert np.allclose(np.mean(list(got.values()), axis=0), 0, atol=1e-5)

    # LDA: two separable speaker clusters
    u2s = str(tmp_path / "utt2spk")
    sep = {}
    with open(u2s, "w") as f:
        for i in range(20):
            spk = f"s{i % 2}"
            u = f"v{i}"
            f.write(f"{u} {spk}\n")
            sep[u] = (rng.standard_normal(6)
                      + (6.0 if i % 2 else -6.0)).astype(np.float32)
    ark2 = str(tmp_path / "sep.ark")
    with TableWriter(f"ark:{ark2}", holder="vec") as w:
        for k, v in sep.items():
            w[k] = v
    lda = str(tmp_path / "lda.mat")
    assert main(["ivector-compute-lda", "--dim=1", f"ark:{ark2}",
                 f"ark,t:{u2s}", lda]) == 0
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(lda) as f:
        kio.init_kaldi_input_stream(f)
        mat = kio.read_matrix(f)
    assert mat.shape[0] == 1

    # shift-feats
    m_ark = str(tmp_path / "m.ark")
    mat_in = np.arange(12, dtype=np.float32).reshape(4, 3)
    with TableWriter(f"ark:{m_ark}", holder="mat") as w:
        w["u0"] = mat_in
    s_out = str(tmp_path / "s.ark")
    assert main(["shift-feats", "--shift=1", f"ark:{m_ark}",
                 f"ark:{s_out}"]) == 0
    got = dict(SequentialTableReader(f"ark:{s_out}", holder="mat"))["u0"]
    assert np.allclose(got[0], mat_in[0]) and np.allclose(got[1],
                                                          mat_in[0])
    assert np.allclose(got[2:], mat_in[1:3])


def test_chain_est_phone_lm_cli(tmp_path, rng):
    from kaldi_tpu.am.chain import read_phone_lm
    seqs = {f"u{i}": np.asarray(
        [1, 2, 3, 1, 2][: 3 + i % 3], np.int32) for i in range(8)}
    ark = str(tmp_path / "ph.ark")
    with TableWriter(f"ark:{ark}", holder="ivec") as w:
        for k, v in seqs.items():
            w[k] = v
    out = str(tmp_path / "phone_lm")
    assert main(["chain-est-phone-lm", "--ngram-order=3", f"ark:{ark}",
                 out]) == 0
    lm = read_phone_lm(out)
    assert lm.order == 3
    assert lm.phones == [1, 2, 3]
    # rows are distributions: logsumexp(next+final) ~ 0
    row = np.logaddexp.reduce(
        np.concatenate([lm.next_logp, lm.final_logp[:, None]], axis=1),
        axis=1)
    assert np.allclose(row, 0.0, atol=1e-6)


def test_compose_transforms_cli(tmp_path, rng):
    from kaldi_tpu.am.transforms import apply_transform
    from kaldi_tpu.core import io as kio
    a = rng.standard_normal((2, 4)).astype(np.float32)   # affine 3->2
    b = rng.standard_normal((3, 5)).astype(np.float32)   # affine 4->3

    def save(path, m):
        with kio.open_wxfilename(path) as f:
            kio.init_kaldi_output_stream(f)
            kio.write_matrix(f, m)

    pa, pb = str(tmp_path / "a.mat"), str(tmp_path / "b.mat")
    save(pa, a)
    save(pb, b)
    out = str(tmp_path / "c.mat")
    assert main(["compose-transforms", "--b-is-affine=true", pa, pb,
                 out]) == 0
    with kio.open_rxfilename(out) as f:
        kio.init_kaldi_input_stream(f)
        c = kio.read_matrix(f)
    x = rng.standard_normal((5, 4)).astype(np.float32)
    assert np.allclose(apply_transform(x, c),
                       apply_transform(apply_transform(x, b), a),
                       atol=1e-4)


def test_fst_topsort_connect_cli(tmp_path):
    from kaldi_tpu.fst.fst import Arc, VectorFst
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    f = VectorFst()
    s = [f.add_state() for _ in range(4)]
    f.set_start(s[2])
    f.add_arc(s[2], Arc(1, 1, 0.5, s[0]))
    f.add_arc(s[0], Arc(2, 2, 0.25, s[1]))
    f.set_final(s[1], 0.125)
    # s[3] unreachable
    f.add_arc(s[3], Arc(3, 3, 0.0, s[1]))
    p_in, p_conn, p_sort = (str(tmp_path / n) for n in
                            ("in.fst", "conn.fst", "sort.fst"))
    _save_fst(p_in, f)
    assert main(["fstconnect", p_in, p_conn]) == 0
    g = _load_fst(p_conn)
    assert g.num_states == 3
    assert main(["fsttopsort", p_conn, p_sort]) == 0
    h = _load_fst(p_sort)
    assert h.start == 0
    for st in range(h.num_states):
        for a in h.arcs[st]:
            assert a.nextstate > st
