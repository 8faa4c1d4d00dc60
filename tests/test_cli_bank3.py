"""CLI tool bank 3 (cli/tools_bank3.py): feature/posterior/tree/graph/
fst/lattice/ivector/nnet3 long-tail tools driven through `main([...])`
with real files, oracled against direct library calls."""

import math

import numpy as np
import pytest

from kaldi_tpu.am import (HmmTopology, MonophoneContextDependency,
                          TransitionModel)
from kaldi_tpu.am.gmm import AmDiagGmm
from kaldi_tpu.am.serialize import read_mdl, write_mdl
from kaldi_tpu.cli import main
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)
from kaldi_tpu.fst.fst import Arc, SymbolTable, VectorFst
from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice


def _mono_model(tmp_path, rng, D=4, M=2, phones=(1, 2)):
    topo = HmmTopology.three_state(list(phones))
    tree = MonophoneContextDependency(list(phones), topo)
    tm = TransitionModel(topo, tree)
    P = tree.num_pdfs
    am = AmDiagGmm(rng.dirichlet(np.ones(M), size=P),
                   2.0 * rng.standard_normal((P, M, D)),
                   0.5 + rng.random((P, M, D)))
    path = str(tmp_path / "0.mdl")
    write_mdl(path, tm, am)
    return path, tm, am


# ---------------------------------------------------------------------------
# featbin
# ---------------------------------------------------------------------------

def test_feat_manipulation_tools(tmp_path, rng):
    a = rng.standard_normal((10, 3)).astype(np.float32)
    b = rng.standard_normal((10, 2)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/a.ark") as w:
        w["u1"] = a
    with TableWriter(f"ark:{tmp_path}/b.ark") as w:
        w["u1"] = b
    assert main(["paste-feats", f"ark:{tmp_path}/a.ark",
                 f"ark:{tmp_path}/b.ark", f"ark:{tmp_path}/ab.ark"]) == 0
    got = dict(SequentialTableReader(f"ark:{tmp_path}/ab.ark"))["u1"]
    np.testing.assert_allclose(got, np.concatenate([a, b], axis=1),
                               rtol=1e-6)
    assert main(["select-feats", "0,2", f"ark:{tmp_path}/a.ark",
                 f"ark:{tmp_path}/sel.ark"]) == 0
    got = dict(SequentialTableReader(f"ark:{tmp_path}/sel.ark"))["u1"]
    np.testing.assert_allclose(got, a[:, [0, 2]], rtol=1e-6)
    assert main(["subsample-feats", "--n=3", "--offset=1",
                 f"ark:{tmp_path}/a.ark", f"ark:{tmp_path}/sub.ark"]) == 0
    got = dict(SequentialTableReader(f"ark:{tmp_path}/sub.ark"))["u1"]
    np.testing.assert_allclose(got, a[1::3], rtol=1e-6)


def test_extract_segments(tmp_path, rng):
    rate = 8000
    wave = (rng.standard_normal(rate * 2) * 1000).astype(np.int16)
    with TableWriter(f"ark:{tmp_path}/wav.ark", holder="wav") as w:
        w["reco1"] = (wave, rate)
    (tmp_path / "segments").write_text(
        "seg1 reco1 0.25 0.75\nseg2 reco1 1.0 1.5\nshort reco1 0 0.01\n")
    assert main(["extract-segments", f"ark:{tmp_path}/wav.ark",
                 str(tmp_path / "segments"),
                 f"ark:{tmp_path}/segs.ark"]) == 0
    segs = dict(SequentialTableReader(f"ark:{tmp_path}/segs.ark",
                                      holder="wav"))
    assert sorted(segs) == ["seg1", "seg2"]
    s1, r1 = segs["seg1"]
    assert r1 == rate and len(s1) == rate // 2
    np.testing.assert_array_equal(s1.astype(np.int16),
                                  wave[rate // 4: 3 * rate // 4])


# ---------------------------------------------------------------------------
# posteriors
# ---------------------------------------------------------------------------

def test_posterior_tool_chain(tmp_path, rng):
    mdl, tm, _am = _mono_model(tmp_path, rng)
    # alignment through phone 1 (tids of phone 1) then phone 2
    tids_p1 = [t for t in range(1, tm.num_transition_ids + 1)
               if tm.transition_id_to_phone(t) == 1]
    tids_p2 = [t for t in range(1, tm.num_transition_ids + 1)
               if tm.transition_id_to_phone(t) == 2]
    ali = np.array([tids_p1[0]] * 3 + [tids_p2[0]] * 2, np.int32)
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        w["u1"] = ali
    assert main(["ali-to-post", f"ark:{tmp_path}/ali.ark",
                 f"ark:{tmp_path}/post.ark"]) == 0
    post = dict(SequentialTableReader(f"ark:{tmp_path}/post.ark",
                                      holder="post"))["u1"]
    assert len(post) == 5 and post[0] == [(int(ali[0]), 1.0)]
    # weight-silence-post: phone 1 is "silence" → weight 0 drops it
    assert main(["weight-silence-post", "0.0", "1", mdl,
                 f"ark:{tmp_path}/post.ark",
                 f"ark:{tmp_path}/wpost.ark"]) == 0
    wpost = dict(SequentialTableReader(f"ark:{tmp_path}/wpost.ark",
                                       holder="post"))["u1"]
    assert [len(fr) for fr in wpost] == [0, 0, 0, 1, 1]
    assert main(["post-to-weights", f"ark:{tmp_path}/wpost.ark",
                 f"ark:{tmp_path}/w.ark"]) == 0
    wts = dict(SequentialTableReader(f"ark:{tmp_path}/w.ark",
                                     holder="vec"))["u1"]
    np.testing.assert_allclose(wts, [0, 0, 0, 1, 1], atol=1e-6)


# ---------------------------------------------------------------------------
# model/tree info + align-text
# ---------------------------------------------------------------------------

def test_info_tools(tmp_path, rng, capsys):
    mdl, tm, am = _mono_model(tmp_path, rng)
    assert main(["am-info", mdl]) == 0
    out = capsys.readouterr().out
    assert f"number of pdfs {am.num_pdfs}" in out
    assert f"number of transition-ids {tm.num_transition_ids}" in out
    phones = tmp_path / "phones.txt"
    phones.write_text("<eps> 0\nSIL 1\na 2\n")
    assert main(["show-transitions", str(phones), mdl]) == 0
    out = capsys.readouterr().out
    assert "phone = SIL" in out and "self-loop" in out
    # tree round trip via the model file's embedded tree is exercised in
    # serialize tests; here test copy-tree + tree-info on a raw tree file
    from kaldi_tpu.am.serialize import write_tree
    treep = tmp_path / "tree"
    with open(treep, "wb") as f:
        f.write(b"\0B")
        write_tree(f, tm.tree)
    assert main(["copy-tree", str(treep), str(tmp_path / "tree2")]) == 0
    assert main(["tree-info", str(tmp_path / "tree2")]) == 0
    out = capsys.readouterr().out
    assert f"num-pdfs {tm.tree.num_pdfs}" in out


def test_align_text(tmp_path):
    with TableWriter(f"ark:{tmp_path}/ref.ark", holder="text") as w:
        w["u1"] = "the cat sat".split()
    with TableWriter(f"ark:{tmp_path}/hyp.ark", holder="text") as w:
        w["u1"] = "the hat sat down".split()
    assert main(["align-text", f"ark:{tmp_path}/ref.ark",
                 f"ark:{tmp_path}/hyp.ark",
                 f"ark,t:{tmp_path}/ali.txt"]) == 0
    line = dict(SequentialTableReader(f"ark,t:{tmp_path}/ali.txt",
                                      holder="text"))["u1"]
    s = " ".join(line)
    assert "the the" in s and "cat hat" in s and "<eps> down" in s


# ---------------------------------------------------------------------------
# training graphs + alignment
# ---------------------------------------------------------------------------

def test_graph_compile_and_align(tmp_path, rng):
    lex = tmp_path / "lexicon.txt"
    lex.write_text("go g o\nstop s t o p\n")
    # Lang phone order: <eps>=0, SIL=1, then sorted phones g,o,p,s,t
    phones = [1, 2, 3, 4, 5, 6]
    mdl, tm, am = _mono_model(tmp_path, rng, phones=tuple(phones))
    with TableWriter(f"ark:{tmp_path}/text.ark", holder="text") as w:
        w["u1"] = ["go"]
        w["u2"] = ["stop", "go"]
    assert main(["compile-train-graphs", str(lex), mdl,
                 f"ark:{tmp_path}/text.ark",
                 f"ark:{tmp_path}/graphs.ark"]) == 0
    graphs = dict(SequentialTableReader(f"ark:{tmp_path}/graphs.ark",
                                        holder="fst"))
    assert sorted(graphs) == ["u1", "u2"]
    assert graphs["u2"].num_states > graphs["u1"].num_states
    T1, T2 = 30, 50
    feats = {"u1": rng.standard_normal((T1, am.dim)).astype(np.float32),
             "u2": rng.standard_normal((T2, am.dim)).astype(np.float32)}
    with TableWriter(f"ark:{tmp_path}/feats.ark") as w:
        for k, v in feats.items():
            w[k] = v
    assert main(["align-equal-compiled", f"ark:{tmp_path}/graphs.ark",
                 f"ark:{tmp_path}/feats.ark",
                 f"ark:{tmp_path}/eq.ark"]) == 0
    eq = dict(SequentialTableReader(f"ark:{tmp_path}/eq.ark",
                                    holder="ivec"))
    assert len(eq["u1"]) == T1 and len(eq["u2"]) == T2
    assert main(["gmm-align-compiled", mdl, f"ark:{tmp_path}/graphs.ark",
                 f"ark:{tmp_path}/feats.ark",
                 f"ark:{tmp_path}/ali.ark"]) == 0
    ali = dict(SequentialTableReader(f"ark:{tmp_path}/ali.ark",
                                     holder="ivec"))
    assert len(ali["u1"]) == T1 and len(ali["u2"]) == T2
    # the alignment's phone sequence must spell the transcript's phones
    # (with optional silence); "go" → g o
    ph = [tm.transition_id_to_phone(t) for t in ali["u1"]]
    dedup = [p for i, p in enumerate(ph) if i == 0 or p != ph[i - 1]]
    nonsil = [p for p in dedup if p != 1]
    assert nonsil == [2, 3]          # g=2, o=3 in sorted phone order


def test_gmm_boost_silence(tmp_path, rng):
    mdl, tm, am = _mono_model(tmp_path, rng)
    out = str(tmp_path / "boost.mdl")
    assert main(["gmm-boost-silence", "--boost=2.0", "1", mdl, out]) == 0
    _, am2 = read_mdl(out)
    sil_pdfs = {int(tm.tid_to_pdf_array[t])
                for t in range(1, tm.num_transition_ids + 1)
                if tm.transition_id_to_phone(t) == 1}
    x = rng.standard_normal((4, am.dim)).astype(np.float32)
    ll1, ll2 = np.asarray(am.loglikes(x)), np.asarray(am2.loglikes(x))
    for p in range(am.num_pdfs):
        if p in sil_pdfs:
            np.testing.assert_allclose(ll2[:, p], ll1[:, p] + math.log(2),
                                       atol=1e-4)
        else:
            np.testing.assert_allclose(ll2[:, p], ll1[:, p], atol=1e-4)


# ---------------------------------------------------------------------------
# fstbin
# ---------------------------------------------------------------------------

def test_fst_tools(tmp_path):
    f = VectorFst()
    s0, s1 = f.add_state(), f.add_state()
    f.set_start(s0)
    f.add_arc(s0, Arc(7, 5, -math.log(0.4), s1))
    f.add_arc(s0, Arc(2, 4, -math.log(0.6), s1))
    f.set_final(s1, 0.0)
    from kaldi_tpu.fst.openfst_io import read_fst_path, write_fst_path
    p = str(tmp_path / "a.fst")
    write_fst_path(p, f)
    # fstrmsymbols removes ilabel 7
    (tmp_path / "disambig.int").write_text("7\n")
    q = str(tmp_path / "b.fst")
    assert main(["fstrmsymbols", str(tmp_path / "disambig.int"), p, q]) == 0
    g = read_fst_path(q)
    assert sorted(a.ilabel for a in g.arcs[0]) == [0, 2]
    # stochastic: outgoing probs sum to 1 → exit 0
    assert main(["fstisstochastic", p]) == 0
    # non-stochastic FST → exit 1
    f2 = f.copy()
    f2.arcs[0][0].weight += 1.0
    p2 = str(tmp_path / "c.fst")
    write_fst_path(p2, f2)
    assert main(["fstisstochastic", p2]) == 1
    # equivalence: identical files equivalent, perturbed not
    assert main(["fstequivalent", p, p]) == 0
    assert main(["fstequivalent", p, p2]) == 1
    # project onto ilabels: olabels become ilabels
    pr = str(tmp_path / "d.fst")
    assert main(["fstproject", p, pr]) == 0
    h = read_fst_path(pr)
    assert all(a.ilabel == a.olabel for a in h.arcs[0])


# ---------------------------------------------------------------------------
# latbin
# ---------------------------------------------------------------------------

def _lat_table(tmp_path, name="lat.ark"):
    c = CompactLattice()
    s = [c.add_state() for _ in range(3)]
    c.start = s[0]
    c.arcs[s[0]].append(CompactArc(1, 1.0, 0.5, (11, 12), s[1]))
    c.arcs[s[0]].append(CompactArc(2, 2.0, 0.5, (21,), s[1]))
    c.arcs[s[1]].append(CompactArc(3, 0.5, 0.5, (31,), s[2]))
    c.finals[s[2]] = (0.0, 0.0, ())
    spec = f"ark:{tmp_path}/{name}"
    with TableWriter(spec, holder="clat") as w:
        w["u1"] = c
    return spec, c


def test_lattice_tools(tmp_path):
    spec, c = _lat_table(tmp_path)
    # 1best keeps the best path's words
    assert main(["lattice-1best", spec, f"ark:{tmp_path}/best.ark"]) == 0
    best = dict(SequentialTableReader(f"ark:{tmp_path}/best.ark",
                                      holder="clat"))["u1"]
    words, tids, cost = best.best_path()
    assert words == [1, 3] and abs(cost - 2.5) < 1e-6
    assert sorted(tids) == [11, 12, 31]
    # add-penalty shifts every word arc's graph cost
    assert main(["lattice-add-penalty", "--word-ins-penalty=0.7", spec,
                 f"ark:{tmp_path}/pen.ark"]) == 0
    pen = dict(SequentialTableReader(f"ark:{tmp_path}/pen.ark",
                                     holder="clat"))["u1"]
    assert abs(pen.best_path()[2] - (2.5 + 1.4)) < 1e-5
    # rmali drops tid strings
    assert main(["lattice-rmali", spec, f"ark:{tmp_path}/rm.ark"]) == 0
    rm = dict(SequentialTableReader(f"ark:{tmp_path}/rm.ark",
                                    holder="clat"))["u1"]
    assert all(a.tids == () for s in range(rm.num_states)
               for a in rm.arcs[s])
    # determinize-pruned with a tight beam drops the worse branch
    assert main(["lattice-determinize-pruned", "--beam=0.5", spec,
                 f"ark:{tmp_path}/det.ark"]) == 0
    det = dict(SequentialTableReader(f"ark:{tmp_path}/det.ark",
                                     holder="clat"))["u1"]
    assert det.num_arcs == 2          # only the best branch survives


def test_lattice_oracle(tmp_path, capsys):
    spec, c = _lat_table(tmp_path)
    with TableWriter(f"ark:{tmp_path}/ref.ark", holder="text") as w:
        w["u1"] = ["2", "3"]          # the worse branch: oracle err 0
    assert main(["lattice-oracle", spec, f"ark:{tmp_path}/ref.ark"]) == 0
    assert "%WER 0.00 [ 0 / 2 ]" in capsys.readouterr().out
    with TableWriter(f"ark:{tmp_path}/ref2.ark", holder="text") as w:
        w["u1"] = ["2", "9"]          # word 9 unreachable: 1 error
    assert main(["lattice-oracle", spec, f"ark:{tmp_path}/ref2.ark"]) == 0
    assert "%WER 50.00 [ 1 / 2 ]" in capsys.readouterr().out


def test_lattice_to_post(tmp_path):
    spec, c = _lat_table(tmp_path)
    assert main(["lattice-to-post", spec,
                 f"ark:{tmp_path}/post.ark"]) == 0
    post = dict(SequentialTableReader(f"ark:{tmp_path}/post.ark",
                                      holder="post"))["u1"]
    # frame 0: tids 11 (branch A) and 21 (branch B) with branch posts
    pa = 1.0 / (1.0 + math.exp(-1.0))
    d0 = dict(post[0])
    assert abs(d0[11] - pa) < 1e-5 and abs(d0[21] - (1 - pa)) < 1e-5
    # final frame: tid 31 with posterior 1
    assert abs(dict(post[2])[31] - 1.0) < 1e-5


def test_lattice_lmrescore_const_arpa(tmp_path):
    from kaldi_tpu.fst.arpa import ArpaModel
    from kaldi_tpu.lattice.rescore import compose_lm
    spec, c = _lat_table(tmp_path)
    arpa = tmp_path / "lm.arpa"
    arpa.write_text("""
\\data\\
ngram 1=5

\\1-grams:
-0.30103 A
-0.69897 B
-0.30103 C
-0.52288 </s>
-99 <s>

\\end\\
""")
    words = tmp_path / "words.txt"
    words.write_text("<eps> 0\nA 1\nB 2\nC 3\n<s> 4\n</s> 5\n")
    assert main(["lattice-lmrescore-const-arpa", "--lm-scale=1.0",
                 str(arpa), str(words), spec,
                 f"ark:{tmp_path}/resc.ark"]) == 0
    got = dict(SequentialTableReader(f"ark:{tmp_path}/resc.ark",
                                     holder="clat"))["u1"]
    oracle = compose_lm(c, ArpaModel.parse(str(arpa)).score,
                        SymbolTable.read(str(words)), scale=1.0)
    assert abs(got.best_path()[2] - oracle.best_path()[2]) < 1e-5


# ---------------------------------------------------------------------------
# ivectorbin
# ---------------------------------------------------------------------------

def test_ivector_tool_chain(tmp_path, rng):
    D = 6
    spk_means = 4.0 * rng.standard_normal((3, D))
    ivecs = {}
    for k in range(3):
        for j in range(4):
            ivecs[f"s{k}u{j}"] = (spk_means[k]
                                  + 0.3 * rng.standard_normal(D)
                                  ).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/iv.ark", holder="vec") as w:
        for k, v in sorted(ivecs.items()):
            w[k] = v
    spk2utt = tmp_path / "spk2utt"
    spk2utt.write_text("".join(
        f"s{k} " + " ".join(f"s{k}u{j}" for j in range(4)) + "\n"
        for k in range(3)))
    # ivector-mean
    assert main(["ivector-mean", str(spk2utt), f"ark:{tmp_path}/iv.ark",
                 f"ark:{tmp_path}/spk.ark"]) == 0
    spk = dict(SequentialTableReader(f"ark:{tmp_path}/spk.ark",
                                     holder="vec"))
    np.testing.assert_allclose(
        spk["s0"], np.mean([ivecs[f"s0u{j}"] for j in range(4)], axis=0),
        atol=1e-5)
    # plda train + scoring: same-spk trials must outscore diff-spk
    assert main(["ivector-compute-plda", str(spk2utt),
                 f"ark:{tmp_path}/iv.ark", str(tmp_path / "plda")]) == 0
    trials = tmp_path / "trials"
    trials.write_text("s0 s0u0\ns0 s1u0\ns1 s1u1\ns1 s2u1\n")
    assert main(["ivector-plda-scoring", str(tmp_path / "plda"),
                 f"ark:{tmp_path}/spk.ark", f"ark:{tmp_path}/iv.ark",
                 str(trials), str(tmp_path / "scores")]) == 0
    scores = {}
    for line in (tmp_path / "scores").read_text().splitlines():
        e, t, s = line.split()
        scores[(e, t)] = float(s)
    assert scores[("s0", "s0u0")] > scores[("s0", "s1u0")]
    assert scores[("s1", "s1u1")] > scores[("s1", "s2u1")]
    # agglomerative-cluster on a hand-built score matrix
    S = np.array([[0, 9, -9], [9, 0, -9], [-9, -9, 0]], np.float32)
    with TableWriter(f"ark:{tmp_path}/sc.ark") as w:
        w["reco1"] = S
    (tmp_path / "reco2utt").write_text("reco1 a b c\n")
    assert main(["agglomerative-cluster", f"ark:{tmp_path}/sc.ark",
                 str(tmp_path / "reco2utt"),
                 f"ark:{tmp_path}/lab.ark"]) == 0
    lab = dict(SequentialTableReader(f"ark:{tmp_path}/lab.ark",
                                     holder="ivec"))["reco1"]
    assert lab[0] == lab[1] != lab[2]


def test_ivector_extract_tool(tmp_path, rng):
    from kaldi_tpu.am.ivector import (IvectorExtractor,
                                      write_ivector_extractor)
    D, G, K = 5, 8, 3
    ex = IvectorExtractor(rng.standard_normal((G, D)),
                          0.5 + rng.random((G, D)),
                          np.full(G, 1.0 / G), K, seed=0)
    write_ivector_extractor(str(tmp_path / "final.ie"), ex)
    x = rng.standard_normal((40, D)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/f.ark") as w:
        w["u1"] = x
    assert main(["ivector-extract", str(tmp_path / "final.ie"),
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/iv.ark"]) == 0
    got = dict(SequentialTableReader(f"ark:{tmp_path}/iv.ark",
                                     holder="vec"))["u1"]
    np.testing.assert_allclose(got, ex.extract_from_feats(x), atol=1e-4)


# ---------------------------------------------------------------------------
# nnet3bin
# ---------------------------------------------------------------------------

def test_nnet3_compute_and_average(tmp_path, rng):
    import jax
    from kaldi_tpu.am.nnet3_io import write_raw_model
    from kaldi_tpu.am.tdnn import TdnnChain, TdnnConfig
    cfg = TdnnConfig(feat_dim=8, num_pdfs=12, hidden_dim=16,
                     bottleneck_dim=4, num_layers=3,
                     frame_subsampling_factor=3)
    net = TdnnChain(cfg)
    x = rng.standard_normal((1, 30, 8)).astype(np.float32)
    v1 = net.init(jax.random.PRNGKey(0), x, train=False)
    v2 = net.init(jax.random.PRNGKey(1), x, train=False)
    write_raw_model(str(tmp_path / "a.raw"), v1["params"],
                    v1["batch_stats"], cfg)
    write_raw_model(str(tmp_path / "b.raw"), v2["params"],
                    v2["batch_stats"], cfg)
    with TableWriter(f"ark:{tmp_path}/f.ark") as w:
        w["u1"] = x[0]
    assert main(["nnet3-compute", "--frame-subsampling-factor=3",
                 str(tmp_path / "a.raw"), f"ark:{tmp_path}/f.ark",
                 f"ark:{tmp_path}/o.ark"]) == 0
    got = dict(SequentialTableReader(f"ark:{tmp_path}/o.ark"))["u1"]
    oracle = np.asarray(net.apply(v1, x, train=False))[0]
    np.testing.assert_allclose(got, oracle, atol=2e-4)
    assert got.shape == (10, 12)
    # averaging two copies of the same model = identity
    assert main(["nnet3-average", str(tmp_path / "avg.raw"),
                 str(tmp_path / "a.raw"), str(tmp_path / "a.raw")]) == 0
    assert main(["nnet3-compute", str(tmp_path / "avg.raw"),
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/o2.ark"]) == 0
    got2 = dict(SequentialTableReader(f"ark:{tmp_path}/o2.ark"))["u1"]
    np.testing.assert_allclose(got2, got, atol=2e-4)
    # averaging different models: every array equals the elementwise
    # mean of the inputs (the nnet3-average contract)
    from kaldi_tpu.am.nnet3_io import read_nnet3
    assert main(["nnet3-average", str(tmp_path / "avg2.raw"),
                 str(tmp_path / "a.raw"), str(tmp_path / "b.raw")]) == 0
    models = {}
    for name in ("a", "b", "avg2"):
        with open(tmp_path / f"{name}.raw", "rb") as f:
            assert f.read(2) == b"\0B"
            models[name] = read_nnet3(f)
    checked = 0
    for ca, cb, cm in zip(models["a"].components, models["b"].components,
                          models["avg2"].components):
        for fname, fv in cm.fields.items():
            if fv.array is None:
                continue
            np.testing.assert_allclose(
                fv.array, (ca.fields[fname].array
                           + cb.fields[fname].array) / 2.0, atol=1e-5)
            checked += 1
    assert checked > 5
