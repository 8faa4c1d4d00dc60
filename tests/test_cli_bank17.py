"""CLI bank 17: latbin tail, kws index binaries, ivector extractor
training, online2 dump, rnnlm egs, gmm regtree-fMLLR, bin utils."""

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
    return np.random.default_rng(17)


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


def _phone_tids(tm, phone, frames):
    first = next(t for t in range(1, tm.num_transition_ids + 1)
                 if tm.transition_id_to_phone(t) == phone
                 and tm.transition_id_to_hmm_state(t) == 0
                 and not tm.is_self_loop(t))
    loop = next(t for t in range(1, tm.num_transition_ids + 1)
                if tm.transition_id_to_phone(t) == phone
                and tm.transition_id_to_hmm_state(t) == 0
                and tm.is_self_loop(t))
    return [first] + [loop] * (frames - 1)


def _two_path_lat(tm, w1=1, w2=2, T=4):
    clat = CompactLattice()
    s0, s1 = clat.add_state(), clat.add_state()
    clat.start = s0
    clat.arcs[s0].append(CompactArc(w1, 0.5, 1.0,
                                    tuple(_phone_tids(tm, 1, T)), s1))
    clat.arcs[s0].append(CompactArc(w2, 0.7, 1.2,
                                    tuple(_phone_tids(tm, 2, T)), s1))
    clat.finals[s1] = (0.1, 0.0, ())
    return clat


# ---------------------------------------------------------------------------
# latbin tail


def test_lattice_project(tmp_path, rng):
    _mdl, tm, _am = _mono_model(tmp_path, rng)
    with TableWriter(f"ark:{tmp_path}/in.lats", holder="clat") as w:
        w["u"] = _two_path_lat(tm)
    assert TOOLS["lattice-project"](
        [f"ark:{tmp_path}/in.lats", f"ark:{tmp_path}/out.lats"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/out.lats",
                                     holder="clat"))["u"]
    for s in range(out.num_states):
        for a in out.arcs[s]:
            assert a.tids == () and a.acoustic_cost == 0.0
    # total path costs preserved
    assert out.arcs[0][0].graph_cost == pytest.approx(1.5)


def test_lattice_difference(tmp_path, rng):
    _mdl, tm, _am = _mono_model(tmp_path, rng)
    with TableWriter(f"ark:{tmp_path}/in.lats", holder="clat") as w:
        w["u"] = _two_path_lat(tm)
    sub = CompactLattice()
    s0, s1 = sub.add_state(), sub.add_state()
    sub.start = s0
    sub.arcs[s0].append(CompactArc(1, 0.0, 0.0, (), s1))
    sub.finals[s1] = (0.0, 0.0, ())
    with TableWriter(f"ark:{tmp_path}/sub.lats", holder="clat") as w:
        w["u"] = sub
    assert TOOLS["lattice-difference"](
        [f"ark:{tmp_path}/in.lats", f"ark:{tmp_path}/sub.lats",
         f"ark:{tmp_path}/out.lats"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/out.lats",
                                     holder="clat"))["u"]
    words = {a.word for s in range(out.num_states)
             for a in out.arcs[s] if a.word}
    assert words == {2}               # word-1 path removed


def test_smbr_and_mpe_post(tmp_path, rng):
    mdl, tm, _am = _mono_model(tmp_path, rng)
    T = 4
    with TableWriter(f"ark:{tmp_path}/in.lats", holder="clat") as w:
        w["u"] = _two_path_lat(tm, T=T)
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        w["u"] = np.asarray(_phone_tids(tm, 1, T), np.int32)
    for name in ("lattice-to-smbr-post", "lattice-to-mpe-post"):
        assert TOOLS[name](
            [mdl, f"ark:{tmp_path}/ali.ark", f"ark:{tmp_path}/in.lats",
             f"ark:{tmp_path}/post.ark"]) == 0
        post = dict(SequentialTableReader(f"ark:{tmp_path}/post.ark",
                                          holder="post"))["u"]
        assert len(post) == T
        # phone-1 arcs (match ref) get positive weight, phone-2 negative
        pdf1 = tm.transition_id_to_pdf(_phone_tids(tm, 1, T)[0])
        pdf2 = tm.transition_id_to_pdf(_phone_tids(tm, 2, T)[0])
        fr = dict(post[0])
        assert fr[pdf1] > 0 > fr[pdf2]


def test_lattice_rescore_mapped(tmp_path, rng):
    mdl, tm, _am = _mono_model(tmp_path, rng)
    T = 4
    clat = _two_path_lat(tm, T=T)
    with TableWriter(f"ark:{tmp_path}/in.lats", holder="clat") as w:
        w["u"] = clat
    ll = np.zeros((T, tm.num_pdfs), np.float32)
    ll[:, :] = -1.0
    with TableWriter(f"ark:{tmp_path}/ll.ark", holder="mat") as w:
        w["u"] = ll
    assert TOOLS["lattice-rescore-mapped"](
        [mdl, f"ark:{tmp_path}/in.lats", f"ark:{tmp_path}/ll.ark",
         f"ark:{tmp_path}/out.lats"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/out.lats",
                                     holder="clat"))["u"]
    # every frame contributes −ll = +1.0 acoustic per frame
    for a in out.arcs[out.start]:
        assert a.acoustic_cost == pytest.approx(T * 1.0)


def test_lattice_expand_ngram(tmp_path, rng):
    _mdl, tm, _am = _mono_model(tmp_path, rng)
    # diamond: two paths converge then share a suffix arc
    clat = CompactLattice()
    s = [clat.add_state() for _ in range(3)]
    clat.start = s[0]
    t1 = tuple(_phone_tids(tm, 1, 2))
    t2 = tuple(_phone_tids(tm, 2, 2))
    clat.arcs[s[0]].append(CompactArc(1, 0.0, 0.0, t1, s[1]))
    clat.arcs[s[0]].append(CompactArc(2, 0.0, 0.0, t2, s[1]))
    clat.arcs[s[1]].append(CompactArc(3, 0.0, 0.0, t1, s[2]))
    clat.finals[s[2]] = (0.0, 0.0, ())
    with TableWriter(f"ark:{tmp_path}/in.lats", holder="clat") as w:
        w["u"] = clat
    assert TOOLS["lattice-expand-ngram"](
        ["--n=3", f"ark:{tmp_path}/in.lats",
         f"ark:{tmp_path}/out.lats"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/out.lats",
                                     holder="clat"))["u"]
    # suffix arc must be duplicated per distinct history
    assert out.num_arcs == 4
    from kaldi_tpu.lattice.ops import enumerate_paths
    assert enumerate_paths(out) == enumerate_paths(clat)


def test_nbest_roundtrip_and_prons(tmp_path, rng):
    mdl, tm, _am = _mono_model(tmp_path, rng)
    with TableWriter(f"ark:{tmp_path}/in.lats", holder="clat") as w:
        w["u"] = _two_path_lat(tm)
    assert TOOLS["lattice-to-nbest"](
        ["--n=2", f"ark:{tmp_path}/in.lats",
         f"ark:{tmp_path}/nb.lats"]) == 0
    assert TOOLS["nbest-to-lattice"](
        [f"ark:{tmp_path}/nb.lats", f"ark:{tmp_path}/back.lats"]) == 0
    back = dict(SequentialTableReader(f"ark:{tmp_path}/back.lats",
                                      holder="clat"))
    assert list(back) == ["u"]
    from kaldi_tpu.lattice.ops import enumerate_paths
    orig = dict(SequentialTableReader(f"ark:{tmp_path}/in.lats",
                                      holder="clat"))["u"]
    assert enumerate_paths(back["u"]) == pytest.approx(
        enumerate_paths(orig))

    lexp = tmp_path / "lex.int"
    lexp.write_text("1 1\n2 2\n")      # word w → phone w
    assert TOOLS["nbest-to-prons"](
        [mdl, str(lexp), f"ark:{tmp_path}/nb.lats",
         f"ark,t:{tmp_path}/prons.txt"]) == 0
    prons = dict(SequentialTableReader(f"ark,t:{tmp_path}/prons.txt",
                                       holder="text"))
    assert len(prons) == 2


# ---------------------------------------------------------------------------
# kws index binaries


def test_kws_index_build_union_search(tmp_path, rng):
    _mdl, tm, _am = _mono_model(tmp_path, rng)
    with TableWriter(f"ark:{tmp_path}/a.lats", holder="clat") as w:
        w["uA"] = _two_path_lat(tm, w1=5, w2=6)
    with TableWriter(f"ark:{tmp_path}/b.lats", holder="clat") as w:
        w["uB"] = _two_path_lat(tm, w1=5, w2=7)
    assert TOOLS["lattice-to-kws-index"](
        [f"ark:{tmp_path}/a.lats", str(tmp_path / "idx.a")]) == 0
    assert TOOLS["lattice-to-kws-index"](
        [f"ark:{tmp_path}/b.lats", str(tmp_path / "idx.b")]) == 0
    assert TOOLS["kws-index-union"](
        [str(tmp_path / "idx.u"), str(tmp_path / "idx.a"),
         str(tmp_path / "idx.b")]) == 0
    from kaldi_tpu.core import io as kio
    from kaldi_tpu.kws import read_lattice_index
    with kio.open_rxfilename(str(tmp_path / "idx.u")) as f:
        kio.init_kaldi_input_stream(f)
        idx = read_lattice_index(f)
    hits5 = idx.search([5])
    assert {h.utt for h in hits5} == {"uA", "uB"}
    assert {h.utt for h in idx.search([7])} == {"uB"}


def test_transcripts_to_fsts(tmp_path):
    with TableWriter(f"ark:{tmp_path}/t.ark", holder="text") as w:
        w["u"] = ["3", "5", "2"]
    assert TOOLS["transcripts-to-fsts"](
        [f"ark:{tmp_path}/t.ark", f"ark:{tmp_path}/f.ark"]) == 0
    fst = dict(SequentialTableReader(f"ark:{tmp_path}/f.ark",
                                     holder="fst"))["u"]
    assert fst.num_states == 4
    labels = [fst.arcs[s][0].ilabel for s in range(3)]
    assert labels == [3, 5, 2]


# ---------------------------------------------------------------------------
# ivector extractor binaries


def test_ivector_extractor_training_cycle(tmp_path, rng):
    from kaldi_tpu.am.ivector import read_ivector_extractor
    D, G = 3, 4
    feats = {f"u{i}": rng.standard_normal((30, D)).astype(np.float32)
             for i in range(4)}
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        for k, v in feats.items():
            w[k] = v
    # train a tiny global GMM to act as the UBM
    assert TOOLS["gmm-global-init-from-feats"](
        [f"--num-gauss={G}", "--num-iters=3",
         f"ark:{tmp_path}/feats.ark", str(tmp_path / "ubm")]) == 0
    assert TOOLS["ivector-extractor-init"](
        ["--ivector-dim=2", str(tmp_path / "ubm"),
         str(tmp_path / "0.ie")]) == 0
    assert TOOLS["ivector-extractor-acc-stats"](
        [str(tmp_path / "0.ie"), f"ark:{tmp_path}/feats.ark",
         str(tmp_path / "acc1")]) == 0
    assert TOOLS["ivector-extractor-sum-accs"](
        [str(tmp_path / "acc"), str(tmp_path / "acc1"),
         str(tmp_path / "acc1")]) == 0
    assert TOOLS["ivector-extractor-est"](
        [str(tmp_path / "0.ie"), str(tmp_path / "acc"),
         str(tmp_path / "1.ie")]) == 0
    e0 = read_ivector_extractor(str(tmp_path / "0.ie"))
    e1 = read_ivector_extractor(str(tmp_path / "1.ie"))
    assert not np.allclose(e0.T, e1.T)      # M-step changed T
    assert TOOLS["ivector-extract"](
        [str(tmp_path / "1.ie"), f"ark:{tmp_path}/feats.ark",
         f"ark:{tmp_path}/iv.ark"]) == 0
    ivs = dict(SequentialTableReader(f"ark:{tmp_path}/iv.ark",
                                     holder="vec"))
    assert len(ivs) == 4 and ivs["u0"].shape == (2,)


def test_ivector_transform_and_dots(tmp_path, rng):
    from kaldi_tpu.core import io as kio
    vs = {"a": np.asarray([1.0, 0.0], np.float32),
          "b": np.asarray([0.0, 1.0], np.float32)}
    with TableWriter(f"ark:{tmp_path}/iv.ark", holder="vec") as w:
        for k, v in vs.items():
            w[k] = v
    mat = np.asarray([[0.0, 1.0], [1.0, 0.0]], np.float32)
    with kio.open_wxfilename(str(tmp_path / "m.mat")) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, mat)
    assert TOOLS["ivector-transform"](
        [str(tmp_path / "m.mat"), f"ark:{tmp_path}/iv.ark",
         f"ark:{tmp_path}/out.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/out.ark",
                                     holder="vec"))
    np.testing.assert_allclose(out["a"], [0.0, 1.0])

    (tmp_path / "trials").write_text("a a\na b\n")
    assert TOOLS["ivector-compute-dot-products"](
        [str(tmp_path / "trials"), f"ark:{tmp_path}/iv.ark",
         f"ark:{tmp_path}/iv.ark", str(tmp_path / "scores")]) == 0
    lines = open(tmp_path / "scores").read().splitlines()
    assert float(lines[0].split()[2]) == pytest.approx(1.0)
    assert float(lines[1].split()[2]) == pytest.approx(0.0)


def test_ivector_copy_plda(tmp_path, rng):
    from kaldi_tpu.am.ivector import Plda, read_plda, write_plda
    D = 3
    plda = Plda(np.zeros(D), np.eye(D), 0.5 * np.eye(D))
    write_plda(str(tmp_path / "plda"), plda)
    assert TOOLS["ivector-copy-plda"](
        ["--smoothing=0.5", str(tmp_path / "plda"),
         str(tmp_path / "plda2")]) == 0
    p2 = read_plda(str(tmp_path / "plda2"))
    np.testing.assert_allclose(p2.within, 0.75 * np.eye(D))


# ---------------------------------------------------------------------------
# online2 + rnnlm


def test_online2_wav_dump_features(tmp_path, rng):
    sr = 8000
    wav = (0.1 * rng.standard_normal(sr)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/wav.ark", holder="wav") as w:
        w["u"] = (wav, sr)
    assert TOOLS["online2-wav-dump-features"](
        [f"ark:{tmp_path}/wav.ark", f"ark:{tmp_path}/feats.ark"]) == 0
    feats = dict(SequentialTableReader(f"ark:{tmp_path}/feats.ark",
                                       holder="mat"))["u"]
    assert feats.shape[1] == 13 and feats.shape[0] > 90
    # online == offline oracle (on the int16-quantized round-tripped
    # waveform the tool actually read)
    from kaldi_tpu.core.table import SequentialTableReader as SR
    wav_rt, _rate = dict(SR(f"ark:{tmp_path}/wav.ark",
                            holder="wav"))["u"]
    from kaldi_tpu.features import FrameExtractionOptions, Mfcc, MfccOptions
    off = Mfcc(MfccOptions(frame_opts=FrameExtractionOptions(
        samp_freq=float(sr), dither=0.0))).compute(
            np.asarray(wav_rt, np.float32))
    np.testing.assert_allclose(feats, np.asarray(off)[:len(feats)],
                               atol=1e-3)


def test_rnnlm_get_egs(tmp_path):
    with TableWriter(f"ark:{tmp_path}/text.ark", holder="text") as w:
        w["s1"] = ["4", "5", "6"]
    assert TOOLS["rnnlm-get-egs"](
        [f"ark:{tmp_path}/text.ark", f"ark:{tmp_path}/egs.ark"]) == 0
    eg = dict(SequentialTableReader(f"ark:{tmp_path}/egs.ark",
                                    holder="mat"))["s1"]
    np.testing.assert_allclose(eg, [[1, 4, 5, 6], [4, 5, 6, 2]])


# ---------------------------------------------------------------------------
# gmm tail


def test_gmm_est_regtree_fmllr_recovers(tmp_path, rng):
    """Speaker feats transformed by A⁻¹: estimated root fMLLR must undo
    it (objective improvement ⇒ transform ≈ A)."""
    from kaldi_tpu.am.serialize import read_mdl
    D = 3
    mdl, tm, am = _mono_model(tmp_path, rng, D=D, M=1)
    T = 400
    # generate model-distributed feats then corrupt
    pdfs = rng.integers(0, tm.num_pdfs, T).astype(np.int32)
    # sample from the model's own Gaussians so the ML transform's
    # variance matching does not fight the planted A
    clean = (am.means[pdfs, 0]
             + np.sqrt(am.vars[pdfs, 0])
             * rng.standard_normal((T, D)))
    A = np.eye(D) + 0.25 * rng.standard_normal((D, D))
    corrupted = clean @ np.linalg.inv(A).T
    tids = []
    for p in pdfs:
        tid = next(t for t in range(1, tm.num_transition_ids + 1)
                   if tm.transition_id_to_pdf(t) == p)
        tids.append(tid)
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        w["spk"] = corrupted.astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        w["spk"] = np.asarray(tids, np.int32)
    assert TOOLS["gmm-est-regtree-fmllr"](
        ["--num-base-classes=2", "--min-count=50", mdl,
         f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/ali.ark",
         f"ark:{tmp_path}/trans.ark"]) == 0
    W = dict(SequentialTableReader(f"ark:{tmp_path}/trans.ark",
                                   holder="mat"))["spk"]
    fixed = corrupted @ W[:, :D].T + W[:, D]
    # fMLLR objective (loglike + log|det|) improves vs corrupted
    ll_fix = np.asarray(am.loglikes(fixed.astype(np.float32)))[
        np.arange(T), pdfs].mean()
    ll_bad = np.asarray(am.loglikes(corrupted.astype(np.float32)))[
        np.arange(T), pdfs].mean()
    logdet = np.linalg.slogdet(W[:, :D])[1]
    assert ll_fix + logdet > ll_bad + 0.2
    # and the root transform approximately undoes the corruption
    np.testing.assert_allclose(W[:, :D] @ np.linalg.inv(A), np.eye(D),
                               atol=0.35)


def test_gmm_est_fmllr_gpost(tmp_path, rng):
    mdl, tm, am = _mono_model(tmp_path, rng, D=3, M=2)
    T = 60
    feats = rng.standard_normal((T, 3)).astype(np.float32)
    tid = next(t for t in range(1, tm.num_transition_ids + 1))
    post = [[(tid, 1.0)] for _ in range(T)]
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        w["u"] = feats
    with TableWriter(f"ark:{tmp_path}/post.ark", holder="post") as w:
        w["u"] = post
    assert TOOLS["gmm-post-to-gpost"](
        [mdl, f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/post.ark",
         f"ark:{tmp_path}/gpost.ark"]) == 0
    assert TOOLS["gmm-est-fmllr-gpost"](
        [mdl, f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/gpost.ark",
         f"ark:{tmp_path}/trans.ark"]) == 0
    W = dict(SequentialTableReader(f"ark:{tmp_path}/trans.ark",
                                   holder="mat"))["u"]
    assert W.shape == (3, 4)


def test_gmm_acc_stats2_signs(tmp_path, rng):
    from kaldi_tpu.cli.tools_extra import read_gmm_accs
    mdl, tm, am = _mono_model(tmp_path, rng)
    T = 10
    feats = rng.standard_normal((T, am.dim)).astype(np.float32)
    tid = 1
    post = [[(tid, 1.0 if t % 2 == 0 else -0.5)] for t in range(T)]
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        w["u"] = feats
    with TableWriter(f"ark:{tmp_path}/post.ark", holder="post") as w:
        w["u"] = post
    assert TOOLS["gmm-acc-stats2"](
        [mdl, f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/post.ark",
         str(tmp_path / "num.acc"), str(tmp_path / "den.acc")]) == 0
    num = read_gmm_accs(str(tmp_path / "num.acc"))
    den = read_gmm_accs(str(tmp_path / "den.acc"))
    assert num.occ.sum() == pytest.approx(5.0)
    assert den.occ.sum() == pytest.approx(2.5)


def test_gmm_align_one_shot(tmp_path, rng):
    lex = tmp_path / "lexicon.txt"
    lex.write_text("go g o\nstop s t o p\n")
    phones = [1, 2, 3, 4, 5, 6]
    mdl, tm, am = _mono_model(tmp_path, rng, phones=tuple(phones))
    with TableWriter(f"ark:{tmp_path}/text.ark", holder="text") as w:
        w["u1"] = ["go"]
    T = 30
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        w["u1"] = rng.standard_normal((T, am.dim)).astype(np.float32)
    assert TOOLS["gmm-align"](
        [str(lex), mdl, f"ark:{tmp_path}/feats.ark",
         f"ark:{tmp_path}/text.ark", f"ark:{tmp_path}/ali.ark"]) == 0
    ali = dict(SequentialTableReader(f"ark:{tmp_path}/ali.ark",
                                     holder="ivec"))["u1"]
    assert len(ali) == T


def test_gmm_latgen_faster_parallel_matches_serial(tmp_path, rng):
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    lex = Lexicon(entries=[("GO", ["G", "OW"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(3), np.ones(3),
                              perturb=0.3)
    mdl = str(tmp_path / "final.mdl")
    write_mdl(mdl, tm, am)
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"GO": 1.0, "NO": 1.0})),
        lang.words))
    HCLG.write_text(str(tmp_path / "HCLG.txt"))
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        for i in range(3):
            w[f"u{i}"] = rng.standard_normal((20, 3)).astype(np.float32)
    assert TOOLS["gmm-latgen-faster-parallel"](
        ["--num-threads=2", mdl, str(tmp_path / "HCLG.txt"),
         f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/par.lats"]) == 0
    assert TOOLS["gmm-latgen-faster"](
        [mdl, str(tmp_path / "HCLG.txt"), f"ark:{tmp_path}/feats.ark",
         f"ark:{tmp_path}/ser.lats"]) == 0
    par = dict(SequentialTableReader(f"ark:{tmp_path}/par.lats",
                                     holder="clat"))
    ser = dict(SequentialTableReader(f"ark:{tmp_path}/ser.lats",
                                     holder="clat"))
    assert sorted(par) == sorted(ser)
    for k in par:
        pw, _, pc = par[k].best_path()
        sw, _, sc = ser[k].best_path()
        assert pw == sw and pc == pytest.approx(sc)


# ---------------------------------------------------------------------------
# bin utilities


def test_show_alignments(tmp_path, rng, capsys):
    mdl, tm, _am = _mono_model(tmp_path, rng)
    phones_txt = tmp_path / "phones.txt"
    phones_txt.write_text("<eps> 0\nSIL 1\na 2\n")
    tids = _phone_tids(tm, 1, 3) + _phone_tids(tm, 2, 2)
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        w["u"] = np.asarray(tids, np.int32)
    assert TOOLS["show-alignments"](
        [str(phones_txt), mdl, f"ark:{tmp_path}/ali.ark"]) == 0
    out = capsys.readouterr().out
    assert "SIL a" in out and "[" in out


def test_phones_to_prons(tmp_path, rng):
    mdl, tm, _am = _mono_model(tmp_path, rng, phones=(1, 2, 3))
    lexp = tmp_path / "lex.int"
    lexp.write_text("7 2 3\n8 2\n")
    tids = (_phone_tids(tm, 1, 2) + _phone_tids(tm, 2, 3)
            + _phone_tids(tm, 3, 2))
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        w["u"] = np.asarray(tids, np.int32)
    with TableWriter(f"ark:{tmp_path}/text.ark", holder="text") as w:
        w["u"] = ["7"]
    assert TOOLS["phones-to-prons"](
        [mdl, str(lexp), "1", f"ark:{tmp_path}/ali.ark",
         f"ark:{tmp_path}/text.ark", f"ark,t:{tmp_path}/p.txt"]) == 0
    prons = dict(SequentialTableReader(f"ark,t:{tmp_path}/p.txt",
                                       holder="text"))["u"]
    assert prons == ["7", "2", "3"]


def test_matrix_dim_and_copy_gselect(tmp_path, rng, capsys):
    with TableWriter(f"ark:{tmp_path}/m.ark", holder="mat") as w:
        w["u"] = rng.standard_normal((5, 3)).astype(np.float32)
    assert TOOLS["matrix-dim"]([f"ark:{tmp_path}/m.ark"]) == 0
    assert "u 5 3" in capsys.readouterr().out
    with TableWriter(f"ark:{tmp_path}/gs.ark", holder="ivec") as w:
        w["u"] = np.asarray([4, 2, 9, 1], np.int32)
    assert TOOLS["copy-gselect"](
        ["--n=2", f"ark:{tmp_path}/gs.ark",
         f"ark:{tmp_path}/gs2.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/gs2.ark",
                                     holder="ivec"))["u"]
    assert out.tolist() == [4, 2]
