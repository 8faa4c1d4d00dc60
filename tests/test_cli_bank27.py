"""CLI bank 27: gmmbin + featbin long tail — simple/biglm/regtree
latgen, fMPE stats derivatives/rescaling, MAP from stats, gpost
basis-fMLLR, raw-space fMLLR, global-GMM tail, feature comparison,
two-channel CMVN, full LDA matrices."""

import numpy as np
import pytest

from kaldi_tpu.am.gmm import AmDiagGmm
from kaldi_tpu.am.serialize import read_mdl, write_mdl
from kaldi_tpu.am.topology import HmmTopology
from kaldi_tpu.am.transitions import TransitionModel
from kaldi_tpu.am.tree import MonophoneContextDependency
from kaldi_tpu.cli import TOOLS, main
from kaldi_tpu.core.table import SequentialTableReader, TableWriter


@pytest.fixture
def rng():
    return np.random.default_rng(27)


def _mono_model(tmp_path, rng, D=3, M=2, name="0.mdl", phones=(1, 2)):
    topo = HmmTopology.three_state(list(phones))
    tree = MonophoneContextDependency(list(phones), topo)
    tm = TransitionModel(topo, tree)
    P = tree.num_pdfs
    am = AmDiagGmm(rng.dirichlet(np.ones(M), size=P),
                   rng.standard_normal((P, M, D)),
                   0.5 + rng.random((P, M, D)))
    path = str(tmp_path / name)
    write_mdl(path, tm, am)
    return path, tm, am


def _lang_system(tmp_path, rng, D=3):
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    lex = Lexicon(entries=[("GO", ["G", "OW"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(D), np.ones(D),
                              perturb=0.3)
    mdl = str(tmp_path / "final.mdl")
    write_mdl(mdl, tm, am)
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"GO": 1.0, "NO": 1.0})),
        lang.words))
    HCLG.write_text(str(tmp_path / "HCLG.txt"))
    return mdl, lang


# ---------------------------------------------------------------------------
# decoding


def test_gmm_latgen_simple_matches_faster_best_path(tmp_path, rng):
    mdl, _lang = _lang_system(tmp_path, rng)
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        for i in range(2):
            w[f"u{i}"] = rng.standard_normal((18, 3)).astype(np.float32)
    assert main(["gmm-latgen-simple", mdl, str(tmp_path / "HCLG.txt"),
                 f"ark:{tmp_path}/feats.ark",
                 f"ark:{tmp_path}/simple.lats"]) == 0
    assert main(["gmm-latgen-faster", "--beam=100", mdl,
                 str(tmp_path / "HCLG.txt"),
                 f"ark:{tmp_path}/feats.ark",
                 f"ark:{tmp_path}/faster.lats"]) == 0
    simple = dict(SequentialTableReader(f"ark:{tmp_path}/simple.lats",
                                        holder="clat"))
    faster = dict(SequentialTableReader(f"ark:{tmp_path}/faster.lats",
                                        holder="clat"))
    for k in simple:
        sw, _st, sc = simple[k].best_path()
        fw, _ft, fc = faster[k].best_path()
        assert sw == fw
        assert sc == pytest.approx(fc, abs=1e-3)


def test_gmm_decode_biglm_faster(tmp_path, rng):
    from kaldi_tpu.fst.arpa import make_unigram_arpa
    mdl, lang = _lang_system(tmp_path, rng)
    (tmp_path / "old.arpa").write_text(
        make_unigram_arpa({"GO": 1.0, "NO": 1.0}))
    (tmp_path / "new.arpa").write_text(
        make_unigram_arpa({"GO": 3.0, "NO": 1.0}))
    words_txt = tmp_path / "words.txt"
    lang.words.write(str(words_txt))
    T = 15
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        w["u0"] = rng.standard_normal((T, 3)).astype(np.float32)
    assert main(["gmm-decode-biglm-faster",
                 f"--word-symbol-table={words_txt}", mdl,
                 str(tmp_path / "HCLG.txt"), str(tmp_path / "old.arpa"),
                 str(tmp_path / "new.arpa"),
                 f"ark:{tmp_path}/feats.ark",
                 f"ark:{tmp_path}/words.ark",
                 f"ark:{tmp_path}/ali.ark"]) == 0
    hyp = dict(SequentialTableReader(f"ark:{tmp_path}/words.ark",
                                     holder="text"))["u0"]
    assert all(w in ("GO", "NO") for w in hyp)
    ali = dict(SequentialTableReader(f"ark:{tmp_path}/ali.ark",
                                     holder="ivec"))["u0"]
    assert len(ali) == T


def test_gmm_latgen_faster_regtree_fmllr_identity(tmp_path, rng):
    """Identity transforms → lattices match the plain latgen."""
    mdl, _lang = _lang_system(tmp_path, rng)
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        w["u0"] = rng.standard_normal((15, 3)).astype(np.float32)
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))],
                           axis=1).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/trans.ark", holder="mat") as w:
        w["u0"] = ident
    assert main(["gmm-latgen-faster-regtree-fmllr", mdl,
                 str(tmp_path / "HCLG.txt"), f"ark:{tmp_path}/trans.ark",
                 f"ark:{tmp_path}/feats.ark",
                 f"ark:{tmp_path}/rt.lats"]) == 0
    assert main(["gmm-latgen-faster", mdl, str(tmp_path / "HCLG.txt"),
                 f"ark:{tmp_path}/feats.ark",
                 f"ark:{tmp_path}/plain.lats"]) == 0
    rt = dict(SequentialTableReader(f"ark:{tmp_path}/rt.lats",
                                    holder="clat"))["u0"]
    plain = dict(SequentialTableReader(f"ark:{tmp_path}/plain.lats",
                                       holder="clat"))["u0"]
    assert rt.best_path()[0] == plain.best_path()[0]
    assert rt.best_path()[2] == pytest.approx(plain.best_path()[2],
                                              abs=1e-3)


# ---------------------------------------------------------------------------
# stats derivatives / rescale / MAP


def _acc_stats(tmp_path, rng, mdl, tm, feats, name, shift=0.0):
    T = len(feats)
    with TableWriter(f"ark:{tmp_path}/{name}_f.ark", holder="mat") as w:
        w["u"] = (feats + shift).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/{name}_a.ark", holder="ivec") as w:
        w["u"] = rng.integers(1, tm.num_transition_ids + 1,
                              T).astype(np.int32)
    assert main(["gmm-acc-stats-ali", mdl,
                 f"ark:{tmp_path}/{name}_f.ark",
                 f"ark:{tmp_path}/{name}_a.ark",
                 str(tmp_path / f"{name}.acc")]) == 0
    return str(tmp_path / f"{name}.acc")


def test_gmm_get_stats_deriv_zero_when_num_equals_den(tmp_path, rng):
    from kaldi_tpu.am.serialize import read_pytree
    from kaldi_tpu.core import io as kio
    mdl, tm, _am = _mono_model(tmp_path, rng)
    feats = rng.standard_normal((40, 3))
    acc = _acc_stats(tmp_path, rng, mdl, tm, feats, "num")
    assert main(["gmm-get-stats-deriv", mdl, acc, acc,
                 str(tmp_path / "deriv")]) == 0
    with kio.open_rxfilename(str(tmp_path / "deriv")) as f:
        kio.init_kaldi_input_stream(f)
        kio.expect_token(f, "<GmmStatsDeriv>")
        d = read_pytree(f)
    np.testing.assert_allclose(d["d_mean"], 0.0, atol=1e-6)
    np.testing.assert_allclose(d["d_occ"], 0.0, atol=1e-6)


def test_gmm_get_stats_deriv_sign(tmp_path, rng):
    """num stats from shifted features → mean derivative points along
    the shift (positive average in every dim)."""
    from kaldi_tpu.am.serialize import read_pytree
    from kaldi_tpu.core import io as kio
    mdl, tm, _am = _mono_model(tmp_path, rng, M=1)
    rng2 = np.random.default_rng(1)
    feats = rng2.standard_normal((200, 3))
    num = _acc_stats(tmp_path, rng, mdl, tm, feats, "num", shift=2.0)
    den = _acc_stats(tmp_path, rng, mdl, tm, feats, "den", shift=0.0)
    assert main(["gmm-get-stats-deriv", mdl, num, den,
                 str(tmp_path / "deriv")]) == 0
    with kio.open_rxfilename(str(tmp_path / "deriv")) as f:
        kio.init_kaldi_input_stream(f)
        kio.expect_token(f, "<GmmStatsDeriv>")
        d = read_pytree(f)
    # not identically zero, and the aggregate mean-deriv is positive
    assert float(np.abs(d["d_mean"]).max()) > 0.1
    occ = np.maximum(d["d_occ"], 0)[..., None]
    assert float((d["d_mean"] * (occ > -1)).sum()) > 0


def test_gmm_est_rescale_tracks_shift(tmp_path, rng):
    mdl, tm, am0 = _mono_model(tmp_path, rng, M=1)
    feats = rng.standard_normal((300, 3))
    old = _acc_stats(tmp_path, rng, mdl, tm, feats, "old")
    # same posteriors, features shifted by +1.5: reuse the SAME ali
    with TableWriter(f"ark:{tmp_path}/new_f.ark", holder="mat") as w:
        w["u"] = (feats + 1.5).astype(np.float32)
    assert main(["gmm-acc-stats-ali", mdl, f"ark:{tmp_path}/new_f.ark",
                 f"ark:{tmp_path}/old_a.ark",
                 str(tmp_path / "new.acc")]) == 0
    assert main(["gmm-est-rescale", "--min-count=1", mdl, old,
                 str(tmp_path / "new.acc"),
                 str(tmp_path / "resc.mdl")]) == 0
    _tm2, am2 = read_mdl(str(tmp_path / "resc.mdl"))
    occ_ok = True     # every pdf visited enough in 300 frames? check
    moved = am2.means - am0.means
    # pdfs with enough counts moved by ≈ +1.5 in every dim
    big = np.abs(moved) > 0.5
    assert big.any()
    np.testing.assert_allclose(moved[big], 1.5, atol=0.5)


def test_gmm_est_map_matches_adapt_map(tmp_path, rng):
    mdl, tm, _am = _mono_model(tmp_path, rng)
    feats = rng.standard_normal((60, 3))
    acc = _acc_stats(tmp_path, rng, mdl, tm, feats, "map")
    assert main(["gmm-est-map", "--mean-tau=5", mdl, acc,
                 str(tmp_path / "est.mdl")]) == 0
    assert main(["gmm-adapt-map", "--mean-tau=5", mdl,
                 f"ark:{tmp_path}/map_f.ark",
                 f"ark:{tmp_path}/map_a.ark",
                 str(tmp_path / "adapt.mdl")]) == 0
    _t1, am1 = read_mdl(str(tmp_path / "est.mdl"))
    _t2, am2 = read_mdl(str(tmp_path / "adapt.mdl"))
    np.testing.assert_allclose(am1.means, am2.means, atol=1e-4)


# ---------------------------------------------------------------------------
# basis-fMLLR gpost


def test_basis_fmllr_gpost_pipeline(tmp_path, rng):
    mdl, tm, am = _mono_model(tmp_path, rng, D=3)
    T = 80
    feats = rng.standard_normal((T, 3)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        w["u"] = feats
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        w["u"] = rng.integers(1, tm.num_transition_ids + 1,
                              T).astype(np.int32)
    with TableWriter(f"ark:{tmp_path}/post.ark", holder="post") as w:
        w["u"] = [[(1, 1.0)] for _ in range(T)]
    assert main(["gmm-post-to-gpost", mdl, f"ark:{tmp_path}/feats.ark",
                 f"ark:{tmp_path}/post.ark",
                 f"ark:{tmp_path}/gpost.ark"]) == 0
    assert main(["gmm-basis-fmllr-accs-gpost", mdl,
                 f"ark:{tmp_path}/feats.ark",
                 f"ark:{tmp_path}/gpost.ark",
                 str(tmp_path / "sc.acc")]) == 0
    assert main(["gmm-basis-fmllr-training", str(tmp_path / "basis"),
                 str(tmp_path / "sc.acc")]) == 0
    assert main(["gmm-est-basis-fmllr-gpost", mdl,
                 str(tmp_path / "basis"), f"ark:{tmp_path}/feats.ark",
                 f"ark:{tmp_path}/gpost.ark",
                 f"ark:{tmp_path}/trans.ark"]) == 0
    W = dict(SequentialTableReader(f"ark:{tmp_path}/trans.ark",
                                   holder="mat"))["u"]
    assert W.shape == (3, 4)
    assert np.isfinite(W).all()


# ---------------------------------------------------------------------------
# raw-space fMLLR


def test_gmm_est_fmllr_raw_recovers_shift(tmp_path, rng):
    """Raw feats are model feats lifted to 4-dim + a constant shift;
    the raw transform must undo the shift (objf improves, offset
    column ≈ -shift in the informative dims)."""
    from kaldi_tpu.core import io as kio
    D, Dr, T = 2, 3, 300
    topo = HmmTopology.three_state([1])
    tree = MonophoneContextDependency([1], topo)
    tm = TransitionModel(topo, tree)
    mu = np.array([1.0, -1.0])
    am = AmDiagGmm.flat_start(tree.num_pdfs, mu, np.ones(D) * 0.5,
                              perturb=0.2)
    mdl = str(tmp_path / "raw.mdl")
    write_mdl(mdl, tm, am)
    # LDA: picks the first two raw dims
    lda = np.zeros((D, Dr))
    lda[0, 0] = 1.0
    lda[1, 1] = 1.0
    with kio.open_wxfilename(str(tmp_path / "lda.mat")) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, lda)
    # raw data: model-space samples + shift, third dim noise
    shift = np.array([0.8, -0.6, 0.0])
    clean = mu[None, :] + 0.7 * rng.standard_normal((T, D))
    raw = np.concatenate([clean, rng.standard_normal((T, 1))],
                         axis=1) + shift[None, :]
    with TableWriter(f"ark:{tmp_path}/raw.ark", holder="mat") as w:
        w["u"] = raw.astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/post.ark", holder="post") as w:
        w["u"] = [[(0, 1.0)] for _ in range(T)]
    assert main(["gmm-est-fmllr-raw", f"--lda-matrix={tmp_path}/lda.mat",
                 "--num-iters=150", "--learning-rate=0.05", mdl,
                 f"ark:{tmp_path}/raw.ark", f"ark:{tmp_path}/post.ark",
                 f"ark:{tmp_path}/trans.ark"]) == 0
    W = dict(SequentialTableReader(f"ark:{tmp_path}/trans.ark",
                                   holder="mat"))["u"]
    assert W.shape == (Dr, Dr + 1)
    # applying W then LDA must center the data near the model mean
    y = raw @ W[:, :Dr].T + W[:, Dr]
    z = y @ lda.T
    np.testing.assert_allclose(z.mean(axis=0), mu, atol=0.25)


def test_gmm_est_fmllr_raw_gpost(tmp_path, rng):
    from kaldi_tpu.core import io as kio
    mdl, tm, am = _mono_model(tmp_path, rng, D=2, M=2)
    Dr, T = 3, 60
    lda = np.zeros((2, Dr))
    lda[0, 0], lda[1, 1] = 1.0, 1.0
    with kio.open_wxfilename(str(tmp_path / "lda.mat")) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, lda)
    raw = rng.standard_normal((T, Dr))
    with TableWriter(f"ark:{tmp_path}/raw.ark", holder="mat") as w:
        w["u"] = raw.astype(np.float32)
    M = am.max_mix
    with TableWriter(f"ark:{tmp_path}/gpost.ark", holder="post") as w:
        w["u"] = [[(1 * M + 0, 1.0)] for _ in range(T)]
    assert main(["gmm-est-fmllr-raw-gpost",
                 f"--lda-matrix={tmp_path}/lda.mat", "--num-iters=30",
                 mdl, f"ark:{tmp_path}/raw.ark",
                 f"ark:{tmp_path}/gpost.ark",
                 f"ark:{tmp_path}/trans.ark"]) == 0
    W = dict(SequentialTableReader(f"ark:{tmp_path}/trans.ark",
                                   holder="mat"))["u"]
    assert W.shape == (Dr, Dr + 1) and np.isfinite(W).all()


# ---------------------------------------------------------------------------
# global-GMM tail


def _global_gmm(tmp_path, rng, D=3, M=4, name="glob.gmm"):
    from kaldi_tpu.cli.tools_bank5 import _write_global_gmm
    am = AmDiagGmm(rng.dirichlet(np.ones(M), size=1),
                   rng.standard_normal((1, M, D)),
                   0.5 + rng.random((1, M, D)))
    path = str(tmp_path / name)
    _write_global_gmm(path, am)
    return path, am


def test_gmm_global_acc_stats_twofeats_identity(tmp_path, rng):
    """feats2 == feats1 → same accs as gmm-global-acc-stats."""
    from kaldi_tpu.cli.tools_extra import read_gmm_accs
    gmm, _am = _global_gmm(tmp_path, rng)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = rng.standard_normal((30, 3)).astype(np.float32)
    assert main(["gmm-global-acc-stats-twofeats", gmm,
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/f.ark",
                 str(tmp_path / "two.acc")]) == 0
    assert main(["gmm-global-acc-stats", gmm, f"ark:{tmp_path}/f.ark",
                 str(tmp_path / "one.acc")]) == 0
    two = read_gmm_accs(str(tmp_path / "two.acc"))
    one = read_gmm_accs(str(tmp_path / "one.acc"))
    np.testing.assert_allclose(two.occ, one.occ, atol=1e-4)
    np.testing.assert_allclose(two.mean_acc, one.mean_acc, atol=1e-3)


def test_gmm_acc_mllt_global_and_est(tmp_path, rng):
    gmm, _am = _global_gmm(tmp_path, rng)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        for i in range(2):
            w[f"u{i}"] = rng.standard_normal((40, 3)).astype(np.float32)
    assert main(["gmm-acc-mllt-global", gmm, f"ark:{tmp_path}/f.ark",
                 str(tmp_path / "mllt.acc")]) == 0
    assert main(["est-mllt", str(tmp_path / "m.mat"),
                 str(tmp_path / "mllt.acc")]) == 0
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(str(tmp_path / "m.mat")) as f:
        kio.init_kaldi_input_stream(f)
        mat = kio.read_matrix(f)
    assert mat.shape == (3, 3)
    assert abs(np.linalg.det(mat)) > 1e-3


def test_gmm_global_est_lvtln_trans_selects_class(tmp_path, rng):
    """Features scaled by 2 need the 0.5-scaling class."""
    from kaldi_tpu.am.lvtln import Lvtln, write_lvtln
    from kaldi_tpu.core import io as kio
    D = 3
    am = AmDiagGmm(np.ones((1, 1)), np.zeros((1, 1, D)),
                   np.ones((1, 1, D)))
    from kaldi_tpu.cli.tools_bank5 import _write_global_gmm
    gmm = str(tmp_path / "g.gmm")
    _write_global_gmm(gmm, am)
    lv = Lvtln(D, 2, default_class=0)
    lv.set_transform(0, np.eye(D), 1.0)
    lv.set_transform(1, 0.5 * np.eye(D), 0.9)
    with kio.open_wxfilename(str(tmp_path / "lv")) as f:
        kio.init_kaldi_output_stream(f)
        write_lvtln(f, lv)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["s1"] = (2.0 * rng.standard_normal((100, D))).astype(
            np.float32)
    assert main(["gmm-global-est-lvtln-trans", gmm,
                 str(tmp_path / "lv"), f"ark:{tmp_path}/f.ark",
                 f"ark:{tmp_path}/trans.ark",
                 f"ark:{tmp_path}/warp.ark"]) == 0
    W = dict(SequentialTableReader(f"ark:{tmp_path}/trans.ark",
                                   holder="mat"))["s1"]
    np.testing.assert_allclose(W[:, :D], 0.5 * np.eye(D), atol=1e-6)
    warp = dict(SequentialTableReader(f"ark:{tmp_path}/warp.ark",
                                      holder="vec"))["s1"]
    assert warp[0] == pytest.approx(0.9)


# ---------------------------------------------------------------------------
# featbin tail


def test_compare_feats(tmp_path, rng, capsys):
    x = rng.standard_normal((20, 4)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/a.ark", holder="mat") as w:
        w["u"] = x
    with TableWriter(f"ark:{tmp_path}/b.ark", holder="mat") as w:
        w["u"] = (x + 0.3 * rng.standard_normal(x.shape)
                  ).astype(np.float32)
    assert main(["compare-feats", f"ark:{tmp_path}/a.ark",
                 f"ark:{tmp_path}/a.ark"]) == 0
    sim = float(capsys.readouterr().out.strip())
    assert sim == pytest.approx(1.0, abs=1e-6)
    # noisy copy fails a tight threshold but passes a loose one
    assert main(["compare-feats", "--threshold=0.999",
                 f"ark:{tmp_path}/a.ark", f"ark:{tmp_path}/b.ark"]) == 1
    assert main(["compare-feats", "--threshold=0.5",
                 f"ark:{tmp_path}/a.ark", f"ark:{tmp_path}/b.ark"]) == 0


def test_compute_cmvn_stats_two_channel(tmp_path, rng):
    T, D = 30, 3
    a = rng.standard_normal((T, D))
    b = rng.standard_normal((T, D))
    a[:, 0] = 5.0          # channel A always louder
    b[:, 0] = 1.0
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["rec-A"] = a.astype(np.float32)
        w["rec-B"] = b.astype(np.float32)
    (tmp_path / "r2fc").write_text("rec-A rec A\nrec-B rec B\n")
    assert main(["compute-cmvn-stats-two-channel",
                 str(tmp_path / "r2fc"), f"ark:{tmp_path}/f.ark",
                 f"ark:{tmp_path}/cmvn.ark"]) == 0
    stats = dict(SequentialTableReader(f"ark:{tmp_path}/cmvn.ark",
                                       holder="mat"))
    # A gets full weight on every frame, B only the floor weight
    assert stats["rec-A"][0, D] == pytest.approx(T)
    assert stats["rec-B"][0, D] == pytest.approx(0.01 * T, rel=1e-3)
    # A's stats equal plain CMVN stats
    np.testing.assert_allclose(stats["rec-A"][0, :D], a.sum(axis=0),
                               rtol=1e-5)


def test_get_full_lda_mat(tmp_path, rng):
    from kaldi_tpu.am.transforms import LdaEstimate
    from kaldi_tpu.core import io as kio
    # LDA accs written directly in the est-lda <LDAACCS> framing
    D, C = 4, 3
    feats = rng.standard_normal((200, D))
    labels = rng.integers(0, C, 200)
    feats += labels[:, None] * 1.5
    lda = LdaEstimate(C, D)
    lda.accumulate_batch(feats, labels)
    with kio.open_wxfilename(str(tmp_path / "lda.acc")) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<LDAACCS>")
        kio.write_matrix(f, lda.counts[None, :])
        kio.write_matrix(f, lda.first)
        kio.write_matrix(f, lda.total_second)
        kio.write_token(f, "</LDAACCS>")
    assert main(["est-lda", "--dim=2",
                 f"--write-full-matrix={tmp_path}/full.mat",
                 str(tmp_path / "lda.mat"), str(tmp_path / "lda.acc")
                 ]) == 0
    assert main(["get-full-lda-mat", str(tmp_path / "lda.mat"),
                 str(tmp_path / "full.mat"),
                 str(tmp_path / "composed.mat")]) == 0
    with kio.open_rxfilename(str(tmp_path / "composed.mat")) as f:
        kio.init_kaldi_input_stream(f)
        comp = kio.read_matrix(f)
    with kio.open_rxfilename(str(tmp_path / "lda.mat")) as f:
        kio.init_kaldi_input_stream(f)
        red = kio.read_matrix(f)
    assert comp.shape == (D, D + 1)
    np.testing.assert_allclose(comp[:2], red, atol=1e-6)
    # square part invertible
    assert abs(np.linalg.det(comp[:, :D])) > 1e-6
