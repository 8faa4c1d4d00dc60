"""CLI bank 31: nnet2bin surgery/transform/discriminative tail,
nnet3-latgen-incremental, calibration, GOP, device probe."""

import numpy as np
import pytest

from kaldi_tpu.am.gmm import AmDiagGmm
from kaldi_tpu.am.serialize import write_mdl
from kaldi_tpu.am.topology import HmmTopology
from kaldi_tpu.am.transitions import TransitionModel
from kaldi_tpu.am.tree import MonophoneContextDependency
from kaldi_tpu.cli import TOOLS, main
from kaldi_tpu.core.table import SequentialTableReader, TableWriter
from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice


@pytest.fixture
def rng():
    return np.random.default_rng(31)


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


def _nnet2_model(tmp_path, rng, name="n2.mdl", D=4, num_pdfs=6,
                 layers=2):
    import jax
    from kaldi_tpu.am.nnet2 import Nnet2Config, Nnet2Model, save_nnet2
    cfg = Nnet2Config(feat_dim=D, num_pdfs=num_pdfs,
                      num_hidden_layers=layers, pnorm_input_dim=16,
                      pnorm_output_dim=4, splice=(-1, 0, 1))
    model = Nnet2Model(cfg)
    params = model.init(jax.random.PRNGKey(int(rng.integers(1 << 30))),
                        np.zeros((1, 5, D), np.float32))["params"]
    path = str(tmp_path / name)
    save_nnet2(path, params, cfg)
    return path, cfg


# ---------------------------------------------------------------------------


def test_cuda_gpu_available_cpu_backend():
    # tests run on the forced-CPU backend → no accelerator → exit 1
    assert TOOLS["cuda-gpu-available"]([]) == 1


def test_logistic_regression_copy_scale_priors(tmp_path, rng):
    from kaldi_tpu.core import io as kio
    C, D = 3, 5
    W = rng.standard_normal((C, D + 1)).astype(np.float32)
    m0 = str(tmp_path / "lr.mdl")
    with kio.open_wxfilename(m0) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<LogisticRegression>")
        kio.write_matrix(f, W)
        kio.write_token(f, "</LogisticRegression>")
    scales = np.asarray([1.0, 2.0, 0.5], np.float32)
    with kio.open_wxfilename(str(tmp_path / "s.vec")) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_vector(f, scales)
    m1 = str(tmp_path / "lr2.mdl")
    assert TOOLS["logistic-regression-copy"](
        [f"--scale-priors={tmp_path}/s.vec", m0, m1]) == 0
    with kio.open_rxfilename(m1) as f:
        kio.init_kaldi_input_stream(f)
        kio.expect_token(f, "<LogisticRegression>")
        W2 = np.asarray(kio.read_matrix(f))
    np.testing.assert_allclose(W2[:, :D], W[:, :D], atol=1e-6)
    np.testing.assert_allclose(W2[:, D] - W[:, D], np.log(scales),
                               atol=1e-5)


def test_compute_calibration_separates_clusters(tmp_path, rng):
    lo = rng.normal(-4.0, 0.5, 200)
    hi = rng.normal(3.0, 0.5, 200)
    with TableWriter(f"ark:{tmp_path}/s.ark", holder="vec") as w:
        w["a"] = lo.astype(np.float32)
        w["b"] = hi.astype(np.float32)
    out = str(tmp_path / "thr")
    assert TOOLS["compute-calibration"](
        [f"ark:{tmp_path}/s.ark", out]) == 0
    thr = float(open(out).read())
    assert -3.0 < thr < 2.0


def test_compute_gop(tmp_path, rng):
    mdl, tm, _am = _mono_model(tmp_path, rng)
    T = 8
    tids = _phone_tids(tm, 1, 4) + _phone_tids(tm, 2, 4)
    pdf_of = [tm.transition_id_to_pdf(t) for t in tids]
    P = tm.num_pdfs
    # u_good: aligned pdf dominates each frame → GOP ≈ 0
    lp = np.full((T, P), np.log(0.01 / (P - 1)))
    for t in range(T):
        lp[t, pdf_of[t]] = np.log(0.99)
    # u_bad: a DIFFERENT phone's pdfs dominate frames 0..3
    lp_bad = lp.copy()
    wrong = tm.transition_id_to_pdf(_phone_tids(tm, 2, 1)[0])
    for t in range(4):
        lp_bad[t] = np.log(0.01 / (P - 1))
        lp_bad[t, wrong] = np.log(0.99)
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        w["u_good"] = np.asarray(tids, np.int32)
        w["u_bad"] = np.asarray(tids, np.int32)
    with TableWriter(f"ark:{tmp_path}/p.ark", holder="mat") as w:
        w["u_good"] = lp.astype(np.float32)
        w["u_bad"] = lp_bad.astype(np.float32)
    assert TOOLS["compute-gop"](
        [mdl, f"ark:{tmp_path}/ali.ark", f"ark:{tmp_path}/p.ark",
         f"ark:{tmp_path}/gop.ark", f"ark:{tmp_path}/ph.ark"]) == 0
    gop = dict(SequentialTableReader(f"ark:{tmp_path}/gop.ark",
                                     holder="vec"))
    ph = dict(SequentialTableReader(f"ark:{tmp_path}/ph.ark",
                                    holder="ivec"))
    assert list(ph["u_good"]) == [1, 2]
    assert np.all(gop["u_good"] > -0.1)           # well-pronounced
    assert gop["u_bad"][0] < -2.0                 # mispronounced seg
    assert gop["u_bad"][1] > -0.1


# ---------------------------------------------------------------------------


def test_nnet_am_limit_rank(tmp_path, rng):
    from kaldi_tpu.am.nnet2 import load_nnet2_full
    m0, cfg = _nnet2_model(tmp_path, rng)
    out = str(tmp_path / "lr.mdl")
    assert TOOLS["nnet-am-limit-rank"](["--dim=2", m0, out]) == 0
    params, cfg2, _ = load_nnet2_full(out)
    for i in range(cfg.num_hidden_layers):
        K = np.asarray(params[f"pnorm{i + 1}"]["affine"]["kernel"])
        assert np.linalg.matrix_rank(K.astype(np.float64),
                                     tol=1e-4) <= 2
    # full rank ⇒ reconstruction is (numerically) the identity op
    out2 = str(tmp_path / "full.mdl")
    assert TOOLS["nnet-am-limit-rank"](["--dim=999", m0, out2]) == 0
    p0, _, _ = load_nnet2_full(m0)
    p2, _, _ = load_nnet2_full(out2)
    np.testing.assert_allclose(
        np.asarray(p2["pnorm1"]["affine"]["kernel"]),
        np.asarray(p0["pnorm1"]["affine"]["kernel"]), atol=1e-4)


def test_nnet_am_reinitialize(tmp_path, rng):
    from kaldi_tpu.am.nnet2 import load_nnet2_full
    m0, cfg = _nnet2_model(tmp_path, rng, num_pdfs=6)
    big_mdl, tm, _ = _mono_model(tmp_path, rng, phones=(1, 2, 3))
    out = str(tmp_path / "re.mdl")
    assert TOOLS["nnet-am-reinitialize"]([m0, big_mdl, out]) == 0
    params, cfg2, _ = load_nnet2_full(out)
    assert cfg2.num_pdfs == tm.num_pdfs == 9
    assert np.asarray(
        params["output_affine"]["kernel"]).shape[1] == 9
    p0, _, _ = load_nnet2_full(m0)
    np.testing.assert_allclose(
        np.asarray(params["pnorm1"]["affine"]["kernel"]),
        np.asarray(p0["pnorm1"]["affine"]["kernel"]), atol=1e-6)


def test_nnet_compute_from_egs(tmp_path, rng):
    from kaldi_tpu.pipelines.egs_io import XentEg
    m0, cfg = _nnet2_model(tmp_path, rng)
    B, T = 2, 5
    with TableWriter(f"ark:{tmp_path}/egs.ark", holder="xeg") as w:
        w["e1"] = XentEg(
            feats=rng.standard_normal((B, T, cfg.feat_dim)).astype(
                np.float32),
            pdfs=np.zeros((B, T), np.int32))
    assert TOOLS["nnet-compute-from-egs"](
        [m0, f"ark:{tmp_path}/egs.ark", f"ark:{tmp_path}/o.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/o.ark",
                                     holder="mat"))["e1"]
    assert out.shape == (B * T, cfg.num_pdfs)
    # rows are log-posteriors
    np.testing.assert_allclose(np.exp(out).sum(axis=1), 1.0,
                               atol=1e-4)


def _write_lda_acc(path, counts, first, second):
    from kaldi_tpu.core import io as kio
    with kio.open_wxfilename(path) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<LDAACCS>")
        kio.write_matrix(f, counts[None, :])
        kio.write_matrix(f, first)
        kio.write_matrix(f, second)
        kio.write_token(f, "</LDAACCS>")


def _rand_lda_stats(rng, C, D, n_per=50):
    means = 3.0 * rng.standard_normal((C, D))
    counts = np.full(C, float(n_per))
    first = np.zeros((C, D))
    second = np.zeros((D, D))
    for c in range(C):
        x = means[c] + rng.standard_normal((n_per, D))
        first[c] = x.sum(axis=0)
        second += x.T @ x
    return counts, first, second


def test_nnet_get_feature_transform(tmp_path, rng):
    from kaldi_tpu.core import io as kio
    C, D = 3, 4
    counts, first, second = _rand_lda_stats(rng, C, D)
    # split the stats across two acc files: the tool must sum them
    _write_lda_acc(str(tmp_path / "a1.acc"), counts / 2, first / 2,
                   second / 2)
    _write_lda_acc(str(tmp_path / "a2.acc"), counts / 2, first / 2,
                   second / 2)
    out = str(tmp_path / "t.mat")
    assert TOOLS["nnet-get-feature-transform"](
        ["--within-class-factor=0.001", out,
         str(tmp_path / "a1.acc"), str(tmp_path / "a2.acc")]) == 0
    with kio.open_rxfilename(out) as f:
        kio.init_kaldi_input_stream(f)
        M = np.asarray(kio.read_matrix(f))
    assert M.shape == (D, D + 1)          # non-dimension-reducing
    assert np.all(np.isfinite(M))
    # within-class-factor scales the projection: 1.0 ⇒ √1000× larger
    out2 = str(tmp_path / "t2.mat")
    assert TOOLS["nnet-get-feature-transform"](
        ["--within-class-factor=1.0", out2,
         str(tmp_path / "a1.acc"), str(tmp_path / "a2.acc")]) == 0
    with kio.open_rxfilename(out2) as f:
        kio.init_kaldi_input_stream(f)
        M2 = np.asarray(kio.read_matrix(f))
    np.testing.assert_allclose(
        np.linalg.norm(M2[:, :D]) / np.linalg.norm(M[:, :D]),
        np.sqrt(1000.0), rtol=1e-3)


def test_nnet_get_feature_transform_multi(tmp_path, rng):
    from kaldi_tpu.core import io as kio
    D, N = 3, 3      # 3 context positions of dim 3 → acc over dim 9
    counts, first, second = _rand_lda_stats(rng, 2, D * N)
    _write_lda_acc(str(tmp_path / "a.acc"), counts, first, second)
    out = str(tmp_path / "m.mat")
    assert TOOLS["nnet-get-feature-transform-multi"](
        [f"--feat-dim={D}", "--context-groups=0,1:2",
         str(tmp_path / "a.acc"), out]) == 0
    with kio.open_rxfilename(out) as f:
        kio.init_kaldi_input_stream(f)
        M = np.asarray(kio.read_matrix(f))
    assert M.shape == (D * N, D * N + 1)
    # block-diagonal: group {0,1} rows have zero weight on context 2
    assert np.abs(M[:2 * D, 2 * D:3 * D]).max() == 0.0
    assert np.abs(M[2 * D:, :2 * D]).max() == 0.0


def test_nnet_modify_learning_rates(tmp_path, rng):
    import jax
    from kaldi_tpu.am.nnet2 import load_nnet2_full, save_nnet2
    m0, cfg = _nnet2_model(tmp_path, rng)
    p0, cfg0, _ = load_nnet2_full(m0)
    # perturb layer 1 a lot, layer 2 a little, output in between
    deltas = {"pnorm1": 0.5, "pnorm2": 0.01, "output_affine": 0.1}
    p1 = jax.tree_util.tree_map(np.asarray, dict(p0))
    p1 = {k: jax.tree_util.tree_map(
        lambda x, s=deltas[k]: x + s * np.abs(x).mean(), v)
        for k, v in p1.items()}
    m1 = str(tmp_path / "cur.mdl")
    save_nnet2(m1, p1, cfg0)
    out = str(tmp_path / "lrd.mdl")
    alr = 2e-3
    assert TOOLS["nnet-modify-learning-rates"](
        [f"--average-learning-rate={alr}", m0, m1, out]) == 0
    _, cfg2, _ = load_nnet2_full(out)
    lrs = np.asarray(cfg2.learn_rates)
    assert len(lrs) == cfg.num_hidden_layers + 1
    # big change → small lr; geometric mean pinned
    assert lrs[0] < lrs[2] < lrs[1]
    np.testing.assert_allclose(np.exp(np.mean(np.log(lrs))), alr,
                               rtol=1e-5)
    # nnet-train-simple consumes the rates without error
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = rng.standard_normal((32, cfg.feat_dim)).astype(
            np.float32)
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        w["u"] = rng.integers(0, cfg.num_pdfs, 32).astype(np.int32)
    assert TOOLS["nnet-train-simple"](
        [out, f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/ali.ark",
         str(tmp_path / "tr.mdl")]) == 0


def test_nnet_normalize_stddev(tmp_path, rng):
    from kaldi_tpu.am.nnet2 import load_nnet2_full
    from kaldi_tpu.pipelines.egs_io import XentEg
    m0, cfg = _nnet2_model(tmp_path, rng)
    B, T = 4, 20
    feats = 5.0 * rng.standard_normal(
        (B, T, cfg.feat_dim * len(cfg.splice))).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/egs.ark", holder="xeg") as w:
        w["e"] = XentEg(feats=feats, pdfs=np.zeros((B, T), np.int32))
    out = str(tmp_path / "norm.mdl")
    assert TOOLS["nnet-normalize-stddev"](
        [m0, f"ark:{tmp_path}/egs.ark", out]) == 0
    params, _, _ = load_nnet2_full(out)
    lay = params["pnorm1"]["affine"]
    pre = feats.reshape(-1, feats.shape[-1]) @ np.asarray(
        lay["kernel"]) + np.asarray(lay["bias"])
    np.testing.assert_allclose(pre.std(), 1.0, rtol=1e-3)


# ---------------------------------------------------------------------------


@pytest.fixture
def nnet2_disc_setup(tmp_path, rng):
    """nnet2 model + degs (built by the SHARED degs writer)."""
    mdl, tm, am = _mono_model(tmp_path, rng)
    n2, cfg = _nnet2_model(tmp_path, rng, D=am.dim,
                           num_pdfs=tm.num_pdfs)
    T = 6
    tids_a = _phone_tids(tm, 1, T)
    tids_b = _phone_tids(tm, 2, T)
    with TableWriter(f"ark:{tmp_path}/lats.ark", holder="clat") as lw:
        for k in ("u1", "u2"):
            clat = CompactLattice()
            s0, s1 = clat.add_state(), clat.add_state()
            clat.start = s0
            clat.arcs[s0].append(CompactArc(1, 0.5, 0.0,
                                            tuple(tids_a), s1))
            clat.arcs[s0].append(CompactArc(2, 0.7, 0.0,
                                            tuple(tids_b), s1))
            clat.finals[s1] = (0.0, 0.0, ())
            lw[k] = clat
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        for k in ("u1", "u2"):
            w[k] = rng.standard_normal((T, am.dim)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        for k in ("u1", "u2"):
            w[k] = np.asarray([tm.transition_id_to_pdf(t)
                               for t in tids_a], np.int32)
    assert TOOLS["nnet3-discriminative-get-egs"](
        [mdl, f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/ali.ark",
         f"ark:{tmp_path}/lats.ark", f"ark:{tmp_path}/degs.ark"]) == 0
    return {"n2": n2, "cfg": cfg, "tmp": tmp_path}


def test_nnet_train_discriminative_simple(nnet2_disc_setup):
    from kaldi_tpu.am.nnet2 import load_nnet2_full
    t = nnet2_disc_setup["tmp"]
    out = str(t / "disc.mdl")
    assert TOOLS["nnet-train-discriminative-simple"](
        ["--criterion=smbr", "--learning-rate=1e-3",
         nnet2_disc_setup["n2"], f"ark:{t}/degs.ark", out]) == 0
    p0, _, _ = load_nnet2_full(nnet2_disc_setup["n2"])
    p1, _, _ = load_nnet2_full(out)
    d = np.abs(np.asarray(p1["output_affine"]["kernel"])
               - np.asarray(p0["output_affine"]["kernel"])).max()
    assert d > 1e-5      # training moved the model
    # mmi criterion also runs
    assert TOOLS["nnet-train-discriminative-simple"](
        ["--criterion=mmi", "--num-epochs=1",
         nnet2_disc_setup["n2"], f"ark:{t}/degs.ark",
         str(t / "mmi.mdl")]) == 0


def test_nnet_train_discriminative_parallel(nnet2_disc_setup):
    from kaldi_tpu.am.nnet2 import load_nnet2_full
    t = nnet2_disc_setup["tmp"]
    out = str(t / "par.mdl")
    assert TOOLS["nnet-train-discriminative-parallel"](
        ["--num-threads=2", "--criterion=smbr", "--num-epochs=1",
         "--learning-rate=1e-3",
         nnet2_disc_setup["n2"], f"ark:{t}/degs.ark", out]) == 0
    p, cfg, _ = load_nnet2_full(out)
    assert cfg.num_pdfs == nnet2_disc_setup["cfg"].num_pdfs
    assert np.all(np.isfinite(
        np.asarray(p["output_affine"]["kernel"])))


# ---------------------------------------------------------------------------


def test_nnet3_latgen_incremental_matches_offline(tmp_path, rng):
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
    assert main(["nnet3-latgen-incremental", "--chunk-frames=7"]
                + common + [f"ark:{tmp_path}/inc.lats"]) == 0
    assert main(["nnet3-latgen-faster"] + common
                + [f"ark:{tmp_path}/off.lats"]) == 0
    inc = dict(SequentialTableReader(f"ark:{tmp_path}/inc.lats",
                                     holder="clat"))
    off = dict(SequentialTableReader(f"ark:{tmp_path}/off.lats",
                                     holder="clat"))
    wi, _, ci = inc["u"].best_path()
    wo, _, co = off["u"].best_path()
    assert list(wi) == list(wo)
    assert abs(ci - co) < 0.1
