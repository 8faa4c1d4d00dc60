"""CLI bank 25: nnet1 tail (proto init, feature-transform nnets,
sequence training), nnet2 upstream-named utilities, sgmm2 decode
tail."""

import numpy as np
import pytest

from kaldi_tpu.am import (HmmTopology, MonophoneContextDependency,
                          TransitionModel)
from kaldi_tpu.cli import TOOLS, main
from kaldi_tpu.core.table import SequentialTableReader, TableWriter


@pytest.fixture
def rng():
    return np.random.default_rng(25)


def test_nnet_initialize_and_forward(tmp_path, rng):
    proto = """<NnetProto>
<AffineTransform> <InputDim> 5 <OutputDim> 12
<Sigmoid> <InputDim> 12 <OutputDim> 12
<AffineTransform> <InputDim> 12 <OutputDim> 7
<Softmax> <InputDim> 7 <OutputDim> 7
</NnetProto>
"""
    (tmp_path / "nnet.proto").write_text(proto)
    assert main(["nnet-initialize", "--seed=3",
                 str(tmp_path / "nnet.proto"),
                 str(tmp_path / "0.nnet")]) == 0
    from kaldi_tpu.am.nnet1 import load_nnet1
    params, hid, P, _pri = load_nnet1(str(tmp_path / "0.nnet"))
    assert tuple(hid) == (12,) and P == 7
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = rng.standard_normal((9, 5)).astype(np.float32)
    assert main(["nnet-forward", str(tmp_path / "0.nnet"),
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/o.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/o.ark",
                                     holder="mat"))["u"]
    assert out.shape == (9, 7)
    np.testing.assert_allclose(np.exp(out).sum(axis=1), 1.0,
                               atol=1e-4)


def test_transf_to_nnet_feature_transform(tmp_path, rng):
    """transf-to-nnet + nnet-forward --feature-transform equals
    transforming the features first."""
    from kaldi_tpu.core import io as kio
    D = 4
    mat = np.concatenate([2.0 * np.eye(D), np.ones((D, 1))],
                         axis=1).astype(np.float32)
    with kio.open_wxfilename(str(tmp_path / "t.mat")) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, mat)
    assert main(["transf-to-nnet", str(tmp_path / "t.mat"),
                 str(tmp_path / "ft.nnet")]) == 0
    proto = ("<AffineTransform> <InputDim> 4 <OutputDim> 6\n"
             "<AffineTransform> <InputDim> 6 <OutputDim> 3\n")
    (tmp_path / "p").write_text(proto)
    assert main(["nnet-initialize", str(tmp_path / "p"),
                 str(tmp_path / "m.nnet")]) == 0
    x = rng.standard_normal((7, D)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = x
    with TableWriter(f"ark:{tmp_path}/ft.ark", holder="mat") as w:
        w["u"] = (2.0 * x + 1.0).astype(np.float32)
    assert main(["nnet-forward",
                 f"--feature-transform={tmp_path}/ft.nnet",
                 str(tmp_path / "m.nnet"), f"ark:{tmp_path}/f.ark",
                 f"ark:{tmp_path}/a.ark"]) == 0
    assert main(["nnet-forward", str(tmp_path / "m.nnet"),
                 f"ark:{tmp_path}/ft.ark", f"ark:{tmp_path}/b.ark"]) == 0
    a = dict(SequentialTableReader(f"ark:{tmp_path}/a.ark",
                                   holder="mat"))["u"]
    b = dict(SequentialTableReader(f"ark:{tmp_path}/b.ark",
                                   holder="mat"))["u"]
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_paste_post(tmp_path):
    with TableWriter(f"ark:{tmp_path}/p1.ark", holder="post") as w:
        w["u"] = [[(0, 0.5)], [(2, 1.0)]]
    with TableWriter(f"ark:{tmp_path}/p2.ark", holder="post") as w:
        w["u"] = [[(1, 0.25)], [(0, 0.75)]]
    assert main(["paste-post", "--dims=3:2", f"ark:{tmp_path}/p1.ark",
                 f"ark:{tmp_path}/p2.ark", f"ark:{tmp_path}/o.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/o.ark",
                                     holder="post"))["u"]
    assert out[0] == [(0, pytest.approx(0.5)),
                      (4, pytest.approx(0.25))]
    assert out[1] == [(2, pytest.approx(1.0)),
                      (3, pytest.approx(0.75))]


def test_nnet_train_perutt_learns(tmp_path, rng):
    D, P, T = 5, 3, 150
    mu = 3.0 * rng.standard_normal((P, D))
    feats, alis = {}, {}
    for k in ("u1", "u2"):
        a = rng.integers(0, P, T).astype(np.int32)
        feats[k] = (mu[a] + 0.3 * rng.standard_normal((T, D))
                    ).astype(np.float32)
        alis[k] = a
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        for k, v in feats.items():
            w[k] = v
    with TableWriter(f"ark:{tmp_path}/a.ark", holder="ivec") as w:
        for k, v in alis.items():
            w[k] = v
    (tmp_path / "p").write_text(
        f"<AffineTransform> <InputDim> {D} <OutputDim> 16\n"
        f"<AffineTransform> <InputDim> 16 <OutputDim> {P}\n")
    assert main(["nnet-initialize", str(tmp_path / "p"),
                 str(tmp_path / "0.nnet")]) == 0
    assert main(["nnet-train-perutt", "--num-epochs=30",
                 "--learn-rate=0.5", str(tmp_path / "0.nnet"),
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/a.ark",
                 str(tmp_path / "1.nnet")]) == 0
    assert main(["nnet-forward", str(tmp_path / "1.nnet"),
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/o.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/o.ark",
                                     holder="mat"))
    acc = (out["u1"].argmax(1) == alis["u1"]).mean()
    assert acc > 0.8


@pytest.fixture
def seq_setup(tmp_path, rng):
    """Model + feats + num ali + 2-path den lattices for sequence
    training."""
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.am.serialize import write_mdl
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    phones = [1, 2]
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    D = 4
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(D), np.ones(D))
    mdl = str(tmp_path / "t.mdl")
    write_mdl(mdl, tm, am)
    T = 6

    def tids_of(phone):
        first = next(t for t in range(1, tm.num_transition_ids + 1)
                     if tm.transition_id_to_phone(t) == phone
                     and tm.transition_id_to_hmm_state(t) == 0
                     and not tm.is_self_loop(t))
        loop = next(t for t in range(1, tm.num_transition_ids + 1)
                    if tm.transition_id_to_phone(t) == phone
                    and tm.transition_id_to_hmm_state(t) == 0
                    and tm.is_self_loop(t))
        return [first] + [loop] * (T - 1)

    with TableWriter(f"ark:{tmp_path}/lats.ark", holder="clat") as lw, \
            TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as fw, \
            TableWriter(f"ark:{tmp_path}/a.ark", holder="ivec") as aw:
        for i in range(3):
            clat = CompactLattice()
            s0, s1 = clat.add_state(), clat.add_state()
            clat.start = s0
            clat.arcs[s0].append(CompactArc(1, 0.5, 0.2,
                                            tuple(tids_of(1)), s1))
            clat.arcs[s0].append(CompactArc(2, 0.7, 0.1,
                                            tuple(tids_of(2)), s1))
            clat.finals[s1] = (0.0, 0.0, ())
            lw[f"u{i}"] = clat
            fw[f"u{i}"] = rng.standard_normal((T, D)).astype(np.float32)
            aw[f"u{i}"] = np.asarray(tids_of(1), np.int32)
    return {"tmp": tmp_path, "mdl": mdl, "tm": tm, "D": D, "T": T}


@pytest.mark.parametrize("name", ["nnet-train-mmi-sequential",
                                  "nnet-train-mpe-sequential"])
def test_nnet1_sequence_training(seq_setup, name):
    t = seq_setup["tmp"]
    D = seq_setup["D"]
    P = seq_setup["tm"].num_pdfs
    (t / "p").write_text(
        f"<AffineTransform> <InputDim> {D} <OutputDim> 12\n"
        f"<AffineTransform> <InputDim> 12 <OutputDim> {P}\n")
    assert main(["nnet-initialize", str(t / "p"),
                 str(t / "0.nnet")]) == 0
    assert main([name, "--learn-rate=0.1", seq_setup["mdl"],
                 str(t / "0.nnet"), f"ark:{t}/f.ark", f"ark:{t}/a.ark",
                 f"ark:{t}/lats.ark", str(t / "1.nnet")]) == 0
    from kaldi_tpu.am.nnet1 import load_nnet1
    p0, _h0, _n0, _ = load_nnet1(str(t / "0.nnet"))
    p1, _h1, _n1, _ = load_nnet1(str(t / "1.nnet"))
    # parameters moved (gradient was nonzero)
    diff = np.abs(np.asarray(p1["output_affine"]["kernel"])
                  - np.asarray(p0["output_affine"]["kernel"])).max()
    assert diff > 1e-6


def test_nnet2_upstream_aliases_and_fix(tmp_path, rng):
    t = tmp_path
    with TableWriter(f"ark:{t}/f.ark", holder="mat") as w:
        w["u"] = rng.standard_normal((20, 5)).astype(np.float32)
    assert main(["nnet-am-init", "--feat-dim=5", "--num-pdfs=4",
                 "--num-hidden-layers=1", "--pnorm-input-dim=16",
                 "--pnorm-output-dim=8", str(t / "0.nnet2")]) == 0
    # upstream-named copy + compute
    assert main(["nnet-am-copy", str(t / "0.nnet2"),
                 str(t / "1.nnet2")]) == 0
    assert main(["nnet-compute", str(t / "1.nnet2"),
                 f"ark:{t}/f.ark", f"ark:{t}/o.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{t}/o.ark",
                                     holder="mat"))["u"]
    assert out.shape[1] == 4
    # fix: plant a NaN + a huge value, then verify repaired
    from kaldi_tpu.am.nnet2 import load_nnet2, save_nnet2
    params, cfg = load_nnet2(str(t / "1.nnet2"))
    k = np.asarray(params["pnorm1"]["affine"]["kernel"]).copy()
    k[0, 0] = np.nan
    k[0, 1] = 1e9
    params["pnorm1"]["affine"]["kernel"] = k
    save_nnet2(str(t / "bad.nnet2"), params, cfg)
    assert main(["nnet-am-fix", "--max-param-value=20",
                 str(t / "bad.nnet2"), str(t / "fixed.nnet2")]) == 0
    fixed, _cfg = load_nnet2(str(t / "fixed.nnet2"))
    fk = np.asarray(fixed["pnorm1"]["affine"]["kernel"])
    assert np.isfinite(fk).all() and np.abs(fk).max() <= 20.0


def test_nnet2_egs_and_combine(tmp_path, rng):
    t = tmp_path
    D, P, T = 5, 3, 90
    mu = 3.0 * rng.standard_normal((P, D))
    a = rng.integers(0, P, T).astype(np.int32)
    feats = (mu[a] + 0.3 * rng.standard_normal((T, D))
             ).astype(np.float32)
    with TableWriter(f"ark:{t}/f.ark", holder="mat") as w:
        w["u"] = feats
    with TableWriter(f"ark:{t}/a.ark", holder="ivec") as w:
        w["u"] = a
    assert main(["nnet-get-egs", "--left-context=1",
                 "--right-context=1", "--batch-size=32",
                 f"ark:{t}/f.ark", f"ark:{t}/a.ark",
                 f"ark:{t}/egs.ark"]) == 0
    egs = list(SequentialTableReader(f"ark:{t}/egs.ark", holder="xeg"))
    assert len(egs) == 3                      # 90/32 → 2 full + rest
    assert egs[0][1].feats.shape == (32, 1, 3 * D)
    assert main(["nnet-shuffle-egs", "--srand=7", f"ark:{t}/egs.ark",
                 f"ark:{t}/shuf.ark"]) == 0
    assert len(list(SequentialTableReader(f"ark:{t}/shuf.ark",
                                          holder="xeg"))) == 3
    # combine two models; combined xent beats the worse input
    for i, seed_args in enumerate((["--srand=1"], ["--srand=2"])):
        assert main(["nnet-am-init", "--feat-dim=5", "--num-pdfs=3",
                     "--num-hidden-layers=1", "--pnorm-input-dim=16",
                     "--pnorm-output-dim=8"] + seed_args +
                    [str(t / f"m{i}.nnet2")]) == 0
    assert main(["nnet-combine-fast", "--num-iters=10",
                 f"ark:{t}/f.ark", f"ark:{t}/a.ark",
                 str(t / "m0.nnet2"), str(t / "m1.nnet2"),
                 str(t / "comb.nnet2")]) == 0
    from kaldi_tpu.am.nnet2 import Nnet2Model, load_nnet2
    import jax.numpy as jnp

    def xent(path):
        params, cfg = load_nnet2(path)
        logp = np.asarray(Nnet2Model(cfg).apply(
            {"params": params}, jnp.asarray(feats)[None]))[0]
        return float(logp[np.arange(T), a].mean())

    assert xent(str(t / "comb.nnet2")) >= min(
        xent(str(t / "m0.nnet2")), xent(str(t / "m1.nnet2"))) - 1e-4


def test_sgmm2_gselect_and_rescore(tmp_path, rng):
    t = tmp_path
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.am.serialize import write_mdl
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    with TableWriter(f"ark:{t}/f.ark", holder="mat") as w:
        w["u"] = rng.standard_normal((12, 5)).astype(np.float32)
    assert main(["sgmm2-init", "--num-pdfs=6", "--num-gauss=4",
                 "--subspace-dim=2", f"ark:{t}/f.ark",
                 str(t / "m.sgmm2")]) == 0
    assert main(["sgmm2-gselect", "--gselect=2", str(t / "m.sgmm2"),
                 f"ark:{t}/f.ark", f"ark:{t}/gs.ark"]) == 0
    gs = dict(SequentialTableReader(f"ark:{t}/gs.ark",
                                    holder="post"))["u"]
    assert len(gs) == 12 and all(len(fr) == 2 for fr in gs)
    # best-first ordering
    assert all(fr[0][1] >= fr[1][1] for fr in gs)
    # rescore: same model as scorer → finite sensible costs
    phones = [1, 2]
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(5), np.ones(5))
    mdl = str(t / "t.mdl")
    write_mdl(mdl, tm, am)
    tid = 1
    clat = CompactLattice()
    s0, s1 = clat.add_state(), clat.add_state()
    clat.start = s0
    clat.arcs[s0].append(CompactArc(1, 0.5, 99.0, (tid,) * 12, s1))
    clat.finals[s1] = (0.0, 0.0, ())
    with TableWriter(f"ark:{t}/l.ark", holder="clat") as w:
        w["u"] = clat
    # sgmm2 here has 6 pdfs >= tree pdfs? ensure pdf ids in range:
    # tree has 6 pdfs (2 phones × 3 states) matching --num-pdfs=6
    assert main(["sgmm2-rescore-lattice", mdl, str(t / "m.sgmm2"),
                 f"ark:{t}/l.ark", f"ark:{t}/f.ark",
                 f"ark:{t}/r.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{t}/r.ark",
                                     holder="clat"))["u"]
    ac = out.arcs[out.start][0].acoustic_cost
    assert np.isfinite(ac) and ac != 99.0
