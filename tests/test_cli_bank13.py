"""CLI bank 13: fgmm family, LVTLN, apply-cmvn-online, fst long tail."""

import numpy as np
import pytest

from kaldi_tpu.cli import TOOLS
from kaldi_tpu.core.table import SequentialTableReader, TableWriter


@pytest.fixture
def rng():
    return np.random.default_rng(13)


@pytest.fixture
def ubm_setup(tmp_path, rng):
    """Feats from a 2-component correlated Gaussian mixture + a trained
    diagonal global GMM on disk."""
    n = 400
    a = rng.normal(size=(n, 3)) @ np.array(
        [[1.0, 0.5, 0.0], [0.0, 1.0, 0.3], [0.0, 0.0, 1.0]])
    b = rng.normal(size=(n, 3)) @ np.array(
        [[1.0, -0.4, 0.0], [0.0, 1.0, 0.0], [0.2, 0.0, 1.0]]) + 4.0
    feats = np.concatenate([a, b]).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        w["u1"] = feats[:n]
        w["u2"] = feats[n:]
    gmm_path = tmp_path / "diag.ubm"
    assert TOOLS["gmm-global-init-from-feats"](
        ["--num-gauss=4", "--num-iters=6",
         f"ark:{tmp_path}/feats.ark", str(gmm_path)]) == 0
    return {"tmp": tmp_path, "feats": feats, "diag": str(gmm_path)}


def test_fgmm_family_em_improves(ubm_setup, tmp_path, capsys):
    t = ubm_setup["tmp"]
    fgmm0 = tmp_path / "0.fubm"
    assert TOOLS["gmm-global-to-fgmm"]([ubm_setup["diag"], str(fgmm0)]) == 0

    assert TOOLS["fgmm-global-info"]([str(fgmm0)]) == 0
    out = capsys.readouterr().out
    assert "feature dimension 3" in out

    # likes before EM
    assert TOOLS["fgmm-global-get-frame-likes"](
        ["--average=true", str(fgmm0), f"ark:{t}/feats.ark",
         f"ark:{tmp_path}/likes0.ark"]) == 0
    likes0 = {k: float(v[0]) for k, v in SequentialTableReader(
        f"ark:{tmp_path}/likes0.ark", holder="vec")}

    # one full-cov EM step: acc per utt (2 files) -> sum -> est
    with TableWriter(f"ark:{tmp_path}/f1.ark", holder="mat") as w:
        w["u1"] = ubm_setup["feats"][:400]
    with TableWriter(f"ark:{tmp_path}/f2.ark", holder="mat") as w:
        w["u2"] = ubm_setup["feats"][400:]
    assert TOOLS["fgmm-global-acc-stats"](
        [str(fgmm0), f"ark:{tmp_path}/f1.ark", str(tmp_path / "a1")]) == 0
    assert TOOLS["fgmm-global-acc-stats"](
        [str(fgmm0), f"ark:{tmp_path}/f2.ark", str(tmp_path / "a2")]) == 0
    assert TOOLS["fgmm-global-sum-accs"](
        [str(tmp_path / "sum"), str(tmp_path / "a1"),
         str(tmp_path / "a2")]) == 0
    fgmm1 = tmp_path / "1.fubm"
    assert TOOLS["fgmm-global-est"](
        [str(fgmm0), str(tmp_path / "sum"), str(fgmm1)]) == 0

    assert TOOLS["fgmm-global-get-frame-likes"](
        ["--average=true", str(fgmm1), f"ark:{t}/feats.ark",
         f"ark:{tmp_path}/likes1.ark"]) == 0
    likes1 = {k: float(v[0]) for k, v in SequentialTableReader(
        f"ark:{tmp_path}/likes1.ark", holder="vec")}
    # full-covariance EM on correlated data must beat the diag init
    assert sum(likes1.values()) > sum(likes0.values()) + 0.01

    # copy round-trip + gselect shape
    assert TOOLS["fgmm-global-copy"]([str(fgmm1),
                                      str(tmp_path / "c.fubm")]) == 0
    assert TOOLS["fgmm-gselect"](
        ["--n=2", str(fgmm1), f"ark:{t}/feats.ark",
         f"ark:{tmp_path}/gsel.ark"]) == 0
    for _k, post in SequentialTableReader(f"ark:{tmp_path}/gsel.ark",
                                          holder="post"):
        assert all(len(frame) == 2 for frame in post)

    # fgmm -> diag keeps means
    assert TOOLS["fgmm-global-to-gmm"]([str(fgmm1),
                                        str(tmp_path / "d.ubm")]) == 0
    from kaldi_tpu.cli.tools_bank13 import _read_full_gmm
    from kaldi_tpu.cli.tools_bank5 import _read_global_gmm
    full = _read_full_gmm(str(fgmm1))
    diag = _read_global_gmm(str(tmp_path / "d.ubm"))
    np.testing.assert_allclose(diag.means[0], full.means, rtol=1e-5)


def test_lvtln_recovers_planted_transform(tmp_path, rng):
    from kaldi_tpu.am.lvtln import read_lvtln
    from kaldi_tpu.core import io as kio
    D = 4
    lv_path = tmp_path / "0.lvtln"
    assert TOOLS["gmm-init-lvtln"](
        [f"--dim={D}", "--num-classes=3", "--default-class=1",
         str(lv_path)]) == 0

    a_true = np.eye(D) + 0.15 * rng.normal(size=(D, D))
    x = rng.normal(size=(300, D))
    with TableWriter(f"ark:{tmp_path}/x.ark", holder="mat") as w:
        w["u1"] = x[:150].astype(np.float32)
        w["u2"] = x[150:].astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/y.ark", holder="mat") as w:
        w["u1"] = (x[:150] @ a_true.T).astype(np.float32)
        w["u2"] = (x[150:] @ a_true.T).astype(np.float32)
    lv1 = tmp_path / "1.lvtln"
    assert TOOLS["gmm-train-lvtln-special"](
        ["--warp=0.9", "0", str(lv_path), str(lv1),
         f"ark:{tmp_path}/x.ark", f"ark:{tmp_path}/y.ark"]) == 0
    with kio.open_rxfilename(str(lv1)) as f:
        kio.init_kaldi_input_stream(f)
        lv = read_lvtln(f)
    np.testing.assert_allclose(lv.mats[0], a_true, atol=5e-2)
    assert lv.warps[0] == pytest.approx(0.9)
    np.testing.assert_allclose(lv.mats[1], np.eye(D))  # untouched class


def test_lvtln_selects_matching_class(tmp_path, rng):
    """Speaker whose features need warp A to match the model must get
    class 0 (= A); an unwarped speaker must keep the default class."""
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.am.serialize import write_mdl
    from kaldi_tpu.am.topology import HmmTopology
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.am.tree import MonophoneContextDependency
    D = 3
    topo = HmmTopology.three_state([1])
    tree = MonophoneContextDependency([1], topo)
    tm = TransitionModel(topo, tree)
    mu = np.array([2.0, -1.0, 0.5])
    am = AmDiagGmm.flat_start(tree.num_pdfs, mu, np.ones(D) * 0.25)
    mdl = tmp_path / "final.mdl"
    write_mdl(str(mdl), tm, am)

    a = np.diag([1.3, 0.8, 1.1])       # the "warp" class 0 transform
    lv_path = tmp_path / "lv"
    assert TOOLS["gmm-init-lvtln"](
        [f"--dim={D}", "--num-classes=2", "--default-class=1",
         str(lv_path)]) == 0
    x = rng.normal(size=(200, D)) * 0.5
    with TableWriter(f"ark:{tmp_path}/x.ark", holder="mat") as w:
        w["u"] = x.astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/y.ark", holder="mat") as w:
        w["u"] = (x @ a.T).astype(np.float32)
    assert TOOLS["gmm-train-lvtln-special"](
        ["--warp=0.9", "0", str(lv_path), str(lv_path),
         f"ark:{tmp_path}/x.ark", f"ark:{tmp_path}/y.ark"]) == 0

    T = 120
    # warped speaker: model sees A z as matching mu -> feats z = A^-1 u
    u = mu + 0.5 * rng.normal(size=(T, D))
    z = u @ np.linalg.inv(a).T
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        w["spkA"] = z.astype(np.float32)
        w["spkB"] = (mu + 0.5 * rng.normal(size=(T, D))).astype(np.float32)
    # REAL transition-id-level posteriors (the ali-to-post convention):
    # pick a tid of the LAST pdf so the tool's tid->pdf conversion is
    # actually exercised (raw tids exceed num_pdfs).
    tid = next(t for t in range(1, tm.num_transition_ids + 1)
               if tm.transition_id_to_pdf(t) == tree.num_pdfs - 1)
    assert tid >= tree.num_pdfs   # would IndexError/mis-score unconverted
    post = [[(tid, 1.0)] for _ in range(T)]
    with TableWriter(f"ark:{tmp_path}/post.ark", holder="post") as w:
        w["spkA"] = post
        w["spkB"] = post
    assert TOOLS["gmm-est-lvtln-trans"](
        [str(mdl), str(lv_path), f"ark:{tmp_path}/feats.ark",
         f"ark:{tmp_path}/post.ark", f"ark:{tmp_path}/trans.ark",
         f"ark,t:{tmp_path}/warps.txt"]) == 0
    warps = dict(SequentialTableReader(f"ark,t:{tmp_path}/warps.txt",
                                       holder="text"))
    assert warps["spkA"] == ["0.90"]
    assert warps["spkB"] == ["1.00"]
    trans = dict(SequentialTableReader(f"ark:{tmp_path}/trans.ark",
                                       holder="mat"))
    assert trans["spkA"].shape == (D, D + 1)
    np.testing.assert_allclose(np.asarray(trans["spkB"])[:, :D], np.eye(D),
                               atol=1e-6)


def test_apply_cmvn_online(tmp_path, rng):
    from kaldi_tpu.core import io as kio
    T, D, W = 30, 4, 8
    x = rng.normal(size=(T, D)).astype(np.float64) + 3.0
    gmean = np.full(D, 10.0)
    gcount = 100.0
    stats = np.zeros((2, D + 1))
    stats[0, :D] = gmean * gcount
    stats[0, D] = gcount
    stats[1, :D] = (gmean ** 2 + 1.0) * gcount
    with kio.open_wxfilename(str(tmp_path / "g.stats")) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, stats.astype(np.float32))
    with TableWriter(f"ark:{tmp_path}/in.ark", holder="mat") as w:
        w["u"] = x.astype(np.float32)
    assert TOOLS["apply-cmvn-online"](
        [f"--cmn-window={W}", str(tmp_path / "g.stats"),
         f"ark:{tmp_path}/in.ark", f"ark:{tmp_path}/out.ark"]) == 0
    out = np.asarray(dict(SequentialTableReader(
        f"ark:{tmp_path}/out.ark", holder="mat"))["u"], np.float64)
    # steady state (t >= W-1): exact trailing-window mean subtraction
    for t in [W - 1, W + 5, T - 1]:
        mean = x[t - W + 1:t + 1].mean(axis=0)
        np.testing.assert_allclose(out[t], x[t] - mean, atol=1e-4)
    # first frame: 1 real frame + (W-1) global-prior frames
    mean0 = (x[0] + (W - 1) * gmean) / W
    np.testing.assert_allclose(out[0], x[0] - mean0, atol=1e-4)


def test_fstcompose_and_pushspecial(tmp_path):
    import math
    from kaldi_tpu.cli.tools_extra import _load_fst
    from kaldi_tpu.fst.fst import INF
    f1 = tmp_path / "a.txt"
    f1.write_text("0 1 1 1 0.5\n0 1 2 2 1.0\n1 0.0\n")
    f2 = tmp_path / "b.txt"
    f2.write_text("0 1 1 10 0.25\n1 0.0\n")
    out = tmp_path / "c.fst"
    assert TOOLS["fstcompose"]([str(f1), str(f2), str(out)]) == 0
    c = _load_fst(str(out))
    arcs = [a for s in range(c.num_states) for a in c.arcs[s]]
    assert len(arcs) == 1
    assert arcs[0].olabel == 10
    assert arcs[0].weight == pytest.approx(0.75)

    # pushspecial: equal per-state log-semiring outgoing mass
    f3 = tmp_path / "p.txt"
    f3.write_text("0 1 1 1 0.3\n0 2 2 2 2.0\n1 3 3 3 0.7\n"
                  "2 3 4 4 0.1\n3 0.4\n")
    pout = tmp_path / "p.fst"
    assert TOOLS["fstpushspecial"](["--delta=1e-6", str(f3), str(pout)]) == 0
    p = _load_fst(str(pout))

    def state_mass(s):
        terms = [-a.weight for a in p.arcs[s]]
        if p.final(s) != INF:
            terms.append(-p.final(s))
        m = max(terms)
        return m + math.log(sum(math.exp(t - m) for t in terms))

    masses = [state_mass(s) for s in range(p.num_states)
              if p.arcs[s] or p.final(s) != INF]
    assert max(masses) - min(masses) < 1e-4

    # total path mass is preserved
    def total_mass(fst):
        tot = 0.0
        stack = [(fst.start, 0.0)]
        while stack:
            s, w = stack.pop()
            if fst.final(s) != INF:
                tot += math.exp(-(w + fst.final(s)))
            for a in fst.arcs[s]:
                stack.append((a.nextstate, w + a.weight))
        return tot
    orig = _load_fst(str(f3))
    assert total_mass(p) == pytest.approx(total_mass(orig), rel=1e-3)


def test_matrix_sum_rows(tmp_path, rng):
    m = rng.normal(size=(5, 3)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/m.ark", holder="mat") as w:
        w["u"] = m
    assert TOOLS["matrix-sum-rows"](
        [f"ark:{tmp_path}/m.ark", f"ark:{tmp_path}/v.ark"]) == 0
    v = dict(SequentialTableReader(f"ark:{tmp_path}/v.ark",
                                   holder="vec"))["u"]
    np.testing.assert_allclose(v, m.sum(axis=0), rtol=1e-5)
