"""CLI bank 10: context composition, regtree MLLR, EER, feature
segments, augmentation, nnet3 am wrappers."""

import numpy as np
import pytest

from kaldi_tpu.cli import TOOLS
from kaldi_tpu.core.table import SequentialTableReader, TableWriter


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_fstcomposecontext(tmp_path):
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.fst import Arc, VectorFst
    # linear LG over phones 1 2 3
    lg = VectorFst()
    states = [lg.add_state() for _ in range(4)]
    lg.set_start(states[0])
    for i, p in enumerate([1, 2, 3]):
        lg.arcs[states[i]].append(Arc(p, p, 0.5, states[i + 1]))
    lg.set_final(states[3], 0.0)
    lgp = tmp_path / "LG.fst"
    _save_fst(str(lgp), lg)
    ilabels = tmp_path / "ilabels.int"
    clgp = tmp_path / "CLG.fst"
    assert TOOLS["fstcomposecontext"](
        [str(ilabels), str(lgp), str(clgp)]) == 0
    clg = _load_fst(str(clgp))
    assert clg.num_states > 0
    info = [tuple(int(x) for x in line.split())
            for line in open(ilabels) if line.strip()]
    assert info[0] == (0,)                    # ε slot
    assert any(len(w) == 3 for w in info)     # triphone windows


def test_fsts_to_transcripts(tmp_path):
    from kaldi_tpu.fst.fst import Arc, VectorFst
    fst = VectorFst()
    s = [fst.add_state() for _ in range(3)]
    fst.set_start(s[0])
    fst.arcs[s[0]].append(Arc(1, 7, 0.0, s[1]))
    fst.arcs[s[1]].append(Arc(2, 9, 0.0, s[2]))
    fst.set_final(s[2], 0.0)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="fst") as w:
        w["u"] = fst
    assert TOOLS["fsts-to-transcripts"](
        [f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/t.ark"]) == 0
    got = dict(SequentialTableReader(f"ark:{tmp_path}/t.ark",
                                     holder="text"))["u"]
    assert got == ["7", "9"]


def test_gmm_est_regtree_mllr(tmp_path, rng):
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.am.serialize import read_mdl, write_mdl
    from kaldi_tpu.am.topology import HmmTopology
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.am.tree import MonophoneContextDependency
    phones = [1, 2]
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    D = 4
    am = AmDiagGmm(rng.dirichlet(np.ones(2), size=tree.num_pdfs),
                   rng.standard_normal((tree.num_pdfs, 2, D)),
                   0.5 + rng.random((tree.num_pdfs, 2, D)))
    mdl = tmp_path / "m.mdl"
    write_mdl(str(mdl), tm, am)
    T = 300
    tids = rng.integers(1, tm.num_transition_ids + 1, T).astype(np.int32)
    # features shifted by a constant → MLLR should move means toward it
    pdfs = np.array([tm.transition_id_to_pdf(int(t)) for t in tids])
    base = am.means[pdfs, 0]
    feats = (base + 2.0 + 0.1 * rng.standard_normal((T, D))
             ).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = feats
    with TableWriter(f"ark:{tmp_path}/a.ark", holder="ivec") as w:
        w["u"] = tids
    out = tmp_path / "adapted.mdl"
    assert TOOLS["gmm-est-regtree-mllr"](
        ["--num-base-classes=2", "--min-count=10", str(mdl),
         f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/a.ark",
         str(out)]) == 0
    _, am2 = read_mdl(str(out))
    # adapted means moved toward the shifted features
    assert np.mean(am2.means) > np.mean(am.means) + 0.5


def test_gmm_gselect(tmp_path, rng):
    from kaldi_tpu.cli.tools_bank5 import _write_global_gmm
    from kaldi_tpu.am.gmm import AmDiagGmm
    G, D = 6, 3
    am = AmDiagGmm(rng.dirichlet(np.ones(G), size=1),
                   rng.standard_normal((1, G, D)),
                   0.5 + rng.random((1, G, D)))
    gp = tmp_path / "g.gmm"
    _write_global_gmm(str(gp), am)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = rng.standard_normal((10, D)).astype(np.float32)
    assert TOOLS["gmm-gselect"](
        ["--n=3", str(gp), f"ark:{tmp_path}/f.ark",
         f"ark:{tmp_path}/gs.ark"]) == 0
    gs = dict(SequentialTableReader(f"ark:{tmp_path}/gs.ark",
                                    holder="post"))["u"]
    assert len(gs) == 10 and all(len(fr) == 3 for fr in gs)
    # entries sorted by posterior descending
    for fr in gs:
        ws = [w for _, w in fr]
        assert ws == sorted(ws, reverse=True)


def test_compute_eer(tmp_path, capsys):
    scores = tmp_path / "scores.txt"
    rngl = np.random.default_rng(0)
    lines = [f"{3 + 0.5 * rngl.standard_normal():.4f} target"
             for _ in range(200)]
    lines += [f"{-3 + 0.5 * rngl.standard_normal():.4f} nontarget"
              for _ in range(200)]
    scores.write_text("\n".join(lines) + "\n")
    assert TOOLS["compute-eer"]([str(scores)]) == 0
    eer = float(capsys.readouterr().out.strip())
    assert eer < 1.0      # well-separated → near-zero EER (percent)


def test_lattice_limit_depth_and_nbest_ctm(tmp_path):
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    clat = CompactLattice()
    s0, s1 = clat.add_state(), clat.add_state()
    clat.start = s0
    # many parallel arcs → depth > 2
    for k in range(8):
        clat.arcs[s0].append(CompactArc(k + 3, float(k), 0.0,
                                        (1, 1, 1, 1), s1))
    clat.finals[s1] = (0.0, 0.0, ())
    with TableWriter(f"ark:{tmp_path}/l.ark", holder="clat") as w:
        w["u"] = clat
    assert TOOLS["lattice-limit-depth"](
        ["--max-depth=2", f"ark:{tmp_path}/l.ark",
         f"ark:{tmp_path}/o.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/o.ark",
                                     holder="clat"))["u"]
    assert len(out.arcs[out.start]) < 8
    bw, _, _ = out.best_path()
    assert bw == [3]                          # best arc survives
    # nbest-to-ctm over a single-path lattice
    assert TOOLS["lattice-to-nbest"](
        ["--n=1", f"ark:{tmp_path}/l.ark", f"ark:{tmp_path}/nb.ark"]) == 0
    ctm = tmp_path / "o.ctm"
    assert TOOLS["nbest-to-ctm"](
        ["--frame-shift=0.03", f"ark:{tmp_path}/nb.ark", str(ctm)]) == 0
    row = open(ctm).read().split()
    assert row[0] == "u-1" and row[4] == "3"
    assert float(row[3]) == pytest.approx(0.12)   # 4 frames × 0.03


def test_feat_to_post_and_segments_concat(tmp_path, rng):
    feats = rng.standard_normal((20, 5)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["reco"] = feats
    assert TOOLS["feat-to-post"](
        ["--top-n=2", f"ark:{tmp_path}/f.ark",
         f"ark:{tmp_path}/p.ark"]) == 0
    post = dict(SequentialTableReader(f"ark:{tmp_path}/p.ark",
                                      holder="post"))["reco"]
    assert len(post) == 20 and all(len(fr) == 2 for fr in post)
    top = max(range(5), key=lambda i: feats[0, i])
    assert post[0][0][0] == top
    # segments
    seg = tmp_path / "segments"
    seg.write_text("seg1 reco 0.00 0.10\nseg2 reco 0.10 0.20\n")
    assert TOOLS["extract-feature-segments"](
        [f"ark:{tmp_path}/f.ark", str(seg), f"ark:{tmp_path}/s.ark"]) == 0
    segs = dict(SequentialTableReader(f"ark:{tmp_path}/s.ark",
                                      holder="mat"))
    assert np.asarray(segs["seg1"]).shape == (10, 5)
    np.testing.assert_allclose(np.asarray(segs["seg2"]), feats[10:20])
    # concat over time
    assert TOOLS["concat-feats"](
        [f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/f.ark",
         f"ark:{tmp_path}/c.ark"]) == 0
    cat = dict(SequentialTableReader(f"ark:{tmp_path}/c.ark",
                                     holder="mat"))["reco"]
    assert np.asarray(cat).shape == (40, 5)


def test_wav_reverberate(tmp_path, rng):
    wave = (rng.standard_normal(800) * 100).astype(np.int16)
    rir = np.zeros(16, np.int16)
    rir[0] = 1000
    rir[8] = 500
    with TableWriter(f"ark:{tmp_path}/w.ark", holder="wav") as w:
        w["u"] = (wave, 8000)
    with TableWriter(f"ark:{tmp_path}/rir.ark", holder="wav") as w:
        w["rir"] = (rir, 8000)
    assert TOOLS["wav-reverberate"](
        [f"--impulse-response=ark:{tmp_path}/rir.ark",
         f"ark:{tmp_path}/w.ark", f"ark:{tmp_path}/o.ark"]) == 0
    out, rate = dict(SequentialTableReader(f"ark:{tmp_path}/o.ark",
                                           holder="wav"))["u"]
    out = np.asarray(out, np.float64)
    assert rate == 8000 and len(out) == len(wave)
    # normalized output: power preserved (int16 rounding tolerance)
    assert np.mean(out ** 2) == pytest.approx(
        float(np.mean(wave.astype(np.float64) ** 2)), rel=2e-2)
    # echo structure: un-normalized convolution matches numpy oracle
    ref = np.convolve(wave.astype(np.float64), rir)[:len(wave)]
    scale = np.sqrt(np.mean(wave.astype(np.float64) ** 2)
                    / np.mean(ref ** 2))
    np.testing.assert_allclose(out, ref * scale, atol=1.0)


def test_pitch_combined(tmp_path, rng):
    t = np.arange(4000) / 16000.0
    wave = (5000 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/w.ark", holder="wav") as w:
        w["u"] = (wave, 16000)
    assert TOOLS["compute-and-process-kaldi-pitch-feats"](
        [f"ark:{tmp_path}/w.ark", f"ark:{tmp_path}/p.ark"]) == 0
    p = np.asarray(dict(SequentialTableReader(
        f"ark:{tmp_path}/p.ark", holder="mat"))["u"])
    assert p.shape[1] == 3 and p.shape[0] > 10


def test_nnet3_am_copy_info(tmp_path, capsys):
    import jax
    from kaldi_tpu.am.nnet3_io import write_raw_model
    from kaldi_tpu.am.serialize import write_transition_model
    from kaldi_tpu.am.tdnn import TdnnChain, TdnnConfig
    from kaldi_tpu.am.topology import HmmTopology
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.am.tree import MonophoneContextDependency
    phones = [1, 2]
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    cfg = TdnnConfig(feat_dim=4, num_pdfs=tree.num_pdfs, hidden_dim=8,
                     bottleneck_dim=4, num_layers=2)
    net = TdnnChain(cfg)
    variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 12, 4)),
                         train=False)
    raw = tmp_path / "final.raw"
    write_raw_model(str(raw), variables["params"],
                    variables.get("batch_stats", {}), cfg)
    # assemble a .mdl: \0B + <TransitionModel> + nnet
    mdl = tmp_path / "final.mdl"
    with open(mdl, "wb") as f:
        f.write(b"\0B")
        write_transition_model(f, tm)
        with open(raw, "rb") as rf:
            rf.read(2)
            f.write(rf.read())
    assert TOOLS["nnet3-am-info"]([str(mdl)]) == 0
    info = capsys.readouterr().out
    assert "num-components" in info
    out_raw = tmp_path / "copy.raw"
    assert TOOLS["nnet3-am-copy"](
        ["--raw=true", str(mdl), str(out_raw)]) == 0
    from kaldi_tpu.am.nnet3_io import read_nnet3
    with open(out_raw, "rb") as f:
        assert f.read(2) == b"\0B"
        model = read_nnet3(f)
    assert model.components
    out_mdl = tmp_path / "copy.mdl"
    assert TOOLS["nnet3-am-copy"]([str(mdl), str(out_mdl)]) == 0
    data = open(out_mdl, "rb").read()
    assert b"</TransitionModel>" in data
