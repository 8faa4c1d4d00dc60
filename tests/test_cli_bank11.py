"""CLI bank 11: batched wav→lattice pipeline, sgmm2 acc/est split,
lattice composition / re-determinization, post-to-tacc."""

import numpy as np
import pytest

from kaldi_tpu.cli import TOOLS
from kaldi_tpu.core.table import SequentialTableReader, TableWriter


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_batched_wav_nnet3(tmp_path, rng):
    import jax
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.am.nnet3_io import write_raw_model
    from kaldi_tpu.am.serialize import write_mdl
    from kaldi_tpu.am.tdnn import TdnnChain, TdnnConfig
    from kaldi_tpu.am.topology import HmmTopology
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.am.tree import MonophoneContextDependency
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    lex = Lexicon(entries=[("YES", ["Y", "EH", "S"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"YES": 1.0, "NO": 1.0})),
        lang.words), self_loop_scale=1.0)
    D = 13
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(D), np.ones(D))
    mdl = tmp_path / "final.mdl"
    write_mdl(str(mdl), tm, am)
    cfg = TdnnConfig(feat_dim=D, num_pdfs=tree.num_pdfs, hidden_dim=16,
                     bottleneck_dim=8, num_layers=2,
                     frame_subsampling_factor=3)
    net = TdnnChain(cfg)
    variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 12, D)),
                         train=False)
    raw = tmp_path / "final.raw"
    write_raw_model(str(raw), variables["params"],
                    variables.get("batch_stats", {}), cfg)
    fstp = tmp_path / "HCLG.fst"
    HCLG.write_text(str(fstp))
    with TableWriter(f"ark:{tmp_path}/w.ark", holder="wav") as w:
        for u in range(3):
            w[f"u{u}"] = ((rng.standard_normal(9600) * 1000)
                          .astype(np.int16), 16000)
    assert TOOLS["batched-wav-nnet3-cuda"](
        ["--batch-size=2", str(mdl), str(raw), str(fstp),
         f"ark:{tmp_path}/w.ark", f"ark:{tmp_path}/lat.ark",
         f"ark:{tmp_path}/words.ark"]) == 0
    lats = dict(SequentialTableReader(f"ark:{tmp_path}/lat.ark",
                                      holder="clat"))
    assert set(lats) == {"u0", "u1", "u2"}
    for clat in lats.values():
        clat.best_path()          # every lattice has a complete path


def test_sgmm2_acc_est_cycle(tmp_path, rng):
    from kaldi_tpu.am.sgmm2 import (accumulate, init_sgmm, read_sgmm2,
                                    update, write_sgmm2)
    J, D = 4, 5
    model = init_sgmm(J, D, 3, 2, np.zeros(D), np.ones(D), seed=1)
    m0 = tmp_path / "0.sgmm2"
    write_sgmm2(str(m0), model)
    T = 60
    feats = rng.standard_normal((T, D)).astype(np.float32)
    ali = rng.integers(0, J, T).astype(np.int32)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u"] = feats
    with TableWriter(f"ark:{tmp_path}/a.ark", holder="ivec") as w:
        w["u"] = ali
    acc1 = tmp_path / "1.acc"
    assert TOOLS["sgmm2-acc-stats"](
        [str(m0), f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/a.ark",
         str(acc1)]) == 0
    summed = tmp_path / "sum.acc"
    assert TOOLS["sgmm2-sum-accs"](
        [str(m0), str(summed), str(acc1), str(acc1)]) == 0
    m1 = tmp_path / "1.sgmm2"
    assert TOOLS["sgmm2-est-from-accs"](
        [str(m0), str(summed), str(m1)]) == 0
    # oracle: doubling identical accs equals accumulating twice
    a = accumulate(model, feats, ali)
    a.gamma *= 2
    a.y *= 2
    a.S *= 2
    ref = update(model, a)
    got = read_sgmm2(str(m1))
    np.testing.assert_allclose(got.V, ref.V, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got.var, ref.var, rtol=1e-4, atol=1e-5)


def test_lattice_compose_and_determinize(tmp_path):
    from kaldi_tpu.cli.tools_extra import _save_fst
    from kaldi_tpu.fst.fst import Arc, VectorFst
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    clat = CompactLattice()
    s0, s1 = clat.add_state(), clat.add_state()
    clat.start = s0
    clat.arcs[s0].append(CompactArc(5, 1.0, 2.0, (1, 2), s1))
    clat.arcs[s0].append(CompactArc(6, 0.5, 1.0, (3,), s1))
    clat.finals[s1] = (0.0, 0.0, ())
    with TableWriter(f"ark:{tmp_path}/l.ark", holder="clat") as w:
        w["u"] = clat
    # constraint FST accepting only word 5 (with a bonus weight)
    fst = VectorFst()
    a, b = fst.add_state(), fst.add_state()
    fst.set_start(a)
    fst.arcs[a].append(Arc(5, 5, 0.25, b))
    fst.set_final(b, 0.5)
    fstp = tmp_path / "g.fst"
    _save_fst(str(fstp), fst)
    assert TOOLS["lattice-compose"](
        [f"ark:{tmp_path}/l.ark", str(fstp),
         f"ark:{tmp_path}/c.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/c.ark",
                                     holder="clat"))["u"]
    paths = dict(out.paths())
    assert set(paths) == {(5,)}                    # word 6 pruned away
    assert paths[(5,)] == pytest.approx(1.0 + 2.0 + 0.25 + 0.5)
    # re-determinization keeps path semantics
    assert TOOLS["lattice-determinize"](
        [f"ark:{tmp_path}/l.ark", f"ark:{tmp_path}/d.ark"]) == 0
    det = dict(SequentialTableReader(f"ark:{tmp_path}/d.ark",
                                     holder="clat"))["u"]
    assert dict(det.paths()) == pytest.approx(dict(clat.paths()))
    bw, bt, bc = det.best_path()
    assert bw == [6] and bt == [3] and bc == pytest.approx(1.5)


def test_post_to_tacc(tmp_path):
    from kaldi_tpu.core import io as kio
    with TableWriter(f"ark:{tmp_path}/p.ark", holder="post") as w:
        w["u1"] = [[(1, 0.5), (2, 0.5)], [(1, 1.0)]]
        w["u2"] = [[(4, 0.25)]]
    out = tmp_path / "t.acc"
    assert TOOLS["post-to-tacc"](
        [f"ark:{tmp_path}/p.ark", str(out)]) == 0
    with kio.open_rxfilename(str(out)) as f:
        assert kio.init_kaldi_input_stream(f)
        v = kio.read_vector(f)
    np.testing.assert_allclose(v, [0.0, 1.5, 0.5, 0.0, 0.25])
