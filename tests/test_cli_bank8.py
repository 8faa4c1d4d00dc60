"""CLI bank 8: alignment utilities, lattice trans-probs/depth,
global-GMM frame likes, dense PLDA scoring, fstinfo."""

import numpy as np
import pytest

from kaldi_tpu.cli import TOOLS
from kaldi_tpu.core.table import SequentialTableReader, TableWriter


@pytest.fixture
def mono_setup(tmp_path):
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.am.serialize import write_mdl
    from kaldi_tpu.am.topology import HmmTopology
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.am.tree import MonophoneContextDependency
    phones = [1, 2]
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(4), np.ones(4))
    mdl = str(tmp_path / "final.mdl")
    write_mdl(mdl, tm, am)
    fwd, slf = {}, {}
    for tid in range(1, tm.num_transition_ids + 1):
        ph = tm.transition_id_to_phone(tid)
        (slf if tm.is_self_loop(tid) else fwd).setdefault(ph, tid)

    def tids(runs):
        out = []
        for p, d in runs:
            out.extend([fwd[p]] + [slf[p]] * (d - 1))
        return np.asarray(out, np.int32)

    return mdl, tm, tids


def test_ali_to_phones_lengths_and_ctm(tmp_path, mono_setup):
    mdl, tm, tids = mono_setup
    runs = [(1, 3), (2, 5), (1, 2)]
    with TableWriter(f"ark:{tmp_path}/a.ark", holder="ivec") as w:
        w["u"] = tids(runs)
    assert TOOLS["ali-to-phones-lengths"](
        [mdl, f"ark:{tmp_path}/a.ark", f"ark,t:{tmp_path}/l.txt"]) == 0
    line = open(f"{tmp_path}/l.txt").read().split(None, 1)[1].strip()
    assert line == "1 3 ; 2 5 ; 1 2"
    assert TOOLS["ali-to-ctm"](
        ["--frame-shift=0.03", mdl, f"ark:{tmp_path}/a.ark",
         f"{tmp_path}/p.ctm"]) == 0
    rows = open(f"{tmp_path}/p.ctm").read().splitlines()
    assert rows[0].split() == ["u", "1", "0.00", "0.09", "1"]
    assert rows[1].split() == ["u", "1", "0.09", "0.15", "2"]


def test_lattice_add_trans_probs_and_depth(tmp_path, mono_setup):
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    mdl, tm, tids = mono_setup
    clat = CompactLattice()
    s0, s1 = clat.add_state(), clat.add_state()
    clat.start = s0
    ts = tuple(tids([(1, 4)]).tolist())
    clat.arcs[s0].append(CompactArc(5, 1.0, 2.0, ts, s1))
    clat.finals[s1] = (0.0, 0.0, ())
    with TableWriter(f"ark:{tmp_path}/lat.ark", holder="clat") as w:
        w["u"] = clat
    assert TOOLS["lattice-add-trans-probs"](
        [mdl, f"ark:{tmp_path}/lat.ark", f"ark:{tmp_path}/out.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/out.ark",
                                     holder="clat"))["u"]
    expect = 1.0 - sum(float(tm.log_probs[t]) for t in ts)
    assert out.arcs[0][0].graph_cost == pytest.approx(expect, abs=1e-4)

    assert TOOLS["lattice-depth-per-frame"](
        [f"ark:{tmp_path}/lat.ark", f"ark:{tmp_path}/d.ark"]) == 0
    depth = dict(SequentialTableReader(f"ark:{tmp_path}/d.ark",
                                       holder="ivec"))["u"]
    np.testing.assert_array_equal(depth, [1, 1, 1, 1])


def test_global_frame_likes_and_fstinfo(tmp_path, rng, capsys):
    feats = rng.standard_normal((30, 5)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/f.ark") as w:
        w["u"] = feats
    gmm_path = str(tmp_path / "g.ubm")
    assert TOOLS["gmm-global-init-from-feats"](
        ["--num-gauss=3", f"ark:{tmp_path}/f.ark", gmm_path]) == 0
    assert TOOLS["gmm-global-get-frame-likes"](
        [gmm_path, f"ark:{tmp_path}/f.ark",
         f"ark:{tmp_path}/ll.ark"]) == 0
    ll = dict(SequentialTableReader(f"ark:{tmp_path}/ll.ark",
                                    holder="vec"))["u"]
    assert ll.shape == (30,) and np.isfinite(ll).all()

    open(f"{tmp_path}/t.txt", "w").write("0 1 1 1 0.5\n1 1.0\n")
    assert TOOLS["fstcompile"]([f"{tmp_path}/t.txt",
                                f"{tmp_path}/t.fst"]) == 0
    assert TOOLS["fstinfo"]([f"{tmp_path}/t.fst"]) == 0
    out = capsys.readouterr().out
    assert "# of states 2" in out and "# of arcs 1" in out
