"""CLI bank 14: nnet3 xent egs plumbing + lattice long tail."""

import numpy as np
import pytest

from kaldi_tpu.cli import TOOLS
from kaldi_tpu.core.table import SequentialTableReader, TableWriter
from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice


@pytest.fixture
def rng():
    return np.random.default_rng(14)


@pytest.fixture
def xent_setup(tmp_path, rng):
    """Feats + pdf alignments for two utterances, 2 separable classes."""
    D, P = 5, 3
    feats, alis = {}, {}
    mu = rng.normal(size=(P, D)) * 3
    for k, T in [("u1", 150), ("u2", 100)]:
        pdf = rng.integers(0, P, T).astype(np.int32)
        feats[k] = (mu[pdf] + 0.3 * rng.normal(size=(T, D))).astype(
            np.float32)
        alis[k] = pdf
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        for k, v in feats.items():
            w[k] = v
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        for k, v in alis.items():
            w[k] = v
    return {"tmp": tmp_path, "D": D, "P": P}


def test_xent_egs_pipeline(xent_setup, tmp_path, capsys):
    t = xent_setup["tmp"]
    assert TOOLS["nnet3-get-egs"](
        ["--chunk-size=50", f"ark:{t}/feats.ark", f"ark:{t}/ali.ark",
         f"ark:{tmp_path}/egs.ark"]) == 0
    egs = list(SequentialTableReader(f"ark:{tmp_path}/egs.ark",
                                     holder="xeg"))
    assert len(egs) == 5          # 150//50 + 100//50
    for _k, eg in egs:
        assert eg.feats.shape == (1, 50, xent_setup["D"])
        assert eg.pdfs.shape == (1, 50)

    assert TOOLS["nnet3-shuffle-egs"](
        ["--srand=1", f"ark:{tmp_path}/egs.ark",
         f"ark:{tmp_path}/shuf.ark"]) == 0
    assert TOOLS["nnet3-copy-egs"](
        ["--n=3", f"ark:{tmp_path}/shuf.ark",
         f"ark:{tmp_path}/sub.ark"]) == 0
    assert len(list(SequentialTableReader(f"ark:{tmp_path}/sub.ark",
                                          holder="xeg"))) == 3

    assert TOOLS["nnet3-merge-egs"](
        ["--minibatch-size=2", f"ark:{tmp_path}/egs.ark",
         f"ark:{tmp_path}/mb.ark"]) == 0
    mbs = list(SequentialTableReader(f"ark:{tmp_path}/mb.ark",
                                     holder="xeg"))
    assert sum(eg.feats.shape[0] for _k, eg in mbs) == 5
    assert mbs[0][1].feats.shape[0] == 2

    # init a model and measure prob before/after training
    raw0 = tmp_path / "0.raw"
    assert TOOLS["nnet3-init"](
        [f"--feat-dim={xent_setup['D']}",
         f"--num-pdfs={xent_setup['P']}", "--hidden-dim=32",
         "--bottleneck-dim=8", "--num-layers=2", str(raw0)]) == 0
    assert TOOLS["nnet3-compute-prob"](
        [str(raw0), f"ark:{tmp_path}/mb.ark"]) == 0
    out0 = capsys.readouterr().out
    lp0 = float(out0.split("log-probability per frame ")[1].split()[0])

    raw1 = tmp_path / "1.raw"
    assert TOOLS["nnet3-train"](
        [f"--num-pdfs={xent_setup['P']}", "--hidden-dim=32",
         "--bottleneck-dim=8", "--num-layers=2", "--num-epochs=12",
         f"ark:{t}/feats.ark", f"ark:{t}/ali.ark", str(raw1)]) == 0
    assert TOOLS["nnet3-compute-prob"](
        [str(raw1), f"ark:{tmp_path}/mb.ark"]) == 0
    out1 = capsys.readouterr().out
    lp1 = float(out1.split("log-probability per frame ")[1].split()[0])
    assert lp1 > lp0 + 0.02       # training must beat random init


def _toy_model(tmp_path):
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.am.serialize import write_mdl
    from kaldi_tpu.am.topology import HmmTopology
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.am.tree import MonophoneContextDependency
    topo = HmmTopology.three_state([1, 2])
    tree = MonophoneContextDependency([1, 2], topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(2), np.ones(2),
                              perturb=0.1)
    path = tmp_path / "final.mdl"
    write_mdl(str(path), tm, am)
    return str(path), tm


def _phone_tids(tm, phone, frames):
    """tid sequence spending `frames` frames in `phone` (state 0 then
    self-loops), using the transition model's own numbering."""
    tids = []
    for tid in range(1, tm.num_transition_ids + 1):
        if (tm.transition_id_to_phone(tid) == phone
                and tm.transition_id_to_hmm_state(tid) == 0):
            if not tm.is_self_loop(tid) and not tids:
                tids.append(tid)
    for tid in range(1, tm.num_transition_ids + 1):
        if (tm.transition_id_to_phone(tid) == phone
                and tm.transition_id_to_hmm_state(tid) == 0
                and tm.is_self_loop(tid)):
            while len(tids) < frames:
                tids.append(tid)
            break
    assert len(tids) == frames
    return tids


def _two_path_lattice(tm):
    """start --(w=1, phones 1,2)--> final  and  --(w=2, phone 1)-->."""
    clat = CompactLattice()
    s0, s1 = clat.add_state(), clat.add_state()
    clat.start = s0
    tids_a = _phone_tids(tm, 1, 3) + _phone_tids(tm, 2, 2)
    tids_b = _phone_tids(tm, 1, 5)
    clat.arcs[s0].append(CompactArc(1, 1.5, 2.0, tuple(tids_a), s1))
    clat.arcs[s0].append(CompactArc(2, 0.5, 3.0, tuple(tids_b), s1))
    clat.finals[s1] = (0.25, 0.0, ())
    return clat



def _tid_paths(cl):
    """Exhaustive (tid-string, total-cost) pairs over all lattice paths."""
    out = []
    stack = [(cl.start, (), 0.0)]
    while stack:
        s, tids, cost = stack.pop()
        if s in cl.finals:
            gc, ac, ftids = cl.finals[s]
            out.append((tids + tuple(ftids), round(cost + gc + ac, 6)))
        for a in cl.arcs[s]:
            stack.append((a.nextstate, tids + tuple(a.tids),
                          cost + a.total))
    return sorted(out)

def test_lattice_align_phones(tmp_path):
    mdl, tm = _toy_model(tmp_path)
    clat = _two_path_lattice(tm)
    with TableWriter(f"ark:{tmp_path}/in.lats", holder="clat") as w:
        w["u"] = clat
    assert TOOLS["lattice-align-phones"](
        [mdl, f"ark:{tmp_path}/in.lats", f"ark:{tmp_path}/out.lats"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/out.lats",
                                     holder="clat"))["u"]
    # every arc = exactly one phone's tids; olabel = that phone
    for s in range(out.num_states):
        for a in out.arcs[s]:
            phones = {tm.transition_id_to_phone(t) for t in a.tids}
            assert len(phones) == 1
            assert a.word == phones.pop()
    # path weights and tid strings preserved
    assert _tid_paths(out) == _tid_paths(clat)


def test_lattice_boost_ali(tmp_path):
    mdl, tm = _toy_model(tmp_path)
    clat = _two_path_lattice(tm)
    # reference alignment = path B's tids (phone 1 for all 5 frames)
    ref = np.asarray(_phone_tids(tm, 1, 5), np.int32)
    with TableWriter(f"ark:{tmp_path}/in.lats", holder="clat") as w:
        w["u"] = clat
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        w["u"] = ref
    assert TOOLS["lattice-boost-ali"](
        ["--b=0.1", mdl, f"ark:{tmp_path}/in.lats",
         f"ark:{tmp_path}/ali.ark", f"ark:{tmp_path}/out.lats"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/out.lats",
                                     holder="clat"))["u"]
    arcs = {a.word: a for a in out.arcs[out.start]}
    # path A: last 2 frames are phone 2 vs ref phone 1 → 2 errors
    assert arcs[1].graph_cost == pytest.approx(1.5 - 0.1 * 2)
    # path B matches the reference exactly → unchanged
    assert arcs[2].graph_cost == pytest.approx(0.5)
    assert arcs[1].acoustic_cost == pytest.approx(2.0)


def test_lattice_minimize_merges_suffixes(tmp_path):
    clat = CompactLattice()
    s0 = clat.add_state()
    s1, s2 = clat.add_state(), clat.add_state()
    s3a, s3b = clat.add_state(), clat.add_state()
    clat.start = s0
    clat.arcs[s0].append(CompactArc(1, 1.0, 0.0, (1,), s1))
    clat.arcs[s0].append(CompactArc(2, 2.0, 0.0, (2,), s2))
    # identical suffixes from s1/s2 through duplicate states s3a/s3b
    clat.arcs[s1].append(CompactArc(5, 0.5, 0.1, (3,), s3a))
    clat.arcs[s2].append(CompactArc(5, 0.5, 0.1, (3,), s3b))
    clat.finals[s3a] = (0.0, 0.0, ())
    clat.finals[s3b] = (0.0, 0.0, ())
    with TableWriter(f"ark:{tmp_path}/in.lats", holder="clat") as w:
        w["u"] = clat
    assert TOOLS["lattice-minimize"](
        [f"ark:{tmp_path}/in.lats", f"ark:{tmp_path}/out.lats"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/out.lats",
                                     holder="clat"))["u"]
    assert out.num_states < clat.num_states     # s3a/s3b merged
    assert _tid_paths(out) == _tid_paths(clat)


def test_lattice_combine(tmp_path):
    import math
    a = CompactLattice()
    s0, s1 = a.add_state(), a.add_state()
    a.start = s0
    a.arcs[s0].append(CompactArc(7, 1.0, 0.5, (1,), s1))
    a.finals[s1] = (0.0, 0.0, ())
    b = CompactLattice()
    t0, t1 = b.add_state(), b.add_state()
    b.start = t0
    b.arcs[t0].append(CompactArc(8, 2.0, 0.25, (2,), t1))
    b.finals[t1] = (0.0, 0.0, ())
    with TableWriter(f"ark:{tmp_path}/a.lats", holder="clat") as w:
        w["u"] = a
    with TableWriter(f"ark:{tmp_path}/b.lats", holder="clat") as w:
        w["u"] = b
    assert TOOLS["lattice-combine"](
        ["--lat-weights=0.75:0.25", f"ark:{tmp_path}/a.lats",
         f"ark:{tmp_path}/b.lats", f"ark:{tmp_path}/c.lats"]) == 0
    c = dict(SequentialTableReader(f"ark:{tmp_path}/c.lats",
                                   holder="clat"))["u"]
    words = {}
    for s in range(c.num_states):
        for arc in c.arcs[s]:
            if arc.word:
                words[arc.word] = arc
    assert set(words) == {7, 8}
    assert words[7].graph_cost == pytest.approx(1.0 - math.log(0.75))
    assert words[8].graph_cost == pytest.approx(2.0 - math.log(0.25))
