"""Eighth bank of CLI tools: alignment/lattice utilities and
diarization scoring.

Canonical shapes mirrored: bin/ali-to-phones --write-lengths /
--ctm-output (the get_train_ctm.sh path), latbin/
lattice-add-trans-probs.cc, latbin/lattice-depth-per-frame.cc,
gmmbin/gmm-global-get-frame-likes.cc,
ivectorbin/ivector-plda-scoring-dense.cc (diarization score matrix),
fstbin/fstinfo.
"""

from __future__ import annotations

import numpy as np

from kaldi_tpu.cli.tools import tool
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


@tool("ali-to-phones-lengths")
def ali_to_phones_lengths(argv):
    """ali-to-phones --write-lengths: phone runs as `p1 d1 ; p2 d2 …`
    text entries (the duration-model / chain-egs input shape)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.pipelines.chain import phone_alignment_runs
    po = ParseOptions(
        "ali-to-phones-lengths <model> <ali-rspec> <lengths-wspec>")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    with TableWriter(args[2], holder="text") as w:
        for key, ali in SequentialTableReader(args[1], holder="ivec"):
            runs = phone_alignment_runs(tm, ali.tolist())
            w[key] = " ; ".join(f"{p} {d}" for p, d in runs).split()
    return 0


@tool("ali-to-ctm")
def ali_to_ctm(argv):
    """ali-to-phones --ctm-output: per-phone CTM lines
    (utt channel start dur phone) at the given frame shift."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.pipelines.chain import phone_alignment_runs
    po = ParseOptions("ali-to-ctm [opts] <model> <ali-rspec> <ctm-out>")
    po.register("frame-shift", float, 0.01, "seconds per frame")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    shift = po["frame-shift"]
    lines = []
    for key, ali in SequentialTableReader(args[1], holder="ivec"):
        t = 0
        for p, d in phone_alignment_runs(tm, ali.tolist()):
            lines.append(f"{key} 1 {t * shift:.2f} {d * shift:.2f} {p}")
            t += d
    with open(args[2], "w") as f:
        f.write("\n".join(lines) + "\n")
    log.info("wrote %d ctm lines", len(lines))
    return 0


@tool("lattice-add-trans-probs")
def lattice_add_trans_probs(argv):
    """Add transition log-probs into lattice graph costs
    (latbin/lattice-add-trans-probs.cc)."""
    from kaldi_tpu.am.serialize import read_mdl
    po = ParseOptions(
        "lattice-add-trans-probs [opts] <model> <lat-rspec> <lat-wspec>")
    po.register("transition-scale", float, 1.0, "transition scale")
    po.register("self-loop-scale", float, 1.0, "self-loop scale")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    ts, ss = po["transition-scale"], po["self-loop-scale"]
    n = 0
    with TableWriter(args[2], holder="clat") as w:
        for key, clat in SequentialTableReader(args[1], holder="clat"):
            for s in range(clat.num_states):
                for a in clat.arcs[s]:
                    add = 0.0
                    for tid in a.tids:
                        scale = ss if tm.is_self_loop(tid) else ts
                        add -= scale * float(tm.log_probs[tid])
                    a.graph_cost += add
            w[key] = clat
            n += 1
    log.info("added transition probs to %d lattices", n)
    return 0


@tool("lattice-depth-per-frame")
def lattice_depth_per_frame(argv):
    """Per-frame lattice depth (arcs crossing each frame)."""
    from kaldi_tpu.lattice.functions import state_times
    po = ParseOptions(
        "lattice-depth-per-frame <lat-rspec> <depth-wspec>")
    args = po.read(argv)
    with TableWriter(args[1], holder="ivec") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            times = state_times(clat)
            T = max((times[s] + 0 for s in clat.finals), default=0)
            depth = np.zeros(max(T, 1), np.int32)
            for s in range(clat.num_states):
                for a in clat.arcs[s]:
                    t0, t1 = times[s], times[s] + len(a.tids)
                    depth[t0:min(t1, len(depth))] += 1
            w[key] = depth
    return 0


@tool("gmm-global-get-frame-likes")
def gmm_global_get_frame_likes(argv):
    """Per-frame log-likelihoods under a global (single) GMM."""
    from kaldi_tpu.cli.tools_bank5 import _read_global_gmm
    po = ParseOptions(
        "gmm-global-get-frame-likes <gmm-in> <feats-rspec> <likes-wspec>")
    args = po.read(argv)
    gmm = _read_global_gmm(args[0])
    with TableWriter(args[2], holder="vec") as w:
        for key, m in SequentialTableReader(args[1], holder="mat"):
            ll = np.asarray(gmm.loglikes(np.asarray(m)), np.float32)
            w[key] = ll.reshape(len(ll))
    return 0


@tool("ivector-plda-scoring-dense")
def ivector_plda_scoring_dense(argv):
    """All-pairs PLDA score matrix over one recording's segment
    i-vectors (the diarization clustering input)."""
    from kaldi_tpu.am.ivector import read_plda
    po = ParseOptions(
        "ivector-plda-scoring-dense <plda> <spk2utt> <ivec-rspec> "
        "<scores-wspec>")
    args = po.read(argv)
    plda = read_plda(args[0])
    ivecs = RandomAccessTableReader(args[2], holder="vec")
    n = 0
    with TableWriter(args[3], holder="mat") as w:
        for line in open(args[1]):
            parts = line.split()
            reco, segs = parts[0], parts[1:]
            X = np.stack([np.asarray(ivecs[s]) for s in segs])
            K = len(segs)
            S = np.zeros((K, K), np.float32)
            for i in range(K):
                for j in range(K):
                    S[i, j] = plda.score(X[i], X[j])
            w[reco] = S
            n += 1
    log.info("scored %d recordings", n)
    return 0


@tool("fstinfo")
def fstinfo_tool(argv):
    from kaldi_tpu.cli.tools_extra import _load_fst
    from kaldi_tpu.fst.fst import EPS, INF
    po = ParseOptions("fstinfo <fst-in>")
    args = po.read(argv)
    f = _load_fst(args[0])
    arcs = sum(len(a) for a in f.arcs)
    eps = sum(1 for al in f.arcs for a in al if a.ilabel == EPS)
    finals = sum(1 for s in range(f.num_states) if f.final(s) != INF)
    print(f"# of states {f.num_states}")
    print(f"# of arcs {arcs}")
    print(f"# of eps arcs {eps}")
    print(f"# of final states {finals}")
    print(f"initial state {f.start}")
    return 0
