"""Thirteenth bank of CLI tools: full-covariance UBM binaries, linear
VTLN, online CMVN application, fst long tail.

Canonical shapes mirrored (SURVEY.md §2.1 bins):
fgmmbin/{fgmm-global-acc-stats,fgmm-global-sum-accs,fgmm-global-est,
fgmm-global-copy,fgmm-global-info,fgmm-global-get-frame-likes,
fgmm-global-to-gmm,fgmm-gselect}.cc, gmmbin/{gmm-global-to-fgmm,
gmm-init-lvtln,gmm-train-lvtln-special,gmm-est-lvtln-trans}.cc,
online2bin/apply-cmvn-online.cc, fstbin/{fstcompose,fstpushspecial}.cc,
bin/matrix-sum-rows.cc.
"""

from __future__ import annotations

import math
import sys
from typing import List

import numpy as np

from kaldi_tpu.cli.tools import tool
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


# ---------------------------------------------------------------------------
# Full-covariance global GMM (the full-UBM stage of ivector systems).
# Serialization: Kaldi-style token framing over core/io primitives.

def _write_full_gmm(path: str, gmm) -> None:
    from kaldi_tpu.core import io as kio
    with kio.open_wxfilename(path) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<FullGMM>")
        kio.write_vector(f, gmm.weights.astype(np.float32))
        kio.write_matrix(f, gmm.means.astype(np.float32))
        kio.write_basic_int32(f, gmm.num_mix)
        for m in range(gmm.num_mix):
            kio.write_matrix(f, gmm.covars[m].astype(np.float32))
        kio.write_token(f, "</FullGMM>")


def _read_full_gmm(path: str):
    from kaldi_tpu.am.full_gmm import FullGmm
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(path) as f:
        if not kio.init_kaldi_input_stream(f):
            raise KaldiError(f"{path}: not a binary kaldi file")
        kio.expect_token(f, "<FullGMM>")
        weights = np.asarray(kio.read_vector(f), np.float64)
        means = np.asarray(kio.read_matrix(f), np.float64)
        M = kio.read_basic_int32(f)
        covars = np.stack([np.asarray(kio.read_matrix(f), np.float64)
                           for _ in range(M)])
        kio.expect_token(f, "</FullGMM>")
        return FullGmm(weights, means, covars)


def _write_full_accs(path: str, accs) -> None:
    from kaldi_tpu.core import io as kio
    with kio.open_wxfilename(path) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<FullGmmAccs>")
        kio.write_vector(f, accs.occ.astype(np.float64), dtype="float64")
        kio.write_matrix(f, accs.mean_acc.astype(np.float64),
                         dtype="float64")
        kio.write_basic_int32(f, len(accs.occ))
        for m in range(len(accs.occ)):
            kio.write_matrix(f, accs.cov_acc[m].astype(np.float64),
                             dtype="float64")
        kio.write_token(f, "</FullGmmAccs>")


def _read_full_accs(path: str):
    from kaldi_tpu.am.full_gmm import AccumFullGmm
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(path) as f:
        if not kio.init_kaldi_input_stream(f):
            raise KaldiError(f"{path}: not a binary kaldi file")
        kio.expect_token(f, "<FullGmmAccs>")
        occ = np.asarray(kio.read_vector(f), np.float64)
        mean_acc = np.asarray(kio.read_matrix(f), np.float64)
        M = kio.read_basic_int32(f)
        cov_acc = np.stack([np.asarray(kio.read_matrix(f), np.float64)
                            for _ in range(M)])
        kio.expect_token(f, "</FullGmmAccs>")
        accs = AccumFullGmm(len(occ), mean_acc.shape[1])
        accs.occ, accs.mean_acc, accs.cov_acc = occ, mean_acc, cov_acc
        return accs


@tool("gmm-global-to-fgmm")
def gmm_global_to_fgmm_tool(argv):
    """Diagonal global GMM → full-covariance GMM
    (gmmbin/gmm-global-to-fgmm.cc; train_full_ubm.sh start)."""
    from kaldi_tpu.am.full_gmm import FullGmm
    from kaldi_tpu.cli.tools_bank5 import _read_global_gmm
    po = ParseOptions("gmm-global-to-fgmm <gmm-in> <fgmm-out>")
    args = po.read(argv)
    am = _read_global_gmm(args[0])
    w = am.weights[0]
    keep = w > 0
    gmm = FullGmm.from_diag(w[keep], am.means[0][keep], am.vars[0][keep])
    _write_full_gmm(args[1], gmm)
    log.info("gmm-global-to-fgmm: %d gaussians, dim %d",
             gmm.num_mix, gmm.dim)
    return 0


@tool("fgmm-global-to-gmm")
def fgmm_global_to_gmm_tool(argv):
    """Full-covariance GMM → diagonal (keeps the covariance diagonal;
    fgmmbin/fgmm-global-to-gmm.cc)."""
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.cli.tools_bank5 import _write_global_gmm
    po = ParseOptions("fgmm-global-to-gmm <fgmm-in> <gmm-out>")
    args = po.read(argv)
    gmm = _read_full_gmm(args[0])
    variances = np.stack([np.diag(gmm.covars[m])
                          for m in range(gmm.num_mix)])
    am = AmDiagGmm(gmm.weights[None, :], gmm.means[None, :, :],
                   variances[None, :, :])
    _write_global_gmm(args[1], am)
    return 0


@tool("fgmm-global-copy")
def fgmm_global_copy_tool(argv):
    """Copy a full-covariance GMM (fgmmbin/fgmm-global-copy.cc)."""
    po = ParseOptions("fgmm-global-copy <fgmm-in> <fgmm-out>")
    args = po.read(argv)
    _write_full_gmm(args[1], _read_full_gmm(args[0]))
    return 0


@tool("fgmm-global-info")
def fgmm_global_info_tool(argv):
    """Print dims of a full-covariance GMM (fgmmbin/fgmm-global-info.cc)."""
    po = ParseOptions("fgmm-global-info <fgmm-in>")
    args = po.read(argv)
    gmm = _read_full_gmm(args[0])
    print(f"number of gaussians {gmm.num_mix}")
    print(f"feature dimension {gmm.dim}")
    return 0


@tool("fgmm-global-acc-stats")
def fgmm_global_acc_stats_tool(argv):
    """Accumulate full-covariance sufficient stats over a feature table
    (fgmmbin/fgmm-global-acc-stats.cc)."""
    from kaldi_tpu.am.full_gmm import AccumFullGmm
    po = ParseOptions("fgmm-global-acc-stats <fgmm-in> <feats-rspec> "
                      "<accs-out>")
    args = po.read(argv)
    gmm = _read_full_gmm(args[0])
    accs = AccumFullGmm(gmm.num_mix, gmm.dim)
    tot_like, tot_t, n = 0.0, 0, 0
    for _key, feats in SequentialTableReader(args[1], holder="mat"):
        feats = np.asarray(feats)
        tot_like += accs.accumulate(gmm, feats)
        tot_t += len(feats)
        n += 1
    _write_full_accs(args[2], accs)
    log.info("fgmm-global-acc-stats: %d utts, avg like/frame %.4f",
             n, tot_like / max(tot_t, 1))
    return 0


@tool("fgmm-global-sum-accs")
def fgmm_global_sum_accs_tool(argv):
    """Sum full-covariance stats files (fgmmbin/fgmm-global-sum-accs.cc)."""
    po = ParseOptions("fgmm-global-sum-accs <accs-out> <accs-in1> ...")
    args = po.read(argv)
    total = _read_full_accs(args[1])
    for path in args[2:]:
        a = _read_full_accs(path)
        total.occ += a.occ
        total.mean_acc += a.mean_acc
        total.cov_acc += a.cov_acc
    _write_full_accs(args[0], total)
    return 0


@tool("fgmm-global-est")
def fgmm_global_est_tool(argv):
    """Re-estimate a full-covariance GMM from stats
    (fgmmbin/fgmm-global-est.cc)."""
    from kaldi_tpu.am.full_gmm import mle_full_gmm_update
    po = ParseOptions("fgmm-global-est [--min-occ=10] <fgmm-in> "
                      "<accs-in> <fgmm-out>")
    po.register("min-occ", float, 10.0, "skip components below this count")
    po.register("cov-floor", float, 1e-3, "covariance eigenvalue floor")
    args = po.read(argv)
    gmm = _read_full_gmm(args[0])
    accs = _read_full_accs(args[1])
    mle_full_gmm_update(gmm, accs, min_occ=po["min-occ"],
                        cov_floor=po["cov-floor"])
    _write_full_gmm(args[2], gmm)
    log.info("fgmm-global-est: total occupancy %.1f", float(accs.occ.sum()))
    return 0


@tool("fgmm-global-get-frame-likes")
def fgmm_global_get_frame_likes_tool(argv):
    """Per-frame (or per-utterance average) log-likelihoods under a
    full-covariance GMM (fgmmbin/fgmm-global-get-frame-likes.cc)."""
    po = ParseOptions("fgmm-global-get-frame-likes [--average=false] "
                      "<fgmm-in> <feats-rspec> <likes-wspec>")
    po.register("average", bool, False,
                "write one average like per utterance")
    args = po.read(argv)
    gmm = _read_full_gmm(args[0])
    with TableWriter(args[2], holder="vec") as w:
        for key, feats in SequentialTableReader(args[1], holder="mat"):
            likes = gmm.loglikes(np.asarray(feats))
            if po["average"]:
                likes = np.array([likes.mean()])
            w[key] = likes.astype(np.float32)
    return 0


@tool("fgmm-gselect")
def fgmm_gselect_tool(argv):
    """Top-N Gaussian indices per frame under a full-covariance GMM
    (fgmmbin/fgmm-gselect.cc)."""
    po = ParseOptions("fgmm-gselect [--n=50] <fgmm-in> <feats-rspec> "
                      "<gselect-wspec>")
    po.register("n", int, 50, "Gaussians to keep per frame")
    args = po.read(argv)
    gmm = _read_full_gmm(args[0])
    n_keep = min(po["n"], gmm.num_mix)
    with TableWriter(args[2], holder="post") as w:
        for key, feats in SequentialTableReader(args[1], holder="mat"):
            post = gmm.posteriors(np.asarray(feats))
            idx = np.argsort(-post, axis=1)[:, :n_keep]
            w[key] = [[(int(i), float(post[t, i])) for i in idx[t]]
                      for t in range(len(post))]
    return 0


# ---------------------------------------------------------------------------
# Linear VTLN.

@tool("gmm-init-lvtln")
def gmm_init_lvtln_tool(argv):
    """Initialize an LVTLN object with identity transforms
    (gmmbin/gmm-init-lvtln.cc)."""
    from kaldi_tpu.am.lvtln import Lvtln, write_lvtln
    from kaldi_tpu.core import io as kio
    po = ParseOptions("gmm-init-lvtln --dim=D --num-classes=N "
                      "[--default-class=K] <lvtln-out>")
    po.register("dim", int, 13, "feature dimension")
    po.register("num-classes", int, 21, "number of warp classes")
    po.register("default-class", int, 10, "class treated as unwarped")
    args = po.read(argv)
    lv = Lvtln(po["dim"], po["num-classes"], po["default-class"])
    with kio.open_wxfilename(args[0]) as f:
        kio.init_kaldi_output_stream(f)
        write_lvtln(f, lv)
    return 0


@tool("gmm-train-lvtln-special")
def gmm_train_lvtln_special_tool(argv):
    """Least-squares fit of one LVTLN class from paired
    (unwarped, warped) feature tables (gmmbin/gmm-train-lvtln-special.cc)."""
    from kaldi_tpu.am.lvtln import read_lvtln, write_lvtln
    from kaldi_tpu.core import io as kio
    po = ParseOptions("gmm-train-lvtln-special [--warp=1.0] <class-index> "
                      "<lvtln-in> <lvtln-out> <feats-rspec> "
                      "<warped-feats-rspec>")
    po.register("warp", float, 1.0, "warp factor this class represents")
    args = po.read(argv)
    cls = int(args[0])
    with kio.open_rxfilename(args[1]) as f:
        kio.init_kaldi_input_stream(f)
        lv = read_lvtln(f)
    warped = RandomAccessTableReader(args[4], holder="mat")
    pairs = []
    for key, x in SequentialTableReader(args[3], holder="mat"):
        if key in warped:
            pairs.append((np.asarray(x), np.asarray(warped[key])))
    if not pairs:
        raise KaldiError("no overlapping utterances between tables")
    lv.train_class(cls, po["warp"], pairs)
    with kio.open_wxfilename(args[2]) as f:
        kio.init_kaldi_output_stream(f)
        write_lvtln(f, lv)
    return 0


@tool("gmm-est-lvtln-trans")
def gmm_est_lvtln_trans_tool(argv):
    """Select the best LVTLN class per speaker given a model and
    posteriors; write affine transforms + chosen warps
    (gmmbin/gmm-est-lvtln-trans.cc)."""
    from kaldi_tpu.am.lvtln import read_lvtln
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.core import io as kio
    po = ParseOptions("gmm-est-lvtln-trans [--spk2utt=rspec] <model-in> "
                      "<lvtln-in> <feats-rspec> <post-rspec> <trans-wspec> "
                      "[<warps-wspec>]")
    po.register("spk2utt", str, "", "speaker→utterance map (else per-utt)")
    args = po.read(argv)
    _tm, am = read_mdl(args[0])
    with kio.open_rxfilename(args[1]) as f:
        kio.init_kaldi_input_stream(f)
        lv = read_lvtln(f)
    feats_r = RandomAccessTableReader(args[2], holder="mat")
    post_r = RandomAccessTableReader(args[3], holder="post")
    groups = {}
    if po["spk2utt"]:
        for spk, utts in SequentialTableReader(po["spk2utt"], holder="text"):
            groups[spk] = list(utts)
    else:
        for key, _ in SequentialTableReader(args[2], holder="mat"):
            groups[key] = [key]
    warps_w = TableWriter(args[5], holder="text") if len(args) > 5 else None
    tot_impr, n_spk = 0.0, 0
    with TableWriter(args[4], holder="mat") as w:
        for spk, utts in groups.items():
            feats, posts = [], []
            for u in utts:
                if u in feats_r and u in post_r:
                    feats.append(np.asarray(feats_r[u]))
                    # Incoming posteriors are transition-id level
                    # (ali-to-post convention); Lvtln.select scores
                    # per-pdf loglikes, so convert tid -> pdf here
                    # (gmm-est-lvtln-trans.cc does the same).
                    posts.extend(
                        [(_tm.transition_id_to_pdf(int(tid)), w)
                         for tid, w in frame]
                        for frame in post_r[u])
            if not feats:
                continue
            cls, affine, impr = lv.select(am, np.concatenate(feats), posts)
            w[spk] = affine.astype(np.float32)
            if warps_w is not None:
                warps_w[spk] = f"{lv.warps[cls]:.2f}"
            tot_impr += impr
            n_spk += 1
    if warps_w is not None:
        warps_w.close()
    log.info("gmm-est-lvtln-trans: %d speakers, avg objf impr/frame %.4f",
             n_spk, tot_impr / max(n_spk, 1))
    return 0


# ---------------------------------------------------------------------------
# Online CMVN application (online2bin/apply-cmvn-online.cc).

@tool("apply-cmvn-online")
def apply_cmvn_online_tool(argv):
    """Causal CMVN: per frame t, mean (and optionally variance) stats
    from the trailing window [t-W+1, t]; when fewer than W frames are
    available, the deficit is padded with the supplied global stats —
    the online2 decoding contract (online2bin/apply-cmvn-online.cc)."""
    from kaldi_tpu.core import io as kio
    po = ParseOptions("apply-cmvn-online [--cmn-window=600] "
                      "[--norm-vars=false] <global-stats-in> "
                      "<feats-rspec> <feats-wspec>")
    po.register("cmn-window", int, 600, "trailing window, frames")
    po.register("norm-vars", bool, False, "also normalize variance")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        kio.init_kaldi_input_stream(f)
        gstats = np.asarray(kio.read_matrix(f), np.float64)
    W = po["cmn-window"]
    gcount = gstats[0, -1]
    gsum, gsumsq = gstats[0, :-1], gstats[1, :-1]
    with TableWriter(args[2], holder="mat") as w:
        for key, feats in SequentialTableReader(args[1], holder="mat"):
            x = np.asarray(feats, np.float64)
            T, D = x.shape
            csum = np.cumsum(x, axis=0)
            csumsq = np.cumsum(x * x, axis=0)
            out = np.empty_like(x)
            for t in range(T):
                lo = max(0, t - W + 1)
                cnt = t - lo + 1
                s = csum[t] - (csum[lo - 1] if lo > 0 else 0.0)
                ss = csumsq[t] - (csumsq[lo - 1] if lo > 0 else 0.0)
                deficit = W - cnt
                if deficit > 0 and gcount > 0:
                    scale = deficit / gcount
                    s = s + scale * gsum
                    ss = ss + scale * gsumsq
                    cnt += deficit
                mean = s / cnt
                out[t] = x[t] - mean
                if po["norm-vars"]:
                    var = np.maximum(ss / cnt - mean * mean, 1e-10)
                    out[t] /= np.sqrt(var)
            w[key] = out.astype(np.float32)
    return 0


# ---------------------------------------------------------------------------
# fst long tail.

@tool("fstcompose")
def fstcompose_tool(argv):
    """Plain FST composition (OpenFst fstcompose; same ε-filter engine
    as fsttablecompose)."""
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.ops import compose
    po = ParseOptions("fstcompose <fst1> <fst2> <fst-out>")
    po.register("connect", bool, True, "trim the result")
    args = po.read(argv)
    out = compose(_load_fst(args[0]), _load_fst(args[1]),
                  connect_result=po["connect"])
    _save_fst(args[2], out)
    return 0


@tool("fstpushspecial")
def fstpushspecial_tool(argv):
    """Weight pushing in the log semiring so every state's outgoing
    (+final) probability mass becomes the same constant, keeping total
    path weights unchanged (fstbin/fstpushspecial.cc).  Potentials are
    the log-semiring distance-to-final, computed by damped fixed-point
    iteration; per-state mass then equals exp(-V(start))^(1/paths)
    uniformly up to --delta."""
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.fst import INF, Arc, VectorFst
    po = ParseOptions("fstpushspecial [--delta=1e-4] <fst-in> <fst-out>")
    po.register("delta", float, 1e-4, "convergence tolerance")
    po.register("max-iters", int, 200, "fixed-point iteration cap")
    args = po.read(argv)
    from kaldi_tpu.fst.ops import connect
    fst = connect(_load_fst(args[0]))
    n = fst.num_states
    if n == 0 or fst.start < 0:
        _save_fst(args[1], fst)
        return 0
    # Find potentials U (U(start) = 0, so total path weight is exactly
    # preserved) and a common mass λ with, for every state s,
    #   sum_arcs e^{-(w + U(d) - U(s))} + e^{-(final - U(s))} = λ.
    # Damped fixed point: push each state's log-mass toward the start
    # state's (the reference iterates an equivalent eigenvalue problem).
    def log_mass(U):
        out = np.full(n, -np.inf)
        for s in range(n):
            terms = []
            fw = fst.final(s)
            if fw != INF:
                terms.append(-(fw - U[s]))
            for a in fst.arcs[s]:
                terms.append(-(a.weight + U[a.nextstate] - U[s]))
            if terms:
                m = max(terms)
                out[s] = m + math.log(sum(math.exp(t - m) for t in terms))
        return out
    U = np.zeros(n)
    for _ in range(po["max-iters"]):
        lm = log_mass(U)
        delta = lm[fst.start] - lm
        delta[~np.isfinite(delta)] = 0.0
        if np.max(np.abs(delta)) < po["delta"]:
            break
        U = U + 0.5 * delta
        U[fst.start] = 0.0
    out = VectorFst()
    for _ in range(n):
        out.add_state()
    out.set_start(fst.start)
    for s in range(n):
        for a in fst.arcs[s]:
            w = a.weight + U[a.nextstate] - U[s]
            out.add_arc(s, Arc(a.ilabel, a.olabel, w, a.nextstate))
        fw = fst.final(s)
        if fw != INF:
            out.set_final(s, fw - U[s])
    _save_fst(args[1], out)
    return 0


@tool("matrix-sum-rows")
def matrix_sum_rows_tool(argv):
    """Sum the rows of each matrix into a vector table
    (bin/matrix-sum-rows.cc)."""
    po = ParseOptions("matrix-sum-rows <mat-rspec> <vec-wspec>")
    args = po.read(argv)
    with TableWriter(args[1], holder="vec") as w:
        for key, mat in SequentialTableReader(args[0], holder="mat"):
            w[key] = np.asarray(mat).sum(axis=0).astype(np.float32)
    return 0
