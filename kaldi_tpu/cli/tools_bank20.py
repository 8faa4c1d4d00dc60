"""Twentieth bank of CLI tools: language-id logistic regression,
global-GMM fMLLR/gselect posteriors, transform utilities, batched
nnet3 decoding, and OpenFst-utility tail.

Canonical shapes mirrored (SURVEY.md §2.1 bins):
ivectorbin/{logistic-regression-train,logistic-regression-eval}.cc,
gmmbin/{gmm-global-est-fmllr,gmm-global-gselect-to-post}.cc,
bin/extend-transform-dim.cc,
nnet3bin/nnet3-latgen-faster-batch.cc,
OpenFst tools shipped by tools/openfst and used in recipes:
fstprune, fstclosure.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from kaldi_tpu.cli.tools import tool, _load_hclg, _LatgenDecoder
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


# ---------------------------------------------------------------------------
# Language-ID logistic regression (ivectorbin).

@tool("logistic-regression-train")
def logistic_regression_train_tool(argv):
    """Multiclass logistic regression on i-vectors
    (ivectorbin/logistic-regression-train.cc).  Training pairs come
    from a '<key> <class-int>' text table; the model file carries the
    (C, D+1) affine weights."""
    import jax
    import jax.numpy as jnp
    import optax
    from kaldi_tpu.core import io as kio
    po = ParseOptions("logistic-regression-train [opts] <ivec-rspec> "
                      "<classes-rspec> <model-out>")
    po.register("num-steps", int, 200, "optimizer steps")
    po.register("learning-rate", float, 0.1, "adam lr")
    po.register("l2", float, 1e-3, "l2 regularization")
    args = po.read(argv)
    cls_r = {k: int(v[0]) for k, v in
             SequentialTableReader(args[1], holder="text")}
    xs, ys = [], []
    for key, v in SequentialTableReader(args[0], holder="vec"):
        if key in cls_r:
            xs.append(np.asarray(v, np.float32))
            ys.append(cls_r[key])
    if not xs:
        raise KaldiError("logistic-regression-train: no training pairs")
    X = jnp.asarray(np.stack(xs))
    y = jnp.asarray(np.asarray(ys, np.int32))
    C = int(max(ys)) + 1
    D = X.shape[1]
    W = jnp.zeros((C, D + 1))
    l2 = po["l2"]

    def loss_fn(W):
        logits = X @ W[:, :D].T + W[:, D]
        lp = jax.nn.log_softmax(logits)
        nll = -jnp.mean(lp[jnp.arange(len(ys)), y])
        return nll + l2 * jnp.sum(W[:, :D] ** 2)

    tx = optax.adam(po["learning-rate"])
    opt = tx.init(W)
    step = jax.jit(lambda W, o: (lambda l_g: (
        optax.apply_updates(W, tx.update(l_g[1], o)[0]),
        tx.update(l_g[1], o)[1], l_g[0]))(
            jax.value_and_grad(loss_fn)(W)))
    loss = None
    for _ in range(po["num-steps"]):
        W, opt, loss = step(W, opt)
    with kio.open_wxfilename(args[2]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<LogisticRegression>")
        kio.write_matrix(f, np.asarray(W, np.float32))
        kio.write_token(f, "</LogisticRegression>")
    log.info("logistic-regression-train: %d examples, %d classes, "
             "final nll %.4f", len(ys), C, float(loss))
    return 0


@tool("logistic-regression-eval")
def logistic_regression_eval_tool(argv):
    """Per-vector class log-posteriors under a trained model
    (ivectorbin/logistic-regression-eval.cc)."""
    from kaldi_tpu.core import io as kio
    po = ParseOptions("logistic-regression-eval <model-in> "
                      "<ivec-rspec> <logpost-wspec>")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        kio.init_kaldi_input_stream(f)
        kio.expect_token(f, "<LogisticRegression>")
        W = np.asarray(kio.read_matrix(f))
        kio.expect_token(f, "</LogisticRegression>")
    D = W.shape[1] - 1
    n = 0
    with TableWriter(args[2], holder="vec") as w:
        for key, v in SequentialTableReader(args[1], holder="vec"):
            logits = W[:, :D] @ np.asarray(v) + W[:, D]
            logits = logits - logits.max()
            lp = logits - np.log(np.exp(logits).sum())
            w[key] = lp.astype(np.float32)
            n += 1
    log.info("logistic-regression-eval: %d vectors", n)
    return 0


# ---------------------------------------------------------------------------
# Global-GMM tail (gmmbin).

@tool("gmm-global-est-fmllr")
def gmm_global_est_fmllr_tool(argv):
    """fMLLR against a GLOBAL GMM (gmmbin/gmm-global-est-fmllr.cc —
    the UBM-based adaptation used by diarization/VTLN flows)."""
    from kaldi_tpu.am.transforms import FmllrAccs
    from kaldi_tpu.cli.tools_bank5 import _read_global_gmm
    po = ParseOptions("gmm-global-est-fmllr [--spk2utt=rspec] "
                      "<global-gmm> <feats-rspec> <transform-wspec>")
    po.register("spk2utt", str, "", "speaker→utterances map")
    args = po.read(argv)
    am = _read_global_gmm(args[0])
    feats_r = RandomAccessTableReader(args[1], holder="mat")
    groups = {}
    if po["spk2utt"]:
        for spk, utts in SequentialTableReader(po["spk2utt"],
                                               holder="text"):
            groups[spk] = list(utts)
    else:
        for key, _ in SequentialTableReader(args[1], holder="mat"):
            groups[key] = [key]
    n = 0
    with TableWriter(args[2], holder="mat") as w:
        for spk, utts in groups.items():
            accs = FmllrAccs(am.dim)
            got = False
            for u in utts:
                if u not in feats_r:
                    continue
                feats = np.asarray(feats_r[u])
                T = len(feats)
                post = np.asarray(am.component_posteriors(
                    feats, np.zeros(T, np.int32)))       # (T, M)
                means = np.broadcast_to(am.means[0], (T,) +
                                        am.means[0].shape)
                ivars = np.broadcast_to(1.0 / am.vars[0], (T,) +
                                        am.vars[0].shape)
                accs.accumulate(post, feats, means, ivars)
                got = True
            if not got:
                continue
            W, _impr = accs.update()
            w[spk] = W.astype(np.float32)
            n += 1
    log.info("gmm-global-est-fmllr: %d speakers", n)
    return 0


@tool("gmm-global-gselect-to-post")
def gmm_global_gselect_to_post_tool(argv):
    """Gaussian posteriors restricted to preselected indices
    (gmmbin/gmm-global-gselect-to-post.cc: the gselect → ivector
    stats pruning step)."""
    from kaldi_tpu.cli.tools_bank5 import _read_global_gmm
    po = ParseOptions("gmm-global-gselect-to-post [--min-post=0.0] "
                      "<global-gmm> <feats-rspec> <gselect-rspec> "
                      "<post-wspec>\ngselect entries: per-frame lists "
                      "via the 'post' holder (index, _)")
    po.register("min-post", float, 0.0, "drop weaker posteriors")
    args = po.read(argv)
    am = _read_global_gmm(args[0])
    gs_r = RandomAccessTableReader(args[2], holder="post")
    n = 0
    with TableWriter(args[3], holder="post") as w:
        for key, feats in SequentialTableReader(args[1], holder="mat"):
            if key not in gs_r:
                continue
            feats = np.asarray(feats)
            post = np.asarray(am.component_posteriors(
                feats, np.zeros(len(feats), np.int32)))  # (T, M)
            out = []
            for t, frame in enumerate(gs_r[key]):
                if t >= len(feats):
                    break
                idx = [int(i) for i, _w in frame]
                p = post[t, idx]
                tot = p.sum()
                p = p / tot if tot > 0 else p
                out.append([(i, float(v)) for i, v in zip(idx, p)
                            if v >= po["min-post"]])
            w[key] = out
            n += 1
    log.info("gmm-global-gselect-to-post: %d utterances", n)
    return 0


# ---------------------------------------------------------------------------
# Transform utility (bin).

@tool("extend-transform-dim")
def extend_transform_dim_tool(argv):
    """Pad a (linear or affine) transform with identity rows/cols up
    to --new-dimension (bin/extend-transform-dim.cc — lets an LDA
    matrix estimated on D dims apply to D+Δ-dim features, e.g. +pitch
    or +ivector appends)."""
    from kaldi_tpu.core import io as kio
    po = ParseOptions("extend-transform-dim --new-dimension=N "
                      "<transform-in> <transform-out>")
    po.register("new-dimension", int, 0, "target input dim (required)")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        kio.init_kaldi_input_stream(f)
        mat = np.asarray(kio.read_matrix(f), np.float64)
    rows, cols = mat.shape
    affine = False
    in_dim = cols
    if cols == rows + 1:
        affine = True
        in_dim = cols - 1
    nd = po["new-dimension"]
    if nd < in_dim:
        raise KaldiError("extend-transform-dim: new dim smaller than "
                         "current")
    add = nd - in_dim
    out = np.zeros((rows + add, nd + (1 if affine else 0)))
    out[:rows, :in_dim] = mat[:, :in_dim]
    if affine:
        out[:rows, -1] = mat[:, -1]
    out[rows:, in_dim:in_dim + add] = np.eye(add)
    with kio.open_wxfilename(args[1]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, out.astype(np.float32))
    log.info("extend-transform-dim: (%d, %d) → %s", rows, cols,
             out.shape)
    return 0


# ---------------------------------------------------------------------------
# Batched nnet3 decoding (the fork-flagship batch shape).

@tool("nnet3-latgen-faster-batch")
def nnet3_latgen_faster_batch_tool(argv):
    """Batched lattice decoding: utterances padded into device
    batches, decoded by the vectorized sweep in one program
    (nnet3bin/nnet3-latgen-faster-batch.cc / the cudadecoder batch
    contract).  Falls back to per-utterance dense decode on small
    graphs."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.cli.tools_bank3 import _load_tdnn
    po = ParseOptions("nnet3-latgen-faster-batch [opts] <trans-model> "
                      "<raw-nnet3> <fst> <feats-rspec> <lat-wspec>")
    po.register("beam", float, 15.0, "decoding beam")
    po.register("lattice-beam", float, 8.0, "lattice beam")
    po.register("max-active", int, 7000, "max active states")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    po.register("batch-size", int, 8, "utterances per device batch")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    _cfg, fwd = _load_tdnn(args[1], 3)
    HCLG = _load_hclg(args[2])
    entries = [(k, np.asarray(m, np.float32)) for k, m in
               SequentialTableReader(args[3], holder="mat")]
    # score all utterances first (the nnet stage)
    lls = [(k, np.asarray(fwd(m[None]))[0]) for k, m in entries]
    if HCLG.num_states <= 20000:
        dec = _LatgenDecoder(HCLG, tm.tid_to_pdf_array, po["beam"],
                             po["lattice-beam"], po["acoustic-scale"],
                             max_active=po["max-active"])
        with TableWriter(args[4], holder="clat") as w:
            for k, ll in lls:
                w[k] = dec.decode_to_clat(ll)
        log.info("nnet3-latgen-faster-batch: %d utts (dense path)",
                 len(lls))
        return 0
    from kaldi_tpu.decoder.beam import BeamDecoder, BeamDecoderConfig
    from kaldi_tpu.fst.csr import pack_fst
    cap = max(po["max-active"], 512)
    dec = BeamDecoder(pack_fst(HCLG), tm.tid_to_pdf_array,
                      BeamDecoderConfig(
        beam=po["beam"], lattice_beam=po["lattice-beam"],
        acoustic_scale=po["acoustic-scale"],
        max_active=po["max-active"],
        lattice_arcs_per_frame=max(2 * cap, 4096)))
    B = po["batch-size"]
    n = 0
    with TableWriter(args[4], holder="clat") as w:
        for i in range(0, len(lls), B):
            chunk = lls[i:i + B]
            T_pad = int(np.ceil(max(len(x) for _k, x in chunk)
                                / 64) * 64)
            P = chunk[0][1].shape[1]
            X = np.zeros((len(chunk), T_pad, P), np.float32)
            lens = np.zeros(len(chunk), np.int32)
            for b, (_k, ll) in enumerate(chunk):
                X[b, :len(ll)] = ll
                lens[b] = len(ll)
            raws = dec.decode_lattice_batch(X, lens)
            from kaldi_tpu.lattice.determinize import \
                determinize_lattice_pruned
            for (k, _ll), raw in zip(chunk, raws):
                w[k] = determinize_lattice_pruned(
                    raw, po["lattice-beam"])
                n += 1
    log.info("nnet3-latgen-faster-batch: %d utts (batched beam path)",
             n)
    return 0


# ---------------------------------------------------------------------------
# OpenFst utility tail (shipped by tools/openfst, used in recipes).

@tool("fstprune")
def fstprune_tool(argv):
    """Weight-threshold pruning: drop arcs/states on no path within
    --weight of the best (OpenFst fstprune)."""
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.fst import VectorFst
    po = ParseOptions("fstprune [--weight=W] <fst-in> <fst-out>")
    po.register("weight", float, 10.0, "beam around the best path")
    args = po.read(argv)
    fst = _load_fst(args[0])
    n = fst.num_states
    INF = float("inf")
    # forward/backward shortest distances (acyclic or cyclic: use
    # Bellman-Ford-ish relaxation sweeps, bounded)
    alpha = np.full(n, INF)
    if fst.start >= 0:
        alpha[fst.start] = 0.0
    for _ in range(n):
        changed = False
        for s in range(n):
            if alpha[s] == INF:
                continue
            for a in fst.arcs[s]:
                c = alpha[s] + a.weight
                if c < alpha[a.nextstate] - 1e-12:
                    alpha[a.nextstate] = c
                    changed = True
        if not changed:
            break
    beta = np.full(n, INF)
    for s in range(n):
        fw = fst.final(s)
        if fw != INF:
            beta[s] = fw
    for _ in range(n):
        changed = False
        for s in range(n):
            for a in fst.arcs[s]:
                c = a.weight + beta[a.nextstate]
                if c < beta[s] - 1e-12:
                    beta[s] = c
                    changed = True
        if not changed:
            break
    best = alpha[fst.start] + beta[fst.start] if fst.start >= 0 else INF
    cutoff = best + po["weight"]
    out = VectorFst()
    keep = [s for s in range(n) if alpha[s] + beta[s] <= cutoff]
    new_id = {s: i for i, s in enumerate(keep)}
    for _ in keep:
        out.add_state()
    if fst.start in new_id:
        out.set_start(new_id[fst.start])
    from kaldi_tpu.fst.fst import Arc
    for s in keep:
        for a in fst.arcs[s]:
            if (a.nextstate in new_id
                    and alpha[s] + a.weight + beta[a.nextstate]
                    <= cutoff):
                out.add_arc(new_id[s], Arc(a.ilabel, a.olabel,
                                           a.weight,
                                           new_id[a.nextstate]))
        fw = fst.final(s)
        if fw != INF and alpha[s] + fw <= cutoff:
            out.set_final(new_id[s], fw)
    _save_fst(args[1], out)
    log.info("fstprune: %d → %d states", n, out.num_states)
    return 0


@tool("fstclosure")
def fstclosure_tool(argv):
    """Kleene closure: final states loop back to the start with their
    final weight; start becomes final (OpenFst fstclosure)."""
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.fst import Arc
    po = ParseOptions("fstclosure <fst-in> <fst-out>")
    args = po.read(argv)
    fst = _load_fst(args[0]).copy()
    INF = float("inf")
    if fst.start >= 0:
        for s in range(fst.num_states):
            fw = fst.final(s)
            if fw != INF:
                fst.add_arc(s, Arc(0, 0, fw, fst.start))
        fst.set_final(fst.start, 0.0)
    _save_fst(args[1], fst)
    return 0
