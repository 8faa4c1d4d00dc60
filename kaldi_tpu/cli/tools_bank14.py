"""Fourteenth bank of CLI tools: nnet3 xent egs plumbing and the
lattice long tail.

Canonical shapes mirrored (SURVEY.md §2.1 bins):
nnet3bin/{nnet3-init,nnet3-get-egs,nnet3-copy-egs,nnet3-shuffle-egs,
nnet3-merge-egs,nnet3-compute-prob,nnet3-align-compiled}.cc,
latbin/{lattice-align-phones,lattice-boost-ali,lattice-minimize,
lattice-combine}.cc.
"""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.cli.tools import tool
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


# ---------------------------------------------------------------------------
# nnet3 xent egs plumbing (get_egs.sh role for the non-chain trainer).

@tool("nnet3-init")
def nnet3_init_tool(argv):
    """Random-initialize a raw TDNN-F acoustic model
    (nnet3bin/nnet3-init.cc role; topology via flags like nnet3-train)."""
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.am.nnet3_io import write_raw_model
    from kaldi_tpu.am.tdnn import TdnnChain, TdnnConfig
    po = ParseOptions("nnet3-init [opts] <raw-out>")
    po.register("feat-dim", int, 0, "input dim (required)")
    po.register("num-pdfs", int, 0, "output dim (required)")
    po.register("hidden-dim", int, 256, "hidden layer dim")
    po.register("bottleneck-dim", int, 64, "TDNN-F bottleneck dim")
    po.register("num-layers", int, 5, "TDNN-F layers")
    po.register("srand", int, 0, "init seed")
    args = po.read(argv)
    if po["feat-dim"] <= 0 or po["num-pdfs"] <= 0:
        raise KaldiError("nnet3-init: --feat-dim and --num-pdfs required")
    cfg = TdnnConfig(feat_dim=po["feat-dim"], num_pdfs=po["num-pdfs"],
                     hidden_dim=po["hidden-dim"],
                     bottleneck_dim=po["bottleneck-dim"],
                     num_layers=po["num-layers"],
                     frame_subsampling_factor=1)
    net = TdnnChain(cfg)
    variables = net.init(jax.random.PRNGKey(po["srand"]),
                         jnp.zeros((2, 16, cfg.feat_dim)), train=False)
    write_raw_model(args[0], variables["params"],
                    variables.get("batch_stats", {}), cfg)
    return 0


@tool("nnet3-get-egs")
def nnet3_get_egs_tool(argv):
    """Cut feats + pdf alignments into fixed-size xent chunks
    (nnet3bin/nnet3-get-egs.cc)."""
    from kaldi_tpu.pipelines.egs_io import XentEg
    po = ParseOptions("nnet3-get-egs [--chunk-size=64] <feats-rspec> "
                      "<pdf-ali-rspec> <egs-wspec>")
    po.register("chunk-size", int, 64, "frames per chunk")
    args = po.read(argv)
    T = po["chunk-size"]
    ali_r = RandomAccessTableReader(args[1], holder="ivec")
    n = 0
    with TableWriter(args[2], holder="xeg") as w:
        for key, feats in SequentialTableReader(args[0], holder="mat"):
            if key not in ali_r:
                log.warning("nnet3-get-egs: no alignment for %s", key)
                continue
            feats = np.asarray(feats, np.float32)
            pdfs = np.asarray(ali_r[key], np.int32)
            if len(pdfs) != len(feats):
                raise KaldiError(f"{key}: ali/feats length mismatch")
            for i, lo in enumerate(range(0, len(feats) - T + 1, T)):
                w[f"{key}-{i}"] = XentEg(feats[lo:lo + T][None],
                                         pdfs[lo:lo + T][None])
                n += 1
            rem = len(feats) % T
            if rem >= T // 2:    # keep the tail chunk, left-extended
                w[f"{key}-tail"] = XentEg(feats[-T:][None],
                                          pdfs[-T:][None])
                n += 1
    log.info("nnet3-get-egs: wrote %d egs of %d frames", n, T)
    return 0


@tool("nnet3-copy-egs")
def nnet3_copy_egs_tool(argv):
    po = ParseOptions("nnet3-copy-egs [--n=-1] <egs-rspec> <egs-wspec>")
    po.register("n", int, -1, "copy only the first n (-1 = all)")
    args = po.read(argv)
    n = 0
    with TableWriter(args[1], holder="xeg") as w:
        for key, eg in SequentialTableReader(args[0], holder="xeg"):
            if po["n"] >= 0 and n >= po["n"]:
                break
            w[key] = eg
            n += 1
    log.info("copied %d egs", n)
    return 0


@tool("nnet3-shuffle-egs")
def nnet3_shuffle_egs_tool(argv):
    po = ParseOptions("nnet3-shuffle-egs [--srand=0] <egs-rspec> "
                      "<egs-wspec>")
    po.register("srand", int, 0, "shuffle seed")
    args = po.read(argv)
    entries = list(SequentialTableReader(args[0], holder="xeg"))
    order = np.random.default_rng(po["srand"]).permutation(len(entries))
    with TableWriter(args[1], holder="xeg") as w:
        for i in order:
            key, eg = entries[i]
            w[key] = eg
    return 0


@tool("nnet3-merge-egs")
def nnet3_merge_egs_tool(argv):
    """Batch consecutive same-length egs into minibatch egs
    (nnet3bin/nnet3-merge-egs.cc)."""
    from kaldi_tpu.pipelines.egs_io import XentEg
    po = ParseOptions("nnet3-merge-egs [--minibatch-size=32] "
                      "<egs-rspec> <egs-wspec>")
    po.register("minibatch-size", int, 32, "chunks per merged eg")
    args = po.read(argv)
    B = po["minibatch-size"]
    buf, n_out = [], 0

    def flush(w):
        nonlocal n_out
        if not buf:
            return
        feats = np.concatenate([e.feats for e in buf])
        pdfs = np.concatenate([e.pdfs for e in buf])
        w[f"mb-{n_out}"] = XentEg(feats, pdfs)
        n_out += 1
        buf.clear()

    with TableWriter(args[1], holder="xeg") as w:
        for _key, eg in SequentialTableReader(args[0], holder="xeg"):
            if buf and buf[0].feats.shape[1] != eg.feats.shape[1]:
                flush(w)
            buf.append(eg)
            if sum(e.feats.shape[0] for e in buf) >= B:
                flush(w)
        flush(w)
    log.info("nnet3-merge-egs: wrote %d minibatch egs", n_out)
    return 0


@tool("nnet3-compute-prob")
def nnet3_compute_prob_tool(argv):
    """Average per-frame log-probability + accuracy of a raw model on
    egs (nnet3bin/nnet3-compute-prob.cc; the train/valid diagnostic)."""
    import jax
    from kaldi_tpu.cli.tools_bank3 import _load_tdnn
    po = ParseOptions("nnet3-compute-prob <raw-model> <egs-rspec>")
    args = po.read(argv)
    _, fwd = _load_tdnn(args[0], 1)
    tot_lp, tot_correct, tot_frames = 0.0, 0, 0
    for _key, eg in SequentialTableReader(args[1], holder="xeg"):
        logits = np.asarray(fwd(eg.feats))           # (B, T, P)
        lp = jax.nn.log_softmax(logits, axis=-1)
        lp = np.asarray(lp)
        picked = np.take_along_axis(
            lp, eg.pdfs[..., None].astype(np.int64), axis=2)[..., 0]
        tot_lp += float(picked.sum())
        tot_correct += int((lp.argmax(-1) == eg.pdfs).sum())
        tot_frames += eg.pdfs.size
    if tot_frames == 0:
        raise KaldiError("nnet3-compute-prob: no egs")
    print(f"log-probability per frame {tot_lp / tot_frames:.4f} "
          f"accuracy {tot_correct / tot_frames:.4f} "
          f"over {tot_frames} frames")
    return 0


@tool("nnet3-align-compiled")
def nnet3_align_compiled_tool(argv):
    """Align utterances against per-utterance graphs with nnet3
    pseudo-loglikes (nnet3bin/nnet3-align-compiled.cc).  The transition
    model (tid→pdf map) comes from <model>; acoustic scores from the
    raw nnet."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.cli.tools_bank3 import _load_tdnn
    from kaldi_tpu.decoder.align import (DenseAligner, in_degrees,
                                         pack_dense_reverse)
    po = ParseOptions("nnet3-align-compiled [opts] <model> <raw-nnet> "
                      "<graphs-rspec> <feats-rspec> <ali-wspec>")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    args = po.read(argv)
    tm, _am = read_mdl(args[0])
    _, fwd = _load_tdnn(args[1], 1)
    graphs = dict(SequentialTableReader(args[2], holder="fst"))
    aligner = DenseAligner(tm.tid_to_pdf_array,
                           acoustic_scale=po["acoustic-scale"])
    ae = an = smax = 1
    for g in graphs.values():
        e, n = in_degrees(g)
        ae, an = max(ae, e), max(an, n)
        smax = max(smax, g.num_states)
    n_done = 0
    with TableWriter(args[4], holder="ivec") as w:
        for key, m in SequentialTableReader(args[3], holder="mat"):
            if key not in graphs:
                log.warning("nnet3-align-compiled: no graph for %s", key)
                continue
            g = pack_dense_reverse(graphs[key], smax, ae, an)
            ll = np.asarray(fwd(np.asarray(m, np.float32)[None]))[0]
            (tids, _cost), = aligner.align_batch([g], [ll])
            w[key] = np.asarray(tids, np.int32)
            n_done += 1
    log.info("nnet3-align-compiled: aligned %d utterances", n_done)
    return 0


# ---------------------------------------------------------------------------
# lattice long tail.

@tool("lattice-align-phones")
def lattice_align_phones_tool(argv):
    """Split lattice arcs at phone boundaries; olabels become phone ids
    with --replace-output-symbols (latbin/lattice-align-phones.cc)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.lattice.phone_align import phone_align_lattice
    po = ParseOptions("lattice-align-phones [opts] <model> <clat-rspec> "
                      "<clat-wspec>")
    po.register("replace-output-symbols", bool, True,
                "olabel = phone id on every arc")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    n = 0
    with TableWriter(args[2], holder="clat") as w:
        for key, clat in SequentialTableReader(args[1], holder="clat"):
            w[key] = phone_align_lattice(
                clat, tm,
                replace_output_symbols=po["replace-output-symbols"])
            n += 1
    log.info("lattice-align-phones: %d lattices", n)
    return 0


@tool("lattice-boost-ali")
def lattice_boost_ali_tool(argv):
    """Boosted MMI: decrease graph costs by b × #frame-phone-errors vs
    the numerator alignment (latbin/lattice-boost-ali.cc)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.lattice.phone_align import boost_lattice_ali
    po = ParseOptions("lattice-boost-ali [opts] <model> <clat-rspec> "
                      "<ali-rspec> <clat-wspec>")
    po.register("b", float, 0.05, "boosting constant")
    po.register("silence-phones", str, "", "colon-separated phone ids")
    po.register("max-silence", float, 0.0,
                "error contribution of each silence frame")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    sil = {int(p) for p in po["silence-phones"].split(":") if p}
    ali_r = RandomAccessTableReader(args[2], holder="ivec")
    n = 0
    with TableWriter(args[3], holder="clat") as w:
        for key, clat in SequentialTableReader(args[1], holder="clat"):
            if key not in ali_r:
                log.warning("lattice-boost-ali: no alignment for %s", key)
                continue
            try:
                w[key] = boost_lattice_ali(
                    clat, tm, np.asarray(ali_r[key]).tolist(), po["b"],
                    silence_phones=sil,
                    max_silence_error=po["max-silence"])
            except KaldiError as e:
                log.warning("lattice-boost-ali: skipping %s: %s", key, e)
                continue
            n += 1
    log.info("lattice-boost-ali: boosted %d lattices (b=%.3f)", n, po["b"])
    return 0


@tool("lattice-minimize")
def lattice_minimize_tool(argv):
    """Suffix-sharing minimization of compact lattices
    (latbin/lattice-minimize.cc)."""
    from kaldi_tpu.lattice.phone_align import minimize_lattice
    po = ParseOptions("lattice-minimize <clat-rspec> <clat-wspec>")
    args = po.read(argv)
    n_states_in = n_states_out = 0
    with TableWriter(args[1], holder="clat") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            out = minimize_lattice(clat)
            n_states_in += clat.num_states
            n_states_out += out.num_states
            w[key] = out
    log.info("lattice-minimize: %d -> %d states", n_states_in,
             n_states_out)
    return 0


@tool("lattice-combine")
def lattice_combine_tool(argv):
    """System combination: union of per-system lattices with the
    posterior scales folded into graph costs
    (latbin/lattice-combine.cc)."""
    import math
    from kaldi_tpu.lattice.lattice import CompactArc
    from kaldi_tpu.lattice.ops import lattice_union
    po = ParseOptions("lattice-combine [--lat-weights=w1:w2:...] "
                      "<clat-rspec1> <clat-rspec2> [...] <clat-wspec>")
    po.register("lat-weights", str, "", "per-system posterior weights")
    args = po.read(argv)
    if len(args) < 3:
        po.print_usage()
        return 1
    n_sys = len(args) - 1
    weights = ([float(x) for x in po["lat-weights"].split(":")]
               if po["lat-weights"] else [1.0 / n_sys] * n_sys)
    if len(weights) != n_sys:
        raise KaldiError("lattice-combine: #weights != #systems")

    def scaled(clat, wgt):
        out = type(clat)()
        for _ in range(clat.num_states):
            out.add_state()
        out.start = clat.start
        add = -math.log(max(wgt, 1e-30))
        for s in range(clat.num_states):
            first = s == clat.start
            for a in clat.arcs[s]:
                out.arcs[s].append(CompactArc(
                    a.word, a.graph_cost + (add if first else 0.0),
                    a.acoustic_cost, a.tids, a.nextstate))
            if s in clat.finals:
                gc, ac, tids = clat.finals[s]
                out.finals[s] = (gc + (add if first else 0.0), ac, tids)
        return out

    readers = [RandomAccessTableReader(a, holder="clat")
               for a in args[1:-1]]
    n = 0
    with TableWriter(args[-1], holder="clat") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            out = scaled(clat, weights[0])
            for i, r in enumerate(readers):
                if key in r:
                    out = lattice_union(out, scaled(r[key],
                                                    weights[i + 1]))
            w[key] = out
            n += 1
    log.info("lattice-combine: combined %d keys from %d systems",
             n, n_sys)
    return 0
