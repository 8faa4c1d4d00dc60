"""Sixth bank of CLI tools: nnet3 model configuration (xconfig).

Canonical shapes mirrored: egs/wsj/s5/steps/nnet3/xconfig_to_configs.py
(the script every nnet3/chain recipe calls to expand its model
definition) — here the expansion target is the flax interpreter in
am/xconfig.py rather than nnet3 config-file text, so the tool's job is
validation + the per-layer dimension report the reference script
prints, plus writing the parsed form where the recipe expects it.
"""

from __future__ import annotations

import os
import sys

from kaldi_tpu.cli.tools import tool
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions

log = get_logger(__name__)


@tool("gmm-adapt-map")
def gmm_adapt_map_tool(argv):
    """MAP mean adaptation of a GMM model to new data.

    Usage: gmm-adapt-map [opts] <model-in> <feats-rspec> <ali-rspec>
           <model-out>"""
    import numpy as np
    from kaldi_tpu.am.gmm import GmmAccs, accumulate_stats, map_update
    from kaldi_tpu.am.serialize import read_mdl, write_mdl
    from kaldi_tpu.core.table import (RandomAccessTableReader,
                                      SequentialTableReader)
    po = ParseOptions(
        "gmm-adapt-map [opts] <model-in> <feats-rspec> <ali-rspec> "
        "<model-out>")
    po.register("mean-tau", float, 10.0, "prior count for means")
    po.register("weight-tau", float, 0.0, "prior count for weights "
                "(0 = no weight update)")
    po.register("var-tau", float, 0.0, "prior count for variances "
                "(0 = no variance update)")
    args = po.read(argv)
    if len(args) != 4:
        po.print_usage()
        return 1
    tm, am = read_mdl(args[0])
    feats = RandomAccessTableReader(args[1], holder="mat")
    accs = GmmAccs.zeros(am.num_pdfs, am.means.shape[1],
                         am.means.shape[2])
    n = 0
    for key, tids in SequentialTableReader(args[2], holder="ivec"):
        if key not in feats:
            continue
        pdfs = tm.tid_to_pdf_array[np.asarray(tids, np.int64)]
        accumulate_stats(am, np.asarray(feats[key]), pdfs, accs)
        n += 1
    map_update(am, accs, mean_tau=po["mean-tau"],
               weight_tau=po["weight-tau"], var_tau=po["var-tau"])
    write_mdl(args[3], tm, am)
    log.info("MAP-adapted on %d utterances", n)
    return 0


@tool("fstshortestpath")
def fstshortestpath_tool(argv):
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.fst import Arc, VectorFst
    from kaldi_tpu.fst.ops import shortest_path
    po = ParseOptions("fstshortestpath <fst-in> <fst-out>")
    args = po.read(argv)
    arcs, cost = shortest_path(_load_fst(args[0]))
    out = VectorFst()
    s = out.add_state()
    out.set_start(s)
    for a in arcs:
        n = out.add_state()
        out.add_arc(s, Arc(a.ilabel, a.olabel, a.weight, n))
        s = n
    out.set_final(s, 0.0)
    _save_fst(args[1] if len(args) > 1 else "/dev/stdout", out)
    return 0


@tool("fstpush")
def fstpush_tool(argv):
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.ops import push_weights
    po = ParseOptions("fstpush [--push-weights=true] <fst-in> <fst-out>")
    po.register("push-weights", bool, True, "push weights to initial")
    args = po.read(argv)
    f = _load_fst(args[0])
    if po["push-weights"]:
        f = push_weights(f)
    _save_fst(args[1] if len(args) > 1 else "/dev/stdout", f)
    return 0


@tool("fstreverse")
def fstreverse_tool(argv):
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.ops import reverse
    po = ParseOptions("fstreverse <fst-in> <fst-out>")
    args = po.read(argv)
    _save_fst(args[1] if len(args) > 1 else "/dev/stdout",
              reverse(_load_fst(args[0])))
    return 0


@tool("sgmm2-est")
def sgmm2_est_tool(argv):
    """One SGMM2 EM iteration from feats + pdf alignments on disk.

    Usage: sgmm2-est [opts] <feats-rspec> <pdf-ali-rspec>
    Prints per-iteration average loglike (model I/O flows through the
    library; this tool is the trainer stage of steps/train_sgmm2.sh)."""
    import numpy as np
    from kaldi_tpu.am.sgmm2 import train_sgmm
    from kaldi_tpu.core.table import (RandomAccessTableReader,
                                      SequentialTableReader)
    po = ParseOptions("sgmm2-est [opts] <feats-rspec> <pdf-ali-rspec>")
    po.register("num-gauss", int, 8, "shared Gaussians")
    po.register("subspace-dim", int, 4, "state-vector dimension")
    po.register("num-iters", int, 6, "EM iterations")
    args = po.read(argv)
    feats_r = RandomAccessTableReader(args[0], holder="mat")
    ali = {k: np.asarray(v, np.int32) for k, v in
           SequentialTableReader(args[1], holder="ivec")}
    feats = {k: np.asarray(feats_r[k]) for k in sorted(ali)
             if k in feats_r}
    num_pdfs = int(max(a.max() for a in ali.values())) + 1
    _, likes = train_sgmm(feats, ali, num_pdfs=num_pdfs,
                          num_gauss=po["num-gauss"],
                          subspace=po["subspace-dim"],
                          num_iters=po["num-iters"])
    log.info("sgmm2-est: final avg loglike %.4f", likes[-1])
    return 0


@tool("gmm-latgen-biglm-faster")
def gmm_latgen_biglm_faster_tool(argv):
    """Decode with on-the-fly big-LM composition (difference LM).

    Usage: gmm-latgen-biglm-faster [opts] <model> <fst> <old-arpa>
           <new-arpa> <feats-rspec> <words-wspec>
    <fst> is the HCLG compiled with the OLD (small) LM; word scores are
    swapped for the new LM's during the search."""
    import numpy as np
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.core.table import SequentialTableReader, TableWriter
    from kaldi_tpu.decoder.biglm import (BiglmDecoderConfig,
                                         BiglmFasterDecoder)
    from kaldi_tpu.fst.arpa import ArpaModel
    from kaldi_tpu.fst.fst import SymbolTable, VectorFst
    po = ParseOptions(
        "gmm-latgen-biglm-faster [opts] <model> <fst> <old-arpa> "
        "<new-arpa> <feats-rspec> <words-wspec>")
    po.register("beam", float, 13.0, "decoding beam")
    po.register("max-active", int, 7000, "max active tokens")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("word-symbol-table", str, "", "words.txt (REQUIRED)")
    args = po.read(argv)
    if len(args) != 6 or not po["word-symbol-table"]:
        po.print_usage()
        return 1
    tm, am = read_mdl(args[0])
    import struct as _struct
    with open(args[1], "rb") as _fh:
        _bin = _fh.read(4) == _struct.pack("<i", 2125659606)
    if _bin:
        from kaldi_tpu.fst.openfst_io import read_fst_path
        HCLG = read_fst_path(args[1])
    else:
        HCLG = VectorFst.read_text(args[1])
    old_lm = ArpaModel.parse(args[2])
    new_lm = ArpaModel.parse(args[3])
    words = SymbolTable.read(po["word-symbol-table"])
    dec = BiglmFasterDecoder(
        HCLG, tm.tid_to_pdf_array, old_lm.score, new_lm.score, words,
        BiglmDecoderConfig(beam=po["beam"], max_active=po["max-active"],
                           acoustic_scale=po["acoustic-scale"],
                           history_len=max(new_lm.order - 1, 1)))
    n = 0
    with TableWriter(args[5], holder="text") as w:
        for key, feats in SequentialTableReader(args[4], holder="mat"):
            ll = np.asarray(am.loglikes(np.asarray(feats)))
            _, ols, cost = dec.decode(ll)
            text = [words.find(o) for o in ols]
            w[key] = text
            log.info("%s: %s (cost %.2f)", key, " ".join(text), cost)
            n += 1
    log.info("decoded %d utterances with big-LM composition", n)
    return 0


@tool("nnet3-chain-get-egs")
def nnet3_chain_get_egs_tool(argv):
    """Cut aligned utterances into fixed-size chain training chunks.

    Usage: nnet3-chain-get-egs [opts] <chain-mdl> <feats-rspec>
           <ali-rspec> <egs-wspec>
    The model supplies the chain topology/tree; the denominator phone
    LM (for normalization weights) is estimated from the alignments
    themselves (chain-est-phone-lm + get_egs.sh in one stage)."""
    import numpy as np
    from kaldi_tpu.am.chain import make_denominator_graph
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.core.table import (RandomAccessTableReader,
                                      SequentialTableReader)
    from kaldi_tpu.pipelines.chain import (make_chain_egs,
                                           phone_alignment_runs)
    from kaldi_tpu.pipelines.egs_io import write_egs_ark
    po = ParseOptions(
        "nnet3-chain-get-egs [opts] <chain-mdl> <feats-rspec> "
        "<ali-rspec> <egs-wspec>")
    po.register("chunk-size", int, 96, "frames per chunk")
    po.register("frame-subsampling-factor", int, 3, "chain ×3")
    po.register("lm-order", int, 3, "denominator phone-LM order")
    po.register("ali-model", str, "",
                "model whose topology produced <ali-rspec> (the GMM "
                "that aligned the data — chain supervision is "
                "phone-level, so the alignment may come from a "
                "different topology than the chain model; default: "
                "the chain model itself)")
    args = po.read(argv)
    if len(args) != 4:
        po.print_usage()
        return 1
    tm, _am = read_mdl(args[0])
    ali_tm = read_mdl(po["ali-model"])[0] if po["ali-model"] else tm
    ali = {k: np.asarray(v) for k, v in
           SequentialTableReader(args[2], holder="ivec")}
    feats_r = RandomAccessTableReader(args[1], holder="mat")
    feats = {k: np.asarray(feats_r[k]) for k in sorted(ali)
             if k in feats_r}
    runs = {k: phone_alignment_runs(ali_tm, ali[k]) for k in feats}
    phone_seqs = [[p for p, _ in runs[k]] for k in sorted(runs)]
    den = make_denominator_graph(phone_seqs, tm.tree, tm.topo,
                                 order=po["lm-order"])
    egs = make_chain_egs(feats, runs, tm.tree, tm.topo,
                         chunk_size=po["chunk-size"],
                         subsample=po["frame-subsampling-factor"],
                         den=den)
    write_egs_ark(args[3], egs)
    return 0


@tool("nnet3-chain-copy-egs")
def nnet3_chain_copy_egs_tool(argv):
    from kaldi_tpu.core.table import SequentialTableReader, TableWriter
    po = ParseOptions(
        "nnet3-chain-copy-egs [--n=-1] <egs-rspec> <egs-wspec>")
    po.register("n", int, -1, "copy only the first n (-1 = all)")
    args = po.read(argv)
    n = 0
    with TableWriter(args[1], holder="ceg") as w:
        for key, eg in SequentialTableReader(args[0], holder="ceg"):
            if po["n"] >= 0 and n >= po["n"]:
                break
            w[key] = eg
            n += 1
    log.info("copied %d chain egs", n)
    return 0


@tool("nnet3-chain-shuffle-egs")
def nnet3_chain_shuffle_egs_tool(argv):
    import numpy as np
    from kaldi_tpu.core.table import SequentialTableReader, TableWriter
    po = ParseOptions(
        "nnet3-chain-shuffle-egs [--srand=0] <egs-rspec> <egs-wspec>")
    po.register("srand", int, 0, "shuffle seed")
    args = po.read(argv)
    entries = list(SequentialTableReader(args[0], holder="ceg"))
    order = np.random.default_rng(po["srand"]).permutation(len(entries))
    with TableWriter(args[1], holder="ceg") as w:
        for i in order:
            key, eg = entries[i]
            w[key] = eg
    log.info("shuffled %d chain egs (srand %d)", len(entries),
             po["srand"])
    return 0


@tool("xconfig-to-configs")
def xconfig_to_configs_tool(argv):
    """Validate an xconfig file and report per-layer output dims.

    Usage: xconfig-to-configs --xconfig-file=<f> --config-dir=<dir>
    Writes <dir>/final.xconfig (the canonical copy recipes load) and
    <dir>/network.txt (layer table); prints the table to stderr."""
    po = ParseOptions(
        "xconfig-to-configs --xconfig-file=<file> --config-dir=<dir>")
    po.register("xconfig-file", str, "", "input xconfig file")
    po.register("config-dir", str, "", "output directory")
    po.register("frame-subsampling-factor", int, 1,
                "time subsampling before output layers (chain ×3)")
    po.read(argv)
    if not po["xconfig-file"] or not po["config-dir"]:
        po.print_usage()
        return 1
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.am.xconfig import model_from_xconfig

    with open(po["xconfig-file"]) as f:
        text = f.read()
    model, in_dim, out_dims = model_from_xconfig(
        text, frame_subsampling_factor=po["frame-subsampling-factor"])

    # init once (validates the network builds + counts parameters);
    # per-layer output dims are statically known from each layer's
    # options, so the table needs no re-tracing
    x = jnp.zeros((1, 21, in_dim), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    dims = {}
    for line in model.lines:
        lt, name = line.layer_type, line.name
        if lt == "input":
            dims[name] = in_dim
        elif lt in ("relu-batchnorm-layer", "relu-renorm-layer",
                    "tdnnf-layer", "attention-relu-batchnorm-layer",
                    "output-layer"):
            dims[name] = line.opt_int("dim")
        elif lt == "conv-relu-batchnorm-layer":
            h_in = line.opt_int("height-in")
            sub = line.opt_int("height-subsample-out", 1)
            dims[name] = ((h_in - 1) // sub + 1) * \
                line.opt_int("num-filters-out")
        elif lt == "fast-lstmp-layer":
            dims[name] = line.opt_int(
                "recurrent-projection-dim",
                max(line.opt_int("cell-dim") // 2, 1))
        elif lt == "stats-layer":
            cfg = line.opt("config", "mean+stddev(-99:3:9:99)")
            prev = [n for n in dims][-1]
            dims[name] = dims[prev] * (2 if "stddev" in cfg else 1)
        else:
            prev = [n for n in dims][-1]
            dims[name] = dims[prev]

    os.makedirs(po["config-dir"], exist_ok=True)
    with open(os.path.join(po["config-dir"], "final.xconfig"), "w") as f:
        f.write(text)
    rows = ["# name type dim"]
    for line in model.lines:
        rows.append(f"{line.name} {line.layer_type} {dims[line.name]}")
    with open(os.path.join(po["config-dir"], "network.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")
    num_params = sum(
        int(v.size) for v in jax.tree_util.tree_leaves(variables))
    for r in rows:
        log.info("%s", r)
    log.info("xconfig-to-configs: %d layers, %d parameters, outputs %s",
             len(model.lines), num_params, out_dims)
    return 0
