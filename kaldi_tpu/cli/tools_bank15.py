"""Fifteenth bank of CLI tools: basis fMLLR and FST-input training
graphs.

Canonical shapes mirrored (SURVEY.md §2.1 bins):
gmmbin/{gmm-basis-fmllr-accs,gmm-basis-fmllr-training,
gmm-est-basis-fmllr}.cc, bin/compile-train-graphs-fsts.cc.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from kaldi_tpu.cli.tools import tool
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


@tool("gmm-basis-fmllr-accs")
def gmm_basis_fmllr_accs_tool(argv):
    """Accumulate the gradient scatter for basis-fMLLR training from
    per-utterance fMLLR stats (gmmbin/gmm-basis-fmllr-accs.cc; here the
    supervision is a pdf alignment rather than posteriors)."""
    from kaldi_tpu.am.basis_fmllr import GradientScatter, write_scatter
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.am.transforms import FmllrAccs, accumulate_fmllr_for_utt
    from kaldi_tpu.core import io as kio
    po = ParseOptions("gmm-basis-fmllr-accs <model> <feats-rspec> "
                      "<pdf-ali-rspec> <scatter-out>")
    args = po.read(argv)
    _tm, am = read_mdl(args[0])
    ali_r = RandomAccessTableReader(args[2], holder="ivec")
    sc = GradientScatter(am.dim)
    for key, feats in SequentialTableReader(args[1], holder="mat"):
        if key not in ali_r:
            continue
        accs = FmllrAccs(am.dim)
        accumulate_fmllr_for_utt(accs, am, np.asarray(feats),
                                 np.asarray(ali_r[key], np.int32))
        sc.accumulate(accs)
    with kio.open_wxfilename(args[3]) as f:
        kio.init_kaldi_output_stream(f)
        write_scatter(f, sc)
    log.info("gmm-basis-fmllr-accs: %d utterances, %.0f frames",
             sc.count, sc.beta)
    return 0


@tool("gmm-basis-fmllr-training")
def gmm_basis_fmllr_training_tool(argv):
    """Estimate the fMLLR basis from accumulated gradient scatters
    (gmmbin/gmm-basis-fmllr-training.cc)."""
    from kaldi_tpu.am.basis_fmllr import (read_scatter, train_basis,
                                          write_basis)
    from kaldi_tpu.core import io as kio
    po = ParseOptions("gmm-basis-fmllr-training [--num-bases=N] "
                      "<basis-out> <scatter-in1> [...]")
    po.register("num-bases", int, 0, "bases to keep (0 = all)")
    args = po.read(argv)
    sc = None
    for path in args[1:]:
        with kio.open_rxfilename(path) as f:
            kio.init_kaldi_input_stream(f)
            s = read_scatter(f)
        if sc is None:
            sc = s
        else:
            sc.scatter += s.scatter
            sc.precond += s.precond
            sc.beta += s.beta
            sc.count += s.count
    basis = train_basis(sc, po["num-bases"] or None)
    with kio.open_wxfilename(args[0]) as f:
        kio.init_kaldi_output_stream(f)
        write_basis(f, basis)
    return 0


@tool("gmm-est-basis-fmllr")
def gmm_est_basis_fmllr_tool(argv):
    """Per-speaker basis-fMLLR transforms; basis count grows with the
    speaker's frame count (gmmbin/gmm-est-basis-fmllr.cc)."""
    from kaldi_tpu.am.basis_fmllr import estimate_basis_fmllr, read_basis
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.am.transforms import FmllrAccs, accumulate_fmllr_for_utt
    from kaldi_tpu.core import io as kio
    po = ParseOptions("gmm-est-basis-fmllr [--spk2utt=rspec] "
                      "[--size-scale=0.2] <model> <basis-in> "
                      "<feats-rspec> <pdf-ali-rspec> <trans-wspec>")
    po.register("spk2utt", str, "", "speaker→utt map file (text)")
    po.register("size-scale", float, 0.2, "bases per frame of data")
    args = po.read(argv)
    _tm, am = read_mdl(args[0])
    with kio.open_rxfilename(args[1]) as f:
        kio.init_kaldi_input_stream(f)
        basis = read_basis(f)
    feats = dict(SequentialTableReader(args[2], holder="mat"))
    ali_r = RandomAccessTableReader(args[3], holder="ivec")
    groups: Dict[str, List[str]] = {}
    if po["spk2utt"]:
        with open(po["spk2utt"]) as f:
            for line in f:
                parts = line.split()
                if parts:
                    groups[parts[0]] = parts[1:]
    else:
        groups = {u: [u] for u in feats}
    n_spk, tot_impr = 0, 0.0
    with TableWriter(args[4], holder="mat") as w:
        for spk, utts in groups.items():
            accs = FmllrAccs(am.dim)
            n = 0
            for u in utts:
                if u not in feats or u not in ali_r:
                    continue
                accumulate_fmllr_for_utt(
                    accs, am, np.asarray(feats[u]),
                    np.asarray(ali_r[u], np.int32))
                n += 1
            if not n:
                continue
            W, impr, n_bases = estimate_basis_fmllr(
                accs, basis, size_scale=po["size-scale"])
            w[spk] = W.astype(np.float32)
            tot_impr += impr
            n_spk += 1
            log.info("gmm-est-basis-fmllr: spk %s: %d bases, objf-impr "
                     "%.4f/frame over %.0f frames", spk, n_bases, impr,
                     accs.beta)
    log.info("gmm-est-basis-fmllr: %d speakers, avg impr %.4f", n_spk,
             tot_impr / max(n_spk, 1))
    return 0


@tool("compile-train-graphs-fsts")
def compile_train_graphs_fsts_tool(argv):
    """Per-utterance training graphs from per-utterance G FSTs instead
    of transcripts (bin/compile-train-graphs-fsts.cc; the biased-LM /
    segmentation path)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.cli.tools_bank3 import _lang_from_lexicon
    from kaldi_tpu.fst.hclg import mkgraph
    po = ParseOptions("compile-train-graphs-fsts [opts] <lexicon.txt> "
                      "<model> <fsts-rspec> <graphs-wspec>")
    po.register("transition-scale", float, 1.0, "transition scale")
    po.register("self-loop-scale", float, 0.1, "self-loop scale")
    po.register("sil-phone", str, "SIL", "optional-silence phone")
    args = po.read(argv)
    lang = _lang_from_lexicon(args[0], po["sil-phone"])
    tm, _ = read_mdl(args[1])
    n = 0
    with TableWriter(args[3], holder="fst") as w:
        for key, G in SequentialTableReader(args[2], holder="fst"):
            w[key] = mkgraph(lang, tm, G,
                             transition_scale=po["transition-scale"],
                             self_loop_scale=po["self-loop-scale"])
            n += 1
    log.info("compile-train-graphs-fsts: %d graphs", n)
    return 0
