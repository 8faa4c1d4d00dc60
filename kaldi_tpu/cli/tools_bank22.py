"""Twenty-second bank of CLI tools: the fMPE family (feature-space
discriminative training) and the gmmbin adaptation/decode tail.

Canonical shapes mirrored (SURVEY.md §2.1 bins):
featbin/{fmpe-init, fmpe-acc-stats, fmpe-est, fmpe-copy,
fmpe-sum-accs, fmpe-apply-transform}.cc,
gmmbin/{gmm-fmpe-acc-stats, gmm-acc-stats-twofeats, gmm-decode-simple,
gmm-decode-faster-regtree-fmllr, gmm-decode-faster-regtree-mllr,
gmm-est-fmllr-global, gmm-est-regtree-fmllr-ali, gmm-latgen-map,
gmm-transform-means-global, gmm-init-biphone}.cc.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from kaldi_tpu.cli.tools import tool, _load_hclg
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


# ---------------------------------------------------------------------------
# fMPE (am/fmpe.py)
# ---------------------------------------------------------------------------

def _write_fmpe_accs(path, accs):
    from kaldi_tpu.am.serialize import write_pytree
    from kaldi_tpu.core import io as kio
    with kio.open_wxfilename(path) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<FmpeAccs>")
        write_pytree(f, {"pos": accs.pos, "neg": accs.neg})
        kio.write_token(f, "</FmpeAccs>")


def _read_fmpe_accs(path):
    from kaldi_tpu.am.fmpe import FmpeAccs
    from kaldi_tpu.am.serialize import read_pytree
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(path) as f:
        kio.init_kaldi_input_stream(f)
        kio.expect_token(f, "<FmpeAccs>")
        d = read_pytree(f)
        kio.expect_token(f, "</FmpeAccs>")
    return FmpeAccs(np.asarray(d["pos"], np.float64),
                    np.asarray(d["neg"], np.float64))


@tool("fmpe-init")
def fmpe_init_tool(argv):
    """Zero-projection fMPE object from a (global) diagonal UBM
    (featbin/fmpe-init.cc)."""
    from kaldi_tpu.am.fmpe import fmpe_init, write_fmpe
    from kaldi_tpu.cli.tools_bank5 import _read_global_gmm
    po = ParseOptions("fmpe-init [opts] <diag-ubm> <fmpe-out>")
    po.register("gselect-n", int, 5, "Gaussians selected per frame")
    po.register("context", int, 1, "offset smoothing half-width")
    args = po.read(argv)
    ubm = _read_global_gmm(args[0])
    write_fmpe(args[1], fmpe_init(ubm, gselect_n=po["gselect-n"],
                                  context=po["context"]))
    log.info("fmpe-init: %d gaussians, dim %d", ubm.num_gauss(),
             ubm.dim)
    return 0


def _fmpe_acc_flow(argv, name: str):
    """Shared body of fmpe-acc-stats / gmm-fmpe-acc-stats: model +
    fmpe + ORIGINAL feats + differenced (num−den) posteriors → accs.
    The posteriors are tid-level (ali-to-post / lattice-to-mpe-post
    convention) and converted to pdf-level here."""
    from kaldi_tpu.am.fmpe import (FmpeAccs, accumulate_fmpe,
                                   apply_fmpe, read_fmpe)
    from kaldi_tpu.am.serialize import read_mdl
    po = ParseOptions(f"{name} [opts] <model> <fmpe> <feats-rspec> "
                      "<post-rspec> <accs-out>")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    fm = read_fmpe(args[1])
    post_r = RandomAccessTableReader(args[3], holder="post")
    accs = FmpeAccs.zeros(fm.num_gauss, fm.dim)
    n = 0
    for key, feats in SequentialTableReader(args[2], holder="mat"):
        if key not in post_r:
            log.warning("%s: no posteriors for %s", name, key)
            continue
        pdf_post = [[(tm.transition_id_to_pdf(tid), w)
                     for tid, w in frame] for frame in post_r[key]]
        x = np.asarray(feats, np.float32)
        accumulate_fmpe(fm, am, apply_fmpe(fm, x), pdf_post, accs)
        n += 1
    _write_fmpe_accs(args[4], accs)
    log.info("%s: %d utterances", name, n)
    return 0


@tool("fmpe-acc-stats")
def fmpe_acc_stats_tool(argv):
    """fMPE gradient stats (featbin/fmpe-acc-stats.cc)."""
    return _fmpe_acc_flow(argv, "fmpe-acc-stats")


@tool("gmm-fmpe-acc-stats")
def gmm_fmpe_acc_stats_tool(argv):
    """GMM-side fMPE stats accumulation (gmmbin/gmm-fmpe-acc-stats.cc
    — same flow as fmpe-acc-stats in this implementation: the model's
    Gaussians supply the feature-space differential either way)."""
    return _fmpe_acc_flow(argv, "gmm-fmpe-acc-stats")


@tool("fmpe-sum-accs")
def fmpe_sum_accs_tool(argv):
    po = ParseOptions("fmpe-sum-accs <accs-out> <accs-in1> "
                      "[<accs-in2> ...]")
    args = po.read(argv)
    total = _read_fmpe_accs(args[1])
    for p in args[2:]:
        total = total + _read_fmpe_accs(p)
    _write_fmpe_accs(args[0], total)
    log.info("fmpe-sum-accs: %d inputs", len(args) - 1)
    return 0


@tool("fmpe-est")
def fmpe_est_tool(argv):
    """Projection update M += lr·(pos−neg)/(pos+neg)
    (featbin/fmpe-est.cc)."""
    from kaldi_tpu.am.fmpe import fmpe_update, read_fmpe, write_fmpe
    po = ParseOptions("fmpe-est [opts] <fmpe-in> <accs-in> <fmpe-out>")
    po.register("learning-rate", float, 0.1, "per-element step bound")
    args = po.read(argv)
    fm = read_fmpe(args[0])
    step = fmpe_update(fm, _read_fmpe_accs(args[1]),
                       learning_rate=po["learning-rate"])
    write_fmpe(args[2], fm)
    log.info("fmpe-est: mean |step| %.6f", step)
    return 0


@tool("fmpe-copy")
def fmpe_copy_tool(argv):
    from kaldi_tpu.am.fmpe import read_fmpe, write_fmpe
    po = ParseOptions("fmpe-copy <fmpe-in> <fmpe-out>")
    args = po.read(argv)
    write_fmpe(args[1], read_fmpe(args[0]))
    return 0


@tool("fmpe-apply-transform")
def fmpe_apply_transform_tool(argv):
    """feats + learned offsets (featbin/fmpe-apply-transform.cc)."""
    from kaldi_tpu.am.fmpe import apply_fmpe, read_fmpe
    po = ParseOptions("fmpe-apply-transform <fmpe> <feats-rspec> "
                      "<feats-wspec>")
    args = po.read(argv)
    fm = read_fmpe(args[0])
    n = 0
    with TableWriter(args[2], holder="mat") as w:
        for key, feats in SequentialTableReader(args[1], holder="mat"):
            w[key] = apply_fmpe(fm, np.asarray(feats, np.float32))
            n += 1
    log.info("fmpe-apply-transform: %d utterances", n)
    return 0


# ---------------------------------------------------------------------------
# gmmbin tail
# ---------------------------------------------------------------------------

@tool("gmm-acc-stats-twofeats")
def gmm_acc_stats_twofeats_tool(argv):
    """Posteriors on one feature stream, stats on another
    (gmmbin/gmm-acc-stats-twofeats.cc — the SAT alimdl stage of
    steps/train_sat.sh)."""
    from kaldi_tpu.am.gmm import GmmAccs, accumulate_stats_twofeats
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.cli.tools_extra import write_gmm_accs
    po = ParseOptions("gmm-acc-stats-twofeats <model> <feats1-rspec> "
                      "<feats2-rspec> <ali-rspec> <accs-out>")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    f2 = RandomAccessTableReader(args[2], holder="mat")
    ali_r = RandomAccessTableReader(args[3], holder="ivec")
    accs = GmmAccs.zeros(am.num_pdfs, am.max_mix, am.dim)
    n = 0
    for key, feats in SequentialTableReader(args[1], holder="mat"):
        if key not in f2 or key not in ali_r:
            continue
        tids = np.asarray(ali_r[key], np.int64)
        pdf_ali = tm.tid_to_pdf_array[tids]
        accumulate_stats_twofeats(am, np.asarray(feats, np.float32),
                                  np.asarray(f2[key], np.float32),
                                  pdf_ali, accs)
        n += 1
    write_gmm_accs(args[4], accs)
    log.info("gmm-acc-stats-twofeats: %d utterances", n)
    return 0


@tool("gmm-decode-simple")
def gmm_decode_simple_tool(argv):
    """Unpruned reference decode (gmmbin/gmm-decode-simple.cc,
    SimpleDecoder — the oracle decoders are validated against)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.decoder.simple import SimpleDecoder
    from kaldi_tpu.fst.fst import SymbolTable
    po = ParseOptions("gmm-decode-simple [opts] <model> <fst> "
                      "<feats-rspec> <words-wspec> [<ali-wspec>]")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("word-symbol-table", str, "", "words.txt")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    fst_obj = _load_hclg(args[1])
    dec = SimpleDecoder(fst_obj, acoustic_scale=po["acoustic-scale"])
    words_tab = (SymbolTable.read(po["word-symbol-table"])
                 if po["word-symbol-table"] else None)
    awriter = (TableWriter(args[4], holder="ivec")
               if len(args) > 4 else None)
    n = 0
    with TableWriter(args[3], holder="text") as w:
        for key, feats in SequentialTableReader(args[2], holder="mat"):
            ll = np.asarray(am.loglikes(np.asarray(feats, np.float32)))
            tids, ols, _cost = dec.decode(ll, tm.tid_to_pdf_array)
            w[key] = [words_tab.find(o) if words_tab else str(o)
                      for o in ols]
            if awriter:
                awriter[key] = np.asarray(tids, np.int32)
            n += 1
    if awriter:
        awriter.close()
    log.info("gmm-decode-simple: %d utterances", n)
    return 0


def _regtree_decode(argv, name: str):
    """Shared body of gmm-decode-faster-regtree-{fmllr,mllr}: apply
    the per-speaker regression-tree transform (root transform as
    written by gmm-est-regtree-*) to features, then decode."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.am.transforms import apply_transform
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.fst.fst import SymbolTable
    po = ParseOptions(f"{name} [opts] <model> <fst> "
                      "<transforms-rspec> <feats-rspec> <words-wspec>")
    po.register("beam", float, 16.0, "decoding beam")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("utt2spk", str, "", "utterance→speaker map rspec")
    po.register("word-symbol-table", str, "", "words.txt")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    HCLG = _load_hclg(args[1])
    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array, DenseDecoderConfig(
        beam=po["beam"], acoustic_scale=po["acoustic-scale"]))
    trans = RandomAccessTableReader(args[2], holder="mat")
    utt2spk = {}
    if po["utt2spk"]:
        for u, s in SequentialTableReader(po["utt2spk"], holder="text"):
            utt2spk[u] = s[0]
    words_tab = (SymbolTable.read(po["word-symbol-table"])
                 if po["word-symbol-table"] else None)
    n = 0
    with TableWriter(args[4], holder="text") as w:
        for key, feats in SequentialTableReader(args[3], holder="mat"):
            spk = utt2spk.get(key, key)
            x = np.asarray(feats, np.float32)
            if spk in trans:
                x = apply_transform(x, np.asarray(trans[spk])
                                    ).astype(np.float32)
            ll = np.asarray(am.loglikes(x))
            _tids, ols, _cost = dec.decode(ll)
            w[key] = [words_tab.find(o) if words_tab else str(o)
                      for o in ols]
            n += 1
    log.info("%s: %d utterances", name, n)
    return 0


@tool("gmm-decode-faster-regtree-fmllr")
def gmm_decode_faster_regtree_fmllr_tool(argv):
    """Decode with per-speaker regtree fMLLR transforms
    (gmmbin/gmm-decode-faster-regtree-fmllr.cc)."""
    return _regtree_decode(argv, "gmm-decode-faster-regtree-fmllr")


@tool("gmm-decode-faster-regtree-mllr")
def gmm_decode_faster_regtree_mllr_tool(argv):
    """Decode with per-speaker regtree MLLR mean transforms, applied
    in feature space via the root transform our gmm-est-regtree-mllr
    writes (gmmbin/gmm-decode-faster-regtree-mllr.cc role)."""
    return _regtree_decode(argv, "gmm-decode-faster-regtree-mllr")


@tool("gmm-est-fmllr-global")
def gmm_est_fmllr_global_tool(argv):
    """fMLLR against a single (global) GMM — the upstream spelling
    (gmmbin/gmm-est-fmllr-global.cc); same flow as
    gmm-global-est-fmllr."""
    from kaldi_tpu.cli.tools_bank20 import gmm_global_est_fmllr_tool
    return gmm_global_est_fmllr_tool(argv)


@tool("gmm-est-regtree-fmllr-ali")
def gmm_est_regtree_fmllr_ali_tool(argv):
    """Regtree fMLLR from ALIGNMENTS
    (gmmbin/gmm-est-regtree-fmllr-ali.cc; our gmm-est-regtree-fmllr
    already takes alignments — same flow)."""
    from kaldi_tpu.cli.tools_bank17 import gmm_est_regtree_fmllr_tool
    return gmm_est_regtree_fmllr_tool(argv)


@tool("gmm-latgen-map")
def gmm_latgen_map_tool(argv):
    """MAP-adapted lattice decoding (gmmbin/gmm-latgen-map.cc): each
    speaker's model is MAP-mean-adapted from its own first-pass
    alignments before decoding."""
    import copy
    from kaldi_tpu.am.gmm import GmmAccs, accumulate_stats, map_update
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.cli.tools import _LatgenDecoder
    po = ParseOptions("gmm-latgen-map [opts] <model> <fst> "
                      "<feats-rspec> <ali-rspec> <lattice-wspec>")
    po.register("beam", float, 13.0, "decoding beam")
    po.register("lattice-beam", float, 6.0, "lattice beam")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("mean-tau", float, 10.0, "MAP prior count")
    po.register("utt2spk", str, "", "utterance→speaker map rspec")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    HCLG = _load_hclg(args[1])
    ali_r = RandomAccessTableReader(args[3], holder="ivec")
    utt2spk = {}
    if po["utt2spk"]:
        for u, s in SequentialTableReader(po["utt2spk"], holder="text"):
            utt2spk[u] = s[0]
    feats_all = dict(SequentialTableReader(args[2], holder="mat"))
    spk2utt: Dict[str, List[str]] = {}
    for u in feats_all:
        spk2utt.setdefault(utt2spk.get(u, u), []).append(u)
    n = 0
    with TableWriter(args[4], holder="clat") as w:
        for spk, utts in spk2utt.items():
            adapted = copy.deepcopy(am)
            accs = GmmAccs.zeros(am.num_pdfs, am.max_mix, am.dim)
            got = False
            for u in utts:
                if u in ali_r:
                    tids = np.asarray(ali_r[u], np.int64)
                    accumulate_stats(
                        adapted, np.asarray(feats_all[u], np.float32),
                        tm.tid_to_pdf_array[tids], accs)
                    got = True
            if got:
                map_update(adapted, accs, mean_tau=po["mean-tau"])
            dec = _LatgenDecoder(HCLG, tm.tid_to_pdf_array, po["beam"],
                                 po["lattice-beam"],
                                 po["acoustic-scale"])
            for u in utts:
                ll = np.asarray(adapted.loglikes(
                    np.asarray(feats_all[u], np.float32)))
                w[u] = dec.decode_to_clat(ll)
                n += 1
    log.info("gmm-latgen-map: %d utterances, %d speakers", n,
             len(spk2utt))
    return 0


@tool("gmm-transform-means-global")
def gmm_transform_means_global_tool(argv):
    """Apply a linear/affine transform to a GLOBAL GMM's means
    (gmmbin/gmm-transform-means-global.cc; gmm-transform-means covers
    the per-pdf AM case)."""
    from kaldi_tpu.cli.tools_bank5 import (_read_global_gmm,
                                           _write_global_gmm)
    from kaldi_tpu.core import io as kio
    po = ParseOptions("gmm-transform-means-global <transform> "
                      "<gmm-in> <gmm-out>")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        kio.init_kaldi_input_stream(f)
        mat = np.asarray(kio.read_matrix(f), np.float64)
    am = _read_global_gmm(args[1])
    D = am.dim
    if mat.shape == (D, D):
        lin, off = mat, np.zeros(D)
    elif mat.shape == (D, D + 1):
        lin, off = mat[:, :D], mat[:, D]
    else:
        raise KaldiError(f"transform shape {mat.shape} does not match "
                         f"dim {D}")
    am.means = am.means @ lin.T + off
    am.refresh()
    _write_global_gmm(args[2], am)
    return 0


@tool("gmm-init-biphone")
def gmm_init_biphone_tool(argv):
    """Flat-start full left-biphone model for end-to-end chain
    training (gmmbin/gmm-init-biphone.cc): tree = every (left, phone)
    pair its own pdf, GMM = one Gaussian per pdf at the global
    mean/var."""
    from kaldi_tpu.am.gmm import AmDiagGmm, global_stats
    from kaldi_tpu.am.serialize import read_topology, write_mdl
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.am.tree import full_biphone_tree
    from kaldi_tpu.core import io as kio
    po = ParseOptions("gmm-init-biphone [opts] <topo> <dim|feats-rspec>"
                      " <model-out> <tree-out>")
    po.register("shared-phones", str, "", "file: one phone-set per "
                "line; left contexts within a set are merged")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        kio.init_kaldi_input_stream(f)
        topo = read_topology(f)
    try:
        dim = int(args[1])
        gmean = np.zeros(dim)
        gvar = np.ones(dim)
    except ValueError:
        feats = [np.asarray(m) for _, m in
                 SequentialTableReader(args[1], holder="mat")]
        gmean, gvar = global_stats(feats)
        dim = len(gmean)
    shared = None
    if po["shared-phones"]:
        with kio.open_rxfilename(po["shared-phones"]) as f:
            shared = [[int(p) for p in ln.split()]
                      for ln in f.read().decode().splitlines()
                      if ln.strip()]
    tree = full_biphone_tree(topo.phones, topo, shared_phones=shared)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, gmean, gvar)
    write_mdl(args[2], tm, am)
    from kaldi_tpu.am.serialize import write_tree
    with kio.open_wxfilename(args[3]) as f:
        kio.init_kaldi_output_stream(f)
        write_tree(f, tree)
    log.info("gmm-init-biphone: %d pdfs, dim %d", tree.num_pdfs, dim)
    return 0
