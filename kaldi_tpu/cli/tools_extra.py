"""Second bank of CLI tools: fstbin / gmmbin / lmbin / latbin /
nnet3bin equivalents (reference L10, SURVEY.md §2.1 bins row).

Canonical shapes mirrored: fstbin/fsttablecompose.cc,
fstbin/fstdeterminizestar.cc, bin/add-self-loops.cc,
gmmbin/{gmm-copy,gmm-mixup,gmm-acc-stats-ali,gmm-sum-accs,gmm-est}.cc,
lmbin/arpa2fst.cc, latbin/{lattice-copy,lattice-depth,
lattice-lmrescore,lattice-align-words}.cc, nnet3bin/{nnet3-info,
nnet3-copy}.cc, featbin/{compute-spectrogram-feats,
apply-cmvn-sliding,feat-to-dim,feat-to-len,wav-to-duration}.cc,
bin/{copy-matrix,copy-int-vector,sum-matrices}.cc.
"""

from __future__ import annotations

import struct
import sys
from typing import Dict, List

import numpy as np

from kaldi_tpu.core.io import (read_matrix, read_token, read_vector,
                               write_matrix, write_token, write_vector)
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import SequentialTableReader, TableWriter
from kaldi_tpu.cli.tools import _feature_tool, _make_frame_opts, tool

log = get_logger(__name__)

_FST_MAGIC = struct.pack("<i", 2125659606)


def _load_fst(path: str):
    """Binary OpenFst (vector/const) or text FST, sniffed by magic."""
    from kaldi_tpu.fst.fst import VectorFst
    with open(path, "rb") as f:
        if f.read(4) == _FST_MAGIC:
            from kaldi_tpu.fst.openfst_io import read_fst_path
            return read_fst_path(path)
    return VectorFst.read_text(path)


def _save_fst(path: str, fst) -> None:
    from kaldi_tpu.fst.openfst_io import write_fst_path
    write_fst_path(path, fst)


# ---------------------------------------------------------------------------
# fstbin
# ---------------------------------------------------------------------------

@tool("fstcompile")
def fstcompile(argv):
    from kaldi_tpu.fst.fst import SymbolTable, VectorFst
    po = ParseOptions("fstcompile [--isymbols=f --osymbols=f] "
                      "[text-in] [fst-out]")
    po.register("isymbols", str, "", "input symbol table")
    po.register("osymbols", str, "", "output symbol table")
    args = po.read(argv)
    isym = SymbolTable.read(po["isymbols"]) if po["isymbols"] else None
    osym = SymbolTable.read(po["osymbols"]) if po["osymbols"] else None
    src = args[0] if args else "/dev/stdin"
    fst = VectorFst.read_text(src, isymbols=isym, osymbols=osym)
    _save_fst(args[1] if len(args) > 1 else "/dev/stdout", fst)
    return 0


@tool("fstprint")
def fstprint(argv):
    po = ParseOptions("fstprint <fst-in> [text-out]")
    args = po.read(argv)
    fst = _load_fst(args[0])
    out = open(args[1], "w") if len(args) > 1 else sys.stdout
    fst.write_text(out)
    if len(args) > 1:
        out.close()
    return 0


@tool("fsttablecompose")
def fsttablecompose(argv):
    from kaldi_tpu.fst.ops import compose
    po = ParseOptions("fsttablecompose <fst-a> <fst-b> <fst-out>")
    args = po.read(argv)
    _save_fst(args[2], compose(_load_fst(args[0]), _load_fst(args[1])))
    return 0


@tool("fstdeterminizestar")
def fstdeterminizestar(argv):
    from kaldi_tpu.fst.ops import determinize_star
    po = ParseOptions("fstdeterminizestar <fst-in> <fst-out>")
    po.register("max-states", int, 2_000_000, "state-count abort limit")
    args = po.read(argv)
    _save_fst(args[1], determinize_star(_load_fst(args[0]),
                                        max_states=po["max-states"]))
    return 0


@tool("fstminimizeencoded")
def fstminimizeencoded(argv):
    from kaldi_tpu.fst.ops import minimize_encoded
    po = ParseOptions("fstminimizeencoded <fst-in> <fst-out>")
    args = po.read(argv)
    _save_fst(args[1], minimize_encoded(_load_fst(args[0])))
    return 0


@tool("fstarcsort")
def fstarcsort(argv):
    po = ParseOptions("fstarcsort [--sort_type=ilabel|olabel] "
                      "<fst-in> <fst-out>")
    po.register("sort_type", str, "ilabel", "ilabel|olabel")
    args = po.read(argv)
    fst = _load_fst(args[0])
    key = ((lambda a: (a.ilabel, a.olabel))
           if po["sort_type"] == "ilabel"
           else (lambda a: (a.olabel, a.ilabel)))
    for arcs in fst.arcs:
        arcs.sort(key=key)
    _save_fst(args[1], fst)
    return 0


@tool("add-self-loops")
def add_self_loops_tool(argv):
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.fst.hclg import add_self_loops
    po = ParseOptions("add-self-loops [--self-loop-scale=0.1] "
                      "<model> <fst-in> <fst-out>")
    po.register("self-loop-scale", float, 0.1, "self-loop scale")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    _save_fst(args[2], add_self_loops(_load_fst(args[1]), tm,
                                      po["self-loop-scale"]))
    return 0


# ---------------------------------------------------------------------------
# generic matrix / vector / wav utilities
# ---------------------------------------------------------------------------

@tool("copy-matrix")
def copy_matrix(argv):
    po = ParseOptions("copy-matrix [--scale=1.0] <rspec> <wspec>")
    po.register("scale", float, 1.0, "scalar multiplier")
    args = po.read(argv)
    with TableWriter(args[1], holder="mat") as w:
        for key, m in SequentialTableReader(args[0], holder="mat"):
            w[key] = np.asarray(m) * po["scale"]
    return 0


@tool("copy-int-vector")
def copy_int_vector(argv):
    po = ParseOptions("copy-int-vector <rspec> <wspec>")
    args = po.read(argv)
    with TableWriter(args[1], holder="ivec") as w:
        for key, v in SequentialTableReader(args[0], holder="ivec"):
            w[key] = v
    return 0


@tool("sum-matrices")
def sum_matrices(argv):
    po = ParseOptions("sum-matrices <rspec> <matrix-out> "
                      "(sums all matrices in the table)")
    args = po.read(argv)
    acc = None
    for _, m in SequentialTableReader(args[0], holder="mat"):
        acc = np.asarray(m, np.float64) if acc is None else acc + m
    if acc is None:
        raise KaldiError("sum-matrices: empty table")
    with open(args[1], "wb") as f:
        f.write(b"\0B")
        write_matrix(f, acc.astype(np.float32))
    return 0


@tool("feat-to-dim")
def feat_to_dim(argv):
    po = ParseOptions("feat-to-dim <feats-rspec>")
    args = po.read(argv)
    for _, m in SequentialTableReader(args[0], holder="mat"):
        print(np.asarray(m).shape[1])
        return 0
    raise KaldiError("feat-to-dim: empty table")


@tool("feat-to-len")
def feat_to_len(argv):
    po = ParseOptions("feat-to-len <feats-rspec> [<len-wspec>]")
    args = po.read(argv)
    w = TableWriter(args[1], holder="text") if len(args) > 1 else None
    for key, m in SequentialTableReader(args[0], holder="mat"):
        n = np.asarray(m).shape[0]
        if w:
            w[key] = [str(n)]
        else:
            print(key, n)
    if w:
        w.close()
    return 0


@tool("wav-to-duration")
def wav_to_duration(argv):
    po = ParseOptions("wav-to-duration <wav-rspec> [<dur-wspec>]")
    args = po.read(argv)
    w = TableWriter(args[1], holder="text") if len(args) > 1 else None
    for key, (wave, rate) in SequentialTableReader(args[0], holder="wav"):
        d = len(wave) / float(rate)
        if w:
            w[key] = [f"{d:.3f}"]
        else:
            print(key, f"{d:.3f}")
    if w:
        w.close()
    return 0


# ---------------------------------------------------------------------------
# featbin additions
# ---------------------------------------------------------------------------

@tool("compute-spectrogram-feats")
def compute_spectrogram_feats(argv):
    from kaldi_tpu.features.compute import Spectrogram, SpectrogramOptions

    def factory(po):
        return Spectrogram(SpectrogramOptions(
            frame_opts=_make_frame_opts(po)))

    return _feature_tool(
        argv, factory,
        "compute-spectrogram-feats [opts] <wav-rspec> <feats-wspec>")


@tool("apply-cmvn-sliding")
def apply_cmvn_sliding(argv):
    from kaldi_tpu.features.functions import (SlidingWindowCmnOptions,
                                              sliding_window_cmn)
    po = ParseOptions("apply-cmvn-sliding [opts] <rspec> <wspec>")
    po.register("cmn-window", int, 600, "window size in frames")
    po.register("min-cmn-window", int, 100, "minimum window")
    po.register("norm-vars", bool, False, "normalize variance")
    po.register("center", bool, True, "center the window")
    args = po.read(argv)
    opts = SlidingWindowCmnOptions(
        cmn_window=po["cmn-window"], min_window=po["min-cmn-window"],
        normalize_variance=po["norm-vars"], center=po["center"])
    with TableWriter(args[1], holder="mat") as w:
        for key, m in SequentialTableReader(args[0], holder="mat"):
            w[key] = sliding_window_cmn(np.asarray(m), opts)
    return 0


# ---------------------------------------------------------------------------
# gmmbin
# ---------------------------------------------------------------------------

_ACC_TOKEN = "<GmmAccs>"


def write_gmm_accs(path: str, accs) -> None:
    P, M, D = accs.mean_acc.shape
    with open(path, "wb") as f:
        f.write(b"\0B")
        write_token(f, _ACC_TOKEN)
        write_matrix(f, accs.occ.astype(np.float64), dtype="float64")
        write_matrix(f, accs.mean_acc.reshape(P, M * D).astype(np.float64),
                     dtype="float64")
        write_matrix(f, accs.var_acc.reshape(P, M * D).astype(np.float64),
                     dtype="float64")
        write_vector(f, np.array([accs.tot_like, accs.tot_frames, D],
                                 np.float64), dtype="float64")


def read_gmm_accs(path: str):
    from kaldi_tpu.am.gmm import GmmAccs
    with open(path, "rb") as f:
        if f.read(2) != b"\0B":
            raise KaldiError(f"{path}: not a binary kaldi file")
        tok = read_token(f)
        if tok != _ACC_TOKEN:
            raise KaldiError(f"{path}: expected {_ACC_TOKEN}, got {tok}")
        occ = read_matrix(f)
        mean = read_matrix(f)
        var = read_matrix(f)
        meta = read_vector(f)
    P, M = occ.shape
    D = int(meta[2])
    return GmmAccs(occ, mean.reshape(P, M, D), var.reshape(P, M, D),
                   float(meta[0]), float(meta[1]))


@tool("gmm-copy")
def gmm_copy(argv):
    from kaldi_tpu.am.serialize import read_mdl, write_mdl
    po = ParseOptions("gmm-copy <model-in> <model-out>")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    write_mdl(args[1], tm, am)
    return 0


@tool("gmm-mixup")
def gmm_mixup(argv):
    from kaldi_tpu.am.gmm import mixup
    from kaldi_tpu.am.serialize import read_mdl, write_mdl
    po = ParseOptions("gmm-mixup --mix-up=N <model-in> <model-out>")
    po.register("mix-up", int, 0, "target total #gauss")
    po.register("perturb-factor", float, 0.01, "mean perturbation")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    if po["mix-up"]:
        mixup(am, po["mix-up"], perturb=po["perturb-factor"])
    write_mdl(args[1], tm, am)
    return 0


@tool("gmm-acc-stats-ali")
def gmm_acc_stats_ali(argv):
    from kaldi_tpu.am.gmm import GmmAccs, accumulate_stats
    from kaldi_tpu.am.serialize import read_mdl
    po = ParseOptions("gmm-acc-stats-ali <model> <feats-rspec> "
                      "<ali-rspec> <accs-out>")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    accs = GmmAccs.zeros(am.num_pdfs, am.max_mix, am.dim)
    alis = dict(SequentialTableReader(args[2], holder="ivec"))
    n = 0
    for key, feats in SequentialTableReader(args[1], holder="mat"):
        if key not in alis:
            log.warning("no alignment for %s", key)
            continue
        pdf_ali = tm.tid_to_pdf_array[np.asarray(alis[key])]
        accumulate_stats(am, np.asarray(feats), pdf_ali, accs)
        n += 1
    write_gmm_accs(args[3], accs)
    log.info("accumulated stats from %d utterances; avg like/frame %.4f",
             n, accs.tot_like / max(accs.tot_frames, 1.0))
    return 0


@tool("gmm-sum-accs")
def gmm_sum_accs(argv):
    po = ParseOptions("gmm-sum-accs <accs-out> <accs-in1> [<accs-in2> ...]")
    args = po.read(argv)
    total = read_gmm_accs(args[1])
    for p in args[2:]:
        total = total + read_gmm_accs(p)
    write_gmm_accs(args[0], total)
    return 0


@tool("gmm-est")
def gmm_est(argv):
    from kaldi_tpu.am.gmm import mixup, mle_update
    from kaldi_tpu.am.serialize import read_mdl, write_mdl
    po = ParseOptions("gmm-est [opts] <model-in> <accs-in> <model-out>")
    po.register("min-gaussian-occupancy", float, 3.0, "")
    po.register("mix-up", int, 0, "target #gauss after update")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    accs = read_gmm_accs(args[1])
    mle_update(am, accs, min_occ=po["min-gaussian-occupancy"])
    if po["mix-up"]:
        mixup(am, po["mix-up"])
    write_mdl(args[2], tm, am)
    log.info("estimated model; tot like/frame %.4f over %.0f frames",
             accs.tot_like / max(accs.tot_frames, 1.0), accs.tot_frames)
    return 0


# ---------------------------------------------------------------------------
# lmbin
# ---------------------------------------------------------------------------

@tool("arpa2fst")
def arpa2fst(argv):
    from kaldi_tpu.fst.arpa import ArpaModel, arpa_to_fst
    from kaldi_tpu.fst.fst import SymbolTable
    po = ParseOptions("arpa2fst --read-symbol-table=words.txt "
                      "<arpa-in> <fst-out>")
    po.register("read-symbol-table", str, "", "words.txt")
    po.register("disambig-symbol", str, "#0", "backoff ilabel name")
    args = po.read(argv)
    if not po["read-symbol-table"]:
        raise KaldiError("arpa2fst: --read-symbol-table is required")
    words = SymbolTable.read(po["read-symbol-table"])
    backoff = (words[po["disambig-symbol"]]
               if po["disambig-symbol"] in words else None)
    model = ArpaModel.parse(args[0])
    _save_fst(args[1], arpa_to_fst(model, words, backoff_symbol=backoff))
    return 0


# ---------------------------------------------------------------------------
# latbin
# ---------------------------------------------------------------------------

@tool("lattice-copy")
def lattice_copy(argv):
    po = ParseOptions("lattice-copy <rspec> <wspec>")
    args = po.read(argv)
    with TableWriter(args[1], holder="clat") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            w[key] = clat
    return 0


@tool("lattice-depth")
def lattice_depth(argv):
    from kaldi_tpu.lattice.functions import state_times
    po = ParseOptions("lattice-depth <rspec> [<depth-wspec>]")
    args = po.read(argv)
    w = TableWriter(args[1], holder="text") if len(args) > 1 else None
    tot_arc_frames = tot_frames = 0
    for key, clat in SequentialTableReader(args[0], holder="clat"):
        times = state_times(clat)
        T = max(times) if times else 0
        arc_frames = sum(len(a.tids) for s in range(clat.num_states)
                         for a in clat.arcs[s])
        depth = arc_frames / max(T, 1)
        tot_arc_frames += arc_frames
        tot_frames += T
        if w:
            w[key] = [f"{depth:.2f}"]
        else:
            print(key, f"{depth:.2f}")
    log.info("overall lattice depth %.2f over %d frames",
             tot_arc_frames / max(tot_frames, 1), tot_frames)
    if w:
        w.close()
    return 0


@tool("lattice-lmrescore")
def lattice_lmrescore(argv):
    from kaldi_tpu.fst.arpa import ArpaModel
    from kaldi_tpu.fst.fst import SymbolTable
    from kaldi_tpu.lattice.rescore import lmrescore
    po = ParseOptions("lattice-lmrescore [--lm-scale=1.0] <old-arpa> "
                      "<new-arpa> <words.txt> <lat-rspec> <lat-wspec>")
    po.register("lm-scale", float, 1.0, "LM scale")
    args = po.read(argv)
    old_lm = ArpaModel.parse(args[0])
    new_lm = ArpaModel.parse(args[1])
    words = SymbolTable.read(args[2])
    with TableWriter(args[4], holder="clat") as w:
        for key, clat in SequentialTableReader(args[3], holder="clat"):
            w[key] = lmrescore(clat, old_lm, new_lm, words,
                               lm_scale=po["lm-scale"])
    return 0


@tool("lattice-align-words")
def lattice_align_words(argv):
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.fst.fst import SymbolTable
    from kaldi_tpu.lattice.word_align import word_align_lattice
    po = ParseOptions("lattice-align-words [opts] <lexicon> <phones.txt> "
                      "<words.txt> <model> <lat-rspec> <lat-wspec>")
    po.register("silence-phones", str, "1", "colon-separated phone ids")
    args = po.read(argv)
    phones = SymbolTable.read(args[1])
    words = SymbolTable.read(args[2])
    tm, _ = read_mdl(args[3])
    prons: Dict[int, List[List[int]]] = {}
    with open(args[0]) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2 and parts[0] in words:
                prons.setdefault(words[parts[0]], []).append(
                    [phones[p] for p in parts[1:]])
    sil = {int(x) for x in po["silence-phones"].split(":") if x}
    n_bad = 0
    with TableWriter(args[5], holder="clat") as w:
        for key, clat in SequentialTableReader(args[4], holder="clat"):
            aligned, ok = word_align_lattice(clat, tm, prons, sil)
            n_bad += not ok
            w[key] = aligned
    if n_bad:
        log.warning("%d lattices had best-effort word splits", n_bad)
    return 0


# ---------------------------------------------------------------------------
# online2bin
# ---------------------------------------------------------------------------

@tool("online2-wav-gmm-latgen-faster")
def online2_wav_gmm_latgen_faster(argv):
    """Streaming decode driver (online2bin/online2-wav-gmm-latgen-faster
    role): waveform chunks → online MFCC(+deltas) → GMM loglikes →
    SingleUtteranceDecoder, partials available throughout."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.decoder.online import SingleUtteranceDecoder
    from kaldi_tpu.features import (DeltaFeaturesOptions,
                                    FrameExtractionOptions, Mfcc,
                                    MfccOptions)
    from kaldi_tpu.features.online import OnlineFeaturePipeline
    po = ParseOptions("online2-wav-gmm-latgen-faster [opts] <model> "
                      "<fst> <wav-rspec> <words-wspec>")
    po.register("chunk-length", float, 0.18, "seconds per audio chunk")
    po.register("beam", float, 16.0, "decoding beam")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("sample-frequency", float, 16000.0, "expected rate")
    po.register("do-endpointing", bool, False, "stop at an endpoint")
    po.register("word-symbol-table", str, "", "words.txt")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    dec = DenseDecoder(_load_fst(args[1]), tm.tid_to_pdf_array,
                       DenseDecoderConfig(
                           beam=po["beam"],
                           acoustic_scale=po["acoustic-scale"]))
    words_tab = None
    if po["word-symbol-table"]:
        from kaldi_tpu.fst.fst import SymbolTable
        words_tab = SymbolTable.read(po["word-symbol-table"])
    chunk = int(po["chunk-length"] * po["sample-frequency"])
    mfcc_opts = MfccOptions(frame_opts=FrameExtractionOptions(
        samp_freq=po["sample-frequency"], dither=0.0))
    with TableWriter(args[3], holder="text") as w:
        for key, (wave, rate) in SequentialTableReader(args[2],
                                                       holder="wav"):
            if rate != po["sample-frequency"]:
                raise KaldiError(f"{key}: rate {rate} != "
                                 f"{po['sample-frequency']}")
            pipe = OnlineFeaturePipeline(Mfcc(mfcc_opts),
                                         deltas=DeltaFeaturesOptions())
            online = SingleUtteranceDecoder(dec)
            fed = 0
            for i in range(0, len(wave), chunk):
                pipe.accept_waveform(np.asarray(wave[i:i + chunk],
                                                np.float32))
                ready = pipe.num_frames_ready()
                if ready > fed:
                    feats = pipe.get_frames(fed, ready)
                    online.advance_decoding(
                        np.asarray(am.loglikes(feats)))
                    fed = ready
                if po["do-endpointing"] and online.endpoint_detected():
                    break
            else:
                pipe.input_finished()
                ready = pipe.num_frames_ready()
                if ready > fed:
                    online.advance_decoding(np.asarray(
                        am.loglikes(pipe.get_frames(fed, ready))))
            _, ols, cost = online.get_best_path(use_final_probs=True)
            text = [words_tab.find(o) if words_tab else str(o)
                    for o in ols]
            w[key] = text
            log.info("%s: %s (cost %.2f, %d frames)", key,
                     " ".join(text), cost, online.num_frames_decoded)
    return 0


# ---------------------------------------------------------------------------
# nnet3bin
# ---------------------------------------------------------------------------

def _open_nnet3(path: str):
    from kaldi_tpu.am.nnet3_io import read_nnet3
    with open(path, "rb") as f:
        if f.read(2) != b"\0B":
            raise KaldiError(f"{path}: expected binary header \\0B")
        return read_nnet3(f)


@tool("nnet3-info")
def nnet3_info(argv):
    po = ParseOptions("nnet3-info <nnet3-file>")
    args = po.read(argv)
    model = _open_nnet3(args[0])
    print(f"num-components {len(model.components)}")
    for c in model.components:
        dims = []
        for k in ("InputDim", "OutputDim", "Dim"):
            if k in c.fields:
                dims.append(f"{k.lower()}={c.fields[k].as_int()}")
        print(f"component name={c.name} type={c.ctype} "
              + " ".join(dims))
    return 0


@tool("nnet3-copy")
def nnet3_copy(argv):
    from kaldi_tpu.am.nnet3_io import write_nnet3
    po = ParseOptions("nnet3-copy <nnet3-in> <nnet3-out>")
    args = po.read(argv)
    model = _open_nnet3(args[0])
    with open(args[1], "wb") as f:
        f.write(b"\0B")
        write_nnet3(f, model)
    return 0
