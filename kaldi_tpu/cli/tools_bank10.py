"""Tenth bank of CLI tools: context composition, regression-tree MLLR,
scoring/EER, feature segments, data augmentation, nnet3 am wrappers.

Canonical shapes mirrored: fstbin/fstcomposecontext.cc,
gmmbin/{gmm-est-regtree-mllr,gmm-gselect}.cc, ivectorbin/compute-eer.cc,
latbin/{lattice-limit-depth,nbest-to-ctm}.cc, featbin/
{feat-to-post,extract-feature-segments,concat-feats,wav-reverberate,
compute-and-process-kaldi-pitch-feats}.cc, nnet3bin/{nnet3-am-copy,
nnet3-am-info}.cc, bin/fsts-to-transcripts.cc.
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
# fstbin
# ---------------------------------------------------------------------------

@tool("fstcomposecontext")
def fstcomposecontext(argv):
    """Compose LG with the on-demand context transducer C → CLG
    (fstbin/fstcomposecontext.cc).  Phones/disambig ids from files."""
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.context import compose_context
    po = ParseOptions("fstcomposecontext [opts] <ilabels-out> "
                      "<lg-fst-in> <clg-fst-out>")
    po.register("context-width", int, 3, "phone context window N")
    po.register("central-position", int, 1, "central phone position P")
    po.register("read-disambig-syms", str, "", "disambig phone ids file")
    po.register("phones", str, "", "phone ids file (one per line); "
                "default: infer from LG input labels")
    args = po.read(argv)
    lg = _load_fst(args[1])
    disambig = []
    if po["read-disambig-syms"]:
        with open(po["read-disambig-syms"]) as f:
            disambig = [int(x) for x in f.read().split()]
    if po["phones"]:
        with open(po["phones"]) as f:
            phones = [int(x) for x in f.read().split()]
    else:
        phones = sorted({a.ilabel for arcs in lg.arcs for a in arcs
                         if a.ilabel and a.ilabel not in set(disambig)})

    class _Shim:
        def phone_list(self):
            return phones
        disambig_ids = disambig

    clg, ilabel_info, disambig_start = compose_context(
        lg, _Shim(), po["context-width"], po["central-position"])
    with open(args[0], "w") as f:
        for info in ilabel_info:
            f.write(" ".join(str(x) for x in info) + "\n")
    _save_fst(args[2], clg)
    log.info("fstcomposecontext: CLG %d states, %d ilabels "
             "(disambig from %d)", clg.num_states, len(ilabel_info),
             disambig_start)
    return 0


@tool("fsts-to-transcripts")
def fsts_to_transcripts(argv):
    """Best path olabels of per-utterance FSTs
    (bin/fsts-to-transcripts.cc)."""
    from kaldi_tpu.fst.ops import shortest_path
    po = ParseOptions("fsts-to-transcripts <fsts-rspec> <words-wspec>")
    args = po.read(argv)
    n = 0
    with TableWriter(args[1], holder="text") as w:
        for key, fst in SequentialTableReader(args[0], holder="fst"):
            arcs, _cost = shortest_path(fst)
            w[key] = [str(a.olabel) for a in arcs if a.olabel]
            n += 1
    log.info("fsts-to-transcripts: %d fsts", n)
    return 0


# ---------------------------------------------------------------------------
# gmmbin: regression-tree MLLR, Gaussian selection
# ---------------------------------------------------------------------------

@tool("gmm-est-regtree-mllr")
def gmm_est_regtree_mllr(argv):
    """Estimate per-base-class MLLR mean transforms from alignments and
    write the adapted model (gmmbin/gmm-est-regtree-mllr.cc folded with
    the transform application — the decode-ready artifact)."""
    from kaldi_tpu.am.regtree import RegressionTree, RegtreeMllrAccs
    from kaldi_tpu.am.serialize import read_mdl, write_mdl
    po = ParseOptions("gmm-est-regtree-mllr [opts] <model-in> "
                      "<feats-rspec> <ali-rspec> <model-out>")
    po.register("num-base-classes", int, 4, "regression-tree leaves")
    po.register("min-count", float, 100.0, "occupancy to estimate a node")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    tree = RegressionTree.build(am, po["num-base-classes"])
    accs = RegtreeMllrAccs(tree, am.dim)
    alis = RandomAccessTableReader(args[2], holder="ivec")
    n = 0
    for key, feats in SequentialTableReader(args[1], holder="mat"):
        if key not in alis:
            continue
        pdfs = np.array([tm.transition_id_to_pdf(int(t))
                         for t in alis[key]], np.int32)
        accs.accumulate(am, np.asarray(feats), pdfs)
        n += 1
    if not n:
        raise KaldiError("gmm-est-regtree-mllr: no utterances")
    mllr = accs.estimate(min_count=po["min-count"])
    write_mdl(args[3], tm, mllr.transform_model(am))
    log.info("gmm-est-regtree-mllr: adapted on %d utterances", n)
    return 0


@tool("gmm-gselect")
def gmm_gselect(argv):
    """Top-N Gaussian indices per frame under a global diagonal GMM
    (gmmbin/gmm-gselect.cc; the fGMM/ivector posterior-pruning input)."""
    from kaldi_tpu.cli.tools_bank5 import _read_global_gmm
    po = ParseOptions("gmm-gselect [--n=50] <global-gmm> <feats-rspec> "
                      "<gselect-wspec>")
    po.register("n", int, 50, "Gaussians to keep per frame")
    args = po.read(argv)
    am = _read_global_gmm(args[0])
    n_keep = min(po["n"], am.num_gauss())
    n = 0
    with TableWriter(args[2], holder="post") as w:
        for key, feats in SequentialTableReader(args[1], holder="mat"):
            feats = np.asarray(feats)
            post = np.asarray(am.component_posteriors(
                feats, np.zeros(len(feats), np.int32)))   # (T, M)
            idx = np.argsort(-post, axis=1)[:, :n_keep]
            w[key] = [[(int(i), float(post[t, i])) for i in idx[t]]
                      for t in range(len(feats))]
            n += 1
    log.info("gmm-gselect: %d utterances, %d per frame", n, n_keep)
    return 0


# ---------------------------------------------------------------------------
# ivectorbin: EER
# ---------------------------------------------------------------------------

@tool("compute-eer")
def compute_eer(argv):
    """Equal error rate from a scores file: lines `<score> target|
    nontarget` (ivectorbin/compute-eer.cc)."""
    po = ParseOptions("compute-eer <scores-file|->")
    args = po.read(argv)
    import sys
    f = sys.stdin if args[0] == "-" else open(args[0])
    tgt, non = [], []
    for line in f:
        parts = line.split()
        if len(parts) != 2:
            continue
        (tgt if parts[1] == "target" else non).append(float(parts[0]))
    if args[0] != "-":
        f.close()
    if not tgt or not non:
        raise KaldiError("compute-eer: need both target and nontarget "
                         "scores")
    tgt = np.sort(np.asarray(tgt))
    non = np.sort(np.asarray(non))
    # sweep thresholds over target scores: FRR rises, FAR falls
    best = (1.0, 0.0)
    for i, thr in enumerate(tgt):
        frr = i / len(tgt)
        far = float(np.mean(non >= thr))
        if abs(frr - far) < abs(best[0] - best[1]):
            best = (frr, far)
        if frr > far:
            break
    eer = (best[0] + best[1]) / 2
    log.info("compute-eer: EER %.4f over %d target / %d nontarget",
             eer, len(tgt), len(non))
    print(f"{eer * 100:.4f}")
    return 0


# ---------------------------------------------------------------------------
# latbin
# ---------------------------------------------------------------------------

@tool("lattice-limit-depth")
def lattice_limit_depth(argv):
    """Cap the mean per-frame lattice depth by tightening the prune
    beam until the cap holds (latbin/lattice-limit-depth.cc)."""
    from kaldi_tpu.lattice.determinize import prune_lattice
    from kaldi_tpu.lattice.functions import state_times
    po = ParseOptions("lattice-limit-depth [--max-depth=50] "
                      "<lattice-rspec> <lattice-wspec>")
    po.register("max-depth", float, 50.0, "max mean arcs per frame")
    args = po.read(argv)

    def depth(cl):
        if cl.start < 0:
            return 0.0
        times = state_times(cl)
        T = max(times) if times else 0
        arc_frames = sum(
            max(len(a.tids), 1) for arcs in cl.arcs for a in arcs)
        return arc_frames / max(T, 1)

    n = 0
    with TableWriter(args[1], holder="clat") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            cur = clat
            beam = 16.0
            while depth(cur) > po["max-depth"] and beam > 0.01:
                cur = prune_lattice(clat, beam)
                beam /= 2
            w[key] = cur
            n += 1
    log.info("lattice-limit-depth: %d lattices", n)
    return 0


@tool("nbest-to-ctm")
def nbest_to_ctm(argv):
    """Single-path lattices → CTM lines with word times from the tid
    strings (latbin/nbest-to-ctm.cc)."""
    po = ParseOptions("nbest-to-ctm [opts] <nbest-rspec> <ctm-out>")
    po.register("frame-shift", float, 0.01, "seconds per frame")
    po.register("print-silence", bool, False, "emit eps words too")
    args = po.read(argv)
    shift = po["frame-shift"]
    lines = []
    for key, clat in SequentialTableReader(args[0], holder="clat"):
        t = 0
        cur = clat.start
        while cur >= 0:
            arcs = clat.arcs[cur]
            if not arcs:
                break
            a = arcs[0]
            dur = len(a.tids)
            if a.word or po["print-silence"]:
                lines.append(f"{key} 1 {t * shift:.2f} "
                             f"{max(dur, 1) * shift:.2f} {a.word}")
            t += dur
            cur = a.nextstate
            if cur in clat.finals:
                break
    with open(args[1], "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    log.info("nbest-to-ctm: %d lines", len(lines))
    return 0


# ---------------------------------------------------------------------------
# featbin
# ---------------------------------------------------------------------------

@tool("feat-to-post")
def feat_to_post(argv):
    """Feature rows → posterior entries (featbin/feat-to-post.cc;
    --top-n keeps the n largest values per frame)."""
    po = ParseOptions("feat-to-post [--top-n=0] <feats-rspec> "
                      "<post-wspec>")
    po.register("top-n", int, 0, "keep n largest per frame (0 = all)")
    args = po.read(argv)
    with TableWriter(args[1], holder="post") as w:
        for key, feats in SequentialTableReader(args[0], holder="mat"):
            feats = np.asarray(feats)
            out = []
            for row in feats:
                idx = (np.argsort(-row)[:po["top-n"]] if po["top-n"]
                       else np.arange(len(row)))
                out.append([(int(i), float(row[i])) for i in idx])
            w[key] = out
    return 0


@tool("extract-feature-segments")
def extract_feature_segments(argv):
    """Cut per-recording feature matrices into per-segment matrices via
    a Kaldi segments file `seg reco tstart tend`
    (featbin/extract-feature-segments.cc)."""
    po = ParseOptions("extract-feature-segments [opts] <feats-rspec> "
                      "<segments-file> <feats-wspec>")
    po.register("frame-shift", float, 0.01, "seconds per frame")
    args = po.read(argv)
    feats = RandomAccessTableReader(args[0], holder="mat")
    shift = po["frame-shift"]
    n, skipped = 0, 0
    with TableWriter(args[2], holder="mat") as w:
        with open(args[1]) as f:
            for line in f:
                seg, reco, t0, t1 = line.split()
                if reco not in feats:
                    skipped += 1
                    continue
                m = np.asarray(feats[reco])
                i0 = int(round(float(t0) / shift))
                i1 = int(round(float(t1) / shift))
                i0 = max(0, min(i0, len(m)))
                i1 = max(i0 + 1, min(i1, len(m)))
                w[seg] = m[i0:i1]
                n += 1
    log.info("extract-feature-segments: %d segments (%d skipped)",
             n, skipped)
    return 0


@tool("concat-feats")
def concat_feats(argv):
    """Concatenate feature matrices over TIME, same key in N tables
    (featbin/concat-feats.cc)."""
    po = ParseOptions("concat-feats <rspec1> <rspec2> [...] <wspec>")
    args = po.read(argv)
    if len(args) < 3:
        po.print_usage()
        return 1
    rest = [RandomAccessTableReader(r, holder="mat") for r in args[1:-1]]
    with TableWriter(args[-1], holder="mat") as w:
        for key, m in SequentialTableReader(args[0], holder="mat"):
            parts = [np.asarray(m)]
            for r in rest:
                parts.append(np.asarray(r[key]))
            w[key] = np.concatenate(parts, axis=0)
    return 0


@tool("wav-reverberate")
def wav_reverberate(argv):
    """Convolve waveforms with a room impulse response and/or add
    scaled additive noise (featbin/wav-reverberate.cc)."""
    po = ParseOptions("wav-reverberate [opts] <wav-rspec> <wav-wspec>")
    po.register("impulse-response", str, "", "RIR wav rxfilename "
                "(single-entry ark or raw table key 'rir')")
    po.register("additive-signals", str, "", "noise wav rspecifier "
                "(keys must match)")
    po.register("snrs", float, 20.0, "SNR dB for additive noise")
    po.register("normalize-output", bool, True,
                "rescale output to the input power")
    args = po.read(argv)
    rir = None
    if po["impulse-response"]:
        entries = dict(SequentialTableReader(po["impulse-response"],
                                             holder="wav"))
        rir = np.asarray(next(iter(entries.values()))[0], np.float64)
    noises = (RandomAccessTableReader(po["additive-signals"],
                                      holder="wav")
              if po["additive-signals"] else None)
    n = 0
    with TableWriter(args[1], holder="wav") as w:
        for key, (wave, rate) in SequentialTableReader(args[0],
                                                       holder="wav"):
            x = np.asarray(wave, np.float64)
            p_in = np.mean(x ** 2) + 1e-20
            y = x
            if rir is not None:
                L = len(x) + len(rir) - 1
                nfft = 1 << (L - 1).bit_length()
                y = np.fft.irfft(np.fft.rfft(x, nfft)
                                 * np.fft.rfft(rir, nfft), nfft)[:len(x)]
            if noises is not None and key in noises:
                nz = np.asarray(noises[key][0], np.float64)
                if len(nz) < len(y):
                    nz = np.tile(nz, -(-len(y) // len(nz)))
                nz = nz[:len(y)]
                p_sig = np.mean(y ** 2) + 1e-20
                p_nz = np.mean(nz ** 2) + 1e-20
                scale = np.sqrt(p_sig / (p_nz * 10 ** (po["snrs"] / 10)))
                y = y + scale * nz
            if po["normalize-output"]:
                y = y * np.sqrt(p_in / (np.mean(y ** 2) + 1e-20))
            # samples stay in the Kaldi int16 domain
            w[key] = (np.clip(np.rint(y), -32768, 32767).astype(np.int16),
                      rate)
            n += 1
    log.info("wav-reverberate: %d waveforms", n)
    return 0


@tool("compute-and-process-kaldi-pitch-feats")
def compute_and_process_kaldi_pitch_feats(argv):
    """compute-kaldi-pitch-feats | process-kaldi-pitch-feats in one
    pass (featbin/compute-and-process-kaldi-pitch-feats.cc)."""
    from kaldi_tpu.features.pitch import (PitchExtractionOptions,
                                          compute_kaldi_pitch,
                                          process_pitch)
    po = ParseOptions("compute-and-process-kaldi-pitch-feats [opts] "
                      "<wav-rspec> <feats-wspec>")
    po.register("sample-frequency", float, 16000.0, "sample rate")
    args = po.read(argv)
    opts = PitchExtractionOptions(samp_freq=po["sample-frequency"])
    n = 0
    with TableWriter(args[1], holder="mat") as w:
        for key, (wave, rate) in SequentialTableReader(args[0],
                                                       holder="wav"):
            if rate != opts.samp_freq:
                raise KaldiError(f"{key}: rate {rate} != "
                                 f"{opts.samp_freq}")
            w[key] = np.asarray(process_pitch(
                compute_kaldi_pitch(np.asarray(wave), opts)))
            n += 1
    log.info("compute-and-process-kaldi-pitch-feats: %d utterances", n)
    return 0


# ---------------------------------------------------------------------------
# nnet3bin: .mdl (TransitionModel + nnet) wrappers
# ---------------------------------------------------------------------------

@tool("nnet3-am-copy")
def nnet3_am_copy(argv):
    """Copy an nnet3 .mdl; --raw extracts the bare nnet
    (nnet3bin/nnet3-am-copy.cc)."""
    from kaldi_tpu.am import nnet3_io as n3
    po = ParseOptions("nnet3-am-copy [--raw=false] <mdl-in> <out>")
    po.register("raw", bool, False, "write bare nnet (final.raw)")
    args = po.read(argv)
    with open(args[0], "rb") as f:
        if f.read(2) != b"\0B":
            raise KaldiError(f"{args[0]}: not binary kaldi")
        head = f.read()
    # the .mdl holds <TransitionModel>…</TransitionModel> then the nnet
    tag = b"</TransitionModel>"
    pos = head.find(tag)
    tm_blob = head[:pos + len(tag)] if pos >= 0 else b""
    nnet_blob = head[pos + len(tag):] if pos >= 0 else head
    import io as pio
    model = n3.read_nnet3(pio.BytesIO(nnet_blob))
    with open(args[1], "wb") as f:
        f.write(b"\0B")
        if not po["raw"] and tm_blob:
            f.write(tm_blob)
        n3.write_nnet3(f, model)
    log.info("nnet3-am-copy: %d components%s", len(model.components),
             " (raw)" if po["raw"] else "")
    return 0


@tool("nnet3-am-info")
def nnet3_am_info(argv):
    from kaldi_tpu.am import nnet3_io as n3
    po = ParseOptions("nnet3-am-info <mdl>")
    args = po.read(argv)
    with open(args[0], "rb") as f:
        if f.read(2) != b"\0B":
            raise KaldiError(f"{args[0]}: not binary kaldi")
        head = f.read()
    tag = b"</TransitionModel>"
    pos = head.find(tag)
    import io as pio
    model = n3.read_nnet3(
        pio.BytesIO(head[pos + len(tag):] if pos >= 0 else head))
    print(f"num-components {len(model.components)}")
    for c in model.components:
        print(f"component name={c.name} type={c.ctype} "
              f"fields={','.join(sorted(c.fields))}")
    return 0
