"""Seventh bank of CLI tools: streaming nnet3 decoding, lattice
acoustic rescoring, VAD frame selection.

Canonical shapes mirrored: online2bin/online2-wav-nnet3-latgen-faster
(SURVEY.md §3.5 — the reference's canonical streaming entry point),
latbin/gmm-rescore-lattice.cc, ivectorbin/select-voiced-frames.cc.
"""

from __future__ import annotations

import numpy as np

from kaldi_tpu.cli.tools import tool
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


@tool("online2-wav-nnet3-latgen-faster")
def online2_wav_nnet3_latgen_faster(argv):
    """Streaming nnet3 decode: waveform chunks → online MFCC →
    context-buffered TDNN scoring (decodable-online-looped role) →
    SingleUtteranceDecoder; partial results available throughout."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.cli.tools_bank3 import _load_tdnn
    from kaldi_tpu.cli.tools_extra import _load_fst
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.decoder.online import SingleUtteranceDecoder
    from kaldi_tpu.decoder.online_nnet import OnlineNnetScorer
    from kaldi_tpu.features import FrameExtractionOptions, Mfcc, MfccOptions
    from kaldi_tpu.features.online import OnlineFeaturePipeline
    po = ParseOptions(
        "online2-wav-nnet3-latgen-faster [opts] <trans-model> "
        "<raw-nnet3> <fst> <wav-rspec> <words-wspec>")
    po.register("chunk-length", float, 0.18, "seconds per audio chunk")
    po.register("beam", float, 15.0, "decoding beam")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    po.register("frame-subsampling-factor", int, 3, "subsampling")
    po.register("sample-frequency", float, 16000.0, "expected rate")
    po.register("num-ceps", int, 13, "MFCC cepstra (model input dim)")
    po.register("word-symbol-table", str, "", "words.txt")
    po.register("ivector-extractor", str, "",
                "online i-vectors appended to features (the "
                "OnlineIvectorFeature role)")
    po.register("ivector-period", int, 10,
                "re-estimate the i-vector every N frames")
    po.register("do-endpointing", bool, False,
                "stop decoding at a detected endpoint")
    from kaldi_tpu.cli.tools import register_latgen_opts
    register_latgen_opts(po)
    args = po.read(argv)
    if len(args) != 5:
        po.print_usage()
        return 1
    extractor = None
    if po["ivector-extractor"]:
        from kaldi_tpu.am.ivector import read_ivector_extractor
        extractor = read_ivector_extractor(po["ivector-extractor"])
    tm, _ = read_mdl(args[0])
    _, fwd = _load_tdnn(args[1], po["frame-subsampling-factor"])
    HCLG = _load_fst(args[2])
    if HCLG.num_states > 20000:
        # large-graph streaming path (OnlineBeamDecoder)
        from kaldi_tpu.decoder.beam import BeamDecoder, BeamDecoderConfig
        from kaldi_tpu.fst.csr import pack_fst
        from kaldi_tpu.cli.tools import latgen_kwargs
        kw = latgen_kwargs(po)
        dec = BeamDecoder(pack_fst(HCLG), tm.tid_to_pdf_array,
                          BeamDecoderConfig(
                              beam=po["beam"], max_active=7000,
                              acoustic_scale=po["acoustic-scale"],
                              lattice_beam=8.0,
                              lattice_arcs_per_frame=8192,
                              record_capacity=65536, **kw))
        log.info("online2: %d states → OnlineBeamDecoder "
                 "(large-graph streaming path; arc_budget %d, "
                 "escalate %d)", HCLG.num_states, kw["arc_budget"],
                 kw["escalate_budget"])
    else:
        dec = DenseDecoder(HCLG, tm.tid_to_pdf_array,
                           DenseDecoderConfig(
                               beam=po["beam"],
                               acoustic_scale=po["acoustic-scale"]))
    words_tab = None
    if po["word-symbol-table"]:
        from kaldi_tpu.fst.fst import SymbolTable
        words_tab = SymbolTable.read(po["word-symbol-table"])
    chunk = int(po["chunk-length"] * po["sample-frequency"])
    mfcc = Mfcc(MfccOptions(
        frame_opts=FrameExtractionOptions(
            samp_freq=po["sample-frequency"], dither=0.0),
        num_ceps=po["num-ceps"]))
    n = 0
    _online_beam = [None]
    with TableWriter(args[4], holder="text") as w:
        for key, (wave, rate) in SequentialTableReader(args[3],
                                                       holder="wav"):
            if rate != po["sample-frequency"]:
                raise KaldiError(f"{key}: rate {rate} != "
                                 f"{po['sample-frequency']}")
            est = None
            if extractor is not None:
                from kaldi_tpu.am.ivector import OnlineIvectorEstimator
                est = OnlineIvectorEstimator(extractor)
            pipe = OnlineFeaturePipeline(
                mfcc, ivector_estimator=est,
                ivector_period=po["ivector-period"])
            scorer = OnlineNnetScorer(
                fwd, subsample=po["frame-subsampling-factor"])
            if isinstance(dec, DenseDecoder):
                online = SingleUtteranceDecoder(dec)
            else:
                # one compiled chunk step serves every utterance
                if _online_beam[0] is None:
                    from kaldi_tpu.decoder.online_beam import \
                        OnlineBeamDecoder
                    _online_beam[0] = OnlineBeamDecoder(dec)
                online = _online_beam[0]
                online.reset()
            fed = 0
            endpointed = False
            for i in range(0, len(wave), chunk):
                pipe.accept_waveform(np.asarray(wave[i:i + chunk],
                                                np.float32))
                ready = pipe.num_frames_ready()
                if ready > fed:
                    scorer.accept_features(pipe.get_frames(fed, ready))
                    fed = ready
                scores = scorer.read_new()
                if scores.size:
                    online.advance_decoding(scores)
                if po["do-endpointing"] and online.endpoint_detected():
                    endpointed = True
                    break
            if not endpointed:
                pipe.input_finished()
                ready = pipe.num_frames_ready()
                if ready > fed:
                    scorer.accept_features(pipe.get_frames(fed, ready))
                scorer.input_finished()
                scores = scorer.read_new()
                if scores.size:
                    online.advance_decoding(scores)
            _, ols, cost = online.get_best_path(use_final_probs=True)
            text = [words_tab.find(o) if words_tab else str(o)
                    for o in ols]
            w[key] = text
            log.info("%s: %s (cost %.2f)", key, " ".join(text), cost)
            n += 1
    log.info("streamed %d utterances", n)
    return 0


@tool("gmm-rescore-lattice")
def gmm_rescore_lattice(argv):
    """Replace lattice acoustic scores with a (new) GMM model's
    (latbin/gmm-rescore-lattice.cc): each arc's acoustic cost becomes
    −Σ_t log p(x_t | pdf(tid_t)) over the frames its tid string spans."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.lattice.functions import state_times
    po = ParseOptions(
        "gmm-rescore-lattice <model> <lat-rspec> <feats-rspec> "
        "<lat-wspec>")
    args = po.read(argv)
    if len(args) != 4:
        po.print_usage()
        return 1
    tm, am = read_mdl(args[0])
    feats = RandomAccessTableReader(args[2], holder="mat")
    n = 0
    with TableWriter(args[3], holder="clat") as w:
        for key, clat in SequentialTableReader(args[1], holder="clat"):
            if key not in feats:
                log.warning("%s: no feats; copying unrescored", key)
                w[key] = clat
                continue
            ll = np.asarray(am.loglikes(np.asarray(feats[key])))
            times = state_times(clat)
            for s in range(clat.num_states):
                for a in clat.arcs[s]:
                    t0 = times[s]
                    ac = 0.0
                    for k, tid in enumerate(a.tids):
                        t = t0 + k
                        if t < ll.shape[0]:
                            pdf = tm.tid_to_pdf_array[tid]
                            ac -= float(ll[t, pdf])
                    a.acoustic_cost = ac
            for s, (g, _ac, tids) in list(clat.finals.items()):
                t0 = times[s]
                ac = 0.0
                for k, tid in enumerate(tids):
                    t = t0 + k
                    if t < ll.shape[0]:
                        ac -= float(ll[t, tm.tid_to_pdf_array[tid]])
                clat.finals[s] = (g, ac, tids)
            w[key] = clat
            n += 1
    log.info("rescored %d lattices", n)
    return 0


@tool("select-voiced-frames")
def select_voiced_frames(argv):
    """Keep only frames the VAD marked voiced
    (ivectorbin/select-voiced-frames.cc)."""
    po = ParseOptions(
        "select-voiced-frames <feats-rspec> <vad-rspec> <feats-wspec>")
    args = po.read(argv)
    if len(args) != 3:
        po.print_usage()
        return 1
    vad = RandomAccessTableReader(args[1], holder="vec")
    n = 0
    with TableWriter(args[2], holder="mat") as w:
        for key, m in SequentialTableReader(args[0], holder="mat"):
            if key not in vad:
                log.warning("%s: no VAD; skipped", key)
                continue
            v = np.asarray(vad[key]) > 0.5
            m = np.asarray(m)
            T = min(len(v), m.shape[0])
            sel = m[:T][v[:T]]
            if sel.shape[0] == 0:
                log.warning("%s: no voiced frames; skipped", key)
                continue
            w[key] = sel
            n += 1
    log.info("selected voiced frames for %d utterances", n)
    return 0
