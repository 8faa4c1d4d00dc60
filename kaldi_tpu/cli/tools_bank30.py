"""Thirtieth bank of CLI tools: the LEGACY online family
(src/online/ — GMM-era streaming, UDP/TCP audio servers and clients)
plus the online2bin tail (nnet2 streaming, grammar/incremental nnet3
streaming, wake-word decoding, codec round-trip, i-vector
randomization) and ivector-extractor-copy.

Canonical shapes mirrored (SURVEY.md §2.1 bins):
onlinebin/{online-wav-gmm-decode-faster, online-gmm-decode-faster,
online-server-gmm-decode-faster, online-net-client,
online-audio-server-decode-faster, online-audio-client}.cc,
online2bin/{online2-wav-nnet2-latgen-faster,
online2-wav-nnet2-am-compute, online2-wav-nnet2-latgen-threaded,
online2-wav-nnet3-latgen-grammar, online2-wav-nnet3-latgen-incremental,
online2-wav-nnet3-wake-word-decoder-faster, compress-uncompress-speex,
ivector-randomize}.cc, ivectorbin/ivector-extractor-copy.cc.

The portaudio microphone input of the legacy family is replaced by
raw-S16LE streams (stdin / sockets / wav tables): the DECODING loops
are the component; audio capture is host plumbing.
"""

from __future__ import annotations

import socket
import socketserver
import threading
from typing import Dict, List, Tuple

import numpy as np

from kaldi_tpu.cli.tools import tool, _load_hclg
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


# ---------------------------------------------------------------------------
# shared GMM streaming core (the OnlineFasterDecoder role)
# ---------------------------------------------------------------------------

def _gmm_online_setup(mdl_path: str, fst_path: str, beam: float,
                      acoustic_scale: float):
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    tm, am = read_mdl(mdl_path)
    dec = DenseDecoder(_load_hclg(fst_path), tm.tid_to_pdf_array,
                       DenseDecoderConfig(
                           beam=beam, acoustic_scale=acoustic_scale))
    return tm, am, dec


def _gmm_stream(am, dec, wave: np.ndarray, rate: float, chunk: int,
                deltas: bool = True,
                partial_cb=None) -> Tuple[List[int], List[int]]:
    """Feed the waveform chunk-by-chunk through online MFCC(+deltas) →
    GMM → SingleUtteranceDecoder.  Returns (olabels, tids); calls
    partial_cb(olabels) after each chunk when given."""
    from kaldi_tpu.decoder.online import SingleUtteranceDecoder
    from kaldi_tpu.features import (DeltaFeaturesOptions,
                                    FrameExtractionOptions, Mfcc,
                                    MfccOptions)
    from kaldi_tpu.features.online import OnlineFeaturePipeline
    mfcc = Mfcc(MfccOptions(frame_opts=FrameExtractionOptions(
        samp_freq=rate, dither=0.0)))
    pipe = OnlineFeaturePipeline(
        mfcc, deltas=DeltaFeaturesOptions() if deltas else None)
    online = SingleUtteranceDecoder(dec)
    fed = 0

    def pump(final: bool):
        nonlocal fed
        if final:
            pipe.input_finished()
        ready = pipe.num_frames_ready()
        if ready > fed:
            online.advance_decoding(np.asarray(
                am.loglikes(pipe.get_frames(fed, ready))))
            fed = ready

    for i in range(0, len(wave), chunk):
        pipe.accept_waveform(np.asarray(wave[i:i + chunk], np.float32))
        pump(False)
        if partial_cb is not None and fed > 0:
            try:
                _t, ols, _c = online.get_best_path(
                    use_final_probs=False)
                partial_cb(ols)
            except Exception:
                pass
    pump(True)
    tids, ols, _cost = online.get_best_path(use_final_probs=True)
    return ols, tids


# ---------------------------------------------------------------------------
# onlinebin (legacy online family)
# ---------------------------------------------------------------------------

@tool("online-wav-gmm-decode-faster")
def online_wav_gmm_decode_faster_tool(argv):
    """Legacy streaming GMM decode over a wav table
    (onlinebin/online-wav-gmm-decode-faster.cc): words + alignments
    out, partial hypotheses logged as they form."""
    from kaldi_tpu.fst.fst import SymbolTable
    po = ParseOptions("online-wav-gmm-decode-faster [opts] <model> "
                      "<fst> <wav-rspec> <words-wspec> [<ali-wspec>]")
    po.register("beam", float, 16.0, "decoding beam")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("chunk-length", float, 0.18, "seconds per chunk")
    po.register("word-symbol-table", str, "", "words.txt")
    args = po.read(argv)
    _tm, am, dec = _gmm_online_setup(args[0], args[1], po["beam"],
                                     po["acoustic-scale"])
    words_tab = (SymbolTable.read(po["word-symbol-table"])
                 if po["word-symbol-table"] else None)
    awriter = (TableWriter(args[4], holder="ivec")
               if len(args) > 4 else None)
    n = 0
    with TableWriter(args[3], holder="text") as w:
        for key, (wave, rate) in SequentialTableReader(args[2],
                                                       holder="wav"):
            chunk = max(1, int(po["chunk-length"] * rate))
            ols, tids = _gmm_stream(am, dec, wave, rate, chunk)
            w[key] = [words_tab.find(o) if words_tab else str(o)
                      for o in ols]
            if awriter:
                awriter[key] = np.asarray(tids, np.int32)
            n += 1
    if awriter:
        awriter.close()
    log.info("online-wav-gmm-decode-faster: %d utterances", n)
    return 0


@tool("online-gmm-decode-faster")
def online_gmm_decode_faster_tool(argv):
    """Legacy 'microphone' streaming GMM decode
    (onlinebin/online-gmm-decode-faster.cc): raw S16LE PCM from stdin
    (or --audio=<file>) stands in for the portaudio capture; partial
    hypotheses print as they form, the final line at end-of-stream."""
    import sys
    from kaldi_tpu.fst.fst import SymbolTable
    po = ParseOptions("online-gmm-decode-faster [opts] <model> <fst> "
                      "<words.txt>")
    po.register("beam", float, 16.0, "decoding beam")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("samp-freq", float, 16000.0, "input sample rate")
    po.register("chunk-length", float, 0.18, "seconds per chunk")
    po.register("audio", str, "",
                "raw S16LE file standing in for the microphone "
                "(default: stdin)")
    args = po.read(argv)
    _tm, am, dec = _gmm_online_setup(args[0], args[1], po["beam"],
                                     po["acoustic-scale"])
    words_tab = SymbolTable.read(args[2])
    if po["audio"]:
        with open(po["audio"], "rb") as f:
            raw = f.read()
    else:
        raw = sys.stdin.buffer.read()
    wave = np.frombuffer(raw, dtype="<i2").astype(np.float32)
    chunk = max(1, int(po["chunk-length"] * po["samp-freq"]))

    def partial(ols):
        print("partial: " + " ".join(words_tab.find(o) for o in ols))

    ols, _tids = _gmm_stream(am, dec, wave, po["samp-freq"], chunk,
                             partial_cb=partial)
    print(" ".join(words_tab.find(o) for o in ols))
    log.info("online-gmm-decode-faster: %d samples decoded",
             len(wave))
    return 0


@tool("online-server-gmm-decode-faster")
def online_server_gmm_decode_faster_tool(argv):
    """Legacy UDP decoding server
    (onlinebin/online-server-gmm-decode-faster.cc): clients send raw
    S16LE PCM datagrams (an empty datagram ends the utterance); the
    server replies to the sender with the hypothesis."""
    from kaldi_tpu.fst.fst import SymbolTable
    po = ParseOptions("online-server-gmm-decode-faster [opts] <model> "
                      "<fst> <words.txt>")
    po.register("udp-port", int, 5051, "listen port")
    po.register("beam", float, 16.0, "decoding beam")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("samp-freq", float, 16000.0, "input sample rate")
    po.register("max-utterances", int, 0,
                "serve this many utterances then exit (0 = forever)")
    args = po.read(argv)
    _tm, am, dec = _gmm_online_setup(args[0], args[1], po["beam"],
                                     po["acoustic-scale"])
    words_tab = SymbolTable.read(args[2])
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.bind(("127.0.0.1", po["udp-port"]))
    sock.settimeout(30.0)
    log.info("online-server-gmm-decode-faster: listening on udp:%d",
             sock.getsockname()[1])
    served = 0
    buf: Dict[Tuple[str, int], bytes] = {}
    try:
        while not po["max-utterances"] or served < po["max-utterances"]:
            try:
                data, addr = sock.recvfrom(65536)
            except socket.timeout:
                break
            if data:
                buf[addr] = buf.get(addr, b"") + data
                continue
            # empty datagram = end of utterance
            wave = np.frombuffer(buf.pop(addr, b""),
                                 dtype="<i2").astype(np.float32)
            chunk = max(1, int(0.18 * po["samp-freq"]))
            ols, _tids = _gmm_stream(am, dec, wave, po["samp-freq"],
                                     chunk)
            text = " ".join(words_tab.find(o) for o in ols)
            sock.sendto(text.encode() + b"\n", addr)
            served += 1
            log.info("served %s: %s", addr, text)
    finally:
        sock.close()
    return 0


@tool("online-net-client")
def online_net_client_tool(argv):
    """Legacy UDP client (onlinebin/online-net-client.cc): streams a
    wav table's audio to online-server-gmm-decode-faster and prints
    the hypotheses."""
    po = ParseOptions("online-net-client <server-host> <server-port> "
                      "<wav-rspec>")
    po.register("packet-size", int, 4096, "bytes per datagram")
    args = po.read(argv)
    host, port = args[0], int(args[1])
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.settimeout(60.0)
    n = 0
    try:
        for key, (wave, _rate) in SequentialTableReader(args[2],
                                                        holder="wav"):
            data = np.asarray(wave, np.int16).tobytes()
            for i in range(0, len(data), po["packet-size"]):
                sock.sendto(data[i:i + po["packet-size"]],
                            (host, port))
            sock.sendto(b"", (host, port))          # end marker
            reply, _addr = sock.recvfrom(65536)
            print(f"{key} {reply.decode().strip()}")
            n += 1
    finally:
        sock.close()
    log.info("online-net-client: %d utterances", n)
    return 0


@tool("online-audio-server-decode-faster")
def online_audio_server_decode_faster_tool(argv):
    """Legacy TCP audio server
    (onlinebin/online-audio-server-decode-faster.cc): one raw-S16LE
    audio stream per connection; replies with 'RESULT:' + hypothesis
    and per-word 'WORD:' lines (frame times), then closes."""
    from kaldi_tpu.fst.fst import SymbolTable
    po = ParseOptions("online-audio-server-decode-faster [opts] "
                      "<model> <fst> <words.txt>")
    po.register("port-num", int, 5052, "listen port")
    po.register("beam", float, 16.0, "decoding beam")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("samp-freq", float, 16000.0, "input sample rate")
    po.register("max-connections", int, 0,
                "serve this many connections then exit (0 = forever)")
    args = po.read(argv)
    tm, am, dec = _gmm_online_setup(args[0], args[1], po["beam"],
                                    po["acoustic-scale"])
    words_tab = SymbolTable.read(args[2])
    rate = po["samp-freq"]
    max_conn = po["max-connections"]
    served = threading.Semaphore(0)

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            self.request.settimeout(30.0)
            raw = b""
            while True:
                try:
                    data = self.request.recv(8192)
                except socket.timeout:
                    break
                if not data:
                    break
                raw += data
            wave = np.frombuffer(raw, dtype="<i2").astype(np.float32)
            if len(wave) < 400:           # not even one frame
                self.request.sendall(b"RESULT:\n")
                served.release()
                return
            chunk = max(1, int(0.18 * rate))
            ols, _tids = _gmm_stream(am, dec, wave, rate, chunk)
            text = " ".join(words_tab.find(o) for o in ols)
            out = [f"RESULT:{text}"]
            for o in ols:
                out.append(f"WORD:{words_tab.find(o)}")
            self.request.sendall(("\n".join(out) + "\n").encode())
            served.release()

    srv = socketserver.ThreadingTCPServer(("127.0.0.1",
                                           po["port-num"]), Handler)
    srv.daemon_threads = True
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    log.info("online-audio-server-decode-faster: listening on %d",
             srv.server_address[1])
    if max_conn:
        for _ in range(max_conn):
            served.acquire()
        srv.shutdown()
    else:
        th.join()
    srv.server_close()
    return 0


@tool("online-audio-client")
def online_audio_client_tool(argv):
    """Legacy TCP audio client (onlinebin/online-audio-client.cc):
    sends a wav table's audio to online-audio-server-decode-faster
    and prints each reply."""
    po = ParseOptions("online-audio-client <server-host> "
                      "<server-port> <wav-rspec>")
    args = po.read(argv)
    host, port = args[0], int(args[1])
    n = 0
    for key, (wave, _rate) in SequentialTableReader(args[2],
                                                    holder="wav"):
        with socket.create_connection((host, port),
                                      timeout=60) as sock:
            sock.sendall(np.asarray(wave, np.int16).tobytes())
            sock.shutdown(socket.SHUT_WR)
            sock.settimeout(120.0)
            got = b""
            while True:
                data = sock.recv(65536)
                if not data:
                    break
                got += data
        for line in got.decode().splitlines():
            print(f"{key} {line}")
        n += 1
    log.info("online-audio-client: %d utterances", n)
    return 0


# ---------------------------------------------------------------------------
# online2bin tail: nnet2 streaming
# ---------------------------------------------------------------------------

def _nnet2_stream_scores(params, model, cfg, pipe, wave, rate: float,
                         chunk: int) -> np.ndarray:
    """Chunked waveform → online MFCC → incremental nnet2 forward.
    The model splices ±ctx internally, so scoring frame t needs
    frames [t−ctx, t+ctx]: each step forwards the full available
    window and keeps the newly-final rows (the decodable-online
    contract — identical to the offline forward)."""
    import jax.numpy as jnp
    ctx = max(-min(cfg.splice), max(cfg.splice))
    rows: List[np.ndarray] = []
    done = 0

    def pump(final: bool):
        nonlocal done
        if final:
            pipe.input_finished()
        ready = pipe.num_frames_ready()
        safe = ready if final else max(ready - ctx, 0)
        if safe > done:
            feats = pipe.get_frames(0, ready)
            logp = np.asarray(model.apply(
                {"params": params},
                jnp.asarray(feats, jnp.float32)[None]))[0]
            rows.append(logp[done:safe])
            done = safe

    for i in range(0, len(wave), chunk):
        pipe.accept_waveform(np.asarray(wave[i:i + chunk], np.float32))
        pump(False)
    pump(True)
    return (np.concatenate(rows) if rows
            else np.zeros((0, cfg.num_pdfs), np.float32))


def _online2_nnet2_decode(argv, name: str, threaded: bool):
    from kaldi_tpu.am.nnet2 import Nnet2Model, load_nnet2_full
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.features import (FrameExtractionOptions, Mfcc,
                                    MfccOptions)
    from kaldi_tpu.features.online import OnlineFeaturePipeline
    from kaldi_tpu.fst.fst import SymbolTable
    po = ParseOptions(f"{name} [opts] <trans-model> <nnet2-in> <fst> "
                      "<wav-rspec> <words-wspec>")
    po.register("beam", float, 15.0, "decoding beam")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("chunk-length", float, 0.18, "seconds per chunk")
    po.register("sample-frequency", float, 16000.0, "expected rate")
    po.register("num-ceps", int, 13, "MFCC cepstra (model input dim)")
    po.register("word-symbol-table", str, "", "words.txt")
    po.register("num-threads", int, 4,
                "worker threads (threaded variant)")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    params, cfg, priors = load_nnet2_full(args[1])
    model = Nnet2Model(cfg)
    logpri = None
    if priors is not None:
        pr = np.asarray(priors, np.float64)
        logpri = np.log(np.maximum(pr / pr.sum(), 1e-20)).astype(
            np.float32)
    dec = DenseDecoder(_load_hclg(args[2]), tm.tid_to_pdf_array,
                       DenseDecoderConfig(
                           beam=po["beam"],
                           acoustic_scale=po["acoustic-scale"]))
    words_tab = (SymbolTable.read(po["word-symbol-table"])
                 if po["word-symbol-table"] else None)
    mfcc_opts = MfccOptions(
        frame_opts=FrameExtractionOptions(
            samp_freq=po["sample-frequency"], dither=0.0),
        num_ceps=po["num-ceps"])
    rate = po["sample-frequency"]
    chunk = max(1, int(po["chunk-length"] * rate))

    def one(item):
        from kaldi_tpu.decoder.online import SingleUtteranceDecoder
        key, (wave, wrate) = item
        if wrate != rate:
            raise KaldiError(f"{key}: rate {wrate} != {rate}")
        pipe = OnlineFeaturePipeline(Mfcc(mfcc_opts))
        scores = _nnet2_stream_scores(params, model, cfg, pipe, wave,
                                      rate, chunk)
        if logpri is not None:
            scores = scores - logpri[None, :]
        online = SingleUtteranceDecoder(dec)
        online.advance_decoding(scores)
        _t, ols, _c = online.get_best_path(use_final_probs=True)
        return key, [words_tab.find(o) if words_tab else str(o)
                     for o in ols]

    entries = list(SequentialTableReader(args[3], holder="wav"))
    if threaded:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=po["num-threads"]) as pool:
            results = list(pool.map(one, entries))
    else:
        results = [one(e) for e in entries]
    with TableWriter(args[4], holder="text") as w:
        for key, text in results:
            w[key] = text
    log.info("%s: %d utterances", name, len(results))
    return 0


@tool("online2-wav-nnet2-latgen-faster")
def online2_wav_nnet2_latgen_faster_tool(argv):
    """Streaming nnet2 decode
    (online2bin/online2-wav-nnet2-latgen-faster.cc)."""
    return _online2_nnet2_decode(argv,
                                 "online2-wav-nnet2-latgen-faster",
                                 threaded=False)


@tool("online2-wav-nnet2-latgen-threaded")
def online2_wav_nnet2_latgen_threaded_tool(argv):
    """Threaded streaming nnet2 decode
    (online2bin/online2-wav-nnet2-latgen-threaded.cc)."""
    return _online2_nnet2_decode(argv,
                                 "online2-wav-nnet2-latgen-threaded",
                                 threaded=True)


@tool("online2-wav-nnet2-am-compute")
def online2_wav_nnet2_am_compute_tool(argv):
    """Streaming nnet2 forward: wav chunks → online MFCC → chunked
    model forward; outputs equal the offline forward
    (online2bin/online2-wav-nnet2-am-compute.cc)."""
    from kaldi_tpu.am.nnet2 import Nnet2Model, load_nnet2
    from kaldi_tpu.features import (FrameExtractionOptions, Mfcc,
                                    MfccOptions)
    from kaldi_tpu.features.online import OnlineFeaturePipeline
    po = ParseOptions("online2-wav-nnet2-am-compute [opts] <nnet2-in> "
                      "<wav-rspec> <mat-wspec>")
    po.register("chunk-length", float, 0.18, "seconds per chunk")
    po.register("sample-frequency", float, 16000.0, "expected rate")
    po.register("num-ceps", int, 13, "MFCC cepstra")
    args = po.read(argv)
    params, cfg = load_nnet2(args[0])
    model = Nnet2Model(cfg)
    mfcc_opts = MfccOptions(
        frame_opts=FrameExtractionOptions(
            samp_freq=po["sample-frequency"], dither=0.0),
        num_ceps=po["num-ceps"])
    rate = po["sample-frequency"]
    chunk = max(1, int(po["chunk-length"] * rate))
    n = 0
    with TableWriter(args[2], holder="mat") as w:
        for key, (wave, wrate) in SequentialTableReader(args[1],
                                                        holder="wav"):
            if wrate != rate:
                raise KaldiError(f"{key}: rate {wrate} != {rate}")
            pipe = OnlineFeaturePipeline(Mfcc(mfcc_opts))
            scores = _nnet2_stream_scores(params, model, cfg, pipe,
                                          wave, rate, chunk)
            w[key] = scores.astype(np.float32)
            n += 1
    log.info("online2-wav-nnet2-am-compute: %d utterances", n)
    return 0


# ---------------------------------------------------------------------------
# online2bin tail: nnet3 grammar / incremental / wake word
# ---------------------------------------------------------------------------

@tool("online2-wav-nnet3-latgen-grammar")
def online2_wav_nnet3_latgen_grammar_tool(argv):
    """Streaming nnet3 decode over a grammar FST
    (online2bin/online2-wav-nnet3-latgen-grammar.cc): nonterminal
    sub-HCLGs are spliced in offline, then the standard streaming
    flow runs on the expanded graph."""
    import tempfile
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.cli.tools_bank7 import online2_wav_nnet3_latgen_faster
    from kaldi_tpu.fst.csr import csr_to_vector_fst, pack_fst
    from kaldi_tpu.fst.grammar import replace_nonterminals
    po = ParseOptions("online2-wav-nnet3-latgen-grammar [opts] "
                      "<trans-model> <raw-nnet3> <top-hclg> "
                      "<nonterm-int1> <sub-hclg1> [...] <wav-rspec> "
                      "<words-wspec>\n(passes residual options to "
                      "online2-wav-nnet3-latgen-faster)")
    po.register("beam", float, 15.0, "decoding beam")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    po.register("frame-subsampling-factor", int, 3, "subsampling")
    po.register("num-ceps", int, 13, "MFCC cepstra")
    po.register("word-symbol-table", str, "", "words.txt")
    args = po.read(argv)
    if len(args) < 7 or (len(args) - 5) % 2:
        raise KaldiError("online2-wav-nnet3-latgen-grammar: need "
                         "trans-model, nnet, top, (nonterm, sub)+, "
                         "wav, words")
    top = pack_fst(_load_fst(args[2]))
    subs = {}
    for i in range(3, len(args) - 2, 2):
        subs[int(args[i])] = pack_fst(_load_fst(args[i + 1]))
    expanded = csr_to_vector_fst(replace_nonterminals(top, subs))
    with tempfile.TemporaryDirectory() as td:
        fst_path = f"{td}/expanded.fst"
        _save_fst(fst_path, expanded)
        fwd_args = [f"--beam={po['beam']}",
                    f"--acoustic-scale={po['acoustic-scale']}",
                    "--frame-subsampling-factor="
                    f"{po['frame-subsampling-factor']}",
                    f"--num-ceps={po['num-ceps']}"]
        if po["word-symbol-table"]:
            fwd_args.append(
                f"--word-symbol-table={po['word-symbol-table']}")
        return online2_wav_nnet3_latgen_faster(
            fwd_args + [args[0], args[1], fst_path, args[-2],
                        args[-1]])


@tool("online2-wav-nnet3-latgen-incremental")
def online2_wav_nnet3_latgen_incremental_tool(argv):
    """Streaming nnet3 decode with INCREMENTAL lattice output
    (online2bin/online2-wav-nnet3-latgen-incremental.cc): the
    large-graph streaming decoder runs every utterance and the
    determinized CompactLattice is produced from the streamed state —
    bounded memory regardless of utterance length."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.cli.tools_bank3 import _load_tdnn
    from kaldi_tpu.decoder.beam import BeamDecoder, BeamDecoderConfig
    from kaldi_tpu.decoder.online_beam import OnlineBeamDecoder
    from kaldi_tpu.decoder.online_nnet import OnlineNnetScorer
    from kaldi_tpu.features import (FrameExtractionOptions, Mfcc,
                                    MfccOptions)
    from kaldi_tpu.features.online import OnlineFeaturePipeline
    from kaldi_tpu.fst.csr import pack_fst
    po = ParseOptions("online2-wav-nnet3-latgen-incremental [opts] "
                      "<trans-model> <raw-nnet3> <fst> <wav-rspec> "
                      "<lattice-wspec>")
    po.register("beam", float, 15.0, "decoding beam")
    po.register("lattice-beam", float, 8.0, "lattice beam")
    po.register("max-active", int, 7000, "max active states")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    po.register("frame-subsampling-factor", int, 3, "subsampling")
    po.register("chunk-length", float, 0.18, "seconds per chunk")
    po.register("sample-frequency", float, 16000.0, "expected rate")
    po.register("num-ceps", int, 13, "MFCC cepstra")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    sub = po["frame-subsampling-factor"]
    _, fwd = _load_tdnn(args[1], sub)
    cap = max(po["max-active"], 512)
    dec = BeamDecoder(pack_fst(_load_hclg(args[2])),
                      tm.tid_to_pdf_array,
                      BeamDecoderConfig(
                          beam=po["beam"],
                          lattice_beam=po["lattice-beam"],
                          acoustic_scale=po["acoustic-scale"],
                          max_active=po["max-active"],
                          lattice_arcs_per_frame=max(2 * cap, 4096),
                          record_capacity=65536))
    ob = OnlineBeamDecoder(dec)
    rate = po["sample-frequency"]
    chunk = max(1, int(po["chunk-length"] * rate))
    mfcc_opts = MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=rate, dither=0.0),
        num_ceps=po["num-ceps"])
    n = 0
    with TableWriter(args[4], holder="clat") as w:
        for key, (wave, wrate) in SequentialTableReader(args[3],
                                                        holder="wav"):
            if wrate != rate:
                raise KaldiError(f"{key}: rate {wrate} != {rate}")
            pipe = OnlineFeaturePipeline(Mfcc(mfcc_opts))
            scorer = OnlineNnetScorer(fwd, subsample=sub)
            ob.reset()
            fed = 0

            def pump(final: bool):
                nonlocal fed
                if final:
                    pipe.input_finished()
                ready = pipe.num_frames_ready()
                if ready > fed:
                    scorer.accept_features(pipe.get_frames(fed, ready))
                    fed = ready
                if final:
                    scorer.input_finished()
                scores = scorer.read_new()
                if scores.size:
                    ob.advance(scores)

            for i in range(0, len(wave), chunk):
                pipe.accept_waveform(np.asarray(wave[i:i + chunk],
                                                np.float32))
                pump(False)
            pump(True)
            w[key] = ob.finalize()
            n += 1
    log.info("online2-wav-nnet3-latgen-incremental: %d utterances", n)
    return 0


@tool("online2-wav-nnet3-wake-word-decoder-faster")
def online2_wav_nnet3_wake_word_decoder_faster_tool(argv):
    """Streaming wake-word detection
    (online2bin/online2-wav-nnet3-wake-word-decoder-faster.cc): the
    partial best path is checked after every chunk; the first chunk
    whose hypothesis contains the wake word ends decoding.  Output:
    '<detected 0|1> <frame>' per utterance."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.cli.tools_bank3 import _load_tdnn
    from kaldi_tpu.cli.tools_extra import _load_fst
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.decoder.online import SingleUtteranceDecoder
    from kaldi_tpu.decoder.online_nnet import OnlineNnetScorer
    from kaldi_tpu.features import (FrameExtractionOptions, Mfcc,
                                    MfccOptions)
    from kaldi_tpu.features.online import OnlineFeaturePipeline
    po = ParseOptions("online2-wav-nnet3-wake-word-decoder-faster "
                      "[opts] <trans-model> <raw-nnet3> <fst> "
                      "<wake-word-int> <wav-rspec> <result-wspec>")
    po.register("beam", float, 15.0, "decoding beam")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    po.register("frame-subsampling-factor", int, 3, "subsampling")
    po.register("chunk-length", float, 0.18, "seconds per chunk")
    po.register("sample-frequency", float, 16000.0, "expected rate")
    po.register("num-ceps", int, 13, "MFCC cepstra")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    sub = po["frame-subsampling-factor"]
    _, fwd = _load_tdnn(args[1], sub)
    dec = DenseDecoder(_load_fst(args[2]), tm.tid_to_pdf_array,
                       DenseDecoderConfig(
                           beam=po["beam"],
                           acoustic_scale=po["acoustic-scale"]))
    wake = int(args[3])
    rate = po["sample-frequency"]
    chunk = max(1, int(po["chunk-length"] * rate))
    mfcc_opts = MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=rate, dither=0.0),
        num_ceps=po["num-ceps"])
    n = n_det = 0
    with TableWriter(args[5], holder="text") as w:
        for key, (wave, wrate) in SequentialTableReader(args[4],
                                                        holder="wav"):
            if wrate != rate:
                raise KaldiError(f"{key}: rate {wrate} != {rate}")
            pipe = OnlineFeaturePipeline(Mfcc(mfcc_opts))
            scorer = OnlineNnetScorer(fwd, subsample=sub)
            online = SingleUtteranceDecoder(dec)
            fed = 0
            hit_frame = -1

            def pump(final: bool):
                nonlocal fed
                if final:
                    pipe.input_finished()
                ready = pipe.num_frames_ready()
                if ready > fed:
                    scorer.accept_features(pipe.get_frames(fed, ready))
                    fed = ready
                if final:
                    scorer.input_finished()
                scores = scorer.read_new()
                if scores.size:
                    online.advance_decoding(scores)

            for i in range(0, len(wave), chunk):
                pipe.accept_waveform(np.asarray(wave[i:i + chunk],
                                                np.float32))
                pump(False)
                if online.num_frames_decoded > 0:
                    try:
                        _t, ols, _c = online.get_best_path(
                            use_final_probs=False)
                    except Exception:
                        continue
                    if wake in ols:
                        hit_frame = online.num_frames_decoded
                        break
            else:
                pump(True)
                if online.num_frames_decoded > 0:
                    _t, ols, _c = online.get_best_path(
                        use_final_probs=True)
                    if wake in ols:
                        hit_frame = online.num_frames_decoded
            w[key] = [str(int(hit_frame >= 0)), str(hit_frame)]
            n += 1
            n_det += int(hit_frame >= 0)
    log.info("online2-wav-nnet3-wake-word-decoder-faster: %d/%d "
             "detections", n_det, n)
    return 0


# ---------------------------------------------------------------------------
# codec + ivector odds and ends
# ---------------------------------------------------------------------------

@tool("compress-uncompress-speex")
def compress_uncompress_speex_tool(argv):
    """Lossy codec round-trip for robustness testing — the
    online2bin/compress-uncompress-speex.cc role.  Speex itself is
    not in this environment; the stand-in is 8-bit µ-law
    companding (G.711 µ), the classic telephony codec: same tool
    contract (wav in, degraded wav out), documented divergence."""
    po = ParseOptions("compress-uncompress-speex <wav-rspec> "
                      "<wav-wspec>")
    po.register("mu", float, 255.0, "µ-law compression constant")
    args = po.read(argv)
    mu = po["mu"]
    n = 0
    with TableWriter(args[1], holder="wav") as w:
        for key, (wave, rate) in SequentialTableReader(args[0],
                                                       holder="wav"):
            x = np.asarray(wave, np.float64) / 32768.0
            x = np.clip(x, -1.0, 1.0)
            y = np.sign(x) * np.log1p(mu * np.abs(x)) / np.log1p(mu)
            q = np.round(y * 127.0) / 127.0        # 8-bit quantization
            z = np.sign(q) * ((1.0 + mu) ** np.abs(q) - 1.0) / mu
            w[key] = ((z * 32767.0).astype(np.int16), rate)
            n += 1
    log.info("compress-uncompress-speex: %d utterances (µ-law "
             "stand-in)", n)
    return 0


@tool("ivector-randomize")
def ivector_randomize_tool(argv):
    """Randomize online-ivector rows for training robustness
    (online2bin/ivector-randomize.cc): row t is replaced by row u
    drawn uniformly from [t, T) with probability
    --randomize-prob."""
    po = ParseOptions("ivector-randomize [opts] <ivec-mat-rspec> "
                      "<ivec-mat-wspec>")
    po.register("randomize-prob", float, 0.5,
                "per-row probability of jumping forward")
    po.register("srand", int, 0, "seed")
    args = po.read(argv)
    rng = np.random.default_rng(po["srand"])
    n = 0
    with TableWriter(args[1], holder="mat") as w:
        for key, m in SequentialTableReader(args[0], holder="mat"):
            m = np.asarray(m, np.float32)
            out = m.copy()
            T = len(m)
            for t in range(T):
                if rng.random() < po["randomize-prob"]:
                    out[t] = m[int(rng.integers(t, T))]
            w[key] = out
            n += 1
    log.info("ivector-randomize: %d matrices", n)
    return 0


@tool("ivector-extractor-copy")
def ivector_extractor_copy_tool(argv):
    """Copy an i-vector extractor
    (ivectorbin/ivector-extractor-copy.cc)."""
    from kaldi_tpu.am.ivector import (read_ivector_extractor,
                                      write_ivector_extractor)
    po = ParseOptions("ivector-extractor-copy <extractor-in> "
                      "<extractor-out>")
    args = po.read(argv)
    ex = read_ivector_extractor(args[0])
    write_ivector_extractor(args[1], ex)
    log.info("ivector-extractor-copy: %d Gaussians, ivector dim %d",
             ex.means.shape[0], ex.ivector_dim)
    return 0
