"""Twenty-fourth bank of CLI tools: the online2 TCP decoding server,
fstbin utility tail, grammar-FST compilation, and keyword-search
proxy generation.

Canonical shapes mirrored (SURVEY.md §2.1 bins):
online2bin/{online2-tcp-nnet3-decode-faster, extend-wav-with-silence,
ivector-randomize}.cc,
fstbin/{fstdeterminizelog, fstpropfinal, fstrhocompose, fsts-concat,
fsts-project, fsts-union, make-grammar-fst}.cc,
kwsbin/{generate-proxy-keywords, print-proxy-keywords}.cc.
"""

from __future__ import annotations

import heapq
import math
import socket
import socketserver
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from kaldi_tpu.cli.tools import tool
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


# ---------------------------------------------------------------------------
# online2bin
# ---------------------------------------------------------------------------

@tool("online2-tcp-nnet3-decode-faster")
def online2_tcp_nnet3_decode_faster_tool(argv):
    """TCP streaming recognition server
    (online2bin/online2-tcp-nnet3-decode-faster.cc): clients send raw
    S16LE PCM; the server streams back partial hypotheses terminated
    by '\\r' and, at an endpoint or end-of-stream, the final
    hypothesis terminated by '\\n' — the upstream wire protocol.
    --max-connections bounds the serving loop (0 = serve forever)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.cli.tools_bank3 import _load_tdnn
    from kaldi_tpu.cli.tools_extra import _load_fst
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.decoder.online import SingleUtteranceDecoder
    from kaldi_tpu.decoder.online_nnet import OnlineNnetScorer
    from kaldi_tpu.features import (FrameExtractionOptions, Mfcc,
                                    MfccOptions)
    from kaldi_tpu.features.online import OnlineFeaturePipeline
    from kaldi_tpu.fst.fst import SymbolTable
    po = ParseOptions("online2-tcp-nnet3-decode-faster [opts] "
                      "<trans-model> <raw-nnet3> <fst> <words.txt>")
    po.register("port-num", int, 5050, "listen port")
    po.register("samp-freq", float, 16000.0, "expected sample rate")
    po.register("chunk-length", float, 0.18, "seconds per decode step")
    po.register("beam", float, 15.0, "decoding beam")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    po.register("frame-subsampling-factor", int, 3, "subsampling")
    po.register("num-ceps", int, 13, "MFCC cepstra (model input dim)")
    po.register("max-connections", int, 0,
                "serve this many connections then exit (0 = forever)")
    po.register("read-timeout", float, 10.0,
                "seconds without data before finalizing")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    _, fwd = _load_tdnn(args[1], po["frame-subsampling-factor"])
    HCLG = _load_fst(args[2])
    words_tab = SymbolTable.read(args[3])
    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array, DenseDecoderConfig(
        beam=po["beam"], acoustic_scale=po["acoustic-scale"]))
    rate = po["samp-freq"]
    chunk_samples = max(1, int(po["chunk-length"] * rate))
    sub = po["frame-subsampling-factor"]
    num_ceps = po["num-ceps"]
    served = threading.Semaphore(0)
    max_conn = po["max-connections"]

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            self.request.settimeout(po["read-timeout"])
            mfcc = Mfcc(MfccOptions(
                frame_opts=FrameExtractionOptions(samp_freq=rate,
                                                  dither=0.0),
                num_ceps=num_ceps))
            pipe = OnlineFeaturePipeline(mfcc)
            scorer = OnlineNnetScorer(fwd, subsample=sub)
            online = SingleUtteranceDecoder(dec)
            fed = 0
            buf = b""

            def hyp_text():
                try:
                    _t, ols, _c = online.get_best_path(
                        use_final_probs=False)
                except Exception:
                    return ""
                return " ".join(words_tab.find(o) for o in ols)

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
                    return True
                return False

            try:
                while True:
                    try:
                        data = self.request.recv(4096)
                    except socket.timeout:
                        break
                    if not data:
                        break
                    buf += data
                    n_samp = (len(buf) // (2 * chunk_samples)) \
                        * chunk_samples
                    if n_samp:
                        pcm = np.frombuffer(buf[:2 * n_samp],
                                            np.int16)
                        buf = buf[2 * n_samp:]
                        pipe.accept_waveform(
                            pcm.astype(np.float32))
                        if pump(final=False):
                            self.request.sendall(
                                (hyp_text() + "\r").encode())
            finally:
                if buf:
                    pipe.accept_waveform(np.frombuffer(
                        buf[:2 * (len(buf) // 2)],
                        np.int16).astype(np.float32))
                try:
                    pump(final=True)
                    _t, ols, _c = online.get_best_path(
                        use_final_probs=True)
                    text = " ".join(words_tab.find(o) for o in ols)
                except Exception:
                    text = ""
                try:
                    self.request.sendall((text + "\n").encode())
                except OSError:
                    pass
                log.info("tcp client %s: %s", self.client_address,
                         text)
                served.release()

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    with Server(("0.0.0.0", po["port-num"]), Handler) as srv:
        log.info("online2-tcp: listening on port %d",
                 srv.server_address[1])
        print(srv.server_address[1], flush=True)   # actual port (0→OS)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        if max_conn > 0:
            for _ in range(max_conn):
                served.acquire()
            srv.shutdown()
        else:
            t.join()
    return 0


@tool("extend-wav-with-silence")
def extend_wav_with_silence_tool(argv):
    """Append low-energy 'silence' to each waveform
    (online2bin/extend-wav-with-silence.cc — gives the online decoder
    room to flush its final frames)."""
    po = ParseOptions("extend-wav-with-silence [opts] <wav-rspec> "
                      "<wav-wspec>")
    po.register("extra-silence-length", float, 1.0,
                "seconds of silence to append")
    args = po.read(argv)
    n = 0
    with TableWriter(args[1], holder="wav") as w:
        for key, (wave, rate) in SequentialTableReader(args[0],
                                                       holder="wav"):
            wave = np.asarray(wave)
            ns = int(po["extra-silence-length"] * rate)
            # match the quietest observed level so the appended tail
            # doesn't step the energy VAD (the reference searches for
            # the lowest-energy window and repeats it)
            win = max(1, int(0.025 * rate))
            T = len(wave) - win
            if T > 0:
                e = np.convolve(np.square(wave.astype(np.float64)),
                                np.ones(win), mode="valid")
                lo = int(np.argmin(e))
                seg = wave[lo:lo + win].astype(np.float64)
            else:
                seg = np.zeros(win)
            reps = int(np.ceil(ns / win))
            tail = np.tile(seg, reps)[:ns]
            # the wav holder reads float32 in int16 RANGE but treats
            # float writes as [-1,1]: write int16 to round-trip
            out = np.concatenate([wave.astype(np.float64), tail])
            w[key] = (np.clip(out, -32768, 32767).astype(np.int16),
                      rate)
            n += 1
    log.info("extend-wav-with-silence: %d waveforms (+%.2fs)", n,
             po["extra-silence-length"])
    return 0


@tool("ivector-randomize")
def ivector_randomize_tool(argv):
    """Randomly zero rows of online-ivector matrices
    (ivectorbin/ivector-randomize.cc — augmentation for online
    i-vector egs: with probability p a row is replaced by an earlier
    row, simulating a less-converged estimate)."""
    po = ParseOptions("ivector-randomize [opts] <ivec-matrix-rspec> "
                      "<ivec-matrix-wspec>")
    po.register("randomize-prob", float, 0.5,
                "per-row replacement probability")
    po.register("srand", int, 0, "seed")
    args = po.read(argv)
    rng = np.random.default_rng(po["srand"])
    n = 0
    with TableWriter(args[1], holder="mat") as w:
        for key, m in SequentialTableReader(args[0], holder="mat"):
            m = np.asarray(m).copy()
            for t in range(1, len(m)):
                if rng.random() < po["randomize-prob"]:
                    m[t] = m[rng.integers(0, t + 1)]
            w[key] = m
            n += 1
    log.info("ivector-randomize: %d matrices", n)
    return 0


# ---------------------------------------------------------------------------
# fstbin tail
# ---------------------------------------------------------------------------

@tool("fstdeterminizelog")
def fstdeterminizelog_tool(argv):
    """Determinize in the LOG semiring (fstbin/fstdeterminizelog.cc:
    weights of merged paths combine by log-add rather than min — used
    where probability mass must be preserved, e.g. G for sampling).
    Implemented as subset determinization with log-add residuals."""
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.fst import Arc, VectorFst
    po = ParseOptions("fstdeterminizelog <fst-in> <fst-out>")
    args = po.read(argv)
    f = _load_fst(args[0])

    def logsum(costs):
        m = min(costs)
        return m - math.log(sum(math.exp(m - c) for c in costs))

    # subset determinization: subset = tuple of (state, residual cost)
    out = VectorFst()
    start_sub = ((f.start, 0.0),)
    ids = {start_sub: out.add_state()}
    out.start = ids[start_sub]
    stack = [start_sub]
    while stack:
        sub = stack.pop()
        sid = ids[sub]
        # final weight: log-add over members
        finals = [r + f.final(s) for s, r in sub
                  if math.isfinite(f.final(s))]
        if finals:
            out.set_final(sid, logsum(finals))
        by_label: Dict[Tuple[int, int], Dict[int, List[float]]] = {}
        for s, r in sub:
            for a in f.arcs[s]:
                by_label.setdefault((a.ilabel, a.olabel), {}) \
                    .setdefault(a.nextstate, []).append(r + a.weight)
        for (il, ol), dests in sorted(by_label.items()):
            merged = {ns: logsum(cs) for ns, cs in dests.items()}
            w = logsum(list(merged.values()))
            nsub = tuple(sorted((ns, c - w)
                                for ns, c in merged.items()))
            if nsub not in ids:
                ids[nsub] = out.add_state()
                stack.append(nsub)
            out.add_arc(sid, Arc(il, ol, w, ids[nsub]))
        if len(ids) > 1_000_000:
            raise KaldiError("fstdeterminizelog: blowup")
    _save_fst(args[1], out)
    log.info("fstdeterminizelog: %d → %d states", f.num_states,
             out.num_states)
    return 0


@tool("fstpropfinal")
def fstpropfinal_tool(argv):
    """Propagate final-ness backward through ε-like arcs of a given
    symbol (fstbin/fstpropfinal.cc: states reaching a final state via
    phi/ε paths become final with the accumulated weight)."""
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    po = ParseOptions("fstpropfinal <phi-symbol> <fst-in> <fst-out>")
    args = po.read(argv)
    phi = int(args[0])
    f = _load_fst(args[1])
    # relax final costs through phi arcs until fixpoint (costs only
    # decrease; graph is small — Bellman-Ford style)
    changed = True
    iters = 0
    while changed and iters < f.num_states + 1:
        changed = False
        iters += 1
        for s in range(f.num_states):
            for a in f.arcs[s]:
                if a.ilabel == phi:
                    cand = a.weight + f.final(a.nextstate)
                    if cand < f.final(s) - 1e-12:
                        f.set_final(s, cand)
                        changed = True
    _save_fst(args[2], f)
    return 0


@tool("fstrhocompose")
def fstrhocompose_tool(argv):
    """Compose with rho ('rest') matching on fst2
    (fstbin/fstrhocompose.cc): a rho arc matches ANY label fst2 has
    no explicit arc for, CONSUMING the label (contrast phi, which
    redirects and re-matches)."""
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.fst import Arc, VectorFst
    po = ParseOptions("fstrhocompose <rho-symbol> <fst1-in> <fst2-in> "
                      "<fst-out>")
    args = po.read(argv)
    rho = int(args[0])
    f1 = _load_fst(args[1])
    f2 = _load_fst(args[2])
    idx, rho_arc = [], []
    for s in range(f2.num_states):
        d = {}
        r = None
        for a in f2.arcs[s]:
            if a.ilabel == rho:
                r = a
            else:
                d[a.ilabel] = a
        idx.append(d)
        rho_arc.append(r)
    out = VectorFst()
    ids = {(f1.start, f2.start): out.add_state()}
    out.start = 0
    stack = [(f1.start, f2.start)]
    while stack:
        q1, q2 = stack.pop()
        sid = ids[(q1, q2)]
        fw = f1.final(q1) + f2.final(q2)
        if math.isfinite(fw):
            out.set_final(sid, fw)
        for a in f1.arcs[q1]:
            if a.olabel == 0:
                m = Arc(0, 0, 0.0, q2)      # ε passes through
            else:
                m = idx[q2].get(a.olabel) or rho_arc[q2]
                if m is None:
                    continue
            key = (a.nextstate, m.nextstate)
            if key not in ids:
                ids[key] = out.add_state()
                stack.append(key)
            ol = m.olabel if m.olabel != rho else a.olabel
            out.add_arc(sid, Arc(a.ilabel, ol, a.weight + m.weight,
                                 ids[key]))
    _save_fst(args[3], out)
    log.info("fstrhocompose: %d states", out.num_states)
    return 0


def _fsts_tablewise(argv, name, op):
    po = ParseOptions(f"{name} <fsts-rspec1> <fsts-rspec2> "
                      "<fsts-wspec>")
    args = po.read(argv)
    other = RandomAccessTableReader(args[1], holder="fst")
    n = 0
    with TableWriter(args[2], holder="fst") as w:
        for key, f in SequentialTableReader(args[0], holder="fst"):
            if key not in other:
                log.warning("%s: no pair for %s", name, key)
                continue
            w[key] = op(f, other[key])
            n += 1
    log.info("%s: %d fsts", name, n)
    return 0


@tool("fsts-concat")
def fsts_concat_tool(argv):
    """Per-key concatenation of two FST tables
    (fstbin/fsts-concat.cc): every final of the first connects by ε
    to the second's start."""
    from kaldi_tpu.fst.fst import Arc, VectorFst

    def concat(a, b):
        out = VectorFst()
        for s in range(a.num_states):
            out.add_state()
        off = a.num_states
        for s in range(b.num_states):
            out.add_state()
        out.start = a.start
        for s in range(a.num_states):
            for arc in a.arcs[s]:
                out.add_arc(s, Arc(arc.ilabel, arc.olabel, arc.weight,
                                   arc.nextstate))
            fw = a.final(s)
            if math.isfinite(fw):
                out.add_arc(s, Arc(0, 0, fw, off + b.start))
        for s in range(b.num_states):
            for arc in b.arcs[s]:
                out.add_arc(off + s, Arc(arc.ilabel, arc.olabel,
                                         arc.weight,
                                         off + arc.nextstate))
            fw = b.final(s)
            if math.isfinite(fw):
                out.set_final(off + s, fw)
        return out

    return _fsts_tablewise(argv, "fsts-concat", concat)


@tool("fsts-union")
def fsts_union_tool(argv):
    """Per-key union of two FST tables (fstbin/fsts-union.cc): a new
    superinitial state ε-branches to both starts."""
    from kaldi_tpu.fst.fst import Arc, VectorFst

    def union(a, b):
        out = VectorFst()
        root = out.add_state()
        out.start = root
        for f in (a, b):
            off = out.num_states
            for s in range(f.num_states):
                out.add_state()
            out.add_arc(root, Arc(0, 0, 0.0, off + f.start))
            for s in range(f.num_states):
                for arc in f.arcs[s]:
                    out.add_arc(off + s, Arc(arc.ilabel, arc.olabel,
                                             arc.weight,
                                             off + arc.nextstate))
                fw = f.final(s)
                if math.isfinite(fw):
                    out.set_final(off + s, fw)
        return out

    return _fsts_tablewise(argv, "fsts-union", union)


@tool("fsts-project")
def fsts_project_tool(argv):
    """Project a table of FSTs onto input or output labels
    (fstbin/fsts-project.cc)."""
    po = ParseOptions("fsts-project [--project-output=false] "
                      "<fsts-rspec> <fsts-wspec>")
    po.register("project-output", bool, False, "project onto olabels")
    args = po.read(argv)
    n = 0
    with TableWriter(args[1], holder="fst") as w:
        for key, f in SequentialTableReader(args[0], holder="fst"):
            for s in range(f.num_states):
                for a in f.arcs[s]:
                    if po["project-output"]:
                        a.ilabel = a.olabel
                    else:
                        a.olabel = a.ilabel
            w[key] = f
            n += 1
    log.info("fsts-project: %d fsts", n)
    return 0


@tool("make-grammar-fst")
def make_grammar_fst_tool(argv):
    """Splice nonterminal sub-HCLGs into a top-level HCLG
    (fstbin/make-grammar-fst.cc).  The reference builds a GrammarFst
    expanded lazily at decode time; this implementation expands
    offline via fst/grammar.py replace_nonterminals — the decoder
    consumes the result like any HCLG (swap_sub supports runtime
    replacement through the library API)."""
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.csr import csr_to_vector_fst, pack_fst
    from kaldi_tpu.fst.grammar import replace_nonterminals
    po = ParseOptions("make-grammar-fst <top-hclg> <nonterm-int1> "
                      "<sub-hclg1> [<nonterm-int2> <sub-hclg2> ...] "
                      "<fst-out>")
    args = po.read(argv)
    if len(args) < 4 or len(args) % 2 != 0:
        raise KaldiError("make-grammar-fst: need top, (nonterm, sub) "
                         "pairs, out")
    top = pack_fst(_load_fst(args[0]))
    subs = {}
    for i in range(1, len(args) - 1, 2):
        subs[int(args[i])] = pack_fst(_load_fst(args[i + 1]))
    expanded = replace_nonterminals(top, subs)
    _save_fst(args[-1], csr_to_vector_fst(expanded))
    log.info("make-grammar-fst: %d nonterminals → %d states",
             len(subs), expanded.num_states)
    return 0


# ---------------------------------------------------------------------------
# kwsbin proxies
# ---------------------------------------------------------------------------

def _weighted_edit_proxies(kw_pron: List[int],
                           lex: Dict[int, List[List[int]]],
                           conf_cost, max_cost: float,
                           nbest: int) -> List[Tuple[int, float]]:
    """Words whose pronunciation is within weighted edit cost of the
    keyword's (generate-proxy-keywords' K×L2⁻¹×E×L1 composition,
    solved directly as a Dijkstra over (word, position) — the same
    proxy set without materializing the intermediate FSTs)."""
    out = []
    for wid, prons in lex.items():
        best = math.inf
        for pron in prons:
            n, m = len(kw_pron), len(pron)
            dp = np.full((n + 1, m + 1), np.inf)
            dp[0, 0] = 0.0
            for i in range(n + 1):
                for j in range(m + 1):
                    c = dp[i, j]
                    if not math.isfinite(c):
                        continue
                    if i < n:
                        dp[i + 1, j] = min(dp[i + 1, j],
                                           c + conf_cost(kw_pron[i], 0))
                    if j < m:
                        dp[i, j + 1] = min(dp[i, j + 1],
                                           c + conf_cost(0, pron[j]))
                    if i < n and j < m:
                        dp[i + 1, j + 1] = min(
                            dp[i + 1, j + 1],
                            c + conf_cost(kw_pron[i], pron[j]))
            best = min(best, float(dp[n, m]))
        if best <= max_cost:
            out.append((wid, best))
    out.sort(key=lambda t: t[1])
    return out[:nbest]


@tool("generate-proxy-keywords")
def generate_proxy_keywords_tool(argv):
    """Phone-confusability proxy keywords for OOV/KWS
    (kwsbin/generate-proxy-keywords.cc): each keyword's pronunciation
    is matched against the whole lexicon under a weighted
    edit-distance confusion model; proxies within --proxy-beam become
    alternative linear FSTs."""
    from kaldi_tpu.core import io as kio
    from kaldi_tpu.fst.fst import Arc, VectorFst
    po = ParseOptions("generate-proxy-keywords [opts] <lexicon.int> "
                      "<keywords-rspec> <proxy-fsts-wspec>\n"
                      "lexicon.int: '<word-int> <phone-int>...' lines;"
                      " keywords: word-id sequences")
    po.register("proxy-beam", float, 4.0, "max edit cost")
    po.register("nbest", int, 10, "proxies per keyword")
    po.register("confusion-matrix", str, "",
                "file of '<ph1> <ph2> <cost>' lines (default: sub 1, "
                "ins/del 1)")
    args = po.read(argv)
    lex: Dict[int, List[List[int]]] = {}
    with kio.open_rxfilename(args[0]) as f:
        for ln in f.read().decode().splitlines():
            parts = ln.split()
            if len(parts) >= 2:
                lex.setdefault(int(parts[0]), []).append(
                    [int(p) for p in parts[1:]])
    conf: Dict[Tuple[int, int], float] = {}
    if po["confusion-matrix"]:
        with kio.open_rxfilename(po["confusion-matrix"]) as f:
            for ln in f.read().decode().splitlines():
                parts = ln.split()
                if len(parts) == 3:
                    conf[(int(parts[0]), int(parts[1]))] = \
                        float(parts[2])

    def conf_cost(a, b):
        if a == b:
            return 0.0
        return conf.get((a, b), 1.0)

    n = 0
    with TableWriter(args[2], holder="fst") as w:
        for key, kw_words in SequentialTableReader(args[1],
                                                   holder="text"):
            pron: List[int] = []
            ok = True
            for tok in kw_words:
                wid = int(tok)
                if wid not in lex:
                    log.warning("keyword %s: word %d not in lexicon",
                                key, wid)
                    ok = False
                    break
                pron.extend(lex[wid][0])
            if not ok:
                continue
            proxies = _weighted_edit_proxies(
                pron, lex, conf_cost, po["proxy-beam"], po["nbest"])
            out = VectorFst()
            s0 = out.add_state()
            out.start = s0
            s1 = out.add_state()
            out.set_final(s1, 0.0)
            for wid, cost in proxies:
                out.add_arc(s0, Arc(wid, wid, cost, s1))
            w[key] = out
            n += 1
    log.info("generate-proxy-keywords: %d keywords", n)
    return 0


@tool("print-proxy-keywords")
def print_proxy_keywords_tool(argv):
    """Print proxy-keyword FSTs as '<kw> <word> <cost>' lines
    (kwsbin/print-proxy-keywords.cc)."""
    po = ParseOptions("print-proxy-keywords <proxy-fsts-rspec> "
                      "[<words.txt>]")
    args = po.read(argv)
    words = None
    if len(args) > 1:
        from kaldi_tpu.fst.fst import SymbolTable
        words = SymbolTable.read(args[1])
    for key, f in SequentialTableReader(args[0], holder="fst"):
        for a in f.arcs[f.start]:
            name = words.find(a.olabel) if words else str(a.olabel)
            print(f"{key} {name} {a.weight:.4f}")
    return 0
