"""Twenty-eighth bank of CLI tools: bin/fstbin/latbin/chainbin/
rnnlmbin/kwsbin tails — fused equal alignment, mapped aligners and
incremental latgen, context-FST construction, random FST generation,
lattice n-gram expansion, chain supervision binaries, RNNLM sampling
LMs, keyword-search scoring.

Canonical shapes mirrored (SURVEY.md §2.1 bins):
bin/{align-equal, align-compiled-mapped, compare-int-vector,
prons-to-wordali, make-ilabel-transducer, latgen-incremental-mapped}.cc,
fstbin/{fstmakecontextfst, fstmakecontextsyms, fstrand}.cc,
latbin/{lattice-expand, lattice-lmrescore-rnnlm}.cc,
chainbin/{chain-get-supervision, chain-make-den-fst,
chain-make-num-fst-e2e}.cc,
rnnlmbin/rnnlm-get-sampling-lm.cc, kwsbin/compute-atwv.cc.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from kaldi_tpu.cli.tools import tool, _load_hclg
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


# ---------------------------------------------------------------------------
# bin tail
# ---------------------------------------------------------------------------

@tool("align-equal")
def align_equal_tool(argv):
    """Equal-spaced alignment straight from transcripts: compiles
    per-utterance graphs then distributes frames evenly
    (bin/align-equal.cc = compile-train-graphs + align-equal-compiled
    fused)."""
    import tempfile
    from kaldi_tpu.cli import TOOLS
    po = ParseOptions("align-equal <lexicon-file> <model-in> "
                      "<feats-rspec> <text-rspec> <ali-wspec>")
    args = po.read(argv)
    with tempfile.TemporaryDirectory() as td:
        rc = TOOLS["compile-train-graphs"](
            [args[0], args[1], args[3], f"ark:{td}/graphs.ark"])
        if rc != 0:
            return rc
        return TOOLS["align-equal-compiled"](
            [f"ark:{td}/graphs.ark", args[2], args[4]])


@tool("align-compiled-mapped")
def align_compiled_mapped_tool(argv):
    """Forced alignment from precomputed loglike matrices over
    compiled graphs (bin/align-compiled-mapped.cc; rows are pdf
    loglikes, the transition model supplies tid→pdf)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.decoder.align import (DenseAligner, in_degrees,
                                         pack_dense_reverse)
    po = ParseOptions("align-compiled-mapped [opts] <trans-model> "
                      "<graphs-rspec> <loglikes-rspec> <ali-wspec>")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    graphs = dict(SequentialTableReader(args[1], holder="fst"))
    aligner = DenseAligner(tm.tid_to_pdf_array,
                           acoustic_scale=po["acoustic-scale"])
    ae = an = smax = 1
    for g in graphs.values():
        e, n = in_degrees(g)
        ae, an = max(ae, e), max(an, n)
        smax = max(smax, g.num_states)
    n_done = 0
    with TableWriter(args[3], holder="ivec") as w:
        for key, ll in SequentialTableReader(args[2], holder="mat"):
            if key not in graphs:
                log.warning("align-compiled-mapped: no graph for %s",
                            key)
                continue
            g = pack_dense_reverse(graphs[key], smax, ae, an)
            (tids, _cost), = aligner.align_batch(
                [g], [np.asarray(ll, np.float32)])
            w[key] = np.asarray(tids, np.int32)
            n_done += 1
    log.info("align-compiled-mapped: aligned %d utterances", n_done)
    return 0


@tool("compare-int-vector")
def compare_int_vector_tool(argv):
    """Element-wise comparison of two int-vector tables
    (bin/compare-int-vector.cc): prints the fraction of differing
    entries; nonzero exit when any pair differs (or lengths
    mismatch)."""
    po = ParseOptions("compare-int-vector <ivec-rspec1> <ivec-rspec2>")
    args = po.read(argv)
    r2 = RandomAccessTableReader(args[1], holder="ivec")
    n_utt = n_diff_utt = 0
    tot = diff = 0
    for key, a in SequentialTableReader(args[0], holder="ivec"):
        if key not in r2:
            continue
        a = np.asarray(a, np.int64)
        b = np.asarray(r2[key], np.int64)
        n_utt += 1
        if len(a) != len(b):
            n_diff_utt += 1
            tot += max(len(a), len(b))
            diff += max(len(a), len(b))
            continue
        d = int((a != b).sum())
        tot += len(a)
        diff += d
        if d:
            n_diff_utt += 1
    if n_utt == 0:
        raise KaldiError("compare-int-vector: no matching keys")
    frac = diff / max(tot, 1)
    print(f"{frac:.6f}")
    log.info("compare-int-vector: %d/%d entries differ over %d "
             "utterances (%d with any difference)", diff, tot, n_utt,
             n_diff_utt)
    return 0 if diff == 0 else 1


@tool("prons-to-wordali")
def prons_to_wordali_tool(argv):
    """Word-level alignment from pronunciation parses + per-phone
    durations (bin/prons-to-wordali.cc): pairs phones-to-prons output
    with ali-to-phones-lengths runs → '<word> <frames>' per word."""
    po = ParseOptions("prons-to-wordali <prons-rspec> "
                      "<phone-lengths-rspec> <wordali-wspec>\n"
                      "prons: phones-to-prons output; phone-lengths: "
                      "'phone dur ; phone dur ...' text entries")
    args = po.read(argv)
    len_r = RandomAccessTableReader(args[1], holder="text")
    n_done = n_err = 0
    with TableWriter(args[2], holder="text") as w:
        for key, toks in SequentialTableReader(args[0], holder="text"):
            if key not in len_r:
                continue
            # prons: 'w p p ; w p ...' → [(word, [phones])]
            prons: List[Tuple[int, List[int]]] = []
            cur: List[int] = []
            for t in list(toks) + [";"]:
                if t == ";":
                    if cur:
                        prons.append((int(cur[0]),
                                      [int(p) for p in cur[1:]]))
                        cur = []
                else:
                    cur.append(t)
            # phone lengths: 'p d ; p d ...' → [(phone, dur)]
            runs: List[Tuple[int, int]] = []
            lt = [t for t in len_r[key] if t != ";"]
            if len(lt) % 2:
                raise KaldiError(f"prons-to-wordali: {key}: odd "
                                 "phone-lengths entry")
            for i in range(0, len(lt), 2):
                runs.append((int(lt[i]), int(lt[i + 1])))
            out: List[str] = []
            pos, ok = 0, True
            for word, phones in prons:
                dur = 0
                for p in phones:
                    if pos >= len(runs) or runs[pos][0] != p:
                        ok = False
                        break
                    dur += runs[pos][1]
                    pos += 1
                if not ok:
                    break
                out += [str(word), str(dur)]
            if ok and pos == len(runs):
                w[key] = out
                n_done += 1
            else:
                n_err += 1
                log.warning("prons-to-wordali: %s did not parse", key)
    log.info("prons-to-wordali: %d done, %d failed", n_done, n_err)
    return 0


@tool("make-ilabel-transducer")
def make_ilabel_transducer_tool(argv):
    """Relabeling transducer that maps an old CLG ilabel set onto a
    compact new one keyed by unique context windows
    (bin/make-ilabel-transducer.cc): composing it with CLG shrinks the
    ilabel inventory to the windows actually used."""
    from kaldi_tpu.cli.tools_extra import _save_fst
    from kaldi_tpu.fst.fst import VectorFst, Arc
    po = ParseOptions("make-ilabel-transducer <old-ilabel-info> "
                      "<new-ilabel-info-out> <map-fst-out>\n"
                      "ilabel-info lines: space-separated phone "
                      "windows (line i = ilabel i)")
    args = po.read(argv)
    with open(args[0]) as f:
        old_info = [tuple(int(x) for x in line.split())
                    for line in f]
    new_ids: Dict[Tuple[int, ...], int] = {}
    mapping: List[int] = []
    new_info: List[Tuple[int, ...]] = []
    for info in old_info:
        if info not in new_ids:
            new_ids[info] = len(new_info)
            new_info.append(info)
        mapping.append(new_ids[info])
    with open(args[1], "w") as f:
        for info in new_info:
            f.write(" ".join(str(x) for x in info) + "\n")
    m = VectorFst()
    s = m.add_state()
    m.start = s
    m.set_final(s, 0.0)
    for old_id, new_id in enumerate(mapping):
        if old_id == 0:
            continue                      # ε stays ε
        m.add_arc(s, Arc(new_id, old_id, 0.0, s))
    _save_fst(args[2], m)
    log.info("make-ilabel-transducer: %d old → %d new ilabels",
             len(old_info), len(new_info))
    return 0


@tool("latgen-incremental-mapped")
def latgen_incremental_mapped_tool(argv):
    """Lattice decoding from loglike matrices with CHUNKED advance and
    bounded in-flight state (bin/latgen-incremental-mapped.cc role):
    the online beam decoder consumes --chunk-frames at a time and the
    lattice is finalized incrementally, so peak memory is bounded by
    the chunk, not the utterance."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.decoder.beam import BeamDecoder, BeamDecoderConfig
    from kaldi_tpu.decoder.online_beam import OnlineBeamDecoder
    from kaldi_tpu.fst.csr import pack_fst
    po = ParseOptions("latgen-incremental-mapped [opts] <trans-model> "
                      "<fst> <loglikes-rspec> <lattice-wspec>")
    po.register("beam", float, 13.0, "decoding beam")
    po.register("lattice-beam", float, 6.0, "lattice beam")
    po.register("max-active", int, 7000, "max active states")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("chunk-frames", int, 32, "frames per advance")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    HCLG = _load_hclg(args[1])
    cap = max(po["max-active"], 512)
    dec = BeamDecoder(pack_fst(HCLG), tm.tid_to_pdf_array,
                      BeamDecoderConfig(
                          beam=po["beam"],
                          lattice_beam=po["lattice-beam"],
                          acoustic_scale=po["acoustic-scale"],
                          max_active=po["max-active"],
                          lattice_arcs_per_frame=max(2 * cap, 4096),
                          record_capacity=16384))
    ob = OnlineBeamDecoder(dec, chunk_frames=po["chunk-frames"])
    n = 0
    with TableWriter(args[3], holder="clat") as w:
        for key, ll in SequentialTableReader(args[2], holder="mat"):
            ll = np.asarray(ll, np.float32)
            ob.reset()
            C = po["chunk-frames"]
            for c in range(0, len(ll), C):
                ob.advance(ll[c:c + C])
            w[key] = ob.finalize()
            n += 1
    log.info("latgen-incremental-mapped: %d utterances "
             "(chunk %d)", n, po["chunk-frames"])
    return 0


# ---------------------------------------------------------------------------
# fstbin tail
# ---------------------------------------------------------------------------

@tool("fstmakecontextfst")
def fstmakecontextfst_tool(argv):
    """Explicitly build the context transducer C: ilabels are
    N-phone context windows, olabels are phones; C ∘ LG = CLG
    (fstbin/fstmakecontextfst.cc).

    Construction: window w_i of phone i is phones[i-P : i-P+N]
    zero-padded; consecutive windows overlap by N−1 entries, so
    states are the overlap tuples w[1:], plus a distinguished start.
    Arc: state s --(ilabel=w, olabel=w[P])--> w[1:] for every window
    w with w[:N−1] == s (or P leading zeros from the start state);
    state s is final iff its trailing N−P−1 entries are zero (all
    right context consumed).  |states| grows as |phones|^(N−1): the
    on-demand composition (fstcomposecontext) stays the production
    route; this explicit C is the debugging/verification artifact.
    """
    from kaldi_tpu.cli.tools_extra import _save_fst
    from kaldi_tpu.fst.fst import VectorFst, Arc
    po = ParseOptions("fstmakecontextfst [opts] <phones-file> "
                      "<ilabels-out> <c-fst-out>")
    po.register("context-width", int, 3, "phone window N")
    po.register("central-position", int, 1, "central phone position P")
    po.register("read-disambig-syms", str, "",
                "disambig phone ids file")
    args = po.read(argv)
    with open(args[0]) as f:
        phones = [int(x) for x in f.read().split()]
    disambig = []
    if po["read-disambig-syms"]:
        with open(po["read-disambig-syms"]) as f:
            disambig = [int(x) for x in f.read().split()]
    N, P = po["context-width"], po["central-position"]
    if not (0 <= P < N):
        raise KaldiError("fstmakecontextfst: need 0 <= P < N")
    C = VectorFst()
    ilabel_info: List[Tuple[int, ...]] = [()]          # ε = ilabel 0
    win_id: Dict[Tuple[int, ...], int] = {}

    def window_ilabel(win: Tuple[int, ...]) -> int:
        if win not in win_id:
            win_id[win] = len(ilabel_info)
            ilabel_info.append(win)
        return win_id[win]

    def is_final(s: Tuple[int, ...]) -> bool:
        # all right context consumed: nothing real after position P-1
        return all(x == 0 for x in s[P:]) if len(s) > P else True

    states: Dict[Tuple[int, ...], int] = {}

    def get_state(s: Tuple[int, ...]) -> int:
        if s not in states:
            states[s] = C.add_state()
            if is_final(s):
                C.set_final(states[s], 0.0)
            # disambig pass-through (own single-entry ilabels)
            for d in disambig:
                C.add_arc(states[s], Arc(window_ilabel((d,)), d, 0.0,
                                         states[s]))
        return states[s]

    def tail_mode(s: Tuple[int, ...]) -> bool:
        """True once trailing zero-padding has begun after a phone."""
        seen_phone = False
        for x in s:
            if x != 0:
                seen_phone = True
            elif seen_phone:
                return True
        return False

    from collections import deque
    todo: deque = deque()
    seen = set()

    def add_window(src: int, w: Tuple[int, ...]):
        nxt = w[1:]
        C.add_arc(src, Arc(window_ilabel(w), w[P], 0.0,
                           get_state(nxt)))
        if nxt not in seen:
            seen.add(nxt)
            todo.append(nxt)

    def tails(k: int) -> List[Tuple[int, ...]]:
        """Length-k right contexts: phones then contiguous zeros
        (the zero branch yields only the all-zero tail, so padding
        is always a suffix)."""
        if k == 0:
            return [()]
        out: List[Tuple[int, ...]] = [(0,) * k]
        for p in phones:
            out += [(p,) + t for t in tails(k - 1)]
        return out

    start = C.add_state()
    C.start = start
    C.set_final(start, 0.0)                 # empty sequence accepted
    for d in disambig:
        C.add_arc(start, Arc(window_ilabel((d,)), d, 0.0, start))
    # first real window: P leading zeros, then the first phone
    for c in phones:
        for t in tails(N - P - 1):
            add_window(start, (0,) * P + (c,) + t)
    while todo:
        s = todo.popleft()
        src = get_state(s)
        opts = [0] if tail_mode(s) else list(phones) + [0]
        for r in opts:
            w = s + (r,)
            if w[P] == 0:
                continue
            add_window(src, w)
    with open(args[1], "w") as f:
        for info in ilabel_info:
            f.write(" ".join(str(x) for x in info) + "\n")
    _save_fst(args[2], C)
    log.info("fstmakecontextfst: %d states, %d ilabels (N=%d P=%d)",
             C.num_states, len(ilabel_info), N, P)
    return 0


@tool("fstmakecontextsyms")
def fstmakecontextsyms_tool(argv):
    """Human-readable symbol table for context-window ilabels
    (fstbin/fstmakecontextsyms.cc): window (a, b, c) prints as
    'a/b/c' using the phones symbol table."""
    from kaldi_tpu.fst.fst import SymbolTable
    po = ParseOptions("fstmakecontextsyms <phones-symtab> "
                      "<ilabel-info> <context-syms-out>")
    args = po.read(argv)
    phones_tab = SymbolTable.read(args[0])
    with open(args[1]) as f:
        infos = [tuple(int(x) for x in line.split()) for line in f]
    with open(args[2], "w") as f:
        for i, info in enumerate(infos):
            if not info:
                name = "<eps>"
            elif len(info) == 1 and info[0] <= 0:
                name = f"#{-info[0]}"
            else:
                name = "/".join(
                    phones_tab.find(p) if p else "<eps>"
                    for p in info)
            f.write(f"{name} {i}\n")
    log.info("fstmakecontextsyms: %d symbols", len(infos))
    return 0


@tool("fstrand")
def fstrand_tool(argv):
    """Generate a random connected FST (fstbin/fstrand.cc — the
    property-testing fixture behind determinize-star-test and
    friends)."""
    from kaldi_tpu.cli.tools_extra import _save_fst
    from kaldi_tpu.fst.fst import VectorFst, Arc
    po = ParseOptions("fstrand [opts] <fst-out>")
    po.register("num-states", int, 8, "states before connect")
    po.register("num-arcs", int, 20, "arcs")
    po.register("num-symbols", int, 4, "symbol inventory (>=1)")
    po.register("allow-empty", bool, False,
                "permit an FST with no final states reachable")
    po.register("acceptor", bool, False, "ilabel == olabel")
    po.register("seed", int, 0, "rng seed")
    args = po.read(argv)
    rng = np.random.default_rng(po["seed"])
    for _attempt in range(100):
        fst = VectorFst()
        S = po["num-states"]
        for _ in range(S):
            fst.add_state()
        fst.start = 0
        for _ in range(po["num-arcs"]):
            s = int(rng.integers(S))
            d = int(rng.integers(S))
            il = int(rng.integers(po["num-symbols"] + 1))
            ol = il if po["acceptor"] \
                else int(rng.integers(po["num-symbols"] + 1))
            wgt = round(float(rng.random()) * 4.0, 2)
            fst.add_arc(s, Arc(il, ol, wgt, d))
        for _ in range(max(1, S // 4)):
            fst.set_final(int(rng.integers(S)),
                          round(float(rng.random()), 2))
        from kaldi_tpu.fst.ops import connect
        out = connect(fst)
        if out.num_states or po["allow-empty"]:
            _save_fst(args[0], out)
            log.info("fstrand: %d states, %d arcs", out.num_states,
                     sum(len(a) for a in out.arcs))
            return 0
    raise KaldiError("fstrand: failed to draw a connected FST")


# ---------------------------------------------------------------------------
# latbin tail
# ---------------------------------------------------------------------------

@tool("lattice-expand")
def lattice_expand_tool(argv):
    """Expand lattice states so each state has a unique (n−1)-word
    history (latbin/lattice-expand.cc): after expansion, n-gram LM
    scores can be applied per-state without approximation."""
    from kaldi_tpu.lattice.lattice import CompactLattice, CompactArc
    po = ParseOptions("lattice-expand [--lm-order=3] <lattice-rspec> "
                      "<lattice-wspec>")
    po.register("lm-order", int, 3, "history length n-1 = order-1")
    args = po.read(argv)
    hist_len = max(po["lm-order"] - 1, 0)
    n = 0
    with TableWriter(args[1], holder="clat") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            out = CompactLattice()
            ids: Dict[Tuple[int, Tuple[int, ...]], int] = {}

            def get(state: int, hist: Tuple[int, ...]) -> int:
                k = (state, hist)
                if k not in ids:
                    ids[k] = out.add_state()
                    if state in clat.finals:
                        out.finals[ids[k]] = clat.finals[state]
                return ids[k]

            from collections import deque
            start = get(clat.start, ())
            out.start = start
            todo = deque([(clat.start, ())])
            seen = {(clat.start, ())}
            while todo:
                s, h = todo.popleft()
                src = get(s, h)
                for a in clat.arcs[s]:
                    h2 = ((h + (a.word,))[-hist_len:]
                          if a.word and hist_len else h)
                    dst = get(a.nextstate, h2)
                    out.arcs[src].append(CompactArc(
                        a.word, a.graph_cost, a.acoustic_cost,
                        a.tids, dst))
                    if (a.nextstate, h2) not in seen:
                        seen.add((a.nextstate, h2))
                        todo.append((a.nextstate, h2))
            w[key] = out
            n += 1
    log.info("lattice-expand: %d lattices (history %d)", n, hist_len)
    return 0


@tool("lattice-lmrescore-rnnlm")
def lattice_lmrescore_rnnlm_tool(argv):
    """RNNLM lattice rescoring — the legacy latbin spelling
    (latbin/lattice-lmrescore-rnnlm.cc); same deterministic on-demand
    composition as lattice-lmrescore-kaldi-rnnlm."""
    from kaldi_tpu.cli.tools_bank9 import lattice_lmrescore_kaldi_rnnlm
    return lattice_lmrescore_kaldi_rnnlm(argv)


# ---------------------------------------------------------------------------
# chainbin tail
# ---------------------------------------------------------------------------

def _pdfs_for_factory(tree, topo):
    def pdfs_for(phone: int, is_entry: bool) -> int:
        window = [0] * tree.context_width
        window[tree.central_position] = phone
        st = topo.topology_for_phone(phone)[0]
        cls = (st.forward_pdf_class if is_entry
               else st.self_loop_pdf_class)
        return tree.compute(window, cls)
    return pdfs_for


def _subsample_runs(runs: List[Tuple[int, int]], sub: int
                    ) -> List[Tuple[int, int]]:
    """Phone-at-frame t·sub for each subsampled frame, re-run-length
    encoded (the get_egs.sh frame-subsampling rule)."""
    T = sum(d for _, d in runs)
    phones = np.repeat([p for p, _ in runs], [d for _, d in runs])
    sub_phones = phones[::sub][:T // sub]
    out: List[Tuple[int, int]] = []
    for p in sub_phones:
        p = int(p)
        if out and out[-1][0] == p:
            out[-1] = (p, out[-1][1] + 1)
        else:
            out.append((p, 1))
    return out


@tool("chain-get-supervision")
def chain_get_supervision_tool(argv):
    """Per-utterance chain numerator supervision FSAs from forced
    alignments (chainbin/chain-get-supervision.cc): phone runs at the
    subsampled rate become one arc per phone with boundary times from
    the alignment; written as fsa-only chain egs."""
    from kaldi_tpu.am.chain_supervision import \
        supervision_from_phone_runs
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.pipelines.chain import phone_alignment_runs
    from kaldi_tpu.pipelines.egs_io import ChainEg
    po = ParseOptions("chain-get-supervision [opts] <chain-mdl> "
                      "<ali-rspec> <supervision-wspec>")
    po.register("frame-subsampling-factor", int, 3, "subsampling")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    pdfs_for = _pdfs_for_factory(tm.tree, tm.topo)
    sub = po["frame-subsampling-factor"]
    n = 0
    with TableWriter(args[2], holder="ceg") as w:
        for key, tids in SequentialTableReader(args[1], holder="ivec"):
            runs = _subsample_runs(
                phone_alignment_runs(tm, np.asarray(tids).tolist()),
                sub)
            if not runs:
                log.warning("chain-get-supervision: %s too short",
                            key)
                continue
            T_sub = sum(d for _, d in runs)
            fsa = supervision_from_phone_runs(
                [runs], [0.0], lambda p: pdfs_for(p, True),
                lambda p: pdfs_for(p, False), T_sub)
            w[key] = ChainEg(
                feats=np.zeros((0, 0), np.float32),
                pdf_ali=np.zeros(T_sub, np.int32),
                mask=np.ones(T_sub, bool), fsa=fsa)
            n += 1
    log.info("chain-get-supervision: %d utterances (sub ×%d)", n, sub)
    return 0


@tool("chain-make-den-fst")
def chain_make_den_fst_tool(argv):
    """Denominator graph from training phone sequences — the upstream
    chainbin spelling (chainbin/chain-make-den-fst.cc); same flow as
    nnet3-chain-make-den-fst."""
    from kaldi_tpu.cli.tools_bank16 import nnet3_chain_make_den_fst_tool
    return nnet3_chain_make_den_fst_tool(argv)


@tool("chain-make-num-fst-e2e")
def chain_make_num_fst_e2e_tool(argv):
    """End-to-end numerator FSAs straight from phone transcripts — no
    alignment (chainbin/chain-make-num-fst-e2e.cc): free boundary
    times; train with supervision tolerance >= the utterance
    length."""
    from kaldi_tpu.am.chain_supervision import supervision_from_text
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.pipelines.egs_io import ChainEg
    po = ParseOptions("chain-make-num-fst-e2e [opts] <chain-mdl> "
                      "<phone-transcript-rspec> <num-frames-rspec> "
                      "<supervision-wspec>\n"
                      "num-frames: int-vector table with one entry "
                      "[T] per utterance (full frame rate)")
    po.register("frame-subsampling-factor", int, 3, "subsampling")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    pdfs_for = _pdfs_for_factory(tm.tree, tm.topo)
    sub = po["frame-subsampling-factor"]
    nf_r = RandomAccessTableReader(args[2], holder="ivec")
    n = 0
    with TableWriter(args[3], holder="ceg") as w:
        for key, phones in SequentialTableReader(args[1],
                                                 holder="ivec"):
            if key not in nf_r:
                continue
            T_sub = int(np.asarray(nf_r[key])[0]) // sub
            phones = [int(p) for p in phones]
            if not phones or len(phones) > T_sub:
                log.warning("chain-make-num-fst-e2e: %s: %d phones "
                            "vs %d frames", key, len(phones), T_sub)
                continue
            fsa = supervision_from_text(
                phones, lambda p: pdfs_for(p, True),
                lambda p: pdfs_for(p, False), T_sub)
            w[key] = ChainEg(
                feats=np.zeros((0, 0), np.float32),
                pdf_ali=np.zeros(T_sub, np.int32),
                mask=np.ones(T_sub, bool), fsa=fsa)
            n += 1
    log.info("chain-make-num-fst-e2e: %d utterances", n)
    return 0


# ---------------------------------------------------------------------------
# rnnlmbin tail
# ---------------------------------------------------------------------------

@tool("rnnlm-get-sampling-lm")
def rnnlm_get_sampling_lm_tool(argv):
    """Estimate the importance-sampling proposal distribution
    (unigram^power, the rnnlmbin/rnnlm-get-sampling-lm.cc role) from
    training text; rnnlm-train's sampled softmax draws negatives
    from it."""
    from kaldi_tpu.core import io as kio
    po = ParseOptions("rnnlm-get-sampling-lm [opts] <text-rspec> "
                      "<sampling-lm-out>\ntext: int-transcript table")
    po.register("vocab-size", int, 0, "vocabulary size (0 = infer "
                "from the data: max id + 1)")
    po.register("unigram-power", float, 0.75,
                "flattening exponent on the unigram counts")
    args = po.read(argv)
    counts: Dict[int, float] = {}
    n_sent = 0
    for _key, words in SequentialTableReader(args[0], holder="ivec"):
        for wd in np.asarray(words):
            counts[int(wd)] = counts.get(int(wd), 0.0) + 1.0
        n_sent += 1
    if not counts:
        raise KaldiError("rnnlm-get-sampling-lm: no text")
    V = po["vocab-size"] or (max(counts) + 1)
    vec = np.ones(V)                           # add-one smoothing
    for wd, c in counts.items():
        if wd >= V:
            raise KaldiError(f"rnnlm-get-sampling-lm: word id {wd} "
                             f">= vocab size {V}")
        vec[wd] += c
    probs = vec ** po["unigram-power"]
    probs /= probs.sum()
    with kio.open_wxfilename(args[1]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<SamplingLm>")
        kio.write_basic_float(f, po["unigram-power"])
        kio.write_vector(f, probs.astype(np.float32))
        kio.write_token(f, "</SamplingLm>")
    log.info("rnnlm-get-sampling-lm: %d sentences, vocab %d, "
             "entropy %.3f", n_sent, V,
             -float((probs * np.log(probs)).sum()))
    return 0


def read_sampling_lm(path: str) -> np.ndarray:
    """→ proposal probability vector (rnnlm-train consumes this)."""
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(path) as f:
        kio.init_kaldi_input_stream(f)
        kio.expect_token(f, "<SamplingLm>")
        kio.read_basic_float(f)
        probs = np.asarray(kio.read_vector(f), np.float64)
        kio.expect_token(f, "</SamplingLm>")
    return probs


# ---------------------------------------------------------------------------
# kwsbin tail
# ---------------------------------------------------------------------------

@tool("compute-atwv")
def compute_atwv_tool(argv):
    """Actual Term-Weighted Value of keyword-search results
    (kwsbin/compute-atwv.cc): ATWV = 1 − mean_kw[Pmiss + β·PFA] with
    β = trials-per-second scaling; hits match references when their
    frame midpoint falls inside the reference span (±tolerance)."""
    po = ParseOptions("compute-atwv <total-audio-frames> <ref-rspec> "
                      "<hits-rspec>\nboth tables use the kws-search "
                      "hit format: key '<kw>-<n>', value "
                      "'<utt> <t-begin> <t-end> [<score>]'")
    po.register("beta", float, 999.9, "false-alarm weight")
    po.register("frame-tolerance", int, 50,
                "midpoint tolerance (frames)")
    po.register("print-per-keyword", bool, False,
                "log per-keyword TWV terms")
    args = po.read(argv)
    T_total = float(args[0])

    def load(rspec):
        table: Dict[str, List[Tuple[str, int, int]]] = {}
        for key, toks in SequentialTableReader(rspec, holder="text"):
            kw = key.rsplit("-", 1)[0]
            toks = list(toks)
            table.setdefault(kw, []).append(
                (toks[0], int(toks[1]), int(toks[2])))
        return table

    refs = load(args[1])
    hyps = load(args[2])
    if not refs:
        raise KaldiError("compute-atwv: empty reference")
    beta = po["beta"]
    tol = po["frame-tolerance"]
    twv_sum = 0.0
    for kw, ref_list in sorted(refs.items()):
        n_true = len(ref_list)
        hyp_list = hyps.get(kw, [])
        used = [False] * len(ref_list)
        n_hit = n_fa = 0
        for utt, tb, te in hyp_list:
            mid = (tb + te) / 2
            matched = False
            for i, (rutt, rtb, rte) in enumerate(ref_list):
                if used[i] or rutt != utt:
                    continue
                if rtb - tol <= mid <= rte + tol:
                    used[i] = True
                    matched = True
                    break
            if matched:
                n_hit += 1
            else:
                n_fa += 1
        p_miss = 1.0 - n_hit / n_true
        denom = max(T_total / 100.0 - n_true, 1.0)   # trials ≈ seconds
        p_fa = n_fa / denom
        twv = 1.0 - p_miss - beta * p_fa
        twv_sum += twv
        if po["print-per-keyword"]:
            log.info("compute-atwv: kw %s: hit %d/%d, fa %d, "
                     "twv %.4f", kw, n_hit, n_true, n_fa, twv)
    atwv = twv_sum / len(refs)
    print(f"{atwv:.4f}")
    log.info("compute-atwv: ATWV %.4f over %d keywords", atwv,
             len(refs))
    return 0
