"""Twenty-first bank of CLI tools: latbin determinization/alignment
tail, parallel decode variants, raw (non-compact) lattice tables, and
featbin/lmbin stragglers.

Canonical shapes mirrored (SURVEY.md §2.1 bins):
latbin/{lattice-determinize-pruned-parallel,
lattice-determinize-phone-pruned(-parallel),
lattice-determinize-non-compact, lattice-copy-backoff,
lattice-reverse, lattice-align-words-lexicon}.cc,
rnnlmbin/lattice-lmrescore-kaldi-rnnlm-pruned.cc,
bin/{decode-faster, latgen-faster-mapped-parallel, pdf-to-counts,
post-to-smat}.cc, lmbin/const-arpa-to-arpa? (inverse of
arpa-to-const-arpa; upstream spells it const-arpa-to-arpa? — the
read-back utility), featbin/{subset-feats, process-pitch-feats,
add-deltas-sdc}.cc.
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List

import numpy as np

from kaldi_tpu.cli.tools import tool, _load_hclg, _LatgenDecoder
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


# ---------------------------------------------------------------------------
# latbin: determinization tail
# ---------------------------------------------------------------------------

def _det_prune_one(clat, beam: float, acoustic_scale: float,
                   max_states: int):
    """compact → raw → determinize → prune, the
    DeterminizeLatticePhonePrunedWrapper composite on an
    already-compact input (re-determinization after modification)."""
    from kaldi_tpu.lattice.determinize import (determinize_lattice,
                                               prune_lattice)
    from kaldi_tpu.lattice.functions import scale_lattice
    from kaldi_tpu.lattice.lattice import compact_to_lattice
    if acoustic_scale != 1.0:
        scale_lattice(clat, acoustic_scale=acoustic_scale)
    out = determinize_lattice(compact_to_lattice(clat),
                              max_states=max_states)
    out = prune_lattice(out, beam)
    if acoustic_scale != 1.0:
        scale_lattice(out, acoustic_scale=1.0 / acoustic_scale)
    return out


def _det_parallel(argv, name: str, with_model: bool):
    po = ParseOptions(f"{name} [opts] " +
                      ("<model> " if with_model else "") +
                      "<lat-rspec> <lat-wspec>")
    po.register("beam", float, 8.0, "lattice pruning beam")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    po.register("max-states", int, 200000, "determinization state cap")
    po.register("num-threads", int, 4, "worker threads")
    args = po.read(argv)
    off = 1 if with_model else 0
    if with_model:
        from kaldi_tpu.am.serialize import read_mdl
        read_mdl(args[0])        # validated; phone info not needed —
        #                          our determinization is tid-exact
    beam, scale, mx = po["beam"], po["acoustic-scale"], po["max-states"]
    n = 0
    with TableWriter(args[off + 1], holder="clat") as w, \
            ThreadPoolExecutor(max_workers=max(1, po["num-threads"])) \
            as pool:
        pend = []
        for key, clat in SequentialTableReader(args[off],
                                               holder="clat"):
            pend.append((key, pool.submit(_det_prune_one, clat, beam,
                                          scale, mx)))
        for key, fut in pend:       # write in input order
            w[key] = fut.result()
            n += 1
    log.info("%s: %d lattices (%d threads)", name, n,
             po["num-threads"])
    return 0


@tool("lattice-determinize-pruned-parallel")
def lattice_determinize_pruned_parallel_tool(argv):
    """Threaded lattice determinization + pruning
    (latbin/lattice-determinize-pruned-parallel.cc TaskSequencer
    flow; GIL-releasing native determinize makes threads effective)."""
    return _det_parallel(argv, "lattice-determinize-pruned-parallel",
                         with_model=False)


@tool("lattice-determinize-phone-pruned")
def lattice_determinize_phone_pruned_tool(argv):
    """Determinize + prune taking the transition model
    (latbin/lattice-determinize-phone-pruned.cc
    DeterminizeLatticePhonePrunedWrapper: upstream inserts phone
    boundaries to bound blowup; our determinization is tid-string
    exact so the model is validated but not needed for safety)."""
    po = ParseOptions("lattice-determinize-phone-pruned [opts] "
                      "<model> <lat-rspec> <lat-wspec>")
    po.register("beam", float, 8.0, "lattice pruning beam")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    po.register("max-states", int, 200000, "state cap")
    args = po.read(argv)
    from kaldi_tpu.am.serialize import read_mdl
    read_mdl(args[0])
    n = 0
    with TableWriter(args[2], holder="clat") as w:
        for key, clat in SequentialTableReader(args[1], holder="clat"):
            w[key] = _det_prune_one(clat, po["beam"],
                                    po["acoustic-scale"],
                                    po["max-states"])
            n += 1
    log.info("lattice-determinize-phone-pruned: %d lattices", n)
    return 0


@tool("lattice-determinize-phone-pruned-parallel")
def lattice_determinize_phone_pruned_parallel_tool(argv):
    """Threaded variant
    (latbin/lattice-determinize-phone-pruned-parallel.cc)."""
    return _det_parallel(argv,
                         "lattice-determinize-phone-pruned-parallel",
                         with_model=True)


@tool("lattice-determinize-non-compact")
def lattice_determinize_non_compact_tool(argv):
    """Determinize but write STATE-LEVEL (non-compact) lattices
    (latbin/lattice-determinize-non-compact.cc — keeps Lattice type
    on both sides for tools that need per-frame arcs, e.g. MMI
    numerator processing)."""
    from kaldi_tpu.lattice.determinize import determinize_lattice
    from kaldi_tpu.lattice.lattice import compact_to_lattice
    po = ParseOptions("lattice-determinize-non-compact [opts] "
                      "<lat-rspec> <lat-wspec>  (raw Lattice tables)")
    po.register("max-states", int, 200000, "state cap")
    args = po.read(argv)
    n = 0
    with TableWriter(args[1], holder="lat") as w:
        for key, lat in SequentialTableReader(args[0], holder="lat"):
            w[key] = compact_to_lattice(
                determinize_lattice(lat, max_states=po["max-states"]))
            n += 1
    log.info("lattice-determinize-non-compact: %d lattices", n)
    return 0


@tool("lattice-copy-backoff")
def lattice_copy_backoff_tool(argv):
    """Copy lattices from a primary archive, falling back to a backoff
    archive for missing keys (latbin/lattice-copy-backoff.cc — used
    when a rescoring pass failed on a subset)."""
    po = ParseOptions("lattice-copy-backoff <key-rspec-or-scp> "
                      "<primary-rspec> <backoff-rspec> <wspec>\n"
                      "Keys come from the BACKOFF archive; primary "
                      "entries win when present.")
    args = po.read(argv)
    primary = RandomAccessTableReader(args[1], holder="clat")
    n = n_bak = 0
    with TableWriter(args[3], holder="clat") as w:
        for key, clat in SequentialTableReader(args[2], holder="clat"):
            if key in primary:
                w[key] = primary[key]
            else:
                w[key] = clat
                n_bak += 1
            n += 1
    log.info("lattice-copy-backoff: %d lattices (%d from backoff)",
             n, n_bak)
    return 0


@tool("lattice-reverse")
def lattice_reverse_tool(argv):
    """Time-reverse raw lattices (latbin/lattice-reverse.cc — used by
    backward-decoding system combination): arcs flip direction, the
    old start becomes final, a new superinitial state connects the
    old finals."""
    from kaldi_tpu.lattice.lattice import Lattice, LatticeArc
    po = ParseOptions("lattice-reverse <lat-rspec> <lat-wspec>  "
                      "(raw Lattice tables)")
    args = po.read(argv)
    n = 0
    with TableWriter(args[1], holder="lat") as w:
        for key, lat in SequentialTableReader(args[0], holder="lat"):
            rev = Lattice()
            for _ in range(lat.num_states + 1):
                rev.add_state()           # +1: superinitial at index 0
            rev.start = 0
            for s in range(lat.num_states):
                for a in lat.arcs[s]:
                    rev.arcs[a.nextstate + 1].append(LatticeArc(
                        a.ilabel, a.olabel, a.graph_cost,
                        a.acoustic_cost, s + 1))
            for s, (gc, ac) in lat.finals.items():
                rev.arcs[0].append(LatticeArc(0, 0, gc, ac, s + 1))
            if lat.start >= 0:
                rev.set_final(lat.start + 1, 0.0, 0.0)
            w[key] = rev
            n += 1
    log.info("lattice-reverse: %d lattices", n)
    return 0


@tool("lattice-align-words-lexicon")
def lattice_align_words_lexicon_tool(argv):
    """Word-align lattices using an align-lexicon file
    (latbin/lattice-align-words-lexicon.cc): each line is
    '<word-int> <word-int> <phone-int>...' (steps/..
    align_lexicon.int format, covering word-position-independent
    lexicons that phones/word_boundary.int cannot)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.core import io as kio
    from kaldi_tpu.lattice.word_align import word_align_lattice
    po = ParseOptions("lattice-align-words-lexicon [opts] "
                      "<align-lexicon.int> <model> <lat-rspec> "
                      "<lat-wspec>")
    po.register("silence-phones", str, "", "colon-separated phone ids "
                "treated as optional silence")
    args = po.read(argv)
    prons: Dict[int, List[List[int]]] = {}
    with kio.open_rxfilename(args[0]) as f:
        for raw in f.read().decode().splitlines():
            parts = raw.split()
            if len(parts) < 3:
                continue
            # cols: printed-word word phone...; both word columns are
            # integer ids (<eps> rows map silence — keep word 0 too)
            prons.setdefault(int(parts[1]), []).append(
                [int(p) for p in parts[2:]])
    tm, _ = read_mdl(args[1])
    sil = {int(x) for x in po["silence-phones"].split(":") if x}
    # <eps> pronunciation rows define silence phones implicitly
    for pron in prons.get(0, []):
        sil.update(pron)
    n = n_bad = 0
    with TableWriter(args[3], holder="clat") as w:
        for key, clat in SequentialTableReader(args[2], holder="clat"):
            aligned, ok = word_align_lattice(clat, tm, prons, sil)
            n_bad += not ok
            w[key] = aligned
            n += 1
    if n_bad:
        log.warning("%d lattices had best-effort word splits", n_bad)
    log.info("lattice-align-words-lexicon: %d lattices", n)
    return 0


@tool("lattice-lmrescore-kaldi-rnnlm-pruned")
def lattice_lmrescore_kaldi_rnnlm_pruned_tool(argv):
    """RNNLM rescoring through the PRUNED composition (the
    rnnlmbin/lattice-lmrescore-kaldi-rnnlm-pruned.cc flow: subtract
    the old ARPA G exactly, add the RNNLM via beam-pruned on-demand
    composition — tractable on dense lattices where the exact
    composition blows up)."""
    from kaldi_tpu.fst.arpa import ArpaModel
    from kaldi_tpu.fst.fst import SymbolTable
    from kaldi_tpu.lattice.rescore import lmrescore_pruned
    from kaldi_tpu.lm.rnnlm import RnnLmScorer, load_rnnlm
    po = ParseOptions("lattice-lmrescore-kaldi-rnnlm-pruned [opts] "
                      "<old-arpa> <rnnlm> <words.txt> <lat-rspec> "
                      "<lat-wspec>")
    po.register("lm-scale", float, 1.0, "RNNLM weight")
    po.register("lattice-compose-beam", float, 6.0, "composition beam")
    po.register("max-arcs", int, 100_000, "output arc cap")
    args = po.read(argv)
    old_lm = ArpaModel.parse(args[0])
    params, model = load_rnnlm(args[1])
    words = SymbolTable.read(args[2])
    scorer = RnnLmScorer(params, model, words)
    n = 0
    with TableWriter(args[4], holder="clat") as w:
        for key, clat in SequentialTableReader(args[3], holder="clat"):
            w[key] = lmrescore_pruned(
                clat, old_lm, scorer, words, lm_scale=po["lm-scale"],
                beam=po["lattice-compose-beam"],
                max_arcs=po["max-arcs"])
            n += 1
    log.info("lattice-lmrescore-kaldi-rnnlm-pruned: %d lattices", n)
    return 0


# ---------------------------------------------------------------------------
# bin: decode tail
# ---------------------------------------------------------------------------

@tool("decode-faster")
def decode_faster_tool(argv):
    """Viterbi decoding of loglike matrices whose COLUMNS are already
    the FST's ilabels−1 (bin/decode-faster.cc — no transition model;
    contrast decode-faster-mapped which maps tid→pdf)."""
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.fst.fst import SymbolTable
    po = ParseOptions("decode-faster [opts] <fst> <loglikes-rspec> "
                      "<words-wspec> [<ali-wspec>]")
    po.register("beam", float, 16.0, "decoding beam")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("word-symbol-table", str, "", "words.txt for logging")
    args = po.read(argv)
    HCLG = _load_hclg(args[0])
    # identity tid→pdf: ilabel i scores loglikes column i-1
    max_il = max((a.ilabel for arcs in HCLG.arcs for a in arcs),
                 default=1)
    ident = np.concatenate([np.zeros(1, np.int32),
                            np.arange(max_il, dtype=np.int32)])
    dec = DenseDecoder(HCLG, ident, DenseDecoderConfig(
        beam=po["beam"], acoustic_scale=po["acoustic-scale"]))
    words_tab = (SymbolTable.read(po["word-symbol-table"])
                 if po["word-symbol-table"] else None)
    awriter = (TableWriter(args[3], holder="ivec")
               if len(args) > 3 else None)
    n = 0
    with TableWriter(args[2], holder="text") as w:
        for key, ll in SequentialTableReader(args[1], holder="mat"):
            tids, ols, _cost = dec.decode(np.asarray(ll, np.float32))
            w[key] = [words_tab.find(o) if words_tab else str(o)
                      for o in ols]
            if awriter:
                awriter[key] = np.asarray(tids, np.int32)
            n += 1
    if awriter:
        awriter.close()
    log.info("decode-faster: decoded %d utterances", n)
    return 0


@tool("latgen-faster-mapped-parallel")
def latgen_faster_mapped_parallel_tool(argv):
    """Threaded lattice decoding from loglike matrices
    (bin/latgen-faster-mapped-parallel.cc TaskSequencer role: device
    decode is serialized per utterance; the lattice
    build/determinize runs in a worker pool)."""
    from kaldi_tpu.am.serialize import read_mdl
    po = ParseOptions("latgen-faster-mapped-parallel [opts] "
                      "<trans-model> <fst> <loglikes-rspec> "
                      "<lattice-wspec>")
    po.register("beam", float, 13.0, "decoding beam")
    po.register("lattice-beam", float, 6.0, "lattice beam")
    po.register("max-active", int, 7000, "max active states")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("num-threads", int, 4, "worker threads")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    HCLG = _load_hclg(args[1])
    dec = _LatgenDecoder(HCLG, tm.tid_to_pdf_array, po["beam"],
                         po["lattice-beam"], po["acoustic-scale"],
                         max_active=po["max-active"])
    n = 0
    with TableWriter(args[3], holder="clat") as lw, \
            ThreadPoolExecutor(max_workers=max(1, po["num-threads"])) \
            as pool:
        pend = [(key, pool.submit(dec.decode_to_clat,
                                  np.asarray(ll, np.float32)))
                for key, ll in SequentialTableReader(args[2],
                                                     holder="mat")]
        for key, fut in pend:
            lw[key] = fut.result()
            n += 1
    log.info("latgen-faster-mapped-parallel: %d utterances (%d "
             "threads)", n, po["num-threads"])
    return 0


@tool("pdf-to-counts")
def pdf_to_counts_tool(argv):
    """Count pdf occupancy over pdf-alignment archives
    (bin/pdf-to-counts.cc — priors for nnet decode come from these
    counts via ali-to-pdf | pdf-to-counts)."""
    from kaldi_tpu.core import io as kio
    po = ParseOptions("pdf-to-counts [--binary=true] <pdf-ali-rspec> "
                      "<counts-wxfilename>")
    po.register("binary", bool, True, "binary output")
    args = po.read(argv)
    counts = np.zeros(0, np.float64)
    n = 0
    for _key, ali in SequentialTableReader(args[0], holder="ivec"):
        ali = np.asarray(ali, np.int64)
        if len(ali) and ali.max() >= len(counts):
            counts = np.concatenate(
                [counts, np.zeros(int(ali.max()) + 1 - len(counts))])
        np.add.at(counts, ali, 1.0)
        n += 1
    with kio.open_wxfilename(args[1]) as f:
        if po["binary"]:
            kio.init_kaldi_output_stream(f)
            kio.write_vector(f, counts)
        else:
            f.write((" [ " + " ".join(f"{c:.0f}" for c in counts)
                     + " ]\n").encode())
    log.info("pdf-to-counts: %d alignments, %d pdfs", n, len(counts))
    return 0


@tool("post-to-smat")
def post_to_smat_tool(argv):
    """Posteriors → per-utterance (T, dim) matrices
    (bin/post-to-smat.cc writes SparseMatrix; dense rows carry the
    same values for our numpy consumers)."""
    po = ParseOptions("post-to-smat --dim=N <post-rspec> <mat-wspec>")
    po.register("dim", int, 0, "column count (required)")
    args = po.read(argv)
    if po["dim"] <= 0:
        raise KaldiError("post-to-smat: --dim is required")
    D = po["dim"]
    n = 0
    with TableWriter(args[1], holder="mat") as w:
        for key, frames in SequentialTableReader(args[0],
                                                 holder="post"):
            m = np.zeros((len(frames), D), np.float32)
            for t, items in enumerate(frames):
                for i, wgt in items:
                    if not 0 <= i < D:
                        raise KaldiError(
                            f"post-to-smat: id {i} >= dim {D}")
                    m[t, i] += wgt
            w[key] = m
            n += 1
    log.info("post-to-smat: %d utterances", n)
    return 0


# ---------------------------------------------------------------------------
# lmbin
# ---------------------------------------------------------------------------

@tool("const-arpa-to-arpa")
def const_arpa_to_arpa_tool(argv):
    """Write a const-LM back out as ARPA text — the inverse of
    arpa-to-const-arpa (round-trip check for the binary trie; the
    reference pairs const-arpa-lm.h with ArpaFileParser the same
    way)."""
    from kaldi_tpu.cli.tools_bank18 import read_const_arpa
    from kaldi_tpu.core import io as kio
    po = ParseOptions("const-arpa-to-arpa <const-arpa-in> "
                      "<arpa-out>")
    args = po.read(argv)
    arpa = read_const_arpa(args[0])
    ln10 = math.log(10.0)
    lines = ["\\data\\"]
    for order, table in enumerate(arpa.ngrams, start=1):
        lines.append(f"ngram {order}={len(table)}")
    for order, table in enumerate(arpa.ngrams, start=1):
        lines.append("")
        lines.append(f"\\{order}-grams:")
        for ctx in sorted(table):
            lp, bow = table[ctx]
            row = f"{lp / ln10:.6f}\t{' '.join(ctx)}"
            if bow != 0.0:
                row += f"\t{bow / ln10:.6f}"
            lines.append(row)
    lines += ["", "\\end\\", ""]
    with kio.open_wxfilename(args[1]) as f:
        f.write("\n".join(lines).encode())
    log.info("const-arpa-to-arpa: %d orders", arpa.order)
    return 0


# ---------------------------------------------------------------------------
# featbin stragglers
# ---------------------------------------------------------------------------

@tool("subset-feats")
def subset_feats_tool(argv):
    """Keep the first N utterances or an include list
    (featbin/subset-feats.cc — LDA/diag-UBM stages subsample with
    this)."""
    from kaldi_tpu.core import io as kio
    po = ParseOptions("subset-feats [--n=10|--include=list] "
                      "<feats-rspec> <feats-wspec>")
    po.register("n", int, 10, "keep first n")
    po.register("include", str, "", "file of keys to keep")
    po.register("exclude", str, "", "file of keys to drop")
    args = po.read(argv)
    inc = exc = None
    if po["include"]:
        with kio.open_rxfilename(po["include"]) as f:
            inc = {ln.split()[0] for ln in f.read().decode().splitlines()
                   if ln.strip()}
    if po["exclude"]:
        with kio.open_rxfilename(po["exclude"]) as f:
            exc = {ln.split()[0] for ln in f.read().decode().splitlines()
                   if ln.strip()}
    n_out = 0
    with TableWriter(args[1], holder="mat") as w:
        for key, m in SequentialTableReader(args[0], holder="mat"):
            if inc is not None:
                if key not in inc:
                    continue
            elif exc is not None:
                if key in exc:
                    continue
            elif n_out >= po["n"]:
                break
            w[key] = m
            n_out += 1
    if n_out == 0:
        raise KaldiError("subset-feats: no features written")
    log.info("subset-feats: kept %d utterances", n_out)
    return 0


@tool("process-pitch-feats")
def process_pitch_feats_tool(argv):
    """Post-process raw (NCCF, F0) pitch features: POV nonlinearity +
    log-pitch with sliding mean subtraction
    (featbin/process-pitch-feats.cc, the pre-'process-kaldi-pitch'
    two-column flow)."""
    po = ParseOptions("process-pitch-feats [opts] <feats-rspec> "
                      "<feats-wspec>")
    po.register("normalization-window-size", int, 151,
                "sliding window (frames) for log-pitch mean")
    args = po.read(argv)
    win = max(1, po["normalization-window-size"])
    n = 0
    with TableWriter(args[1], holder="mat") as w:
        for key, m in SequentialTableReader(args[0], holder="mat"):
            m = np.asarray(m, np.float64)
            if m.shape[1] != 2:
                raise KaldiError("process-pitch-feats: expected "
                                 "(NCCF, F0) two-column input")
            nccf, f0 = m[:, 0], np.maximum(m[:, 1], 1e-3)
            # POV: p = exp(-(|nccf|^k)) shaping (upstream sigmoid-ish
            # warp of correlation to voicing probability)
            pov = 2.0 / (1.0 + np.exp(-5.0 * np.abs(nccf))) - 1.0
            logf0 = np.log(f0)
            T = len(logf0)
            means = np.empty(T)
            half = win // 2
            csum = np.concatenate([[0.0], np.cumsum(logf0)])
            for t in range(T):
                a = max(0, t - half)
                b = min(T, t + half + 1)
                means[t] = (csum[b] - csum[a]) / (b - a)
            w[key] = np.stack([pov, logf0 - means],
                              axis=1).astype(np.float32)
            n += 1
    log.info("process-pitch-feats: %d utterances", n)
    return 0


@tool("add-deltas-sdc")
def add_deltas_sdc_tool(argv):
    """Shifted delta cepstra (featbin/add-deltas-sdc.cc, the language
    /speaker-id N-d-P-k configuration): output appends k blocks of
    c[t + iP + d] − c[t + iP − d] to the statics."""
    po = ParseOptions("add-deltas-sdc [opts] <feats-rspec> "
                      "<feats-wspec>")
    po.register("delta-window", int, 1, "d: delta half-window")
    po.register("shift", int, 3, "P: block shift")
    po.register("num-blocks", int, 7, "k: delta blocks")
    args = po.read(argv)
    d, P, k = po["delta-window"], po["shift"], po["num-blocks"]
    n = 0
    with TableWriter(args[1], holder="mat") as w:
        for key, m in SequentialTableReader(args[0], holder="mat"):
            m = np.asarray(m, np.float32)
            T = m.shape[0]
            idx = np.arange(T)
            blocks = [m]
            for i in range(k):
                hi = np.clip(idx + i * P + d, 0, T - 1)
                lo = np.clip(idx + i * P - d, 0, T - 1)
                blocks.append(m[hi] - m[lo])
            w[key] = np.concatenate(blocks, axis=1)
            n += 1
    log.info("add-deltas-sdc: %d utterances (N-d-P-k = %d-%d-%d-%d)",
             n, m.shape[1] if n else 0, d, P, k)
    return 0
