"""Third bank of CLI tools: featbin / bin (tree, posteriors, graphs) /
fstbin / latbin / gmmbin / ivectorbin / nnet3bin long tail (reference
L10, SURVEY.md §2.1 bins row).

Canonical shapes mirrored: featbin/{paste-feats,select-feats,
subsample-feats,extract-segments,compute-kaldi-pitch-feats}.cc,
bin/{ali-to-post,weight-silence-post,post-to-weights,show-transitions,
am-info,tree-info,copy-tree,compile-train-graphs,align-equal-compiled,
align-text}.cc, gmmbin/{gmm-align-compiled,gmm-boost-silence,
gmm-est-fmllr}.cc, fstbin/{fstrmsymbols,fstrmepslocal,fstisstochastic,
fstequivalent,fstproject}.cc, latbin/{lattice-determinize-pruned,
lattice-1best,lattice-oracle,lattice-add-penalty,lattice-to-post,
lattice-rmali,lattice-lmrescore-const-arpa,lattice-lmrescore-pruned}.cc,
ivectorbin/{ivector-extract,ivector-mean,ivector-compute-plda,
ivector-plda-scoring,agglomerative-cluster}.cc,
nnet3bin/{nnet3-compute,nnet3-average,nnet3-latgen-faster}.cc.
"""

from __future__ import annotations

import math
import sys
from typing import Dict, List, Tuple

import numpy as np

from kaldi_tpu.cli.tools import tool
from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


# ---------------------------------------------------------------------------
# featbin
# ---------------------------------------------------------------------------

@tool("paste-feats")
def paste_feats(argv):
    po = ParseOptions("paste-feats <rspec1> <rspec2> [...] <wspec>")
    po.register("length-tolerance", int, 0, "max frame-count mismatch")
    args = po.read(argv)
    if len(args) < 3:
        raise KaldiError("paste-feats: need >=2 inputs and an output")
    readers = [RandomAccessTableReader(r, holder="mat") for r in args[1:-1]]
    tol = po["length-tolerance"]
    with TableWriter(args[-1], holder="mat") as w:
        for key, m in SequentialTableReader(args[0], holder="mat"):
            mats = [np.asarray(m)]
            ok = True
            for r in readers:
                if key not in r:
                    log.warning("paste-feats: %s missing in an input", key)
                    ok = False
                    break
                mats.append(np.asarray(r[key]))
            if not ok:
                continue
            T = min(x.shape[0] for x in mats)
            if max(x.shape[0] for x in mats) - T > tol:
                raise KaldiError(f"paste-feats: length mismatch for {key}")
            w[key] = np.concatenate([x[:T] for x in mats], axis=1)
    return 0


def _parse_ranges(spec: str, dim: int) -> List[int]:
    cols: List[int] = []
    for part in spec.split(","):
        if "-" in part:
            a, b = part.split("-")
            cols.extend(range(int(a), int(b) + 1))
        else:
            cols.append(int(part))
    for c in cols:
        if c < 0 or c >= dim:
            raise KaldiError(f"select-feats: column {c} out of range")
    return cols


@tool("select-feats")
def select_feats(argv):
    po = ParseOptions('select-feats "0-12,26" <rspec> <wspec>')
    args = po.read(argv)
    with TableWriter(args[2], holder="mat") as w:
        for key, m in SequentialTableReader(args[1], holder="mat"):
            m = np.asarray(m)
            w[key] = m[:, _parse_ranges(args[0], m.shape[1])]
    return 0


@tool("subsample-feats")
def subsample_feats(argv):
    po = ParseOptions("subsample-feats [--n=N --offset=k] <rspec> <wspec>")
    po.register("n", int, 1, "keep one in n frames")
    po.register("offset", int, 0, "first frame kept")
    args = po.read(argv)
    with TableWriter(args[1], holder="mat") as w:
        for key, m in SequentialTableReader(args[0], holder="mat"):
            w[key] = np.asarray(m)[po["offset"]::po["n"]]
    return 0


@tool("extract-segments")
def extract_segments(argv):
    """segments file lines: <seg-id> <reco-id> <t-begin> <t-end>."""
    po = ParseOptions("extract-segments <wav-rspec> <segments-file> "
                      "<wav-wspec>")
    po.register("min-segment-length", float, 0.1, "drop shorter segments")
    args = po.read(argv)
    reader = RandomAccessTableReader(args[0], holder="wav")
    n_ok = n_bad = 0
    with TableWriter(args[2], holder="wav") as w:
        with open(args[1]) as f:
            for line in f:
                parts = line.split()
                if len(parts) != 4:
                    continue
                seg, reco, tb, te = (parts[0], parts[1], float(parts[2]),
                                     float(parts[3]))
                if reco not in reader:
                    log.warning("extract-segments: no wav for %s", reco)
                    n_bad += 1
                    continue
                wave, rate = reader[reco]
                b, e = int(tb * rate), int(te * rate)
                e = min(e, len(wave))
                if (e - b) / rate < po["min-segment-length"]:
                    n_bad += 1
                    continue
                # table wav reads come back as float at int16 scale;
                # write back as int16 to keep samples bit-identical
                w[seg] = (np.asarray(wave[b:e]).astype(np.int16), rate)
                n_ok += 1
    log.info("extract-segments: %d segments, %d skipped", n_ok, n_bad)
    return 0


@tool("compute-kaldi-pitch-feats")
def compute_kaldi_pitch_feats(argv):
    from kaldi_tpu.features.pitch import (PitchExtractionOptions,
                                          compute_kaldi_pitch)
    po = ParseOptions("compute-kaldi-pitch-feats [opts] <wav-rspec> "
                      "<feats-wspec>")
    po.register("sample-frequency", float, 16000.0, "expected sample rate")
    po.register("min-f0", float, 50.0, "min F0")
    po.register("max-f0", float, 400.0, "max F0")
    args = po.read(argv)
    with TableWriter(args[1], holder="mat") as w:
        for key, (wave, rate) in SequentialTableReader(args[0],
                                                       holder="wav"):
            opts = PitchExtractionOptions(samp_freq=float(rate),
                                          min_f0=po["min-f0"],
                                          max_f0=po["max-f0"])
            w[key] = compute_kaldi_pitch(np.asarray(wave, np.float32)
                                         / 32768.0, opts)
    return 0


@tool("process-kaldi-pitch-feats")
def process_kaldi_pitch_feats(argv):
    """(pov, pitch) → 3-dim (pov, normalized-log-pitch, delta-pitch)
    features (featbin/process-kaldi-pitch-feats.cc role)."""
    from kaldi_tpu.features.pitch import process_pitch
    po = ParseOptions("process-kaldi-pitch-feats [opts] <pitch-rspec> "
                      "<feats-wspec>")
    po.register("pov-scale", float, 2.0, "scale on the POV feature")
    po.register("pitch-scale", float, 2.0, "scale on normalized log pitch")
    po.register("delta-pitch-scale", float, 10.0, "scale on delta pitch")
    args = po.read(argv)
    with TableWriter(args[1], holder="mat") as w:
        for key, mat in SequentialTableReader(args[0], holder="mat"):
            w[key] = process_pitch(np.asarray(mat),
                                   pov_scale=po["pov-scale"],
                                   pitch_scale=po["pitch-scale"],
                                   delta_scale=po["delta-pitch-scale"])
    return 0


# ---------------------------------------------------------------------------
# bin: posteriors
# ---------------------------------------------------------------------------

@tool("ali-to-post")
def ali_to_post(argv):
    po = ParseOptions("ali-to-post <ali-rspec> <post-wspec>")
    args = po.read(argv)
    with TableWriter(args[1], holder="post") as w:
        for key, ali in SequentialTableReader(args[0], holder="ivec"):
            w[key] = [[(int(t), 1.0)] for t in np.asarray(ali)]
    return 0


@tool("weight-silence-post")
def weight_silence_post(argv):
    """Scale the posterior weight of entries whose tid belongs to a
    silence phone (bin/weight-silence-post.cc: the SAT recipe's fMLLR
    pre-step)."""
    from kaldi_tpu.am.serialize import read_mdl
    po = ParseOptions("weight-silence-post <weight> <silence-phones> "
                      "<model> <post-rspec> <post-wspec>")
    args = po.read(argv)
    weight = float(args[0])
    sil = {int(x) for x in args[1].split(":") if x}
    tm, _ = read_mdl(args[2])
    with TableWriter(args[4], holder="post") as w:
        for key, post in SequentialTableReader(args[3], holder="post"):
            out = []
            for frame in post:
                nf = []
                for tid, p in frame:
                    if tm.transition_id_to_phone(tid) in sil:
                        p *= weight
                    if p > 0:
                        nf.append((tid, p))
                out.append(nf)
            w[key] = out
    return 0


@tool("post-to-weights")
def post_to_weights(argv):
    po = ParseOptions("post-to-weights <post-rspec> <weights-wspec>")
    args = po.read(argv)
    with TableWriter(args[1], holder="vec") as w:
        for key, post in SequentialTableReader(args[0], holder="post"):
            w[key] = np.array([sum(p for _, p in frame) for frame in post],
                              np.float32)
    return 0


# ---------------------------------------------------------------------------
# bin: model/tree info
# ---------------------------------------------------------------------------

@tool("am-info")
def am_info(argv):
    from kaldi_tpu.am.serialize import read_mdl
    po = ParseOptions("am-info <model>")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    print(f"number of phones {len(tm.topo.phones)}")
    print(f"number of pdfs {am.num_pdfs}")
    print(f"number of transition-ids {tm.num_transition_ids}")
    print(f"number of transition-states {len(tm.tuples)}")
    print(f"feature dimension {am.dim}")
    print(f"number of gaussians {am.num_gauss()}")
    return 0


@tool("show-transitions")
def show_transitions(argv):
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.fst.fst import SymbolTable
    po = ParseOptions("show-transitions <phones.txt> <model>")
    args = po.read(argv)
    phones = SymbolTable.read(args[0])
    tm, _ = read_mdl(args[1])
    for ts, tup in enumerate(tm.tuples):
        name = phones.find(tup.phone)
        print(f"Transition-state {ts + 1}: phone = {name} "
              f"hmm-state = {tup.hmm_state} pdf = {tup.forward_pdf}")
        for tid in range(tm.state2id[ts + 1], tm.state2id[ts + 2]):
            p = math.exp(tm.log_probs[tid])
            kind = ("self-loop" if tm.is_self_loop(tid) else
                    f"to state {tm.transition_id_to_hmm_state(tid)}")
            print(f" Transition-id = {tid} p = {p:.3f} [{kind}]")
    return 0


@tool("tree-info")
def tree_info(argv):
    from kaldi_tpu.am.serialize import read_tree
    po = ParseOptions("tree-info <tree>")
    args = po.read(argv)
    with open(args[0], "rb") as f:
        if f.read(2) != b"\0B":
            raise KaldiError(f"{args[0]}: not binary kaldi")
        tree = read_tree(f)
    print(f"num-pdfs {tree.num_pdfs}")
    print(f"context-width {getattr(tree, 'context_width', 1)}")
    print(f"central-position {getattr(tree, 'central_position', 0)}")
    return 0


@tool("copy-tree")
def copy_tree(argv):
    from kaldi_tpu.am.serialize import read_tree, write_tree
    po = ParseOptions("copy-tree <tree-in> <tree-out>")
    args = po.read(argv)
    with open(args[0], "rb") as f:
        if f.read(2) != b"\0B":
            raise KaldiError(f"{args[0]}: not binary kaldi")
        tree = read_tree(f)
    with open(args[1], "wb") as f:
        f.write(b"\0B")
        write_tree(f, tree)
    return 0


@tool("align-text")
def align_text(argv):
    """Levenshtein-align ref/hyp text tables (bin/align-text.cc); output
    lines 'key ref-word hyp-word ; ...' with <eps> for ins/del."""
    po = ParseOptions("align-text <ref-rspec> <hyp-rspec> <out-wspec>")
    po.register("special-symbol", str, "<eps>", "gap symbol")
    args = po.read(argv)
    hyps = RandomAccessTableReader(args[1], holder="text")
    gap = po["special-symbol"]
    with TableWriter(args[2], holder="text") as w:
        for key, ref in SequentialTableReader(args[0], holder="text"):
            if key not in hyps:
                continue
            hyp = hyps[key]
            pairs = _align_pair(list(ref), list(hyp), gap)
            w[key] = " ; ".join(f"{a} {b}" for a, b in pairs)
    return 0


def _align_pair(ref: List[str], hyp: List[str], gap: str
                ) -> List[Tuple[str, str]]:
    n, m = len(ref), len(hyp)
    D = np.zeros((n + 1, m + 1), np.int32)
    D[:, 0] = np.arange(n + 1)
    D[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            D[i, j] = min(D[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1]),
                          D[i - 1, j] + 1, D[i, j - 1] + 1)
    out: List[Tuple[str, str]] = []
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and \
                D[i, j] == D[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1]):
            out.append((ref[i - 1], hyp[j - 1]))
            i, j = i - 1, j - 1
        elif i > 0 and D[i, j] == D[i - 1, j] + 1:
            out.append((ref[i - 1], gap))
            i -= 1
        else:
            out.append((gap, hyp[j - 1]))
            j -= 1
    return out[::-1]


# ---------------------------------------------------------------------------
# bin/gmmbin: training graphs + alignment
# ---------------------------------------------------------------------------

def _lang_from_lexicon(path: str, sil_phone: str):
    from kaldi_tpu.fst.lang import Lang, Lexicon
    entries: List[Tuple[str, List[str]]] = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                entries.append((parts[0], parts[1:]))
    return Lang(Lexicon(entries), sil_phone=sil_phone)


@tool("compile-train-graphs")
def compile_train_graphs(argv):
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.decoder.training_graph import TrainingGraphCompiler
    po = ParseOptions("compile-train-graphs [opts] <lexicon.txt> <model> "
                      "<text-rspec> <graphs-wspec>")
    po.register("transition-scale", float, 1.0, "transition scale")
    po.register("self-loop-scale", float, 0.1, "self-loop scale")
    po.register("sil-phone", str, "SIL", "optional-silence phone")
    args = po.read(argv)
    lang = _lang_from_lexicon(args[0], po["sil-phone"])
    tm, _ = read_mdl(args[1])
    compiler = TrainingGraphCompiler(lang, tm, po["transition-scale"],
                                     po["self-loop-scale"])
    n = 0
    with TableWriter(args[3], holder="fst") as w:
        for key, words in SequentialTableReader(args[2], holder="text"):
            w[key] = compiler.compile_text(list(words))
            n += 1
    log.info("compile-train-graphs: %d graphs", n)
    return 0


@tool("align-equal-compiled")
def align_equal_compiled(argv):
    from kaldi_tpu.decoder.training_graph import equal_align
    po = ParseOptions("align-equal-compiled <graphs-rspec> <feats-rspec> "
                      "<ali-wspec>")
    args = po.read(argv)
    graphs = RandomAccessTableReader(args[0], holder="fst")
    with TableWriter(args[2], holder="ivec") as w:
        for key, m in SequentialTableReader(args[1], holder="mat"):
            if key not in graphs:
                log.warning("align-equal-compiled: no graph for %s", key)
                continue
            w[key] = np.asarray(
                equal_align(graphs[key], np.asarray(m).shape[0]), np.int32)
    return 0


@tool("gmm-align-compiled")
def gmm_align_compiled(argv):
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.decoder.align import (DenseAligner, in_degrees,
                                         pack_dense_reverse)
    po = ParseOptions("gmm-align-compiled [opts] <model> <graphs-rspec> "
                      "<feats-rspec> <ali-wspec>")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    graphs = dict(SequentialTableReader(args[1], holder="fst"))
    aligner = DenseAligner(tm.tid_to_pdf_array,
                           acoustic_scale=po["acoustic-scale"])
    keys, dense, lls = [], [], []
    ae = an = smax = 1
    for g in graphs.values():
        e, n = in_degrees(g)
        ae, an = max(ae, e), max(an, n)
        smax = max(smax, g.num_states)
    n_done = 0
    with TableWriter(args[3], holder="ivec") as w:
        for key, m in SequentialTableReader(args[2], holder="mat"):
            if key not in graphs:
                log.warning("gmm-align-compiled: no graph for %s", key)
                continue
            g = pack_dense_reverse(graphs[key], smax, ae, an)
            ll = np.asarray(am.loglikes(np.asarray(m)))
            (tids, cost), = aligner.align_batch([g], [ll])
            w[key] = np.asarray(tids, np.int32)
            n_done += 1
    log.info("gmm-align-compiled: aligned %d utterances", n_done)
    return 0


@tool("gmm-boost-silence")
def gmm_boost_silence(argv):
    """Scale mixture weights of every pdf reachable from the silence
    phones (gmmbin/gmm-boost-silence.cc)."""
    from kaldi_tpu.am.serialize import read_mdl, write_mdl
    po = ParseOptions("gmm-boost-silence [--boost=1.5] <silence-phones> "
                      "<model-in> <model-out>")
    po.register("boost", float, 1.5, "weight multiplier")
    args = po.read(argv)
    sil = {int(x) for x in args[0].split(":") if x}
    tm, am = read_mdl(args[1])
    pdfs = set()
    for tid in range(1, tm.num_transition_ids + 1):
        if tm.transition_id_to_phone(tid) in sil:
            pdfs.add(int(tm.tid_to_pdf_array[tid]))
    for p in sorted(pdfs):
        am.weights[p] *= po["boost"]
    am.refresh()
    write_mdl(args[2], tm, am)
    log.info("gmm-boost-silence: boosted %d pdfs by %.2f", len(pdfs),
             po["boost"])
    return 0


@tool("gmm-est-fmllr")
def gmm_est_fmllr(argv):
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.am.transforms import FmllrAccs, accumulate_fmllr_for_utt
    po = ParseOptions("gmm-est-fmllr [--spk2utt=rspec] <model> "
                      "<feats-rspec> <post-rspec> <trans-wspec>")
    po.register("spk2utt", str, "", "speaker→utt map file (text)")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    posts = RandomAccessTableReader(args[2], holder="post")
    feats = dict(SequentialTableReader(args[1], holder="mat"))
    groups: Dict[str, List[str]] = {}
    if po["spk2utt"]:
        with open(po["spk2utt"]) as f:
            for line in f:
                parts = line.split()
                if parts:
                    groups[parts[0]] = parts[1:]
    else:
        groups = {u: [u] for u in feats}
    with TableWriter(args[3], holder="mat") as w:
        for spk, utts in groups.items():
            accs = FmllrAccs(am.dim)
            n = 0
            for u in utts:
                if u not in feats or u not in posts:
                    continue
                x = np.asarray(feats[u])
                # tid posteriors → per-frame pdf weights
                gamma = np.zeros((x.shape[0], am.num_pdfs))
                for t, frame in enumerate(posts[u][:x.shape[0]]):
                    for tid, p in frame:
                        gamma[t, int(tm.tid_to_pdf_array[tid])] += p
                accumulate_fmllr_for_utt(accs, am, x, gamma)
                n += 1
            if not n:
                continue
            W, objf = accs.update()
            w[spk] = W.astype(np.float32)
            log.info("gmm-est-fmllr: spk %s (%d utts) objf-impr %.4f",
                     spk, n, objf)
    return 0


# ---------------------------------------------------------------------------
# fstbin
# ---------------------------------------------------------------------------

@tool("fstrmsymbols")
def fstrmsymbols(argv):
    po = ParseOptions("fstrmsymbols <disambig-list-file> <fst-in> "
                      "<fst-out>  (replaces listed ilabels with eps)")
    args = po.read(argv)
    with open(args[0]) as f:
        syms = {int(x) for x in f.read().split()}
    fst = _load_fst(args[1])
    for arcs in fst.arcs:
        for a in arcs:
            if a.ilabel in syms:
                a.ilabel = 0
    _save_fst(args[2], fst)
    return 0


@tool("fstrmepslocal")
def fstrmepslocal(argv):
    from kaldi_tpu.fst.ops import rm_epsilon
    po = ParseOptions("fstrmepslocal <fst-in> <fst-out>")
    args = po.read(argv)
    _save_fst(args[1], rm_epsilon(_load_fst(args[0])))
    return 0


@tool("fstisstochastic")
def fstisstochastic(argv):
    po = ParseOptions("fstisstochastic [--delta=0.01] <fst-in>  "
                      "(prints min/max log-sum per state; exit 0 if "
                      "stochastic)")
    po.register("delta", float, 0.01, "tolerance")
    args = po.read(argv)
    fst = _load_fst(args[0])
    lo, hi = float("inf"), -float("inf")
    for s in range(fst.num_states):
        tot = -float("inf")
        for a in fst.arcs[s]:
            tot = np.logaddexp(tot, -a.weight)
        if s in fst.finals:
            tot = np.logaddexp(tot, -fst.finals[s])
        if tot == -float("inf"):
            continue
        lo, hi = min(lo, -tot), max(hi, -tot)
    if lo > hi:
        lo = hi = 0.0
    print(f"{hi:.6f} {lo:.6f}")
    return 0 if (abs(lo) <= po["delta"] and abs(hi) <= po["delta"]) else 1


@tool("fstequivalent")
def fstequivalent(argv):
    from kaldi_tpu.fst.ops import rand_equivalent
    po = ParseOptions("fstequivalent --random=true <fst1> <fst2>  "
                      "(exit 0 iff equivalent on random paths)")
    po.register("random", bool, True, "randomized test")
    po.register("npath", int, 50, "number of random paths")
    args = po.read(argv)
    ok = rand_equivalent(_load_fst(args[0]), _load_fst(args[1]),
                         num_paths=po["npath"])
    return 0 if ok else 1


@tool("fstproject")
def fstproject(argv):
    po = ParseOptions("fstproject [--project_output=false] <fst-in> "
                      "<fst-out>")
    po.register("project_output", bool, False, "project onto olabels")
    args = po.read(argv)
    _save_fst(args[1],
              _load_fst(args[0]).project(output=po["project_output"]))
    return 0


# ---------------------------------------------------------------------------
# latbin
# ---------------------------------------------------------------------------

@tool("lattice-determinize-pruned")
def lattice_determinize_pruned(argv):
    from kaldi_tpu.lattice.determinize import prune_lattice
    from kaldi_tpu.lattice.functions import scale_lattice
    po = ParseOptions("lattice-determinize-pruned [--beam=8] "
                      "[--acoustic-scale=1.0] <rspec> <wspec>")
    po.register("beam", float, 8.0, "lattice pruning beam")
    po.register("acoustic-scale", float, 1.0, "acoustic scale for prune")
    args = po.read(argv)
    with TableWriter(args[1], holder="clat") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            # input CompactLattices here are already deterministic per
            # word sequence; the pruning half is the operative part
            if po["acoustic-scale"] != 1.0:
                scale_lattice(clat, acoustic_scale=po["acoustic-scale"])
            out = prune_lattice(clat, po["beam"])
            if po["acoustic-scale"] != 1.0:
                scale_lattice(out,
                              acoustic_scale=1.0 / po["acoustic-scale"])
            w[key] = out
    return 0


@tool("lattice-1best")
def lattice_1best(argv):
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    po = ParseOptions("lattice-1best [--acoustic-scale=1.0] <rspec> "
                      "<wspec>")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    args = po.read(argv)
    from kaldi_tpu.lattice.functions import scale_lattice
    with TableWriter(args[1], holder="clat") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            if po["acoustic-scale"] != 1.0:
                scale_lattice(clat, acoustic_scale=po["acoustic-scale"])
            words, tids, cost = clat.best_path()
            lin = CompactLattice()
            states = [lin.add_state() for _ in range(len(words) + 1)]
            lin.start = states[0]
            # distribute tids evenly; exact per-arc splits live in the
            # full lattice — 1best output carries words + total cost
            per = len(tids) // max(len(words), 1) if words else 0
            pos = 0
            for i, wd in enumerate(words):
                hi = pos + per if i < len(words) - 1 else len(tids)
                lin.arcs[states[i]].append(CompactArc(
                    wd, cost if i == 0 else 0.0, 0.0,
                    tuple(tids[pos:hi]), states[i + 1]))
                pos = hi
            lin.finals[states[-1]] = (0.0, 0.0, ())
            w[key] = lin
    return 0


@tool("lattice-oracle")
def lattice_oracle(argv):
    """Oracle (minimum achievable) WER of each lattice vs the reference
    transcript (latbin/lattice-oracle.cc)."""
    from kaldi_tpu.fst.fst import SymbolTable
    po = ParseOptions("lattice-oracle <lat-rspec> <ref-rspec> "
                      "[<oracle-text-wspec>]")
    po.register("word-symbol-table", str, "", "words.txt (ref is text)")
    args = po.read(argv)
    words = (SymbolTable.read(po["word-symbol-table"])
             if po["word-symbol-table"] else None)
    refs = RandomAccessTableReader(args[1], holder="text")
    w = (TableWriter(args[2], holder="text") if len(args) > 2 else None)
    tot_err = tot_words = 0
    for key, clat in SequentialTableReader(args[0], holder="clat"):
        if key not in refs:
            continue
        ref = [words[x] if words else int(x) for x in refs[key]]
        errs, best = _oracle_path(clat, ref)
        tot_err += errs
        tot_words += len(ref)
        if w:
            w[key] = ([words.find(x) for x in best] if words
                      else [str(x) for x in best])
    if w:
        w.close()
    wer = 100.0 * tot_err / max(tot_words, 1)
    log.info("lattice-oracle: %%WER %.2f [ %d / %d ]", wer, tot_err,
             tot_words)
    print(f"%WER {wer:.2f} [ {tot_err} / {tot_words} ]")
    return 0


def _oracle_path(clat, ref: List[int]) -> Tuple[int, List[int]]:
    """Min edit distance over all lattice paths (dp over
    (state, ref position) pairs), returning (errors, best word seq)."""
    order = clat.top_order()
    n, m = clat.num_states, len(ref)
    INF = 10 ** 9
    D = np.full((n, m + 1), INF, np.int64)
    back: Dict[Tuple[int, int], Tuple[int, int, List[int]]] = {}
    if clat.start < 0:
        return len(ref), []
    D[clat.start, 0] = 0
    for s in order:
        for j in range(m + 1):
            d = D[s, j]
            if d >= INF:
                continue
            # deletion of ref word (consume ref, stay at state)
            if j < m and d + 1 < D[s, j + 1]:
                D[s, j + 1] = d + 1
                back[(s, j + 1)] = (s, j, [])
            for a in clat.arcs[s]:
                steps = ([(j, d + (0 if a.word == 0 else 1), [a.word]
                           if a.word else [])]  # insertion (or ε free)
                         + ([(j + 1, d + (a.word != ref[j]),
                              [a.word] if a.word else [])]
                            if j < m and a.word != 0 else []))
                for nj, nd, ws in steps:
                    if nd < D[a.nextstate, nj]:
                        D[a.nextstate, nj] = nd
                        back[(a.nextstate, nj)] = (s, j, ws)
    best, bs = INF, -1
    for s in clat.finals:
        if D[s, m] < best:
            best, bs = int(D[s, m]), s
    if bs < 0:
        return len(ref), []
    seq: List[int] = []
    cur = (bs, m)
    while cur != (clat.start, 0) and cur in back:
        ps, pj, ws = back[cur]
        seq = ws + seq
        cur = (ps, pj)
    return best, seq


@tool("lattice-add-penalty")
def lattice_add_penalty(argv):
    po = ParseOptions("lattice-add-penalty [--word-ins-penalty=0.0] "
                      "<rspec> <wspec>")
    po.register("word-ins-penalty", float, 0.0, "per-word graph cost")
    args = po.read(argv)
    pen = po["word-ins-penalty"]
    with TableWriter(args[1], holder="clat") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            for s in range(clat.num_states):
                for a in clat.arcs[s]:
                    if a.word != 0:
                        a.graph_cost += pen
            w[key] = clat
    return 0


@tool("lattice-to-post")
def lattice_to_post(argv):
    """Arc posteriors → per-frame tid posteriors
    (latbin/lattice-to-post.cc)."""
    from kaldi_tpu.lattice.functions import frame_posteriors
    po = ParseOptions("lattice-to-post [--acoustic-scale=1.0] <rspec> "
                      "<post-wspec>")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    args = po.read(argv)
    with TableWriter(args[1], holder="post") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            w[key] = frame_posteriors(
                clat, acoustic_scale=po["acoustic-scale"])
    return 0


@tool("lattice-rmali")
def lattice_rmali(argv):
    po = ParseOptions("lattice-rmali <rspec> <wspec>  (drops tid strings)")
    args = po.read(argv)
    with TableWriter(args[1], holder="clat") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            for s in range(clat.num_states):
                for a in clat.arcs[s]:
                    a.tids = ()
            clat.finals = {s: (gc, ac, ())
                           for s, (gc, ac, _) in clat.finals.items()}
            w[key] = clat
    return 0


@tool("lattice-lmrescore-const-arpa")
def lattice_lmrescore_const_arpa(argv):
    from kaldi_tpu.fst.arpa import ArpaModel
    from kaldi_tpu.fst.fst import SymbolTable
    from kaldi_tpu.lattice.rescore import compose_lm
    po = ParseOptions("lattice-lmrescore-const-arpa [--lm-scale=1.0] "
                      "<arpa> <words.txt> <lat-rspec> <lat-wspec>")
    po.register("lm-scale", float, 1.0, "LM scale")
    args = po.read(argv)
    lm = ArpaModel.parse(args[0])
    words = SymbolTable.read(args[1])
    with TableWriter(args[3], holder="clat") as w:
        for key, clat in SequentialTableReader(args[2], holder="clat"):
            w[key] = compose_lm(clat, lm.score, words,
                                scale=po["lm-scale"])
    return 0


@tool("lattice-lmrescore-pruned")
def lattice_lmrescore_pruned(argv):
    from kaldi_tpu.fst.arpa import ArpaModel
    from kaldi_tpu.fst.fst import SymbolTable
    from kaldi_tpu.lattice.rescore import lmrescore_diff_pruned
    po = ParseOptions("lattice-lmrescore-pruned [--lm-scale=1.0] "
                      "[--lattice-compose-beam=6] [--max-arcs=200000] "
                      "<old-arpa> <new-arpa> <words.txt> <lat-rspec> "
                      "<lat-wspec>")
    po.register("lm-scale", float, 1.0, "LM scale")
    po.register("lattice-compose-beam", float, 6.0, "composition beam")
    po.register("max-arcs", int, 200_000, "output arc cap")
    args = po.read(argv)
    old_lm = ArpaModel.parse(args[0])
    new_lm = ArpaModel.parse(args[1])
    words = SymbolTable.read(args[2])
    with TableWriter(args[4], holder="clat") as w:
        for key, clat in SequentialTableReader(args[3], holder="clat"):
            # single pruned composition with the difference LM: the
            # exact subtract-then-add intermediate is quadratic in
            # density × histories and blows up on dense lattices
            w[key] = lmrescore_diff_pruned(
                clat, old_lm, new_lm, words, lm_scale=po["lm-scale"],
                beam=po["lattice-compose-beam"], max_arcs=po["max-arcs"])
    return 0


# ---------------------------------------------------------------------------
# ivectorbin
# ---------------------------------------------------------------------------

@tool("ivector-extract")
def ivector_extract(argv):
    from kaldi_tpu.am.ivector import read_ivector_extractor
    po = ParseOptions("ivector-extract <extractor> <feats-rspec> "
                      "<ivector-wspec>")
    args = po.read(argv)
    ex = read_ivector_extractor(args[0])
    with TableWriter(args[2], holder="vec") as w:
        for key, m in SequentialTableReader(args[1], holder="mat"):
            w[key] = ex.extract_from_feats(np.asarray(m)).astype(np.float32)
    return 0


@tool("ivector-mean")
def ivector_mean(argv):
    po = ParseOptions("ivector-mean <spk2utt-file> <ivector-rspec> "
                      "<spk-ivector-wspec>")
    args = po.read(argv)
    ivs = RandomAccessTableReader(args[1], holder="vec")
    with TableWriter(args[2], holder="vec") as w:
        with open(args[0]) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                vecs = [np.asarray(ivs[u]) for u in parts[1:] if u in ivs]
                if vecs:
                    w[parts[0]] = np.mean(vecs, axis=0).astype(np.float32)
    return 0


@tool("ivector-compute-plda")
def ivector_compute_plda(argv):
    from kaldi_tpu.am.ivector import Plda, write_plda
    po = ParseOptions("ivector-compute-plda <spk2utt-file> "
                      "<ivector-rspec> <plda-out>")
    args = po.read(argv)
    ivs = RandomAccessTableReader(args[1], holder="vec")
    spk2ivs: Dict[str, np.ndarray] = {}
    with open(args[0]) as f:
        for line in f:
            parts = line.split()
            vecs = [np.asarray(ivs[u]) for u in parts[1:] if u in ivs]
            if len(vecs) >= 2:
                spk2ivs[parts[0]] = np.stack(vecs)
    if not spk2ivs:
        raise KaldiError("ivector-compute-plda: no speakers with >=2 utts")
    write_plda(args[2], Plda.train(spk2ivs))
    log.info("ivector-compute-plda: trained on %d speakers", len(spk2ivs))
    return 0


@tool("ivector-plda-scoring")
def ivector_plda_scoring(argv):
    """trials file lines: <enroll-key> <test-key>; output lines add the
    LLR score (ivectorbin/ivector-plda-scoring.cc)."""
    from kaldi_tpu.am.ivector import read_plda
    po = ParseOptions("ivector-plda-scoring [--num-utts=rspec] <plda> "
                      "<enroll-ivec-rspec> <test-ivec-rspec> "
                      "<trials-file> <scores-out>")
    args = po.read(argv)
    plda = read_plda(args[0])
    enroll = RandomAccessTableReader(args[1], holder="vec")
    test = RandomAccessTableReader(args[2], holder="vec")
    n = 0
    with open(args[4], "w") as out:
        with open(args[3]) as f:
            for line in f:
                parts = line.split()
                if len(parts) < 2:
                    continue
                e, t = parts[0], parts[1]
                if e not in enroll or t not in test:
                    continue
                s = plda.score(np.asarray(enroll[e]), np.asarray(test[t]))
                out.write(f"{e} {t} {s:.6f}\n")
                n += 1
    log.info("ivector-plda-scoring: scored %d trials", n)
    return 0


@tool("agglomerative-cluster")
def agglomerative_cluster_tool(argv):
    """Per-recording score matrices → integer speaker labels
    (ivectorbin/agglomerative-cluster.cc; labels parallel the
    reco2utt utterance order)."""
    from kaldi_tpu.am.ivector import agglomerative_cluster
    po = ParseOptions("agglomerative-cluster [--threshold=0.0] "
                      "[--num-clusters=0] <scores-rspec> <reco2utt-file> "
                      "<labels-wspec>")
    po.register("threshold", float, 0.0, "merge-stop threshold")
    po.register("num-clusters", int, 0, "force exactly N clusters (0=auto)")
    args = po.read(argv)
    reco2utt: Dict[str, List[str]] = {}
    with open(args[1]) as f:
        for line in f:
            parts = line.split()
            if parts:
                reco2utt[parts[0]] = parts[1:]
    k = po["num-clusters"] or None
    with TableWriter(args[2], holder="ivec") as w:
        for reco, S in SequentialTableReader(args[0], holder="mat"):
            labels = agglomerative_cluster(
                np.asarray(S), po["threshold"],
                min_clusters=k or 1, max_clusters=k)
            w[reco] = labels
    return 0


# ---------------------------------------------------------------------------
# nnet3bin additions
# ---------------------------------------------------------------------------

def _load_tdnn(path: str, subsample: int):
    import jax
    from kaldi_tpu.am.nnet3_io import (infer_tdnn_config, nnet3_to_tdnn,
                                       read_nnet3)
    from kaldi_tpu.am.tdnn import TdnnChain
    with open(path, "rb") as f:
        if f.read(2) != b"\0B":
            raise KaldiError(f"{path}: not binary kaldi")
        model = read_nnet3(f)
    cfg = infer_tdnn_config(model, frame_subsampling_factor=subsample)
    params, batch_stats = nnet3_to_tdnn(model, cfg)
    net = TdnnChain(cfg)
    fwd = jax.jit(lambda x: net.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False))
    return cfg, fwd


@tool("nnet3-compute")
def nnet3_compute(argv):
    po = ParseOptions("nnet3-compute [--frame-subsampling-factor=3] "
                      "<raw-model> <feats-rspec> <out-wspec>")
    po.register("frame-subsampling-factor", int, 3, "output frame rate")
    args = po.read(argv)
    _, fwd = _load_tdnn(args[0], po["frame-subsampling-factor"])
    with TableWriter(args[2], holder="mat") as w:
        for key, m in SequentialTableReader(args[1], holder="mat"):
            w[key] = np.asarray(fwd(np.asarray(m, np.float32)[None]))[0]
    return 0


@tool("nnet3-average")
def nnet3_average(argv):
    from kaldi_tpu.am.nnet3_io import read_nnet3, write_nnet3
    po = ParseOptions("nnet3-average <out> <in1> <in2> [...]")
    args = po.read(argv)
    models = []
    for p in args[1:]:
        with open(p, "rb") as f:
            if f.read(2) != b"\0B":
                raise KaldiError(f"{p}: not binary kaldi")
            models.append(read_nnet3(f))
    base = models[0]
    for c_i, comp in enumerate(base.components):
        for fname, fv in comp.fields.items():
            if fv.array is None:
                continue
            acc = fv.array.astype(np.float64)
            for m in models[1:]:
                acc = acc + m.components[c_i].fields[fname].array
            fv.array = (acc / len(models)).astype(fv.array.dtype)
    with open(args[0], "wb") as f:
        f.write(b"\0B")
        write_nnet3(f, base)
    log.info("nnet3-average: averaged %d models", len(models))
    return 0


@tool("nnet3-latgen-faster")
def nnet3_latgen_faster(argv):
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.cli.tools import (_LatgenDecoder, latgen_kwargs,
                                     register_latgen_opts)
    from kaldi_tpu.fst.fst import SymbolTable
    po = ParseOptions("nnet3-latgen-faster [opts] <trans-model> "
                      "<raw-nnet3> <fst> <feats-rspec> <lat-wspec> "
                      "[<words-wspec>]")
    po.register("beam", float, 15.0, "decoding beam")
    po.register("lattice-beam", float, 8.0, "lattice beam")
    po.register("max-active", int, 7000, "max active states")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    po.register("frame-subsampling-factor", int, 3, "subsampling")
    po.register("word-symbol-table", str, "", "words.txt")
    register_latgen_opts(po)
    args = po.read(argv)
    tm, _am = read_mdl(args[0])
    _, fwd = _load_tdnn(args[1], po["frame-subsampling-factor"])
    dec = _LatgenDecoder(_load_fst(args[2]), tm.tid_to_pdf_array,
                         po["beam"], po["lattice-beam"],
                         po["acoustic-scale"],
                         max_active=po["max-active"],
                         **latgen_kwargs(po))
    words_tab = (SymbolTable.read(po["word-symbol-table"])
                 if po["word-symbol-table"] else None)
    wwriter = (TableWriter(args[5], holder="text")
               if len(args) > 5 else None)
    n = 0
    with TableWriter(args[4], holder="clat") as lw:
        for key, feats in SequentialTableReader(args[3], holder="mat"):
            scores = np.asarray(fwd(np.asarray(feats, np.float32)[None]))[0]
            clat = dec.decode_to_clat(scores)
            lw[key] = clat
            wseq, _, cost = clat.best_path()
            text = [words_tab.find(w) if words_tab else str(w)
                    for w in wseq]
            if wwriter:
                wwriter[key] = text
            log.info("%s: %s (cost %.2f)", key, " ".join(text), cost)
            n += 1
    if wwriter:
        wwriter.close()
    log.info("nnet3-latgen-faster: decoded %d utterances", n)
    return 0
