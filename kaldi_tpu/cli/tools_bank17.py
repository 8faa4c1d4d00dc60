"""Seventeenth bank of CLI tools: latbin tail (project/difference/
smbr-mpe posteriors/rescore-mapped/ngram-expand/nbest), kws index
binaries, i-vector extractor training binaries, online2 feature dump,
rnnlm egs/sentence-probs, gmm regression-tree fMLLR + parallel latgen,
and small bin utilities.

Canonical shapes mirrored (SURVEY.md §2.1 bins):
latbin/{lattice-project,lattice-difference,lattice-to-smbr-post,
lattice-to-mpe-post,lattice-rescore-mapped,lattice-expand-ngram,
nbest-to-lattice,nbest-to-prons}.cc,
kwsbin/{lattice-to-kws-index,kws-index-union,transcripts-to-fsts}.cc,
ivectorbin/{ivector-extractor-init,-acc-stats,-sum-accs,-est,
ivector-transform,ivector-compute-dot-products,ivector-copy-plda}.cc,
online2bin/{online2-wav-dump-features,ivector-extract-online2}.cc,
rnnlmbin/{rnnlm-get-egs,rnnlm-sentence-probs}.cc,
gmmbin/{gmm-est-regtree-fmllr,gmm-est-fmllr-gpost,gmm-acc-stats2,
gmm-latgen-faster-parallel,gmm-align}.cc,
bin/{show-alignments,phones-to-prons,matrix-dim,copy-gselect}.cc.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from kaldi_tpu.cli.tools import tool, _load_hclg, _LatgenDecoder
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


# ---------------------------------------------------------------------------
# latbin tail.

@tool("lattice-project")
def lattice_project_tool(argv):
    """Project lattices onto word labels: drop tid strings and
    acoustic costs (latbin/lattice-project.cc: the word-FSA side used
    for LM rescoring and difference)."""
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    po = ParseOptions("lattice-project <clat-rspec> <clat-wspec>")
    args = po.read(argv)
    n = 0
    with TableWriter(args[1], holder="clat") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            out = CompactLattice()
            for _ in range(clat.num_states):
                out.add_state()
            out.start = clat.start
            for s in range(clat.num_states):
                for a in clat.arcs[s]:
                    out.arcs[s].append(CompactArc(
                        a.word, a.graph_cost + a.acoustic_cost, 0.0,
                        (), a.nextstate))
            for s, (gc, ac, _t) in clat.finals.items():
                out.finals[s] = (gc + ac, 0.0, ())
            w[key] = out
            n += 1
    log.info("lattice-project: %d lattices", n)
    return 0


@tool("lattice-difference")
def lattice_difference_tool(argv):
    """Remove from each lattice every path whose WORD sequence appears
    in the corresponding second lattice (latbin/lattice-difference.cc
    — used to exclude the numerator path from MCE denominators)."""
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    from kaldi_tpu.lattice.ops import enumerate_paths
    po = ParseOptions("lattice-difference <clat-rspec> <sub-rspec> "
                      "<clat-wspec>")
    args = po.read(argv)
    sub_r = RandomAccessTableReader(args[1], holder="clat")
    n_done = n_empty = 0
    with TableWriter(args[2], holder="clat") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            if key not in sub_r:
                w[key] = clat
                n_done += 1
                continue
            remove = set(enumerate_paths(sub_r[key]).keys())
            out = CompactLattice()
            kept = 0
            # path-level difference via enumeration (lattices are
            # determinized/word-deterministic and small post-decode)
            s0 = out.add_state()
            out.start = s0
            for path in _clat_paths(clat):
                words = tuple(a.word for a in path["arcs"]
                              if a.word != 0)
                if words in remove:
                    continue
                cur = s0
                for a in path["arcs"]:
                    nxt = out.add_state()
                    out.arcs[cur].append(CompactArc(
                        a.word, a.graph_cost, a.acoustic_cost,
                        a.tids, nxt))
                    cur = nxt
                fgc, fac, ftids = path["final"]
                out.finals[cur] = (fgc, fac, tuple(ftids))
                kept += 1
            if kept:
                w[key] = out
                n_done += 1
            else:
                n_empty += 1
    log.info("lattice-difference: wrote %d, %d became empty", n_done,
             n_empty)
    return 0


def _clat_paths(clat, limit: int = 20000):
    """Yield {'arcs': [CompactArc...], 'final': (gc, ac, tids)}."""
    if clat.start < 0:
        return
    stack = [(clat.start, [])]
    n = 0
    while stack:
        s, arcs = stack.pop()
        fin = clat.finals.get(s)
        if fin is not None:
            yield {"arcs": arcs, "final": fin}
            n += 1
            if n >= limit:
                raise KaldiError("too many lattice paths to enumerate")
        for a in clat.arcs[s]:
            stack.append((a.nextstate, arcs + [a]))


def _seq_posteriors(clat, tm, ref_tids, acoustic_scale, unit):
    """Shared smbr/mpe posterior computation: per-frame pdf-level
    posteriors weighted by gamma * (accuracy - expected accuracy)
    (src/lat/lattice-functions.cc LatticeForwardBackwardMpeVariants).
    unit='pdf' → sMBR (state-level accuracy), 'phone' → MPE."""
    import math
    from kaldi_tpu.lattice.functions import state_times

    def arc_ll(a):
        return -(a.graph_cost + acoustic_scale * a.acoustic_cost)

    order = clat.top_order()
    nstates = clat.num_states
    times = state_times(clat)
    NEG = -np.inf
    alpha = np.full(nstates, NEG)
    alpha[clat.start] = 0.0

    def ladd(a, b):
        if a == NEG:
            return b
        if b == NEG:
            return a
        m = max(a, b)
        return m + math.log1p(math.exp(-abs(a - b)))

    for s in order:
        if alpha[s] == NEG:
            continue
        for a in clat.arcs[s]:
            alpha[a.nextstate] = ladd(alpha[a.nextstate],
                                      alpha[s] + arc_ll(a))
    beta = np.full(nstates, NEG)
    for s, (gc, ac, _t) in clat.finals.items():
        beta[s] = -(gc + acoustic_scale * ac)
    for s in reversed(order):
        for a in clat.arcs[s]:
            beta[s] = ladd(beta[s], arc_ll(a) + beta[a.nextstate])
    total = beta[clat.start]

    def acc_of(tid, t):
        if t >= len(ref_tids):
            return 0.0
        if unit == "phone":
            return float(tm.transition_id_to_phone(int(tid))
                         == tm.transition_id_to_phone(
                             int(ref_tids[t])))
        return float(tm.transition_id_to_pdf(int(tid))
                     == tm.transition_id_to_pdf(int(ref_tids[t])))

    # arc-level gamma and accuracy
    arcs_info = []
    exp_acc = 0.0
    for s in order:
        if alpha[s] == NEG:
            continue
        for a in clat.arcs[s]:
            g = math.exp(alpha[s] + arc_ll(a) + beta[a.nextstate]
                         - total)
            accs = [acc_of(tid, times[s] + i)
                    for i, tid in enumerate(a.tids)]
            arcs_info.append((s, a, g, accs))
            exp_acc += g * sum(accs)
    # smbr/mpe posterior per (t, pdf): gamma * (arc path accuracy
    # contribution - expected); the standard per-frame decomposition
    T = max((times[s] + len(f[2]) for s, f in clat.finals.items()),
            default=0)
    post: List[List] = [dict() for _ in range(T)]
    for s, a, g, accs in arcs_info:
        for i, tid in enumerate(a.tids):
            t = times[s] + i
            pdf = tm.transition_id_to_pdf(int(tid))
            wgt = g * (accs[i] - exp_acc / max(T, 1))
            post[t][pdf] = post[t].get(pdf, 0.0) + wgt
    return [[(p, w) for p, w in sorted(fr.items())] for fr in post]


@tool("lattice-to-smbr-post")
def lattice_to_smbr_post_tool(argv):
    """State-level minimum-Bayes-risk posteriors for sequence training
    (latbin/lattice-to-smbr-post.cc)."""
    return _seq_post_main(argv, "pdf", "lattice-to-smbr-post")


@tool("lattice-to-mpe-post")
def lattice_to_mpe_post_tool(argv):
    """Minimum-phone-error posteriors (latbin/lattice-to-mpe-post.cc)."""
    return _seq_post_main(argv, "phone", "lattice-to-mpe-post")


def _seq_post_main(argv, unit, name):
    from kaldi_tpu.am.serialize import read_mdl
    po = ParseOptions(f"{name} [opts] <model> <ali-rspec> <clat-rspec> "
                      "<post-wspec>")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    ali_r = RandomAccessTableReader(args[1], holder="ivec")
    n = 0
    with TableWriter(args[3], holder="post") as w:
        for key, clat in SequentialTableReader(args[2], holder="clat"):
            if key not in ali_r:
                log.warning("%s: no alignment for %s", name, key)
                continue
            w[key] = _seq_posteriors(clat, tm,
                                     np.asarray(ali_r[key]).tolist(),
                                     po["acoustic-scale"], unit)
            n += 1
    log.info("%s: %d lattices", name, n)
    return 0


@tool("lattice-rescore-mapped")
def lattice_rescore_mapped_tool(argv):
    """Replace acoustic scores from new loglike matrices — rows are
    pdfs (latbin/lattice-rescore-mapped.cc: the nnet rescoring seam)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.lattice.functions import state_times
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    po = ParseOptions("lattice-rescore-mapped [opts] <trans-model> "
                      "<clat-rspec> <loglikes-rspec> <clat-wspec>")
    po.register("old-acoustic-scale", float, 0.0,
                "add old acoustics at this scale")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    ll_r = RandomAccessTableReader(args[2], holder="mat")
    n = 0
    with TableWriter(args[3], holder="clat") as w:
        for key, clat in SequentialTableReader(args[1], holder="clat"):
            if key not in ll_r:
                log.warning("lattice-rescore-mapped: no loglikes for "
                            "%s", key)
                continue
            ll = np.asarray(ll_r[key])
            times = state_times(clat)
            out = CompactLattice()
            for _ in range(clat.num_states):
                out.add_state()
            out.start = clat.start
            ok = True
            for s in range(clat.num_states):
                for a in clat.arcs[s]:
                    ac = po["old-acoustic-scale"] * a.acoustic_cost
                    for i, tid in enumerate(a.tids):
                        t = times[s] + i
                        if t >= len(ll):
                            ok = False
                            break
                        ac -= float(ll[t, tm.transition_id_to_pdf(
                            int(tid))])
                    out.arcs[s].append(CompactArc(
                        a.word, a.graph_cost, ac, a.tids, a.nextstate))
            for s, (gc, ac0, ftids) in clat.finals.items():
                ac = po["old-acoustic-scale"] * ac0
                for i, tid in enumerate(ftids):
                    t = times[s] + i
                    if t < len(ll):
                        ac -= float(ll[t, tm.transition_id_to_pdf(
                            int(tid))])
                out.finals[s] = (gc, ac, tuple(ftids))
            if ok:
                w[key] = out
                n += 1
    log.info("lattice-rescore-mapped: rescored %d", n)
    return 0


@tool("lattice-expand-ngram")
def lattice_expand_ngram_tool(argv):
    """Expand each lattice so every state has a unique word history of
    length n−1 (latbin/lattice-expand-ngram.cc — prepares lattices for
    n-gram-approximated rescoring)."""
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    po = ParseOptions("lattice-expand-ngram [--n=3] <clat-rspec> "
                      "<clat-wspec>")
    po.register("n", int, 3, "n-gram order")
    args = po.read(argv)
    hist_len = max(po["n"] - 1, 0)
    n_done = 0
    with TableWriter(args[1], holder="clat") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            out = CompactLattice()
            smap: Dict = {}

            def state_of(s, hist):
                k = (s, hist)
                if k not in smap:
                    smap[k] = out.add_state()
                return smap[k]

            start_k = (clat.start, ())
            smap[start_k] = out.add_state()
            out.start = 0
            stack = [start_k]
            seen = {start_k}
            while stack:
                s, hist = stack.pop()
                cur = smap[(s, hist)]
                fin = clat.finals.get(s)
                if fin is not None:
                    out.finals[cur] = fin
                for a in clat.arcs[s]:
                    nh = (hist + ((a.word,) if a.word else ())
                          )[-hist_len:] if hist_len else ()
                    k = (a.nextstate, nh)
                    dst = state_of(a.nextstate, nh)
                    out.arcs[cur].append(CompactArc(
                        a.word, a.graph_cost, a.acoustic_cost,
                        a.tids, dst))
                    if k not in seen:
                        seen.add(k)
                        stack.append(k)
            w[key] = out
            n_done += 1
    log.info("lattice-expand-ngram: %d lattices (n=%d)", n_done,
             po["n"])
    return 0


@tool("nbest-to-lattice")
def nbest_to_lattice_tool(argv):
    """Union utt-N single-path lattices back into one lattice per
    utterance (latbin/nbest-to-lattice.cc)."""
    from kaldi_tpu.lattice.ops import lattice_union
    po = ParseOptions("nbest-to-lattice <nbest-rspec> <clat-wspec>")
    args = po.read(argv)
    groups: Dict[str, List] = {}
    order: List[str] = []
    for key, clat in SequentialTableReader(args[0], holder="clat"):
        utt = key.rsplit("-", 1)[0]
        if utt not in groups:
            groups[utt] = []
            order.append(utt)
        groups[utt].append(clat)
    with TableWriter(args[1], holder="clat") as w:
        for utt in order:
            lat = groups[utt][0]
            for other in groups[utt][1:]:
                lat = lattice_union(lat, other)
            w[utt] = lat
    log.info("nbest-to-lattice: %d utterances from %d paths",
             len(order), sum(len(g) for g in groups.values()))
    return 0


@tool("nbest-to-prons")
def nbest_to_prons_tool(argv):
    """Word + pronunciation lines from single-path lattices
    (latbin/nbest-to-prons.cc): '<utt> <t-start> <t-end> <word>
    <phones...>' via the word-aligned tid strings."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.lattice.word_align import word_align_lattice
    po = ParseOptions("nbest-to-prons <model> <lexicon-file> "
                      "<nbest-rspec> <prons-wspec>\n"
                      "lexicon lines: <word-int> <phone-int>...")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    prons: Dict[int, List[List[int]]] = {}
    with open(args[1]) as f:
        for line in f:
            parts = [int(x) for x in line.split()]
            if parts:
                prons.setdefault(parts[0], []).append(parts[1:])
    sil = {p for p in range(1, 2)}         # phone 1 = SIL convention
    n = 0
    with TableWriter(args[3], holder="text") as w:
        for key, clat in SequentialTableReader(args[2], holder="clat"):
            aligned, ok = word_align_lattice(clat, tm, prons, sil)
            if not ok:
                log.warning("nbest-to-prons: %s word-align failed", key)
            lines = []
            t = 0
            s = aligned.start
            while True:
                fin = aligned.finals.get(s)
                if fin is not None and not aligned.arcs[s]:
                    break
                if not aligned.arcs[s]:
                    break
                a = aligned.arcs[s][0]
                dur = len(a.tids)
                if a.word != 0:
                    ph = [tm.transition_id_to_phone(x)
                          for x in a.tids]
                    dedup = [p for i, p in enumerate(ph)
                             if i == 0 or p != ph[i - 1]]
                    lines.append(f"{t} {t + dur} {a.word} "
                                 + " ".join(str(p) for p in dedup))
                t += dur
                s = a.nextstate
            w[key] = " ; ".join(lines).split() if lines else ["-"]
            n += 1
    log.info("nbest-to-prons: %d paths", n)
    return 0


# ---------------------------------------------------------------------------
# kws index binaries.

@tool("lattice-to-kws-index")
def lattice_to_kws_index_tool(argv):
    """Build the inverted keyword-search index from lattices
    (kwsbin/lattice-to-kws-index.cc; the factor-transducer role)."""
    from kaldi_tpu.core import io as kio
    from kaldi_tpu.kws import LatticeIndex, write_lattice_index
    po = ParseOptions("lattice-to-kws-index [opts] <clat-rspec> "
                      "<index-out>")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    args = po.read(argv)
    lattices = dict(SequentialTableReader(args[0], holder="clat"))
    idx = LatticeIndex.build(lattices,
                             acoustic_scale=po["acoustic-scale"])
    with kio.open_wxfilename(args[1]) as f:
        kio.init_kaldi_output_stream(f)
        write_lattice_index(f, idx)
    log.info("lattice-to-kws-index: indexed %d lattices, %d words",
             len(idx.utts), len(idx.postings))
    return 0


@tool("kws-index-union")
def kws_index_union_tool(argv):
    """Union index shards (kwsbin/kws-index-union.cc)."""
    from kaldi_tpu.core import io as kio
    from kaldi_tpu.kws import (merge_indexes, read_lattice_index,
                               write_lattice_index)
    po = ParseOptions("kws-index-union <index-out> <index-in1> "
                      "[<index-in2> ...]")
    args = po.read(argv)
    parts = []
    for path in args[1:]:
        with kio.open_rxfilename(path) as f:
            kio.init_kaldi_input_stream(f)
            parts.append(read_lattice_index(f))
    idx = merge_indexes(parts)
    with kio.open_wxfilename(args[0]) as f:
        kio.init_kaldi_output_stream(f)
        write_lattice_index(f, idx)
    log.info("kws-index-union: %d shards → %d utterances", len(parts),
             len(idx.utts))
    return 0


@tool("transcripts-to-fsts")
def transcripts_to_fsts_tool(argv):
    """Integer transcripts → linear acceptor FSTs
    (kwsbin/transcripts-to-fsts.cc)."""
    from kaldi_tpu.fst.fst import Arc, VectorFst
    po = ParseOptions("transcripts-to-fsts <text-rspec> <fsts-wspec>")
    args = po.read(argv)
    n = 0
    with TableWriter(args[1], holder="fst") as w:
        for key, words in SequentialTableReader(args[0], holder="text"):
            fst = VectorFst()
            cur = fst.add_state()
            fst.set_start(cur)
            for word in words:
                nxt = fst.add_state()
                fst.add_arc(cur, Arc(int(word), int(word), 0.0, nxt))
                cur = nxt
            fst.set_final(cur, 0.0)
            w[key] = fst
            n += 1
    log.info("transcripts-to-fsts: %d transcripts", n)
    return 0


# ---------------------------------------------------------------------------
# i-vector extractor training binaries (map-reduce EM, the
# accs/sum/est stage contract).

@tool("ivector-extractor-init")
def ivector_extractor_init_tool(argv):
    """Initialize the total-variability extractor from a (full or
    diag) UBM (ivectorbin/ivector-extractor-init.cc)."""
    from kaldi_tpu.am.ivector import (IvectorExtractor,
                                      write_ivector_extractor)
    from kaldi_tpu.cli.tools_bank5 import _read_global_gmm
    po = ParseOptions("ivector-extractor-init [opts] <ubm-in> "
                      "<extractor-out>")
    po.register("ivector-dim", int, 100, "i-vector dimension")
    po.register("seed", int, 0, "T init seed")
    args = po.read(argv)
    am = _read_global_gmm(args[0])
    ex = IvectorExtractor.from_am(am, po["ivector-dim"])
    ex.T = 0.1 * np.random.default_rng(po["seed"]).standard_normal(
        ex.T.shape)
    write_ivector_extractor(args[1], ex)
    log.info("ivector-extractor-init: %d gaussians, dim %d",
             ex.T.shape[0], po["ivector-dim"])
    return 0


@tool("ivector-extractor-acc-stats")
def ivector_extractor_acc_stats_tool(argv):
    """Accumulate EM stats for the extractor over a job's feats
    (ivectorbin/ivector-extractor-acc-stats.cc)."""
    from kaldi_tpu.am.ivector import read_ivector_extractor
    from kaldi_tpu.am.serialize import write_pytree
    from kaldi_tpu.core import io as kio
    po = ParseOptions("ivector-extractor-acc-stats <extractor-in> "
                      "<feats-rspec> <stats-out>")
    args = po.read(argv)
    ex = read_ivector_extractor(args[0])
    utt_stats = [ex.acc_stats(np.asarray(m)) for _k, m in
                 SequentialTableReader(args[1], holder="mat")]
    A, B, gamma = ex.em_stats(utt_stats)
    with kio.open_wxfilename(args[2]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<IvectorStats>")
        write_pytree(f, {"A": A, "B": B, "gamma": gamma,
                         "num_utts": np.int64(len(utt_stats))})
        kio.write_token(f, "</IvectorStats>")
    log.info("ivector-extractor-acc-stats: %d utterances",
             len(utt_stats))
    return 0


def _read_iv_stats(path):
    from kaldi_tpu.am.serialize import read_pytree
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(path) as f:
        kio.init_kaldi_input_stream(f)
        kio.expect_token(f, "<IvectorStats>")
        d = read_pytree(f)
        kio.expect_token(f, "</IvectorStats>")
    return d


@tool("ivector-extractor-sum-accs")
def ivector_extractor_sum_accs_tool(argv):
    """Sum per-job extractor stats
    (ivectorbin/ivector-extractor-sum-accs.cc)."""
    from kaldi_tpu.am.serialize import write_pytree
    from kaldi_tpu.core import io as kio
    po = ParseOptions("ivector-extractor-sum-accs <stats-out> "
                      "<stats-in1> [<stats-in2> ...]")
    args = po.read(argv)
    tot = None
    for path in args[1:]:
        d = _read_iv_stats(path)
        if tot is None:
            tot = d
        else:
            for k in ("A", "B", "gamma", "num_utts"):
                tot[k] = tot[k] + d[k]
    with kio.open_wxfilename(args[0]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<IvectorStats>")
        write_pytree(f, tot)
        kio.write_token(f, "</IvectorStats>")
    log.info("ivector-extractor-sum-accs: %d inputs", len(args) - 1)
    return 0


@tool("ivector-extractor-est")
def ivector_extractor_est_tool(argv):
    """M-step update of T from summed stats
    (ivectorbin/ivector-extractor-est.cc)."""
    from kaldi_tpu.am.ivector import (read_ivector_extractor,
                                      write_ivector_extractor)
    po = ParseOptions("ivector-extractor-est <extractor-in> <stats-in> "
                      "<extractor-out>")
    args = po.read(argv)
    ex = read_ivector_extractor(args[0])
    d = _read_iv_stats(args[1])
    ex.em_update(d["A"], d["B"], d["gamma"])
    write_ivector_extractor(args[2], ex)
    log.info("ivector-extractor-est: updated from %.0f frames of "
             "stats", float(d["gamma"].sum()))
    return 0


@tool("ivector-transform")
def ivector_transform_tool(argv):
    """Apply a linear/affine transform to i-vectors
    (ivectorbin/ivector-transform.cc)."""
    from kaldi_tpu.core import io as kio
    po = ParseOptions("ivector-transform <matrix-in> <ivec-rspec> "
                      "<ivec-wspec>")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        kio.init_kaldi_input_stream(f)
        mat = np.asarray(kio.read_matrix(f))
    n = 0
    with TableWriter(args[2], holder="vec") as w:
        for key, v in SequentialTableReader(args[1], holder="vec"):
            v = np.asarray(v)
            if mat.shape[1] == len(v) + 1:
                v = np.concatenate([v, [1.0]])
            w[key] = (mat @ v).astype(np.float32)
            n += 1
    log.info("ivector-transform: %d vectors", n)
    return 0


@tool("ivector-compute-dot-products")
def ivector_compute_dot_products_tool(argv):
    """Score trial pairs by (normalized) dot product
    (ivectorbin/ivector-compute-dot-products.cc).  Trials file lines:
    <key1> <key2>."""
    po = ParseOptions("ivector-compute-dot-products <trials-file> "
                      "<ivec-rspec1> <ivec-rspec2> <scores-wxfilename>")
    args = po.read(argv)
    iv1 = RandomAccessTableReader(args[1], holder="vec")
    iv2 = RandomAccessTableReader(args[2], holder="vec")
    n = 0
    with open(args[3], "w") as f:
        with open(args[0]) as trials:
            for line in trials:
                parts = line.split()
                if len(parts) < 2:
                    continue
                k1, k2 = parts[0], parts[1]
                if k1 not in iv1 or k2 not in iv2:
                    log.warning("missing ivector for trial %s %s",
                                k1, k2)
                    continue
                a, b = np.asarray(iv1[k1]), np.asarray(iv2[k2])
                score = float(a @ b / (np.linalg.norm(a)
                                       * np.linalg.norm(b) + 1e-20))
                f.write(f"{k1} {k2} {score:.6f}\n")
                n += 1
    log.info("ivector-compute-dot-products: %d trials", n)
    return 0


@tool("ivector-copy-plda")
def ivector_copy_plda_tool(argv):
    """Copy (optionally smooth) a PLDA model
    (ivectorbin/ivector-copy-plda.cc)."""
    from kaldi_tpu.am.ivector import read_plda, write_plda
    po = ParseOptions("ivector-copy-plda [--smoothing=0.0] <plda-in> "
                      "<plda-out>")
    po.register("smoothing", float, 0.0,
                "interpolate within-class toward between-class")
    args = po.read(argv)
    plda = read_plda(args[0])
    if po["smoothing"] > 0:
        plda.within = ((1 - po["smoothing"]) * plda.within
                       + po["smoothing"] * plda.between)
    write_plda(args[1], plda)
    return 0


# ---------------------------------------------------------------------------
# online2 feature dump + online2 i-vectors.

@tool("online2-wav-dump-features")
def online2_wav_dump_features_tool(argv):
    """Run the ONLINE feature pipeline over wav chunks and dump the
    features (online2bin/online2-wav-dump-features.cc) — proves the
    streaming frontend, chunk by chunk."""
    from kaldi_tpu.features import (FrameExtractionOptions, Mfcc,
                                    MfccOptions)
    from kaldi_tpu.features.online import OnlineFeaturePipeline
    po = ParseOptions("online2-wav-dump-features [opts] <wav-rspec> "
                      "<feats-wspec>")
    po.register("chunk-length", float, 0.18, "seconds per chunk")
    po.register("num-ceps", int, 13, "cepstra")
    args = po.read(argv)
    n = 0
    with TableWriter(args[1], holder="mat") as w:
        for key, (wave, rate) in SequentialTableReader(args[0],
                                                       holder="wav"):
            opts = MfccOptions(num_ceps=po["num-ceps"],
                               frame_opts=FrameExtractionOptions(
                                   samp_freq=float(rate), dither=0.0))
            pipe = OnlineFeaturePipeline(Mfcc(opts))
            step = max(1, int(po["chunk-length"] * rate))
            rows = []
            fed = 0
            for i in range(0, len(wave), step):
                pipe.accept_waveform(np.asarray(wave[i:i + step],
                                                np.float32))
                ready = pipe.num_frames_ready()
                if ready > fed:
                    rows.append(pipe.get_frames(fed, ready))
                    fed = ready
            pipe.input_finished()
            ready = pipe.num_frames_ready()
            if ready > fed:
                rows.append(pipe.get_frames(fed, ready))
            w[key] = np.concatenate(rows).astype(np.float32)
            n += 1
    log.info("online2-wav-dump-features: %d utterances", n)
    return 0


@tool("ivector-extract-online2")
def ivector_extract_online2_tool(argv):
    """Online i-vectors re-estimated every --ivector-period frames,
    per speaker across utterances
    (online2bin/ivector-extract-online2.cc)."""
    from kaldi_tpu.am.ivector import (OnlineIvectorEstimator,
                                      read_ivector_extractor)
    po = ParseOptions("ivector-extract-online2 [opts] <spk2utt-rspec> "
                      "<extractor-in> <feats-rspec> <ivector-wspec>")
    po.register("ivector-period", int, 10, "frames between estimates")
    args = po.read(argv)
    ex = read_ivector_extractor(args[1])
    feats_r = RandomAccessTableReader(args[2], holder="mat")
    period = po["ivector-period"]
    n = 0
    with TableWriter(args[3], holder="mat") as w:
        for spk, utts in SequentialTableReader(args[0], holder="text"):
            est = OnlineIvectorEstimator(ex)
            for u in utts:
                if u not in feats_r:
                    continue
                feats = np.asarray(feats_r[u])
                rows = []
                for t0 in range(0, len(feats), period):
                    est.accept_frames(feats[t0:t0 + period])
                    rows.append(est.ivector())
                w[u] = np.stack(rows).astype(np.float32)
                n += 1
    log.info("ivector-extract-online2: %d utterances", n)
    return 0


# ---------------------------------------------------------------------------
# rnnlm egs + sentence probs.

@tool("rnnlm-get-egs")
def rnnlm_get_egs_tool(argv):
    """Integerized sentences → (input, target) training pairs with
    BOS/EOS framing (rnnlmbin/rnnlm-get-egs.cc role); each entry is a
    2×(L+1) int matrix [input; target]."""
    po = ParseOptions("rnnlm-get-egs [--bos=1] [--eos=2] <text-rspec> "
                      "<egs-wspec>")
    po.register("bos", int, 1, "BOS id")
    po.register("eos", int, 2, "EOS id")
    args = po.read(argv)
    n = 0
    with TableWriter(args[1], holder="mat") as w:
        for key, words in SequentialTableReader(args[0], holder="text"):
            ids = [int(x) for x in words]
            inp = [po["bos"]] + ids
            tgt = ids + [po["eos"]]
            w[key] = np.asarray([inp, tgt], np.float32)
            n += 1
    log.info("rnnlm-get-egs: %d sentences", n)
    return 0


@tool("rnnlm-sentence-probs")
def rnnlm_sentence_probs_tool(argv):
    """Per-sentence total log-probability under a trained RNNLM
    (rnnlmbin/rnnlm-sentence-probs.cc)."""
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.lm.rnnlm import load_rnnlm
    po = ParseOptions("rnnlm-sentence-probs [--bos=1] [--eos=2] "
                      "<rnnlm-in> <text-rspec> <probs-wspec>")
    po.register("bos", int, 1, "BOS id")
    po.register("eos", int, 2, "EOS id")
    args = po.read(argv)
    params, model = load_rnnlm(args[0])
    n = 0
    with TableWriter(args[2], holder="text") as w:
        for key, words in SequentialTableReader(args[1], holder="text"):
            ids = [int(x) for x in words]
            toks = jnp.asarray([[po["bos"]] + ids], jnp.int32)
            logits, _ = model.apply(params, toks)
            lp = jax.nn.log_softmax(logits)[0]
            tgt = ids + [po["eos"]]
            total = float(sum(lp[t, v] for t, v in enumerate(tgt)))
            w[key] = [f"{total:.4f}"]
            n += 1
    log.info("rnnlm-sentence-probs: %d sentences", n)
    return 0


# ---------------------------------------------------------------------------
# gmm tail: regression-tree fMLLR, gaussian-level fMLLR, two-accs,
# threaded latgen, one-shot align.

@tool("gmm-est-regtree-fmllr")
def gmm_est_regtree_fmllr_tool(argv):
    """Per-speaker regression-tree fMLLR transforms
    (gmmbin/gmm-est-regtree-fmllr.cc); writes the root node's
    transform per speaker (usable by transform-feats)."""
    from kaldi_tpu.am.regtree import RegressionTree, RegtreeFmllrAccs
    from kaldi_tpu.am.serialize import read_mdl
    po = ParseOptions("gmm-est-regtree-fmllr [opts] "
                      "[--spk2utt=rspec] <model-in> <feats-rspec> "
                      "<ali-rspec> <transform-wspec>")
    po.register("num-base-classes", int, 4, "regression-tree leaves")
    po.register("min-count", float, 200.0, "occupancy gate")
    po.register("spk2utt", str, "", "speaker→utterances map")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    tree = RegressionTree.build(am, po["num-base-classes"])
    feats_r = RandomAccessTableReader(args[1], holder="mat")
    ali_r = RandomAccessTableReader(args[2], holder="ivec")
    groups = {}
    if po["spk2utt"]:
        for spk, utts in SequentialTableReader(po["spk2utt"],
                                               holder="text"):
            groups[spk] = list(utts)
    else:
        for key, _ in SequentialTableReader(args[1], holder="mat"):
            groups[key] = [key]
    n = 0
    with TableWriter(args[3], holder="mat") as w:
        for spk, utts in groups.items():
            accs = RegtreeFmllrAccs(tree, am.dim)
            got = False
            for u in utts:
                if u in feats_r and u in ali_r:
                    ali = np.asarray(ali_r[u], np.int32)
                    pdf = np.asarray(
                        [tm.transition_id_to_pdf(int(t)) for t in ali],
                        np.int32)
                    accs.accumulate(am, np.asarray(feats_r[u]), pdf)
                    got = True
            if not got:
                continue
            est = accs.estimate(min_count=po["min-count"])
            w[spk] = est.root_transform().astype(np.float32)
            n += 1
    log.info("gmm-est-regtree-fmllr: %d speakers", n)
    return 0


@tool("gmm-est-fmllr-gpost")
def gmm_est_fmllr_gpost_tool(argv):
    """fMLLR from Gaussian-level posteriors
    (gmmbin/gmm-est-fmllr-gpost.cc; gpost entries are
    pdf*max_mix+component ids from gmm-post-to-gpost)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.am.transforms import FmllrAccs
    po = ParseOptions("gmm-est-fmllr-gpost [--spk2utt=rspec] "
                      "<model-in> <feats-rspec> <gpost-rspec> "
                      "<transform-wspec>")
    po.register("spk2utt", str, "", "speaker→utterances map")
    args = po.read(argv)
    _tm, am = read_mdl(args[0])
    feats_r = RandomAccessTableReader(args[1], holder="mat")
    gpost_r = RandomAccessTableReader(args[2], holder="post")
    M = am.max_mix
    groups = {}
    if po["spk2utt"]:
        for spk, utts in SequentialTableReader(po["spk2utt"],
                                               holder="text"):
            groups[spk] = list(utts)
    else:
        for key, _ in SequentialTableReader(args[1], holder="mat"):
            groups[key] = [key]
    n = 0
    with TableWriter(args[3], holder="mat") as w:
        for spk, utts in groups.items():
            accs = FmllrAccs(am.dim)
            got = False
            for u in utts:
                if u not in feats_r or u not in gpost_r:
                    continue
                feats = np.asarray(feats_r[u])
                for t, frame in enumerate(gpost_r[u]):
                    if not frame or t >= len(feats):
                        continue
                    gs = [(int(g) // M, int(g) % M, wgt)
                          for g, wgt in frame]
                    post = np.asarray([[wgt for _p, _m, wgt in gs]])
                    means = np.asarray(
                        [[am.means[p, m] for p, m, _w in gs]])
                    ivars = np.asarray(
                        [[1.0 / am.vars[p, m] for p, m, _w in gs]])
                    accs.accumulate(post, feats[t][None], means, ivars)
                got = True
            if not got:
                continue
            W, impr = accs.update()
            w[spk] = W.astype(np.float32)
            n += 1
    log.info("gmm-est-fmllr-gpost: %d speakers", n)
    return 0


@tool("gmm-acc-stats2")
def gmm_acc_stats2_tool(argv):
    """Accumulate SEPARATE num/den GMM stats from signed posteriors
    (gmmbin/gmm-acc-stats2.cc — the discriminative-training
    accumulator: positive weights go to the num accs, negative to
    den)."""
    from kaldi_tpu.am.gmm import GmmAccs
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.cli.tools_extra import write_gmm_accs
    po = ParseOptions("gmm-acc-stats2 <model-in> <feats-rspec> "
                      "<post-rspec> <num-accs-out> <den-accs-out>")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    posts = RandomAccessTableReader(args[2], holder="post")
    num = GmmAccs.zeros(am.num_pdfs, am.max_mix, am.dim)
    den = GmmAccs.zeros(am.num_pdfs, am.max_mix, am.dim)
    n = 0
    for key, feats in SequentialTableReader(args[1], holder="mat"):
        if key not in posts:
            continue
        feats = np.asarray(feats, np.float32)
        for t, frame in enumerate(posts[key]):
            if t >= len(feats):
                break
            x = feats[t]
            for tid, wgt in frame:
                pdf = tm.transition_id_to_pdf(int(tid))
                accs = num if wgt >= 0 else den
                aw = abs(float(wgt))
                comp = np.asarray(am.component_posteriors(
                    x[None, :], np.asarray([pdf], np.int32)))[0]
                accs.occ[pdf] += aw * comp
                accs.mean_acc[pdf] += aw * comp[:, None] * x
                accs.var_acc[pdf] += aw * comp[:, None] * x ** 2
        n += 1
    write_gmm_accs(args[3], num)
    write_gmm_accs(args[4], den)
    log.info("gmm-acc-stats2: %d utterances", n)
    return 0


@tool("gmm-latgen-faster-parallel")
def gmm_latgen_faster_parallel_tool(argv):
    """Threaded lattice decoding — the TaskSequencer role
    (gmmbin/gmm-latgen-faster-parallel.cc): utterance GMM scoring +
    lattice build overlap across a host thread pool."""
    from concurrent.futures import ThreadPoolExecutor
    from kaldi_tpu.am.serialize import read_mdl
    po = ParseOptions("gmm-latgen-faster-parallel [opts] <model> <fst> "
                      "<feats-rspec> <lattice-wspec>")
    po.register("beam", float, 13.0, "decoding beam")
    po.register("lattice-beam", float, 6.0, "lattice beam")
    po.register("max-active", int, 7000, "max active states")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("num-threads", int, 4, "host worker threads")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    HCLG = _load_hclg(args[1])
    dec = _LatgenDecoder(HCLG, tm.tid_to_pdf_array, po["beam"],
                         po["lattice-beam"], po["acoustic-scale"],
                         max_active=po["max-active"])

    def one(item):
        key, feats = item
        ll = np.asarray(am.loglikes(np.asarray(feats)))
        return key, dec.decode_to_clat(ll)

    entries = list(SequentialTableReader(args[2], holder="mat"))
    with ThreadPoolExecutor(max_workers=po["num-threads"]) as pool:
        results = list(pool.map(one, entries))
    with TableWriter(args[3], holder="clat") as w:
        for key, clat in results:
            w[key] = clat
    log.info("gmm-latgen-faster-parallel: %d utterances on %d threads",
             len(results), po["num-threads"])
    return 0


@tool("gmm-align")
def gmm_align_tool(argv):
    """One-shot forced alignment: compiles per-utterance graphs from
    the lexicon + transcripts, then aligns (gmmbin/gmm-align.cc —
    compile-train-graphs + gmm-align-compiled fused)."""
    from kaldi_tpu.cli import TOOLS
    import tempfile
    po = ParseOptions("gmm-align [opts] <lexicon-file> <model-in> "
                      "<feats-rspec> <text-rspec> <ali-wspec>")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    args = po.read(argv)
    with tempfile.TemporaryDirectory() as td:
        rc = TOOLS["compile-train-graphs"](
            [args[0], args[1], args[3], f"ark:{td}/graphs.ark"])
        if rc != 0:
            return rc
        return TOOLS["gmm-align-compiled"](
            [f"--acoustic-scale={po['acoustic-scale']}", args[1],
             f"ark:{td}/graphs.ark", args[2], args[4]])


# ---------------------------------------------------------------------------
# bin utilities.

@tool("show-alignments")
def show_alignments_tool(argv):
    """Human-readable alignments: per-phone tid runs with phone names
    (bin/show-alignments.cc)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.fst.fst import SymbolTable
    po = ParseOptions("show-alignments <phones-symtab> <model> "
                      "<ali-rspec>")
    args = po.read(argv)
    phones_tab = SymbolTable.read(args[0])
    tm, _ = read_mdl(args[1])
    for key, ali in SequentialTableReader(args[2], holder="ivec"):
        runs = []
        cur = []
        for tid in np.asarray(ali):
            tid = int(tid)
            is_initial = (tm.transition_id_to_hmm_state(tid) == 0
                          and not tm.is_self_loop(tid))
            if is_initial and cur:
                runs.append(cur)
                cur = []
            cur.append(tid)
        if cur:
            runs.append(cur)
        tids_str = " ".join("[ " + " ".join(str(t) for t in r) + " ]"
                            for r in runs)
        names = " ".join(
            phones_tab.find(tm.transition_id_to_phone(r[0]))
            for r in runs)
        print(f"{key}  {tids_str}")
        print(f"{key}  {names}")
    return 0


@tool("phones-to-prons")
def phones_to_prons_tool(argv):
    """Match an alignment's phone sequence against word transcripts
    through the lexicon → per-word pronunciations
    (bin/phones-to-prons.cc).  Output: '<word> <phone>...' tokens per
    utterance, words separated by ';'."""
    from kaldi_tpu.am.serialize import read_mdl
    po = ParseOptions("phones-to-prons <model> <lexicon-file> "
                      "<sil-phone> <ali-rspec> <text-rspec> "
                      "<prons-wspec>\n"
                      "lexicon lines: <word-int> <phone-int>...")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    prons: Dict[int, List[List[int]]] = {}
    with open(args[1]) as f:
        for line in f:
            parts = [int(x) for x in line.split()]
            if parts:
                prons.setdefault(parts[0], []).append(parts[1:])
    sil = int(args[2])
    text_r = RandomAccessTableReader(args[4], holder="text")
    n_done = n_err = 0
    with TableWriter(args[5], holder="text") as w:
        for key, ali in SequentialTableReader(args[3], holder="ivec"):
            if key not in text_r:
                continue
            words = [int(x) for x in text_r[key]]
            phones = tm.alignment_to_phones(np.asarray(ali).tolist())
            phones = [p for p in phones if p != sil]
            out, pos, ok = [], 0, True
            for word in words:
                matched = False
                for pron in sorted(prons.get(word, []), key=len,
                                   reverse=True):
                    L = len(pron)
                    if phones[pos:pos + L] == pron:
                        out.append(f"{word} " +
                                   " ".join(str(p) for p in pron))
                        pos += L
                        matched = True
                        break
                if not matched:
                    ok = False
                    break
            if ok and pos == len(phones):
                w[key] = " ; ".join(out).split()
                n_done += 1
            else:
                n_err += 1
                log.warning("phones-to-prons: %s did not parse", key)
    log.info("phones-to-prons: %d done, %d failed", n_done, n_err)
    return 0


@tool("matrix-dim")
def matrix_dim_tool(argv):
    """Print '<key> <rows> <cols>' per matrix (bin/matrix-dim.cc)."""
    po = ParseOptions("matrix-dim <mat-rspec>")
    args = po.read(argv)
    for key, m in SequentialTableReader(args[0], holder="mat"):
        m = np.asarray(m)
        print(f"{key} {m.shape[0]} {m.shape[1]}")
    return 0


@tool("copy-gselect")
def copy_gselect_tool(argv):
    """Copy Gaussian-selection index lists, optionally truncating to
    --n (bin/copy-gselect.cc)."""
    po = ParseOptions("copy-gselect [--n=0] <gselect-rspec> "
                      "<gselect-wspec>")
    po.register("n", int, 0, "keep first n indices (0 = all)")
    args = po.read(argv)
    n_done = 0
    with TableWriter(args[1], holder="ivec") as w:
        for key, v in SequentialTableReader(args[0], holder="ivec"):
            v = np.asarray(v, np.int32)
            w[key] = v[:po["n"]] if po["n"] else v
            n_done += 1
    log.info("copy-gselect: %d entries", n_done)
    return 0
