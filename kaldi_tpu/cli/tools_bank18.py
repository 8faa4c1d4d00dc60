"""Eighteenth bank of CLI tools: the upgraded-SGMM2 binaries
(substates + speaker vectors) and the remaining cross-family tail.

Canonical shapes mirrored (SURVEY.md §2.1 bins):
sgmm2bin/{sgmm2-mixup,sgmm2-est-spkvecs,sgmm2-align-compiled,
sgmm2-latgen-faster,sgmm2-post-to-gpost,sgmm2-acc-stats-gpost}.cc,
lmbin/arpa-to-const-arpa.cc, bin/{logprob-to-post,transform-vec,
get-silence-probs,compile-graph,build-tree-two-level}.cc,
nnet3bin/nnet3-compute-from-egs.cc,
rnnlmbin/rnnlm-get-word-embedding.cc, latbin/lattice-to-ctm-conf.cc,
featbin/{interpolate-pitch,copy-feats-to-sphinx}.cc,
ivectorbin/ivector-adapt-plda.cc.
"""

from __future__ import annotations

import struct
from typing import Dict, List

import numpy as np

from kaldi_tpu.cli.tools import tool, _load_hclg, _LatgenDecoder
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


# ---------------------------------------------------------------------------
# SGMM2 tail (substates + speaker vectors).

@tool("sgmm2-mixup")
def sgmm2_mixup_tool(argv):
    """Split substates toward --num-substates
    (sgmm2bin/sgmm2-mixup.cc / SplitSubstates): needs occupancy accs
    to rank the splits."""
    from kaldi_tpu.am.sgmm2 import read_sgmm2, split_substates, write_sgmm2
    from kaldi_tpu.cli.tools_bank11 import _read_sgmm2_accs
    po = ParseOptions("sgmm2-mixup --num-substates=N [opts] <sgmm2-in> "
                      "<accs-in> <sgmm2-out>")
    po.register("num-substates", int, 0, "target total substates")
    po.register("perturb-factor", float, 0.05,
                "natural-metric split perturbation")
    args = po.read(argv)
    model = read_sgmm2(args[0])
    accs = _read_sgmm2_accs(args[1], model.num_pdfs)
    out = split_substates(model, accs, po["num-substates"],
                          perturb=po["perturb-factor"])
    write_sgmm2(args[2], out)
    log.info("sgmm2-mixup: %d → %d substates",
             int((model.c > 0).sum()), int((out.c > 0).sum()))
    return 0


@tool("sgmm2-est-spkvecs")
def sgmm2_est_spkvecs_tool(argv):
    """Per-speaker vectors u_s in the speaker subspace
    (sgmm2bin/sgmm2-est-spkvecs.cc)."""
    from kaldi_tpu.am.sgmm2 import estimate_speaker_vector, read_sgmm2
    po = ParseOptions("sgmm2-est-spkvecs [--spk2utt=rspec] <sgmm2-in> "
                      "<feats-rspec> <pdf-ali-rspec> <vecs-wspec>")
    po.register("spk2utt", str, "", "speaker→utterances map")
    args = po.read(argv)
    model = read_sgmm2(args[0])
    if model.N is None:
        raise KaldiError("sgmm2-est-spkvecs: model has no speaker "
                         "subspace")
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
    with TableWriter(args[3], holder="vec") as w:
        for spk, utts in groups.items():
            fs, als = [], []
            for u in utts:
                if u in feats_r and u in ali_r:
                    fs.append(np.asarray(feats_r[u]))
                    als.append(np.asarray(ali_r[u], np.int32))
            if not fs:
                continue
            u_s = estimate_speaker_vector(model, np.concatenate(fs),
                                          np.concatenate(als))
            w[spk] = u_s.astype(np.float32)
            n += 1
    log.info("sgmm2-est-spkvecs: %d speakers", n)
    return 0


@tool("sgmm2-align-compiled")
def sgmm2_align_compiled_tool(argv):
    """Forced alignment with SGMM2 acoustic scores
    (sgmm2bin/sgmm2-align-compiled.cc); transition model from
    <trans-model>, optional per-speaker vectors via --spk-vecs +
    --utt2spk."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.am.sgmm2 import read_sgmm2
    from kaldi_tpu.decoder.align import (DenseAligner, in_degrees,
                                         pack_dense_reverse)
    po = ParseOptions("sgmm2-align-compiled [opts] <trans-model> "
                      "<sgmm2-in> <graphs-rspec> <feats-rspec> "
                      "<ali-wspec>")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    po.register("spk-vecs", str, "", "speaker vectors rspec")
    po.register("utt2spk", str, "", "utterance→speaker map rspec")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    model = read_sgmm2(args[1])
    vecs = (RandomAccessTableReader(po["spk-vecs"], holder="vec")
            if po["spk-vecs"] else None)
    u2s = ({k: v[0] for k, v in SequentialTableReader(
        po["utt2spk"], holder="text")} if po["utt2spk"] else {})
    graphs = dict(SequentialTableReader(args[2], holder="fst"))
    aligner = DenseAligner(tm.tid_to_pdf_array,
                           acoustic_scale=po["acoustic-scale"])
    ae = an = smax = 1
    for g in graphs.values():
        e, nn = in_degrees(g)
        ae, an = max(ae, e), max(an, nn)
        smax = max(smax, g.num_states)
    n = 0
    with TableWriter(args[4], holder="ivec") as w:
        for key, feats in SequentialTableReader(args[3], holder="mat"):
            if key not in graphs:
                continue
            spk_u = None
            if vecs is not None:
                spk = u2s.get(key, key)
                if spk in vecs:
                    spk_u = np.asarray(vecs[spk])
            ll = np.asarray(model.loglikes(np.asarray(feats),
                                           spk_u=spk_u), np.float32)
            g = pack_dense_reverse(graphs[key], smax, ae, an)
            (tids, _cost), = aligner.align_batch([g], [ll])
            w[key] = np.asarray(tids, np.int32)
            n += 1
    log.info("sgmm2-align-compiled: aligned %d utterances", n)
    return 0


@tool("sgmm2-latgen-faster")
def sgmm2_latgen_faster_tool(argv):
    """Lattice decoding with SGMM2 scores
    (sgmm2bin/sgmm2-latgen-faster.cc)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.am.sgmm2 import read_sgmm2
    po = ParseOptions("sgmm2-latgen-faster [opts] <trans-model> "
                      "<sgmm2-in> <fst> <feats-rspec> <lattice-wspec> "
                      "[<words-wspec>]")
    po.register("beam", float, 13.0, "decoding beam")
    po.register("lattice-beam", float, 6.0, "lattice beam")
    po.register("max-active", int, 7000, "max active states")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("spk-vecs", str, "", "speaker vectors rspec")
    po.register("utt2spk", str, "", "utterance→speaker map rspec")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    model = read_sgmm2(args[1])
    HCLG = _load_hclg(args[2])
    dec = _LatgenDecoder(HCLG, tm.tid_to_pdf_array, po["beam"],
                         po["lattice-beam"], po["acoustic-scale"],
                         max_active=po["max-active"])
    vecs = (RandomAccessTableReader(po["spk-vecs"], holder="vec")
            if po["spk-vecs"] else None)
    u2s = ({k: v[0] for k, v in SequentialTableReader(
        po["utt2spk"], holder="text")} if po["utt2spk"] else {})
    wwriter = (TableWriter(args[5], holder="text")
               if len(args) > 5 else None)
    n = 0
    with TableWriter(args[4], holder="clat") as lw:
        for key, feats in SequentialTableReader(args[3], holder="mat"):
            spk_u = None
            if vecs is not None:
                spk = u2s.get(key, key)
                if spk in vecs:
                    spk_u = np.asarray(vecs[spk])
            ll = np.asarray(model.loglikes(np.asarray(feats),
                                           spk_u=spk_u), np.float32)
            clat = dec.decode_to_clat(ll)
            lw[key] = clat
            if wwriter:
                wwriter[key] = [str(o) for o in clat.best_path()[0]]
            n += 1
    if wwriter:
        wwriter.close()
    log.info("sgmm2-latgen-faster: decoded %d utterances", n)
    return 0


@tool("sgmm2-post-to-gpost")
def sgmm2_post_to_gpost_tool(argv):
    """Expand tid posteriors to SGMM2 (substate, Gaussian)-level
    posteriors, flattened as pdf·(K·I) + k·I + i
    (sgmm2bin/sgmm2-post-to-gpost.cc)."""
    import jax.numpy as jnp
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.am.sgmm2 import _frame_posteriors, read_sgmm2
    po = ParseOptions("sgmm2-post-to-gpost <trans-model> <sgmm2-in> "
                      "<feats-rspec> <post-rspec> <gpost-wspec>")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    model = read_sgmm2(args[1])
    posts = RandomAccessTableReader(args[3], holder="post")
    K, I = model.num_substates, model.M.shape[0]
    n = 0
    with TableWriter(args[4], holder="post") as w:
        for key, feats in SequentialTableReader(args[2], holder="mat"):
            if key not in posts:
                continue
            feats = np.asarray(feats, np.float32)
            out = []
            for t, frame in enumerate(posts[key]):
                row = []
                for tid, wgt in frame:
                    pdf = tm.transition_id_to_pdf(int(tid))
                    post_ki, _n, _x = _frame_posteriors(
                        model, jnp.asarray(feats[t][None]),
                        jnp.asarray([pdf], jnp.int32), None)
                    pk = np.asarray(post_ki)[0]        # (K, I)
                    for kk in range(K):
                        for ii in range(I):
                            p = float(pk[kk, ii])
                            if p > 1e-8:
                                row.append((pdf * K * I + kk * I + ii,
                                            wgt * p))
                out.append(row)
            w[key] = out
            n += 1
    log.info("sgmm2-post-to-gpost: %d utterances", n)
    return 0


@tool("sgmm2-acc-stats-gpost")
def sgmm2_acc_stats_gpost_tool(argv):
    """Accumulate SGMM2 stats from Gaussian-level posteriors
    (sgmm2bin/sgmm2-acc-stats-gpost.cc)."""
    from kaldi_tpu.am.sgmm2 import Sgmm2Accs, read_sgmm2
    from kaldi_tpu.cli.tools_bank11 import _write_sgmm2_accs
    po = ParseOptions("sgmm2-acc-stats-gpost <sgmm2-in> <feats-rspec> "
                      "<gpost-rspec> <accs-out>")
    args = po.read(argv)
    model = read_sgmm2(args[0])
    gposts = RandomAccessTableReader(args[2], holder="post")
    J, K = model.V.shape[:2]
    I, D = model.M.shape[0], model.dim
    gamma = np.zeros((J, K, I))
    y = np.zeros((J, K, I, D))
    S = np.zeros((I, D))
    n = 0
    frames = 0.0
    for key, feats in SequentialTableReader(args[1], holder="mat"):
        if key not in gposts:
            continue
        feats = np.asarray(feats, np.float64)
        for t, frame in enumerate(gposts[key]):
            if t >= len(feats):
                break
            x = feats[t]
            for g, wgt in frame:
                g = int(g)
                pdf, rem = divmod(g, K * I)
                kk, ii = divmod(rem, I)
                gamma[pdf, kk, ii] += wgt
                y[pdf, kk, ii] += wgt * x
                S[ii] += wgt * x * x
            frames += 1
        n += 1
    _write_sgmm2_accs(args[3], Sgmm2Accs(
        gamma=gamma, y=y, S=S, tot_like=0.0, tot_frames=frames))
    log.info("sgmm2-acc-stats-gpost: %d utterances", n)
    return 0


# ---------------------------------------------------------------------------
# lmbin / bin / nnet3 / rnnlm / latbin / featbin / ivector tail.

@tool("arpa-to-const-arpa")
def arpa_to_const_arpa_tool(argv):
    """Compile an ARPA file into the binary const-LM trie used for
    fast lattice rescoring (lmbin/arpa-to-const-arpa.cc)."""
    from kaldi_tpu.am.serialize import write_pytree
    from kaldi_tpu.core import io as kio
    from kaldi_tpu.fst.arpa import ArpaModel
    po = ParseOptions("arpa-to-const-arpa <arpa-in> <const-arpa-out>")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        text = f.read().decode("utf-8", errors="replace")
    arpa = ArpaModel.parse(text)
    # vocabulary: every word string, id = position (strings ride as a
    # separate token list; pytree carries only arrays)
    vocab = sorted({w for table in arpa.ngrams for ctx in table
                    for w in ctx})
    wid = {w: i for i, w in enumerate(vocab)}
    ngrams = {}
    for order, table in enumerate(arpa.ngrams, start=1):
        ws, lps, bows = [], [], []
        for ctx, (lp, bow) in sorted(table.items()):
            ws.append([wid[w] for w in ctx])
            lps.append(lp)
            bows.append(bow)
        ngrams[f"order{order}"] = {
            "words": (np.asarray(ws, np.int64).reshape(len(ws), order)
                      if ws else np.zeros((0, order), np.int64)),
            "logprob": np.asarray(lps, np.float64),
            "backoff": np.asarray(bows, np.float64)}
    with kio.open_wxfilename(args[1]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<ConstArpaLm>")
        kio.write_basic_int32(f, len(vocab))
        for w in vocab:
            kio.write_token(f, f"<{w}>")
        write_pytree(f, ngrams)
        kio.write_token(f, "</ConstArpaLm>")
    log.info("arpa-to-const-arpa: %d orders, %d 1-grams, %d words",
             len(arpa.ngrams), len(arpa.ngrams[0]), len(vocab))
    return 0


def read_const_arpa(path: str):
    """→ ArpaModel (the trie scorer used by
    lattice-lmrescore-const-arpa)."""
    from kaldi_tpu.am.serialize import read_pytree
    from kaldi_tpu.core import io as kio
    from kaldi_tpu.fst.arpa import ArpaModel
    with kio.open_rxfilename(path) as f:
        kio.init_kaldi_input_stream(f)
        kio.expect_token(f, "<ConstArpaLm>")
        nv = kio.read_basic_int32(f)
        vocab = [kio.read_token(f)[1:-1] for _ in range(nv)]
        d = read_pytree(f)
        kio.expect_token(f, "</ConstArpaLm>")
    arpa = ArpaModel()
    for order in range(1, len(d) + 1):
        t = d[f"order{order}"]
        table = {}
        for row, lp, bow in zip(t["words"], t["logprob"],
                                t["backoff"]):
            table[tuple(vocab[int(x)] for x in row)] = (float(lp),
                                                        float(bow))
        arpa.ngrams.append(table)
    return arpa


@tool("logprob-to-post")
def logprob_to_post_tool(argv):
    """Log-probability matrices → pruned per-frame posteriors
    (bin/logprob-to-post.cc)."""
    po = ParseOptions("logprob-to-post [--min-post=0.01] <logprob-rspec>"
                      " <post-wspec>")
    po.register("min-post", float, 0.01, "drop entries below this")
    args = po.read(argv)
    n = 0
    with TableWriter(args[1], holder="post") as w:
        for key, m in SequentialTableReader(args[0], holder="mat"):
            p = np.exp(np.asarray(m, np.float64))
            out = []
            for row in p:
                keep = np.nonzero(row >= po["min-post"])[0]
                r = row[keep]
                r /= max(r.sum(), 1e-30)
                out.append([(int(i), float(v))
                            for i, v in zip(keep, r)])
            w[key] = out
            n += 1
    log.info("logprob-to-post: %d utterances", n)
    return 0


@tool("transform-vec")
def transform_vec_tool(argv):
    """Apply a linear/affine transform to vectors
    (bin/transform-vec.cc)."""
    from kaldi_tpu.core import io as kio
    po = ParseOptions("transform-vec <matrix-in> <vec-rspec> "
                      "<vec-wspec>")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        kio.init_kaldi_input_stream(f)
        mat = np.asarray(kio.read_matrix(f))
    with TableWriter(args[2], holder="vec") as w:
        for key, v in SequentialTableReader(args[1], holder="vec"):
            v = np.asarray(v)
            if mat.shape[1] == len(v) + 1:
                v = np.concatenate([v, [1.0]])
            w[key] = (mat @ v).astype(np.float32)
    return 0


@tool("get-silence-probs")
def get_silence_probs_tool(argv):
    """Per-frame silence probabilities from silence/nonsilence
    loglike matrices (bin/get-silence-probs.cc): p(sil) via the
    two-class posterior with a prior quantile rule."""
    po = ParseOptions("get-silence-probs [opts] <sil-loglikes-rspec> "
                      "<nonsil-loglikes-rspec> <probs-wspec>")
    po.register("sil-prior", float, 0.5, "prior prob of silence")
    args = po.read(argv)
    nonsil_r = RandomAccessTableReader(args[1], holder="mat")
    prior = po["sil-prior"]
    n = 0
    with TableWriter(args[2], holder="vec") as w:
        for key, sil in SequentialTableReader(args[0], holder="mat"):
            if key not in nonsil_r:
                continue
            sl = np.asarray(sil, np.float64).max(axis=1)
            nl = np.asarray(nonsil_r[key], np.float64).max(axis=1)
            num = np.log(prior) + sl
            den = np.logaddexp(num, np.log1p(-prior) + nl)
            w[key] = np.exp(num - den).astype(np.float32)
            n += 1
    log.info("get-silence-probs: %d utterances", n)
    return 0


@tool("compile-graph")
def compile_graph_tool(argv):
    """One-shot HCLG compilation from lang pieces + model
    (bin/compile-graph.cc / utils/mkgraph.sh): lexicon + G fst →
    binary HCLG."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.cli.tools_extra import _load_fst
    from kaldi_tpu.fst import Lang, Lexicon, mkgraph
    from kaldi_tpu.fst.openfst_io import write_vector_fst
    po = ParseOptions("compile-graph [opts] <lexicon-file> <model-in> "
                      "<G-fst> <HCLG-out>")
    po.register("self-loop-scale", float, 0.1, "self-loop scale")
    args = po.read(argv)
    entries = []
    with open(args[0]) as f:
        for line in f:
            parts = line.split()
            if parts:
                entries.append((parts[0], parts[1:]))
    lang = Lang(Lexicon(entries=entries))
    tm, _ = read_mdl(args[1])
    G = _load_fst(args[2])
    HCLG = mkgraph(lang, tm, G, self_loop_scale=po["self-loop-scale"])
    with open(args[3], "wb") as f:
        write_vector_fst(f, HCLG)
    log.info("compile-graph: HCLG %d states, %d arcs",
             HCLG.num_states, HCLG.num_arcs)
    return 0


@tool("build-tree-two-level")
def build_tree_two_level_tool(argv):
    """Two-level tree build (bin/build-tree-two-level.cc — the
    UBM/SGMM tree shape): the ordinary likelihood-gain leaf split,
    then the leaves k-means-clustered by their Gaussian-stats means
    into --num-clusters coarse groups; writes the tree plus the
    leaf→cluster map."""
    from kaldi_tpu.am.serialize import write_tree
    from kaldi_tpu.am.tree import build_tree, read_tree_stats
    from kaldi_tpu.cli.tools_bank5 import _read_phone_sets
    from kaldi_tpu.core import io as kio
    po = ParseOptions("build-tree-two-level [opts] <tree-stats-in> "
                      "<questions-in> <tree-out> <leafmap-out>")
    po.register("max-leaves", int, 100, "fine leaves")
    po.register("num-clusters", int, 10, "coarse clusters")
    po.register("context-width", int, 3, "phone context window")
    po.register("central-position", int, 1, "central phone position")
    args = po.read(argv)
    stats = read_tree_stats(args[0])
    questions = _read_phone_sets(args[1])
    tree = build_tree(stats, questions, po["context-width"],
                      po["central-position"], po["max-leaves"], 0.0)
    n_leaves = tree.num_pdfs
    # per-leaf Gaussian means from the stats routed through the tree
    dim = next(iter(stats.values())).sum.shape[0]
    sums = np.zeros((n_leaves, dim))
    counts = np.zeros(n_leaves)
    for (ctx, pdf_class), acc in stats.items():
        leaf = tree.compute(list(ctx), pdf_class)
        sums[leaf] += acc.sum
        counts[leaf] += acc.count
    means = sums / np.maximum(counts[:, None], 1e-8)
    C = min(po["num-clusters"], n_leaves)
    # k-means over leaf means (coarse level)
    rng = np.random.default_rng(0)
    cent = means[rng.choice(n_leaves, C, replace=False)]
    for _ in range(20):
        d2 = ((means[:, None, :] - cent[None]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for cc in range(C):
            sel = assign == cc
            if sel.any():
                cent[cc] = means[sel].mean(0)
    leafmap = assign.astype(np.int32)
    with kio.open_wxfilename(args[2]) as f:
        write_tree(f, tree)
    with kio.open_wxfilename(args[3]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_int_vector(f, leafmap)
    log.info("build-tree-two-level: %d leaves → %d clusters",
             n_leaves, C)
    return 0


@tool("nnet3-compute-from-egs")
def nnet3_compute_from_egs_tool(argv):
    """Forward xent egs through a raw model, writing output matrices
    (nnet3bin/nnet3-compute-from-egs.cc)."""
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.am.tdnn import TdnnChain
    from kaldi_tpu.cli.tools_bank16 import _read_raw_auto
    po = ParseOptions("nnet3-compute-from-egs [--apply-exp=false] "
                      "<raw-in> <egs-rspec> <mat-wspec>")
    po.register("apply-exp", bool, False, "write softmax probs")
    args = po.read(argv)
    params, bs, cfg = _read_raw_auto(args[0])
    model = TdnnChain(cfg)
    n = 0
    with TableWriter(args[2], holder="mat") as w:
        for key, eg in SequentialTableReader(args[1], holder="xeg"):
            x = jnp.asarray(eg.feats)
            logits = model.apply({"params": params, "batch_stats": bs},
                                 x, train=False)
            out = jax.nn.log_softmax(logits)
            if po["apply-exp"]:
                out = jnp.exp(out)
            w[key] = np.asarray(out[0], np.float32)
            n += 1
    log.info("nnet3-compute-from-egs: %d egs", n)
    return 0


@tool("rnnlm-get-word-embedding")
def rnnlm_get_word_embedding_tool(argv):
    """Dump the trained RNNLM's word-embedding matrix
    (rnnlmbin/rnnlm-get-word-embedding.cc)."""
    from kaldi_tpu.core import io as kio
    from kaldi_tpu.lm.rnnlm import load_rnnlm
    po = ParseOptions("rnnlm-get-word-embedding <rnnlm-in> "
                      "<matrix-out>")
    args = po.read(argv)
    params, _model = load_rnnlm(args[0])
    emb = None
    flat = params["params"] if "params" in params else params

    def find_embedding(d):
        for k, v in d.items():
            if hasattr(v, "items"):
                r = find_embedding(v)
                if r is not None:
                    return r
            elif "embed" in k.lower() or k == "embedding":
                return np.asarray(v)
        return None

    emb = find_embedding(flat)
    if emb is None:
        # fall back: the first 2-D leaf whose first dim == vocab
        import jax
        leaves = [np.asarray(x) for x in
                  jax.tree_util.tree_leaves(params)]
        emb = next(x for x in leaves if x.ndim == 2)
    with kio.open_wxfilename(args[1]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, emb.astype(np.float32))
    log.info("rnnlm-get-word-embedding: %s", emb.shape)
    return 0


@tool("lattice-to-ctm-conf")
def lattice_to_ctm_conf_tool(argv):
    """MBR-decoded CTM with per-word confidences
    (latbin/lattice-to-ctm-conf.cc): sausage times + posteriors."""
    from kaldi_tpu.lattice.functions import mbr_decode
    po = ParseOptions("lattice-to-ctm-conf [opts] <clat-rspec> "
                      "<ctm-wxfilename>")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    po.register("frame-shift", float, 0.01, "seconds per frame")
    args = po.read(argv)
    shift = po["frame-shift"]
    n = 0
    with open(args[1], "w") as f:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            res = mbr_decode(clat, acoustic_scale=po["acoustic-scale"])
            for word, (b, e), conf in zip(res.words, res.times,
                                          res.confidences):
                if word == 0:
                    continue
                f.write(f"{key} 1 {b * shift:.2f} "
                        f"{(e - b) * shift:.2f} {word} {conf:.2f}\n")
            n += 1
    log.info("lattice-to-ctm-conf: %d lattices", n)
    return 0


@tool("interpolate-pitch")
def interpolate_pitch_tool(argv):
    """Interpolate pitch over unvoiced regions
    (featbin/interpolate-pitch.cc): rows are (pov, pitch); frames with
    pov below the threshold get linearly interpolated pitch."""
    po = ParseOptions("interpolate-pitch [opts] <feats-rspec> "
                      "<feats-wspec>")
    po.register("pov-threshold", float, 0.1,
                "voicing prob below which pitch is interpolated")
    args = po.read(argv)
    thr = po["pov-threshold"]
    n = 0
    with TableWriter(args[1], holder="mat") as w:
        for key, m in SequentialTableReader(args[0], holder="mat"):
            m = np.asarray(m, np.float32).copy()
            pov, pitch = m[:, 0], m[:, 1]
            voiced = pov >= thr
            if voiced.any():
                idx = np.nonzero(voiced)[0]
                pitch[:] = np.interp(np.arange(len(pitch)), idx,
                                     pitch[idx])
            m[:, 1] = pitch
            w[key] = m
            n += 1
    log.info("interpolate-pitch: %d utterances", n)
    return 0


@tool("copy-feats-to-sphinx")
def copy_feats_to_sphinx_tool(argv):
    """Write features as Sphinx .mfc files (big-endian count header +
    float32 data — featbin/copy-feats-to-sphinx.cc) into an output
    directory."""
    import os
    po = ParseOptions("copy-feats-to-sphinx [--output-dir=d] "
                      "<feats-rspec>")
    po.register("output-dir", str, ".", "directory for .mfc files")
    args = po.read(argv)
    os.makedirs(po["output-dir"], exist_ok=True)
    n = 0
    for key, m in SequentialTableReader(args[0], holder="mat"):
        m = np.asarray(m, np.float32)
        path = os.path.join(po["output-dir"], f"{key}.mfc")
        with open(path, "wb") as f:
            f.write(struct.pack(">i", m.size))
            f.write(m.astype(">f4").tobytes())
        n += 1
    log.info("copy-feats-to-sphinx: wrote %d files", n)
    return 0


@tool("ivector-adapt-plda")
def ivector_adapt_plda_tool(argv):
    """Adapt a PLDA model to unlabeled in-domain i-vectors
    (ivectorbin/ivector-adapt-plda.cc): interpolate the model
    covariances toward the adaptation data's total covariance."""
    from kaldi_tpu.am.ivector import read_plda, write_plda
    po = ParseOptions("ivector-adapt-plda [opts] <plda-in> "
                      "<ivec-rspec> <plda-out>")
    po.register("within-covar-scale", float, 0.75,
                "share of new covariance to within")
    po.register("between-covar-scale", float, 0.25,
                "share of new covariance to between")
    args = po.read(argv)
    plda = read_plda(args[0])
    vecs = np.stack([np.asarray(v) for _k, v in
                     SequentialTableReader(args[1], holder="vec")])
    mean = vecs.mean(axis=0)
    cov = np.cov(vecs.T, bias=True)
    model_tot = plda.within + plda.between
    excess = cov - model_tot
    # only ADD variance (the reference clamps negative excess to 0 via
    # its eigen decomposition)
    evals, evecs = np.linalg.eigh(excess)
    evals = np.maximum(evals, 0.0)
    excess_psd = (evecs * evals) @ evecs.T
    plda.mean = mean
    plda.within = plda.within + po["within-covar-scale"] * excess_psd
    plda.between = plda.between + po["between-covar-scale"] * excess_psd
    write_plda(args[2], plda)
    log.info("ivector-adapt-plda: adapted on %d vectors", len(vecs))
    return 0
