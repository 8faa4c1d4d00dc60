"""Fifth bank of CLI tools: tree building, posterior algebra, global
(UBM-style) GMMs, lattice structural ops, i-vector post-processing and
the chain phone-LM stage (reference L10 — SURVEY.md §2.1 bins row).

Canonical shapes mirrored: bin/{acc-tree-stats,sum-tree-stats,
cluster-phones,compile-questions,build-tree,copy-post,sum-post,
scale-post,post-to-pdf-post,post-to-phone-post,prob-to-post}.cc,
gmmbin/{gmm-init-mono,gmm-init-model,gmm-compute-likes,
gmm-global-init-from-feats,gmm-global-acc-stats,gmm-global-est,
gmm-global-get-post}.cc, latbin/{lattice-union,lattice-interp,
lattice-push,lattice-to-phone-lattice,lattice-arc-post,
lattice-confidence,lattice-equivalent}.cc, featbin/{shift-feats,
compose-transforms}.cc, ivectorbin/{ivector-normalize-length,
ivector-subtract-global-mean,ivector-compute-lda}.cc,
chainbin/chain-est-phone-lm.cc, fstbin/{fsttopsort,fstconnect}.
"""

from __future__ import annotations

import math
import sys
from typing import Dict, List

import numpy as np

from kaldi_tpu.cli.tools import tool
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


# ---------------------------------------------------------------------------
# posterior algebra (bin/)
# ---------------------------------------------------------------------------

@tool("copy-post")
def copy_post_tool(argv):
    po = ParseOptions("copy-post [--scale=1.0] <post-rspec> <post-wspec>")
    po.register("scale", float, 1.0, "scale weights")
    args = po.read(argv)
    s = po["scale"]
    with TableWriter(args[1], holder="post") as w:
        for key, post in SequentialTableReader(args[0], holder="post"):
            w[key] = [[(i, wt * s) for i, wt in fr] for fr in post]
    return 0


@tool("scale-post")
def scale_post_tool(argv):
    po = ParseOptions("scale-post <post-rspec> <scale-or-scales-rspec> "
                      "<post-wspec>")
    args = po.read(argv)
    try:
        const = float(args[1])
        scales = None
    except ValueError:
        const = None
        scales = RandomAccessTableReader(args[1], holder="vec")
    with TableWriter(args[2], holder="post") as w:
        for key, post in SequentialTableReader(args[0], holder="post"):
            if const is not None:
                w[key] = [[(i, wt * const) for i, wt in fr] for fr in post]
            else:
                sc = np.asarray(scales[key])
                w[key] = [[(i, wt * float(sc[t])) for i, wt in fr]
                          for t, fr in enumerate(post)]
    return 0


@tool("sum-post")
def sum_post_tool(argv):
    po = ParseOptions("sum-post [--scale1=f] [--scale2=f] <post-rspec1> "
                      "<post-rspec2> <post-wspec>")
    po.register("scale1", float, 1.0, "scale for first posteriors")
    po.register("scale2", float, 1.0, "scale for second posteriors")
    args = po.read(argv)
    second = RandomAccessTableReader(args[1], holder="post")
    s1, s2 = po["scale1"], po["scale2"]
    with TableWriter(args[2], holder="post") as w:
        for key, post in SequentialTableReader(args[0], holder="post"):
            other = second[key]
            out = []
            for t, fr in enumerate(post):
                merged: Dict[int, float] = {}
                for i, wt in fr:
                    merged[i] = merged.get(i, 0.0) + s1 * wt
                if t < len(other):
                    for i, wt in other[t]:
                        merged[i] = merged.get(i, 0.0) + s2 * wt
                out.append(sorted(merged.items()))
            w[key] = out
    return 0


def _map_post(post, fn):
    out = []
    for fr in post:
        merged: Dict[int, float] = {}
        for i, wt in fr:
            j = fn(i)
            merged[j] = merged.get(j, 0.0) + wt
        out.append(sorted(merged.items()))
    return out


@tool("post-to-pdf-post")
def post_to_pdf_post_tool(argv):
    from kaldi_tpu.am.serialize import read_mdl
    po = ParseOptions("post-to-pdf-post <model> <tid-post-rspec> "
                      "<pdf-post-wspec>")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    with TableWriter(args[2], holder="post") as w:
        for key, post in SequentialTableReader(args[1], holder="post"):
            w[key] = _map_post(post, tm.transition_id_to_pdf)
    return 0


@tool("post-to-phone-post")
def post_to_phone_post_tool(argv):
    from kaldi_tpu.am.serialize import read_mdl
    po = ParseOptions("post-to-phone-post <model> <tid-post-rspec> "
                      "<phone-post-wspec>")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    with TableWriter(args[2], holder="post") as w:
        for key, post in SequentialTableReader(args[1], holder="post"):
            w[key] = _map_post(post, tm.transition_id_to_phone)
    return 0


@tool("prob-to-post")
def prob_to_post_tool(argv):
    po = ParseOptions("prob-to-post [--min-post=0.01] <prob-matrix-rspec> "
                      "<post-wspec>")
    po.register("min-post", float, 0.01,
                "posteriors below this are pruned (mass renormalized)")
    args = po.read(argv)
    floor = po["min-post"]
    with TableWriter(args[1], holder="post") as w:
        for key, mat in SequentialTableReader(args[0], holder="mat"):
            mat = np.asarray(mat)
            out = []
            for row in mat:
                keep = np.nonzero(row >= floor)[0]
                if len(keep) == 0:
                    keep = [int(np.argmax(row))]
                tot = float(row[keep].sum())
                out.append([(int(i), float(row[i]) / tot) for i in keep])
            w[key] = out
    return 0


# ---------------------------------------------------------------------------
# tree building (bin/)
# ---------------------------------------------------------------------------

@tool("acc-tree-stats")
def acc_tree_stats_tool(argv):
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.am.tree import write_tree_stats
    from kaldi_tpu.pipelines.tri import accumulate_tree_stats
    po = ParseOptions("acc-tree-stats [--context-width=3] "
                      "[--central-position=1] <model> <feats-rspec> "
                      "<ali-rspec> <tree-accs-out>")
    po.register("context-width", int, 3, "phone context window")
    po.register("central-position", int, 1, "central phone position")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    feats = {k: np.asarray(v) for k, v in
             SequentialTableReader(args[1], holder="mat")}
    alis = {k: [int(x) for x in v] for k, v in
            SequentialTableReader(args[2], holder="ivec")}
    both = {k: feats[k] for k in feats if k in alis}
    stats = accumulate_tree_stats(both, {k: alis[k] for k in both}, tm,
                                  po["context-width"],
                                  po["central-position"])
    write_tree_stats(args[3], stats)
    log.info("acc-tree-stats: %d events from %d utterances",
             len(stats), len(both))
    return 0


@tool("sum-tree-stats")
def sum_tree_stats_tool(argv):
    from kaldi_tpu.am.tree import (read_tree_stats, sum_tree_stats,
                                   write_tree_stats)
    po = ParseOptions("sum-tree-stats <tree-accs-out> <tree-accs-in1> ...")
    args = po.read(argv)
    write_tree_stats(args[0],
                     sum_tree_stats(read_tree_stats(p) for p in args[1:]))
    return 0


def _write_phone_sets(path: str, sets) -> None:
    with open(path, "w") as f:
        for s in sets:
            f.write(" ".join(str(p) for p in sorted(s)) + "\n")


def _read_phone_sets(path: str):
    out = []
    with open(path) as f:
        for line in f:
            if line.strip():
                out.append(frozenset(int(x) for x in line.split()))
    return out


@tool("cluster-phones")
def cluster_phones_tool(argv):
    from kaldi_tpu.am.tree import read_tree_stats
    from kaldi_tpu.pipelines.tri import cluster_phone_questions
    po = ParseOptions("cluster-phones [--central-position=1] "
                      "<tree-stats-in> <phone-sets-out>")
    po.register("central-position", int, 1, "central phone position")
    args = po.read(argv)
    stats = read_tree_stats(args[0])
    questions = cluster_phone_questions(stats, po["central-position"])
    _write_phone_sets(args[1], questions)
    log.info("cluster-phones: %d phone sets", len(questions))
    return 0


@tool("compile-questions")
def compile_questions_tool(argv):
    po = ParseOptions("compile-questions <phone-sets-in> <questions-out> "
                      "(adds singleton sets; text phone-set lines)")
    args = po.read(argv)
    sets = _read_phone_sets(args[0])
    phones = sorted({p for s in sets for p in s})
    for p in phones:
        if frozenset([p]) not in sets:
            sets.append(frozenset([p]))
    _write_phone_sets(args[1], sets)
    log.info("compile-questions: %d questions over %d phones",
             len(sets), len(phones))
    return 0


@tool("build-tree")
def build_tree_tool(argv):
    from kaldi_tpu.am.serialize import write_tree
    from kaldi_tpu.am.tree import build_tree, read_tree_stats
    from kaldi_tpu.core import io as kio
    po = ParseOptions("build-tree [--max-leaves=1000] [--thresh=0] "
                      "[--context-width=3] [--central-position=1] "
                      "<tree-stats-in> <questions-in> <tree-out>")
    po.register("max-leaves", int, 1000, "max pdf leaves")
    po.register("thresh", float, 0.0, "min likelihood-gain to split")
    po.register("context-width", int, 3, "phone context window")
    po.register("central-position", int, 1, "central phone position")
    args = po.read(argv)
    stats = read_tree_stats(args[0])
    questions = _read_phone_sets(args[1])
    tree = build_tree(stats, questions, po["context-width"],
                      po["central-position"], po["max-leaves"],
                      po["thresh"])
    with kio.open_wxfilename(args[2]) as f:
        write_tree(f, tree)
    log.info("build-tree: %d leaves", tree.num_pdfs)
    return 0


# ---------------------------------------------------------------------------
# gmmbin: init + likelihood + global (UBM-style) GMMs
# ---------------------------------------------------------------------------

@tool("gmm-init-mono")
def gmm_init_mono_tool(argv):
    from kaldi_tpu.am.gmm import AmDiagGmm, global_stats
    from kaldi_tpu.am.serialize import (read_topology, write_mdl,
                                        write_tree)
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.am.tree import MonophoneContextDependency
    from kaldi_tpu.core import io as kio
    po = ParseOptions("gmm-init-mono [--train-feats=rspec] "
                      "[--perturb-factor=0] <topo-in> <dim> <model-out> "
                      "<tree-out>")
    po.register("train-feats", str, "",
                "features for the global mean/var flat start")
    po.register("perturb-factor", float, 0.0, "mean perturbation")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        kio.init_kaldi_input_stream(f)
        topo = read_topology(f)
    dim = int(args[1])
    if po["train-feats"]:
        feats = [np.asarray(m) for _, m in
                 SequentialTableReader(po["train-feats"], holder="mat")]
        gmean, gvar = global_stats(feats)
    else:
        gmean, gvar = np.zeros(dim), np.ones(dim)
    tree = MonophoneContextDependency(topo.phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, gmean, gvar,
                              perturb=po["perturb-factor"])
    write_mdl(args[2], tm, am)
    with kio.open_wxfilename(args[3]) as f:
        write_tree(f, tree)
    log.info("gmm-init-mono: %d pdfs dim %d", tree.num_pdfs, dim)
    return 0


@tool("gmm-init-model")
def gmm_init_model_tool(argv):
    from kaldi_tpu.am.serialize import read_topology, read_tree, write_mdl
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.am.tree import read_tree_stats
    from kaldi_tpu.core import io as kio
    from kaldi_tpu.pipelines.tri import init_model_from_tree_stats
    po = ParseOptions("gmm-init-model <tree-in> <tree-stats-in> <topo-in> "
                      "<model-out>")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        kio.init_kaldi_input_stream(f)
        tree = read_tree(f)
    stats = read_tree_stats(args[1])
    with kio.open_rxfilename(args[2]) as f:
        kio.init_kaldi_input_stream(f)
        topo = read_topology(f)
    am = init_model_from_tree_stats(tree, stats)
    tm = TransitionModel(topo, tree)
    write_mdl(args[3], tm, am)
    log.info("gmm-init-model: %d pdfs", am.num_pdfs)
    return 0


@tool("gmm-compute-likes")
def gmm_compute_likes_tool(argv):
    from kaldi_tpu.am.serialize import read_mdl
    po = ParseOptions("gmm-compute-likes <model> <feats-rspec> "
                      "<loglikes-wspec>")
    args = po.read(argv)
    _, am = read_mdl(args[0])
    with TableWriter(args[2], holder="mat") as w:
        for key, feats in SequentialTableReader(args[1], holder="mat"):
            w[key] = np.asarray(am.loglikes(np.asarray(feats)))
    return 0


def _write_global_gmm(path: str, am) -> None:
    from kaldi_tpu.am.serialize import write_am_diag_gmm
    from kaldi_tpu.core import io as kio
    with kio.open_wxfilename(path) as f:
        kio.init_kaldi_output_stream(f)
        write_am_diag_gmm(f, am)


def _read_global_gmm(path: str):
    from kaldi_tpu.am.serialize import read_am_diag_gmm
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(path) as f:
        kio.init_kaldi_input_stream(f)
        return read_am_diag_gmm(f)


@tool("gmm-global-init-from-feats")
def gmm_global_init_from_feats_tool(argv):
    from kaldi_tpu.am.gmm import (AmDiagGmm, GmmAccs, accumulate_stats,
                                  global_stats, mixup, mle_update)
    po = ParseOptions("gmm-global-init-from-feats [--num-gauss=100] "
                      "[--num-iters=20] <feats-rspec> <gmm-out>")
    po.register("num-gauss", int, 100, "target mixture size")
    po.register("num-iters", int, 20, "EM iterations")
    args = po.read(argv)
    feats = np.concatenate([np.asarray(m) for _, m in
                            SequentialTableReader(args[0], holder="mat")])
    gmean, gvar = global_stats([feats])
    am = AmDiagGmm.flat_start(1, gmean, gvar)
    pdf_ali = np.zeros(len(feats), np.int32)
    target = po["num-gauss"]
    for it in range(po["num-iters"]):
        # grow the mixture over the first half of the iterations
        want = min(target, 1 + (target * (it + 1) * 2)
                   // max(po["num-iters"], 1))
        if am.num_gauss() < want:
            am = mixup(am, want)
        accs = GmmAccs.zeros(am.num_pdfs, am.max_mix, am.dim)
        accumulate_stats(am, feats, pdf_ali, accs)
        mle_update(am, accs)
    _write_global_gmm(args[1], am)
    log.info("gmm-global-init-from-feats: %d gaussians on %d frames, "
             "like/frame %.4f", am.num_gauss(), len(feats),
             float(np.mean(np.asarray(am.loglikes(feats))[:, 0])))
    return 0


@tool("gmm-global-acc-stats")
def gmm_global_acc_stats_tool(argv):
    from kaldi_tpu.am.gmm import GmmAccs, accumulate_stats
    from kaldi_tpu.cli.tools_extra import write_gmm_accs
    po = ParseOptions("gmm-global-acc-stats <gmm-in> <feats-rspec> "
                      "<accs-out>")
    args = po.read(argv)
    am = _read_global_gmm(args[0])
    accs = GmmAccs.zeros(am.num_pdfs, am.max_mix, am.dim)
    n = 0
    for key, feats in SequentialTableReader(args[1], holder="mat"):
        feats = np.asarray(feats)
        accumulate_stats(am, feats, np.zeros(len(feats), np.int32), accs)
        n += 1
    write_gmm_accs(args[2], accs)
    log.info("gmm-global-acc-stats: %d utterances", n)
    return 0


@tool("gmm-global-est")
def gmm_global_est_tool(argv):
    from kaldi_tpu.am.gmm import mixup, mle_update
    from kaldi_tpu.cli.tools_extra import read_gmm_accs
    po = ParseOptions("gmm-global-est [--mix-up=0] <gmm-in> <accs-in> "
                      "<gmm-out>")
    po.register("mix-up", int, 0, "grow mixture to this size after update")
    args = po.read(argv)
    am = _read_global_gmm(args[0])
    accs = read_gmm_accs(args[1])
    mle_update(am, accs)
    if po["mix-up"] > am.num_gauss():
        am = mixup(am, po["mix-up"])
    _write_global_gmm(args[2], am)
    return 0


@tool("gmm-global-get-post")
def gmm_global_get_post_tool(argv):
    po = ParseOptions("gmm-global-get-post [--n=10] <gmm-in> <feats-rspec> "
                      "<post-wspec>")
    po.register("n", int, 10, "top-n gaussians per frame")
    args = po.read(argv)
    am = _read_global_gmm(args[0])
    topn = po["n"]
    with TableWriter(args[2], holder="post") as w:
        for key, feats in SequentialTableReader(args[1], holder="mat"):
            feats = np.asarray(feats)
            comp = np.asarray(am.component_posteriors(
                feats, np.zeros(len(feats), np.int32)))
            out = []
            for row in comp:
                idx = np.argsort(-row)[:topn]
                tot = float(row[idx].sum())
                out.append([(int(i), float(row[i]) / max(tot, 1e-20))
                            for i in idx])
            w[key] = out
    return 0


# ---------------------------------------------------------------------------
# latbin: structural ops
# ---------------------------------------------------------------------------

@tool("lattice-union")
def lattice_union_tool(argv):
    from kaldi_tpu.lattice.ops import lattice_union
    po = ParseOptions("lattice-union <clat-rspec1> <clat-rspec2> "
                      "<clat-wspec>")
    args = po.read(argv)
    second = RandomAccessTableReader(args[1], holder="clat")
    with TableWriter(args[2], holder="clat") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            try:
                other = second[key]
            except KeyError:
                w[key] = clat
                continue
            w[key] = lattice_union(clat, other)
    return 0


@tool("lattice-interp")
def lattice_interp_tool(argv):
    from kaldi_tpu.lattice.ops import interp_lattices
    po = ParseOptions("lattice-interp [--alpha=0.5] <clat-rspec1> "
                      "<clat-rspec2> <clat-wspec>")
    po.register("alpha", float, 0.5, "weight on the first lattice")
    args = po.read(argv)
    second = RandomAccessTableReader(args[1], holder="clat")
    n_done = n_empty = 0
    with TableWriter(args[2], holder="clat") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            out = interp_lattices(clat, second[key], po["alpha"])
            if out is None:
                log.warning("lattice-interp: %s — empty composition", key)
                n_empty += 1
                continue
            w[key] = out
            n_done += 1
    log.info("lattice-interp: %d done, %d empty", n_done, n_empty)
    return 0


@tool("lattice-push")
def lattice_push_tool(argv):
    from kaldi_tpu.lattice.ops import push_lattice
    po = ParseOptions("lattice-push <clat-rspec> <clat-wspec>")
    args = po.read(argv)
    with TableWriter(args[1], holder="clat") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            w[key] = push_lattice(clat)
    return 0


@tool("lattice-to-phone-lattice")
def lattice_to_phone_lattice_tool(argv):
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.lattice.ops import lattice_to_phone_lattice
    po = ParseOptions("lattice-to-phone-lattice <model> <clat-rspec> "
                      "<clat-wspec>")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    with TableWriter(args[2], holder="clat") as w:
        for key, clat in SequentialTableReader(args[1], holder="clat"):
            w[key] = lattice_to_phone_lattice(clat, tm)
    return 0


@tool("lattice-arc-post")
def lattice_arc_post_tool(argv):
    from kaldi_tpu.lattice.functions import forward_backward_post
    po = ParseOptions("lattice-arc-post [--acoustic-scale=1.0] "
                      "<clat-rspec> (prints: utt state arc word post)")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    po.register("min-post", float, 0.0001, "prune prints below this")
    args = po.read(argv)
    for key, clat in SequentialTableReader(args[0], holder="clat"):
        post, _ = forward_backward_post(clat, po["acoustic-scale"])
        for (s, i), p in sorted(post.items()):
            if p >= po["min-post"]:
                word = clat.arcs[s][i].word
                print(f"{key} {s} {i} {word} {p:.6f}")
    return 0


@tool("lattice-confidence")
def lattice_confidence_tool(argv):
    from kaldi_tpu.lattice.ops import lattice_confidence
    po = ParseOptions("lattice-confidence <clat-rspec> <confidence-wspec> "
                      "(text: utt -> best/second-best cost gap)")
    args = po.read(argv)
    with TableWriter(args[1], holder="text") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            c = lattice_confidence(clat)
            w[key] = f"{min(c, 1e10):.4f}"
    return 0


@tool("lattice-equivalent")
def lattice_equivalent_tool(argv):
    from kaldi_tpu.lattice.ops import lattices_equivalent
    po = ParseOptions("lattice-equivalent [--delta=0.001] <clat-rspec1> "
                      "<clat-rspec2>  (exit 0 iff all pairs equivalent)")
    po.register("delta", float, 1e-3, "weight tolerance")
    args = po.read(argv)
    second = RandomAccessTableReader(args[1], holder="clat")
    n_bad = n = 0
    for key, clat in SequentialTableReader(args[0], holder="clat"):
        n += 1
        if not lattices_equivalent(clat, second[key], po["delta"]):
            log.warning("lattice-equivalent: %s differs", key)
            n_bad += 1
    log.info("lattice-equivalent: %d/%d equivalent", n - n_bad, n)
    return 1 if n_bad else 0


# ---------------------------------------------------------------------------
# featbin extras
# ---------------------------------------------------------------------------

@tool("shift-feats")
def shift_feats_tool(argv):
    po = ParseOptions("shift-feats [--shift=0] <feats-rspec> <feats-wspec> "
                      "(shift>0 repeats the first frame, <0 the last)")
    po.register("shift", int, 0, "frames to shift")
    args = po.read(argv)
    shift = po["shift"]
    with TableWriter(args[1], holder="mat") as w:
        for key, mat in SequentialTableReader(args[0], holder="mat"):
            mat = np.asarray(mat)
            if shift == 0 or len(mat) == 0:
                w[key] = mat
                continue
            idx = np.clip(np.arange(len(mat)) - shift, 0, len(mat) - 1)
            w[key] = mat[idx]
    return 0


@tool("compose-transforms")
def compose_transforms_tool(argv):
    from kaldi_tpu.am.transforms import compose_transforms
    from kaldi_tpu.core import io as kio
    po = ParseOptions("compose-transforms [--b-is-affine=false] <a-in> "
                      "<b-in> <out>  (result applies b then a)")
    po.register("b-is-affine", bool, False,
                "treat b's last column as an offset")
    args = po.read(argv)

    def load(path):
        with kio.open_rxfilename(path) as f:
            kio.init_kaldi_input_stream(f)
            return kio.read_matrix(f)

    c = compose_transforms(load(args[0]), load(args[1]),
                           b_is_affine=po["b-is-affine"])
    with kio.open_wxfilename(args[2]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, c)
    return 0


# ---------------------------------------------------------------------------
# ivectorbin extras
# ---------------------------------------------------------------------------

@tool("ivector-normalize-length")
def ivector_normalize_length_tool(argv):
    po = ParseOptions("ivector-normalize-length <ivec-rspec> <ivec-wspec> "
                      "(scale each vector to norm sqrt(dim))")
    args = po.read(argv)
    ratios = []
    with TableWriter(args[1], holder="vec") as w:
        for key, v in SequentialTableReader(args[0], holder="vec"):
            v = np.asarray(v, np.float64)
            norm = float(np.linalg.norm(v))
            target = math.sqrt(len(v))
            ratio = norm / target if norm > 0 else 1.0
            ratios.append(ratio)
            w[key] = (v / max(ratio, 1e-20)).astype(np.float32)
    if ratios:
        log.info("ivector-normalize-length: avg norm ratio %.4f",
                 float(np.mean(ratios)))
    return 0


@tool("ivector-subtract-global-mean")
def ivector_subtract_global_mean_tool(argv):
    po = ParseOptions("ivector-subtract-global-mean <ivec-rspec> "
                      "<ivec-wspec>")
    args = po.read(argv)
    pairs = [(k, np.asarray(v, np.float64)) for k, v in
             SequentialTableReader(args[0], holder="vec")]
    if not pairs:
        raise KaldiError("no i-vectors read")
    mean = np.mean([v for _, v in pairs], axis=0)
    with TableWriter(args[1], holder="vec") as w:
        for k, v in pairs:
            w[k] = (v - mean).astype(np.float32)
    return 0


@tool("ivector-compute-lda")
def ivector_compute_lda_tool(argv):
    from kaldi_tpu.am.transforms import LdaEstimate
    po = ParseOptions("ivector-compute-lda [--dim=100] <ivec-rspec> "
                      "<utt2spk-rspec> <lda-matrix-out>")
    po.register("dim", int, 100, "output dimension")
    args = po.read(argv)
    ivecs = {k: np.asarray(v, np.float64) for k, v in
             SequentialTableReader(args[0], holder="vec")}
    utt2spk = {k: (v if isinstance(v, str) else " ".join(v)).strip()
               for k, v in SequentialTableReader(args[1], holder="text")}
    spks = sorted({utt2spk[u] for u in ivecs if u in utt2spk})
    spk_id = {s: i for i, s in enumerate(spks)}
    dim_in = len(next(iter(ivecs.values())))
    lda = LdaEstimate(len(spks), dim_in)
    for u, v in ivecs.items():
        if u in utt2spk:
            lda.accumulate(v, spk_id[utt2spk[u]])
    mat = lda.estimate(min(po["dim"], len(spks) - 1, dim_in))
    from kaldi_tpu.core import io as kio
    with kio.open_wxfilename(args[2]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, np.asarray(mat, np.float32))
    log.info("ivector-compute-lda: (%d, %d) over %d speakers",
             mat.shape[0], mat.shape[1], len(spks))
    return 0


# ---------------------------------------------------------------------------
# chainbin
# ---------------------------------------------------------------------------

@tool("chain-est-phone-lm")
def chain_est_phone_lm_tool(argv):
    from kaldi_tpu.am.chain import estimate_phone_lm, write_phone_lm
    po = ParseOptions("chain-est-phone-lm [--ngram-order=4] "
                      "<phone-seqs-rspec> <phone-lm-out>  (phone seqs = "
                      "ali-to-phones output)")
    po.register("ngram-order", int, 4, "n-gram order")
    args = po.read(argv)
    seqs = [[int(x) for x in v] for _, v in
            SequentialTableReader(args[0], holder="ivec")]
    phones = sorted({p for s in seqs for p in s})
    lm = estimate_phone_lm(seqs, phones, order=po["ngram-order"])
    write_phone_lm(args[1], lm)
    log.info("chain-est-phone-lm: order %d, %d states over %d phones "
             "from %d sequences", po["ngram-order"], lm.num_states,
             len(phones), len(seqs))
    return 0


# ---------------------------------------------------------------------------
# fstbin extras
# ---------------------------------------------------------------------------

@tool("fsttopsort")
def fsttopsort_tool(argv):
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.fst import Arc, VectorFst
    po = ParseOptions("fsttopsort <fst-in> <fst-out>")
    args = po.read(argv)
    fst = _load_fst(args[0])
    # Kahn topological order over all arcs
    n = fst.num_states
    indeg = [0] * n
    for arcs in fst.arcs:
        for a in arcs:
            indeg[a.nextstate] += 1
    from collections import deque
    q = deque([s for s in range(n) if indeg[s] == 0])
    order = []
    while q:
        s = q.popleft()
        order.append(s)
        for a in fst.arcs[s]:
            indeg[a.nextstate] -= 1
            if indeg[a.nextstate] == 0:
                q.append(a.nextstate)
    if len(order) != n:
        raise KaldiError("fsttopsort: input FST is cyclic")
    remap = {old: new for new, old in enumerate(order)}
    out = VectorFst()
    out.add_states(n)
    out.set_start(remap[fst.start])
    for s in range(n):
        for a in fst.arcs[s]:
            out.add_arc(remap[s], Arc(a.ilabel, a.olabel, a.weight,
                                      remap[a.nextstate]))
    for s, wgt in fst.finals.items():
        out.set_final(remap[s], wgt)
    _save_fst(args[1] if len(args) > 1 else "/dev/stdout", out)
    return 0


@tool("fstconnect")
def fstconnect_tool(argv):
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.ops import connect
    po = ParseOptions("fstconnect <fst-in> <fst-out>")
    args = po.read(argv)
    _save_fst(args[1] if len(args) > 1 else "/dev/stdout",
              connect(_load_fst(args[0])))
    return 0
