"""Twelfth bank of CLI tools: bin/featbin/gmmbin/fstbin long tail.

Canonical shapes mirrored (SURVEY.md §2.1 bins): bin/{hmm-info,
copy-transition-model,analyze-counts,get-post-on-ali,weight-post,
post-to-feats,sum-lda-accs,est-pca,compute-wer-bootci,
make-pdf-to-tid-transducer,draw-tree}.cc, featbin/{append-vector-to-feats,
append-post-to-feats,copy-feats-to-htk,extract-rows,modify-cmvn-stats}.cc,
gmmbin/{gmm-acc-stats,gmm-global-sum-accs,gmm-global-copy,gmm-global-info,
gmm-scale-accs,gmm-ismooth-stats,gmm-est-gaussians-ebw,gmm-est-weights-ebw,
gmm-transform-means,gmm-make-regtree,gmm-init-model-flat,gmm-post-to-gpost}.cc,
fstbin/{fstaddselfloops,fstaddsubsequentialloop,fstdeterminize,fstcopy,
fstrandgen,fstphicompose}.cc.
"""

from __future__ import annotations

import struct
import sys
from typing import List

import numpy as np

from kaldi_tpu.cli.tools import tool
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


# ---------------------------------------------------------------------------
# bin/: model & alignment inspection, posterior algebra
# ---------------------------------------------------------------------------

@tool("hmm-info")
def hmm_info_tool(argv):
    """Print phones/pdfs/transition counts of a model (bin/hmm-info.cc)."""
    from kaldi_tpu.am.serialize import read_mdl
    po = ParseOptions("hmm-info <model-in>")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    print(f"number of phones {len(tm.topo.phones)}")
    print(f"number of pdfs {tm.num_pdfs}")
    print(f"number of transition-ids {tm.num_transition_ids}")
    print(f"number of transition-states {len(tm.tuples)}")
    return 0


@tool("copy-transition-model")
def copy_transition_model_tool(argv):
    """Copy the transition model only (bin/copy-transition-model.cc):
    accepts a full .mdl or a bare <TransitionModel> file, writes the
    bare transition model."""
    from kaldi_tpu.am.serialize import (read_transition_model,
                                        write_transition_model)
    from kaldi_tpu.core import io as kio
    po = ParseOptions("copy-transition-model <model-in> <tm-out>")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        if not kio.init_kaldi_input_stream(f):
            raise KaldiError(f"{args[0]}: not a binary kaldi file")
        tm = read_transition_model(f)
    with kio.open_wxfilename(args[1]) as f:
        kio.init_kaldi_output_stream(f)
        write_transition_model(f, tm)
    return 0


@tool("analyze-counts")
def analyze_counts_tool(argv):
    """Symbol occurrence counts over int-vector tables
    (bin/analyze-counts.cc): prints 'symbol count' sorted by count."""
    po = ParseOptions("analyze-counts [opts] <ints-rspec> <counts-out>")
    po.register("binary", bool, False, "(ignored; output is text)")
    args = po.read(argv)
    counts = {}
    n = 0
    for _key, vec in SequentialTableReader(args[0], holder="ivec"):
        for v in np.asarray(vec).ravel():
            counts[int(v)] = counts.get(int(v), 0) + 1
        n += 1
    out = (sys.stdout if args[1] == "-" else open(args[1], "w"))
    # Kaldi writes a bracketed count vector indexed by symbol
    top = max(counts) + 1 if counts else 0
    vec = [counts.get(i, 0) for i in range(top)]
    out.write("[ " + " ".join(str(c) for c in vec) + " ]\n")
    if args[1] != "-":
        out.close()
    log.info("analyze-counts: %d utterances, %d distinct symbols",
             n, len(counts))
    return 0


@tool("get-post-on-ali")
def get_post_on_ali_tool(argv):
    """Per-frame confidence = posterior mass of the aligned transition-id
    (bin/get-post-on-ali.cc)."""
    po = ParseOptions("get-post-on-ali <post-rspec> <ali-rspec> "
                      "<conf-wspec>")
    args = po.read(argv)
    alis = RandomAccessTableReader(args[1], holder="ivec")
    n = 0
    with TableWriter(args[2], holder="vec") as w:
        for key, post in SequentialTableReader(args[0], holder="post"):
            if key not in alis:
                continue
            ali = np.asarray(alis[key])
            conf = np.zeros(len(post), np.float32)
            for t, frame in enumerate(post):
                if t >= len(ali):
                    break
                for tid, wgt in frame:
                    if int(tid) == int(ali[t]):
                        conf[t] += wgt
            w[key] = conf
            n += 1
    log.info("get-post-on-ali: %d utterances", n)
    return 0


@tool("weight-post")
def weight_post_tool(argv):
    """Scale posteriors by per-frame weights (bin/weight-post.cc)."""
    po = ParseOptions("weight-post <post-rspec> <weights-rspec> "
                      "<post-wspec>")
    args = po.read(argv)
    weights = RandomAccessTableReader(args[1], holder="vec")
    with TableWriter(args[2], holder="post") as w:
        for key, post in SequentialTableReader(args[0], holder="post"):
            if key not in weights:
                continue
            wv = np.asarray(weights[key])
            out = []
            for t, frame in enumerate(post):
                s = float(wv[t]) if t < len(wv) else 0.0
                out.append([(i, wgt * s) for i, wgt in frame] if s != 0
                           else [])
            w[key] = out
    return 0


@tool("post-to-feats")
def post_to_feats_tool(argv):
    """Posteriors → dense (T, post_dim) feature matrix
    (featbin/post-to-feats.cc)."""
    po = ParseOptions("post-to-feats --post-dim=N <post-rspec> "
                      "<feats-wspec>")
    po.register("post-dim", int, 0, "dimension of the output features")
    args = po.read(argv)
    dim = po["post-dim"]
    if dim <= 0:
        raise KaldiError("post-to-feats: --post-dim must be set")
    with TableWriter(args[1], holder="mat") as w:
        for key, post in SequentialTableReader(args[0], holder="post"):
            mat = np.zeros((len(post), dim), np.float32)
            for t, frame in enumerate(post):
                for i, wgt in frame:
                    if 0 <= int(i) < dim:
                        mat[t, int(i)] += wgt
            w[key] = mat
    return 0


@tool("sum-lda-accs")
def sum_lda_accs_tool(argv):
    """Sum LDA stats files (bin/sum-lda-accs.cc)."""
    from kaldi_tpu.core import io as kio
    po = ParseOptions("sum-lda-accs <acc-out> <acc1> [<acc2> ...]")
    args = po.read(argv)
    counts = first = second = None
    for acc in args[1:]:
        with kio.open_rxfilename(acc) as f:
            if not kio.init_kaldi_input_stream(f):
                raise KaldiError(f"{acc}: not binary kaldi")
            kio.expect_token(f, "<LDAACCS>")
            c = kio.read_matrix(f)[0]
            fi = kio.read_matrix(f)
            se = kio.read_matrix(f)
            kio.expect_token(f, "</LDAACCS>")
        if counts is None:
            counts, first, second = c.copy(), fi.copy(), se.copy()
        else:
            counts += c
            first += fi
            second += se
    if counts is None:
        raise KaldiError("sum-lda-accs: no input accs")
    with kio.open_wxfilename(args[0]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<LDAACCS>")
        kio.write_matrix(f, counts[None, :])
        kio.write_matrix(f, first)
        kio.write_matrix(f, second)
        kio.write_token(f, "</LDAACCS>")
    return 0


@tool("est-pca")
def est_pca_tool(argv):
    """Estimate a PCA transform from features (bin/est-pca.cc)."""
    from kaldi_tpu.core import io as kio
    po = ParseOptions("est-pca [opts] <feats-rspec> <pca-out>")
    po.register("dim", int, 0, "output dimension (0 = keep all)")
    po.register("normalize-mean", bool, True,
                "append -mean offset column (affine transform)")
    po.register("normalize-variance", bool, False,
                "whiten: scale rows by 1/sqrt(eigenvalue)")
    args = po.read(argv)
    n = 0
    s1 = s2 = None
    for _key, feats in SequentialTableReader(args[0], holder="mat"):
        x = np.asarray(feats, np.float64)
        if s1 is None:
            s1 = np.zeros(x.shape[1])
            s2 = np.zeros((x.shape[1], x.shape[1]))
        s1 += x.sum(axis=0)
        s2 += x.T @ x
        n += len(x)
    if n == 0:
        raise KaldiError("est-pca: no features")
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(-eigvals)
    eigvals, eigvecs = eigvals[order], eigvecs[:, order]
    dim = po["dim"] or len(mean)
    T = eigvecs[:, :dim].T
    if po["normalize-variance"]:
        T = T / np.sqrt(np.maximum(eigvals[:dim, None], 1e-10))
    if po["normalize-mean"]:
        T = np.hstack([T, (-T @ mean)[:, None]])
    with kio.open_wxfilename(args[1]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, T.astype(np.float32))
    log.info("est-pca: %d frames, kept %d dims (top eig %.3g)",
             n, dim, float(eigvals[0]))
    return 0


@tool("compute-wer-bootci")
def compute_wer_bootci_tool(argv):
    """Bootstrap 95%% confidence interval on WER
    (bin/compute-wer-bootci.cc)."""
    from kaldi_tpu.pipelines.score import edit_distance
    po = ParseOptions("compute-wer-bootci [opts] <ref-rspec> <hyp-rspec>")
    po.register("replications", int, 10000, "bootstrap replications")
    args = po.read(argv)
    hyps = RandomAccessTableReader(args[1], holder="text")
    errs, lens = [], []
    for key, ref in SequentialTableReader(args[0], holder="text"):
        hyp = hyps[key] if key in hyps else []
        e = edit_distance(list(ref), list(hyp))[0]
        errs.append(e)
        lens.append(len(ref))
    errs = np.asarray(errs, np.float64)
    lens = np.asarray(lens, np.float64)
    if lens.sum() == 0:
        raise KaldiError("compute-wer-bootci: empty reference")
    rng = np.random.default_rng(0)
    N = len(errs)
    idx = rng.integers(0, N, size=(po["replications"], N))
    wers = errs[idx].sum(axis=1) / np.maximum(lens[idx].sum(axis=1), 1)
    point = 100.0 * errs.sum() / lens.sum()
    lo, hi = np.percentile(wers, [2.5, 97.5]) * 100.0
    print(f"Set1: %WER {point:.2f} 95% Conf Interval "
          f"[ {lo:.2f}%, {hi:.2f}% ]")
    return 0


@tool("make-pdf-to-tid-transducer")
def make_pdf_to_tid_tool(argv):
    """One-state FST mapping pdf-id+1 → transition-ids
    (bin/make-pdf-to-tid-transducer.cc)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.cli.tools_extra import _save_fst
    from kaldi_tpu.fst.fst import Arc, VectorFst
    po = ParseOptions("make-pdf-to-tid-transducer <model-in> <fst-out>")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    fst = VectorFst()
    s = fst.add_state()
    fst.set_start(s)
    fst.set_final(s, 0.0)
    for tid in range(1, tm.num_transition_ids + 1):
        pdf = tm.transition_id_to_pdf(tid)
        fst.arcs[s].append(Arc(pdf + 1, tid, 0.0, s))
    _save_fst(args[1], fst)
    return 0


@tool("draw-tree")
def draw_tree_tool(argv):
    """Decision tree → graphviz dot text (bin/draw-tree.cc)."""
    from kaldi_tpu.am.serialize import read_tree
    from kaldi_tpu.core import io as kio
    po = ParseOptions("draw-tree <tree-in> [<dot-out>]")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        kio.init_kaldi_input_stream(f)
        tree = read_tree(f)
    out = (open(args[1], "w") if len(args) > 1 and args[1] != "-"
           else sys.stdout)
    out.write("digraph tree {\n")
    counter = [0]

    def walk(node):
        my = counter[0]
        counter[0] += 1
        if node.kind == "leaf":
            out.write(f'  n{my} [label="pdf {node.answer}", '
                      f'shape=box];\n')
            return my
        yes = ",".join(str(p) for p in sorted(node.yes_set)[:8])
        out.write(f'  n{my} [label="key {node.key} in {{{yes}}}"];\n')
        for tag, child in (("yes", node.yes), ("no", node.no)):
            if child is not None:
                cid = walk(child)
                out.write(f'  n{my} -> n{cid} [label="{tag}"];\n')
        return my

    if hasattr(tree, "root"):
        walk(tree.root)
    else:                           # monophone map: leaves only
        for (phone, pc), pdf in sorted(tree._map.items()):
            out.write(f'  p{phone}_{pc} [label="phone {phone} state '
                      f'{pc} -> pdf {pdf}", shape=box];\n')
    out.write("}\n")
    if out is not sys.stdout:
        out.close()
    return 0


# ---------------------------------------------------------------------------
# featbin/: feature surgery
# ---------------------------------------------------------------------------

@tool("append-vector-to-feats")
def append_vector_to_feats_tool(argv):
    """Append a per-utterance vector to every frame
    (featbin/append-vector-to-feats.cc)."""
    po = ParseOptions("append-vector-to-feats <feats-rspec> <vec-rspec> "
                      "<feats-wspec>")
    args = po.read(argv)
    vecs = RandomAccessTableReader(args[1], holder="vec")
    with TableWriter(args[2], holder="mat") as w:
        for key, feats in SequentialTableReader(args[0], holder="mat"):
            if key not in vecs:
                continue
            feats = np.asarray(feats)
            v = np.asarray(vecs[key])[None, :].repeat(len(feats), axis=0)
            w[key] = np.hstack([feats, v]).astype(np.float32)
    return 0


@tool("append-post-to-feats")
def append_post_to_feats_tool(argv):
    """Append posteriors (as dense rows) to features
    (featbin/append-post-to-feats.cc)."""
    po = ParseOptions("append-post-to-feats --post-dim=N <feats-rspec> "
                      "<post-rspec> <feats-wspec>")
    po.register("post-dim", int, 0, "posterior dimension")
    args = po.read(argv)
    dim = po["post-dim"]
    if dim <= 0:
        raise KaldiError("append-post-to-feats: --post-dim must be set")
    posts = RandomAccessTableReader(args[1], holder="post")
    with TableWriter(args[2], holder="mat") as w:
        for key, feats in SequentialTableReader(args[0], holder="mat"):
            if key not in posts:
                continue
            feats = np.asarray(feats)
            mat = np.zeros((len(feats), dim), np.float32)
            for t, frame in enumerate(posts[key]):
                if t >= len(feats):
                    break
                for i, wgt in frame:
                    if 0 <= int(i) < dim:
                        mat[t, int(i)] += wgt
            w[key] = np.hstack([feats, mat]).astype(np.float32)
    return 0


@tool("copy-feats-to-htk")
def copy_feats_to_htk_tool(argv):
    """Write features as HTK binary files (featbin/copy-feats-to-htk.cc):
    big-endian 12-byte header (nSamples, sampPeriod, sampSize, parmKind)
    then float32 rows."""
    import os
    po = ParseOptions("copy-feats-to-htk [opts] <feats-rspec>")
    po.register("output-dir", str, "./", "output directory")
    po.register("output-ext", str, "fea", "output extension")
    po.register("sample-period", int, 100000, "sample period, 100ns units")
    args = po.read(argv)
    os.makedirs(po["output-dir"], exist_ok=True)
    n = 0
    for key, feats in SequentialTableReader(args[0], holder="mat"):
        feats = np.asarray(feats, np.float32)
        path = f"{po['output-dir']}/{key}.{po['output-ext']}"
        with open(path, "wb") as f:
            f.write(struct.pack(">iihh", feats.shape[0],
                                po["sample-period"],
                                4 * feats.shape[1], 9))  # parmKind USER
            f.write(feats.astype(">f4").tobytes())
        n += 1
    log.info("copy-feats-to-htk: wrote %d files to %s", n,
             po["output-dir"])
    return 0


@tool("extract-rows")
def extract_rows_tool(argv):
    """Extract row ranges from feature matrices
    (featbin/extract-rows.cc).  Each range line:
    '<out-key> <in-key> <row-start> <row-end>' (end exclusive)."""
    po = ParseOptions("extract-rows <ranges-file> <feats-rspec> "
                      "<feats-wspec>")
    args = po.read(argv)
    feats = RandomAccessTableReader(args[1], holder="mat")
    n = 0
    with TableWriter(args[2], holder="mat") as w:
        for line in open(args[0]):
            parts = line.split()
            if not parts:
                continue
            if len(parts) != 4:
                raise KaldiError(f"extract-rows: bad range line {line!r}")
            out_key, in_key, s, e = parts[0], parts[1], int(parts[2]), \
                int(parts[3])
            if in_key not in feats:
                continue
            mat = np.asarray(feats[in_key])
            w[out_key] = mat[s:e]
            n += 1
    log.info("extract-rows: wrote %d segments", n)
    return 0


@tool("modify-cmvn-stats")
def modify_cmvn_stats_tool(argv):
    """Modify CMVN stats so variance normalization is a no-op on the
    given dims, or on all dims (featbin/modify-cmvn-stats.cc)."""
    po = ParseOptions("modify-cmvn-stats [opts] [<skip-dims>] "
                      "<stats-rspec> <stats-wspec>")
    args = po.read(argv)
    if len(args) == 3:
        skip = [int(d) for d in args[0].split(":") if d]
        rspec, wspec = args[1], args[2]
    else:
        skip = None                 # all dims
        rspec, wspec = args[0], args[1]
    with TableWriter(wspec, holder="mat") as w:
        for key, stats in SequentialTableReader(rspec, holder="mat"):
            st = np.asarray(stats, np.float64).copy()
            count = st[0, -1]
            dims = (skip if skip is not None
                    else list(range(st.shape[1] - 1)))
            for d in dims:
                mean = st[0, d] / max(count, 1e-10)
                # x2 stats st.t. var = 1: sum(x^2) = count*(mean^2+1)
                st[1, d] = count * (mean * mean + 1.0)
            w[key] = st.astype(np.float32)
    return 0


# ---------------------------------------------------------------------------
# gmmbin/: accumulator algebra, EBW splits, model surgery
# ---------------------------------------------------------------------------

def _read_mdl_tm_am(path):
    from kaldi_tpu.am.serialize import read_mdl
    return read_mdl(path)


@tool("gmm-acc-stats")
def gmm_acc_stats_tool(argv):
    """Accumulate GMM stats from transition-id posteriors
    (gmmbin/gmm-acc-stats.cc) — the soft-count sibling of
    gmm-acc-stats-ali."""
    from kaldi_tpu.am.gmm import GmmAccs
    from kaldi_tpu.cli.tools_extra import write_gmm_accs
    po = ParseOptions("gmm-acc-stats <model-in> <feats-rspec> "
                      "<post-rspec> <accs-out>")
    args = po.read(argv)
    tm, am = _read_mdl_tm_am(args[0])
    accs = GmmAccs.zeros(am.num_pdfs, am.max_mix, am.dim)
    posts = RandomAccessTableReader(args[2], holder="post")
    n_utt = 0
    for key, feats in SequentialTableReader(args[1], holder="mat"):
        if key not in posts:
            continue
        feats = np.asarray(feats, np.float32)
        post = posts[key]
        # group (frame, pdf, weight) and accumulate with weighted
        # component posteriors
        for t, frame in enumerate(post):
            if t >= len(feats):
                break
            x = feats[t]
            for tid, wgt in frame:
                pdf = tm.transition_id_to_pdf(int(tid))
                comp = np.asarray(am.component_posteriors(
                    x[None, :], np.asarray([pdf], np.int32)))[0]
                accs.occ[pdf] += wgt * comp
                accs.mean_acc[pdf] += wgt * comp[:, None] * x
                accs.var_acc[pdf] += wgt * comp[:, None] * (x * x)
        accs.tot_frames += len(post)
        n_utt += 1
    write_gmm_accs(args[3], accs)
    log.info("gmm-acc-stats: %d utterances, occ %.1f", n_utt,
             accs.occ.sum())
    return 0


@tool("gmm-scale-accs")
def gmm_scale_accs_tool(argv):
    """Scale GMM accumulators (gmmbin/gmm-scale-accs.cc)."""
    from kaldi_tpu.cli.tools_extra import read_gmm_accs, write_gmm_accs
    po = ParseOptions("gmm-scale-accs <scale> <accs-in> <accs-out>")
    args = po.read(argv)
    scale = float(args[0])
    accs = read_gmm_accs(args[1])
    accs.occ *= scale
    accs.mean_acc *= scale
    accs.var_acc *= scale
    accs.tot_like *= scale
    accs.tot_frames *= scale
    write_gmm_accs(args[2], accs)
    return 0


@tool("gmm-ismooth-stats")
def gmm_ismooth_stats_tool(argv):
    """I-smoothing: interpolate stats toward the model's own expected
    stats (gmmbin/gmm-ismooth-stats.cc), the MMI/MPE regularizer."""
    from kaldi_tpu.cli.tools_extra import read_gmm_accs, write_gmm_accs
    po = ParseOptions("gmm-ismooth-stats [--tau=100] <model-in> "
                      "<accs-in> <accs-out>")
    po.register("tau", float, 100.0, "smoothing count per Gaussian")
    args = po.read(argv)
    _tm, am = _read_mdl_tm_am(args[0])
    accs = read_gmm_accs(args[1])
    tau = po["tau"]
    valid = am.weights > 0
    accs.occ += tau * valid
    accs.mean_acc += tau * valid[..., None] * am.means
    accs.var_acc += tau * valid[..., None] * (am.vars + am.means ** 2)
    write_gmm_accs(args[2], accs)
    return 0


@tool("gmm-est-gaussians-ebw")
def gmm_est_gaussians_ebw_tool(argv):
    """EBW mean/variance update from num/den stats
    (gmmbin/gmm-est-gaussians-ebw.cc)."""
    from kaldi_tpu.am.ebw import ebw_update
    from kaldi_tpu.am.serialize import write_mdl
    from kaldi_tpu.cli.tools_extra import read_gmm_accs
    po = ParseOptions("gmm-est-gaussians-ebw [--e=2.0] <model-in> "
                      "<num-accs> <den-accs> <model-out>")
    po.register("e", float, 2.0, "EBW constant E")
    args = po.read(argv)
    tm, am = _read_mdl_tm_am(args[0])
    num = read_gmm_accs(args[1])
    den = read_gmm_accs(args[2])
    ebw_update(am, num, den, E=po["e"])
    write_mdl(args[3], tm, am)
    return 0


@tool("gmm-est-weights-ebw")
def gmm_est_weights_ebw_tool(argv):
    """EBW mixture-weight update (gmmbin/gmm-est-weights-ebw.cc):
    w ∝ γ_num − γ_den + C·w_old with C large enough to keep all
    weights positive, renormalized per pdf."""
    from kaldi_tpu.am.serialize import write_mdl
    from kaldi_tpu.cli.tools_extra import read_gmm_accs
    po = ParseOptions("gmm-est-weights-ebw <model-in> <num-accs> "
                      "<den-accs> <model-out>")
    args = po.read(argv)
    tm, am = _read_mdl_tm_am(args[0])
    num = read_gmm_accs(args[1])
    den = read_gmm_accs(args[2])
    valid = am.weights > 0
    diff = num.occ - den.occ
    # per-pdf smoothing constant keeping every valid weight positive
    with np.errstate(divide="ignore", invalid="ignore"):
        need = np.where(valid, -diff / np.maximum(am.weights, 1e-10), 0.0)
    C = np.maximum(need.max(axis=1, keepdims=True) * 1.1, 1.0)
    neww = np.where(valid, diff + C * am.weights, 0.0)
    neww = np.maximum(neww, 0.0)
    tot = neww.sum(axis=1, keepdims=True)
    ok = tot[:, 0] > 0
    am.weights[ok] = neww[ok] / tot[ok]
    am.refresh()
    write_mdl(args[3], tm, am)
    return 0


@tool("gmm-transform-means")
def gmm_transform_means_tool(argv):
    """Apply a (D×D or D×(D+1)) transform to all Gaussian means
    (gmmbin/gmm-transform-means.cc)."""
    from kaldi_tpu.am.serialize import write_mdl
    from kaldi_tpu.core import io as kio
    po = ParseOptions("gmm-transform-means <transform> <model-in> "
                      "<model-out>")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        if not kio.init_kaldi_input_stream(f):
            raise KaldiError(f"{args[0]}: not binary kaldi")
        T = kio.read_matrix(f)
    tm, am = _read_mdl_tm_am(args[1])
    D = am.dim
    A = T[:, :D]
    b = T[:, D] if T.shape[1] == D + 1 else np.zeros(D)
    am.means = am.means @ A.T + b
    am.refresh()
    write_mdl(args[2], tm, am)
    return 0


@tool("gmm-make-regtree")
def gmm_make_regtree_tool(argv):
    """Build a regression tree over the model's Gaussians
    (gmmbin/gmm-make-regtree.cc)."""
    from kaldi_tpu.am.regtree import RegressionTree, write_regtree
    po = ParseOptions("gmm-make-regtree [--max-leaves=4] <model-in> "
                      "<regtree-out>")
    po.register("max-leaves", int, 4, "number of base classes")
    args = po.read(argv)
    _tm, am = _read_mdl_tm_am(args[0])
    tree = RegressionTree.build(am, num_base_classes=po["max-leaves"])
    write_regtree(args[1], tree)
    return 0


@tool("gmm-init-model-flat")
def gmm_init_model_flat_tool(argv):
    """Flat-start a model from a tree + topology
    (gmmbin/gmm-init-model-flat.cc)."""
    from kaldi_tpu.am.gmm import AmDiagGmm, global_stats
    from kaldi_tpu.am.serialize import (read_topology, read_tree,
                                        write_mdl)
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.core import io as kio
    po = ParseOptions("gmm-init-model-flat [--train-feats=rspec] "
                      "<tree-in> <topo-in> <model-out>")
    po.register("train-feats", str, "", "features for global mean/var")
    po.register("dim", int, 13, "feature dim when no train-feats")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        kio.init_kaldi_input_stream(f)
        tree = read_tree(f)
    with kio.open_rxfilename(args[1]) as f:
        kio.init_kaldi_input_stream(f)
        topo = read_topology(f)
    if po["train-feats"]:
        feats = [np.asarray(m) for _, m in
                 SequentialTableReader(po["train-feats"], holder="mat")]
        gmean, gvar = global_stats(feats)
    else:
        gmean, gvar = np.zeros(po["dim"]), np.ones(po["dim"])
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, gmean, gvar)
    write_mdl(args[2], tm, am)
    return 0


@tool("gmm-post-to-gpost")
def gmm_post_to_gpost_tool(argv):
    """Expand tid posteriors to Gaussian-level posteriors
    (gmmbin/gmm-post-to-gpost.cc).  Gaussian entries are flattened as
    index = pdf * max_mix + component."""
    po = ParseOptions("gmm-post-to-gpost <model-in> <feats-rspec> "
                      "<post-rspec> <gpost-wspec>")
    args = po.read(argv)
    tm, am = _read_mdl_tm_am(args[0])
    posts = RandomAccessTableReader(args[2], holder="post")
    M = am.max_mix
    with TableWriter(args[3], holder="post") as w:
        for key, feats in SequentialTableReader(args[1], holder="mat"):
            if key not in posts:
                continue
            feats = np.asarray(feats, np.float32)
            out = []
            for t, frame in enumerate(posts[key]):
                row = []
                if t < len(feats):
                    for tid, wgt in frame:
                        pdf = tm.transition_id_to_pdf(int(tid))
                        comp = np.asarray(am.component_posteriors(
                            feats[t][None, :],
                            np.asarray([pdf], np.int32)))[0]
                        row += [(pdf * M + m, wgt * float(c))
                                for m, c in enumerate(comp) if c > 1e-8]
                out.append(row)
            w[key] = out
    return 0


# gmm-global-*: single-GMM (UBM) utilities sharing bank5's format

@tool("gmm-global-sum-accs")
def gmm_global_sum_accs_tool(argv):
    """Sum global-GMM accumulators (gmmbin/gmm-global-sum-accs.cc)."""
    from kaldi_tpu.cli.tools_extra import read_gmm_accs, write_gmm_accs
    po = ParseOptions("gmm-global-sum-accs <accs-out> <accs1> "
                      "[<accs2> ...]")
    args = po.read(argv)
    tot = read_gmm_accs(args[1])
    for path in args[2:]:
        tot = tot + read_gmm_accs(path)
    write_gmm_accs(args[0], tot)
    return 0


@tool("gmm-global-copy")
def gmm_global_copy_tool(argv):
    """Copy a global GMM (gmmbin/gmm-global-copy.cc)."""
    from kaldi_tpu.cli.tools_bank5 import (_read_global_gmm,
                                           _write_global_gmm)
    po = ParseOptions("gmm-global-copy <gmm-in> <gmm-out>")
    args = po.read(argv)
    _write_global_gmm(args[1], _read_global_gmm(args[0]))
    return 0


@tool("gmm-global-info")
def gmm_global_info_tool(argv):
    """Print global-GMM dims (gmmbin/gmm-global-info.cc)."""
    from kaldi_tpu.cli.tools_bank5 import _read_global_gmm
    po = ParseOptions("gmm-global-info <gmm-in>")
    args = po.read(argv)
    am = _read_global_gmm(args[0])
    print(f"number of gaussians {am.num_gauss()}")
    print(f"feature dimension {am.dim}")
    return 0


# ---------------------------------------------------------------------------
# fstbin/: graph-preparation long tail
# ---------------------------------------------------------------------------

@tool("fstcopy")
def fstcopy_tool(argv):
    """Copy an FST (possibly converting text↔binary via the x-filename
    machinery) — fstbin/fstcopy.cc."""
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    po = ParseOptions("fstcopy <fst-in> <fst-out>")
    args = po.read(argv)
    _save_fst(args[1], _load_fst(args[0]))
    return 0


@tool("fstdeterminize")
def fstdeterminize_tool(argv):
    """Determinize an FST (fstbin/fstdeterminize.cc) — functional
    ε-removing determinization, same core as fstdeterminizestar."""
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.ops import determinize_star
    po = ParseOptions("fstdeterminize <fst-in> <fst-out>")
    args = po.read(argv)
    _save_fst(args[1], determinize_star(_load_fst(args[0])))
    return 0


@tool("fstaddselfloops")
def fstaddselfloops_tool(argv):
    """Add disambiguation self-loops (fstbin/fstaddselfloops.cc):
    at every final state and every state with a non-ε output arc,
    add self-loops (in_i : out_i) for each disambig pair."""
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.fst import Arc
    po = ParseOptions("fstaddselfloops <in-disambig-list> "
                      "<out-disambig-list> <fst-in> <fst-out>")
    args = po.read(argv)

    def read_ints(path):
        txt = open(path).read().split() if ":" not in path else \
            path.split(":")
        return [int(x) for x in txt]

    # accept 'sym1 sym2' files or inline colon-separated lists
    import os
    ins = read_ints(args[0]) if os.path.exists(args[0]) else \
        [int(x) for x in args[0].split(":") if x]
    outs = read_ints(args[1]) if os.path.exists(args[1]) else \
        [int(x) for x in args[1].split(":") if x]
    if len(ins) != len(outs):
        raise KaldiError("fstaddselfloops: disambig lists differ "
                         "in length")
    fst = _load_fst(args[2])
    for s in range(fst.num_states):
        if fst.is_final(s) or any(a.olabel != 0 for a in fst.arcs[s]):
            for i, o in zip(ins, outs):
                fst.arcs[s].append(Arc(i, o, 0.0, s))
    _save_fst(args[3], fst)
    return 0


@tool("fstaddsubsequentialloop")
def fstaddsubsequentialloop_tool(argv):
    """Add the subsequential '$' loop (fstbin/fstaddsubsequentialloop.cc):
    every final state gets a $-arc to a new superfinal state with a
    $ self-loop."""
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.fst import Arc
    po = ParseOptions("fstaddsubsequentialloop <subseq-symbol> <fst-in> "
                      "<fst-out>")
    args = po.read(argv)
    sym = int(args[0])
    fst = _load_fst(args[1])
    superfinal = fst.add_state()
    fst.arcs[superfinal].append(Arc(sym, 0, 0.0, superfinal))
    for s in range(fst.num_states):
        if s != superfinal and fst.is_final(s):
            fst.arcs[s].append(Arc(sym, 0, fst.final(s), superfinal))
    fst.set_final(superfinal, 0.0)
    _save_fst(args[2], fst)
    return 0


@tool("fstrandgen")
def fstrandgen_tool(argv):
    """Sample one random path from an FST and print it as a linear FST
    (OpenFst's fstrandgen role, used by test scripts)."""
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.fst import Arc, VectorFst
    po = ParseOptions("fstrandgen [--seed=0] <fst-in> <fst-out>")
    po.register("seed", int, 0, "random seed")
    po.register("max-length", int, 10000, "give up beyond this length")
    args = po.read(argv)
    fst = _load_fst(args[0])
    rng = np.random.default_rng(po["seed"])
    for _attempt in range(100):
        s = fst.start
        path = []
        for _step in range(po["max-length"]):
            choices = list(fst.arcs[s])
            n_fin = 1 if fst.is_final(s) else 0
            if not choices and not n_fin:
                break                         # dead end; retry
            k = rng.integers(0, len(choices) + n_fin)
            if k == len(choices):
                out = VectorFst()
                prev = out.add_state()
                out.set_start(prev)
                for a in path:
                    nxt = out.add_state()
                    out.arcs[prev].append(Arc(a.ilabel, a.olabel, 0.0,
                                              nxt))
                    prev = nxt
                out.set_final(prev, 0.0)
                _save_fst(args[1], out)
                return 0
            a = choices[int(k)]
            path.append(a)
            s = a.nextstate
    raise KaldiError("fstrandgen: failed to sample a complete path")


@tool("fstphicompose")
def fstphicompose_tool(argv):
    """Compose with phi (backoff/failure) matching on fst2
    (fstbin/fstphicompose.cc): when fst2's state has no arc matching
    the label, follow phi arcs (accumulating weight) until a match."""
    from kaldi_tpu.cli.tools_extra import _load_fst, _save_fst
    from kaldi_tpu.fst.fst import Arc, VectorFst
    po = ParseOptions("fstphicompose <phi-symbol> <fst1-in> <fst2-in> "
                      "<fst-out>")
    args = po.read(argv)
    phi = int(args[0])
    f1 = _load_fst(args[1])
    f2 = _load_fst(args[2])
    # index fst2: per state, label → (weight, nextstate); phi arc
    idx = []
    phi_arc = []
    for s in range(f2.num_states):
        d = {}
        p = None
        for a in f2.arcs[s]:
            if a.ilabel == phi:
                p = (a.weight, a.nextstate)
            else:
                d[a.ilabel] = (a.weight, a.nextstate)
        idx.append(d)
        phi_arc.append(p)

    def match(q2, label):
        """Follow phi arcs until `label` matches; returns
        (acc_weight, dest) or None."""
        w = 0.0
        seen = set()
        while True:
            if label in idx[q2]:
                aw, nq = idx[q2][label]
                return w + aw, nq
            if phi_arc[q2] is None or q2 in seen:
                return None
            seen.add(q2)
            pw, q2n = phi_arc[q2]
            w += pw
            q2 = q2n

    def final2(q2):
        """Final weight through phi chains (backoff to a final)."""
        w = 0.0
        seen = set()
        while True:
            if f2.is_final(q2):
                return w + f2.final(q2)
            if phi_arc[q2] is None or q2 in seen:
                return None
            seen.add(q2)
            pw, q2 = phi_arc[q2]
            w += pw

    out = VectorFst()
    smap = {}

    def get(q1, q2):
        if (q1, q2) not in smap:
            smap[(q1, q2)] = out.add_state()
        return smap[(q1, q2)]

    start = get(f1.start, f2.start)
    out.set_start(start)
    stack = [(f1.start, f2.start)]
    done = set()
    while stack:
        q1, q2 = stack.pop()
        if (q1, q2) in done:
            continue
        done.add((q1, q2))
        src = get(q1, q2)
        if f1.is_final(q1):
            fw = final2(q2)
            if fw is not None:
                out.set_final(src, f1.final(q1) + fw)
        for a in f1.arcs[q1]:
            if a.olabel == 0:
                dst = get(a.nextstate, q2)
                out.arcs[src].append(Arc(a.ilabel, 0, a.weight, dst))
                stack.append((a.nextstate, q2))
                continue
            m = match(q2, a.olabel)
            if m is None:
                continue
            mw, q2n = m
            dst = get(a.nextstate, q2n)
            out.arcs[src].append(Arc(a.ilabel, a.olabel,
                                     a.weight + mw, dst))
            stack.append((a.nextstate, q2n))
    _save_fst(args[3], out)
    return 0
