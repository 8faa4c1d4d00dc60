"""Sixteenth bank of CLI tools: nnet3 discriminative egs plumbing +
sequence training, model combination, chain egs tail, x-vector
binaries, and mapped (loglike-matrix) decoding.

Canonical shapes mirrored (SURVEY.md §2.1 bins):
nnet3bin/{nnet3-discriminative-get-egs,-copy-egs,-shuffle-egs,
-train,-compute-objf}.cc (NnetDiscriminativeExample pipeline),
nnet3bin/{nnet3-combine,nnet3-subset-egs,nnet3-show-progress,
nnet3-acc-lda-stats,nnet3-xvector-compute,nnet3-xvector-get-egs}.cc,
chainbin/{nnet3-chain-subset-egs,nnet3-chain-make-den-fst}.cc,
bin/{latgen-faster-mapped,decode-faster-mapped,align-mapped}.cc.
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
# nnet3 discriminative (sequence-training) egs pipeline.

@tool("nnet3-discriminative-get-egs")
def nnet3_discriminative_get_egs_tool(argv):
    """Compile discriminative examples: feats + numerator pdf
    alignment + the utterance's denominator lattice, pre-flattened to
    the dense time-synchronous arrays the sequence objectives train on
    (nnet3bin/nnet3-discriminative-get-egs.cc)."""
    from kaldi_tpu.am.discriminative import (lattice_to_dense,
                                             remove_eps_arcs)
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.lattice.lattice import compact_to_lattice
    from kaldi_tpu.pipelines.egs_io import DiscEg
    po = ParseOptions("nnet3-discriminative-get-egs <model> "
                      "<feats-rspec> <pdf-ali-rspec> <denlats-rspec> "
                      "<degs-wspec>")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    ali_r = RandomAccessTableReader(args[2], holder="ivec")
    lat_r = RandomAccessTableReader(args[3], holder="clat")
    n = 0
    with TableWriter(args[4], holder="deg") as w:
        for key, feats in SequentialTableReader(args[1], holder="mat"):
            if key not in ali_r or key not in lat_r:
                log.warning("nnet3-discriminative-get-egs: missing "
                            "ali/lattice for %s", key)
                continue
            feats = np.asarray(feats, np.float32)
            ali = np.asarray(ali_r[key], np.int32)
            raw = remove_eps_arcs(compact_to_lattice(lat_r[key]))
            dl = lattice_to_dense(raw, tm.tid_to_pdf_array)
            if dl.T > len(feats) or dl.T > len(ali):
                log.warning("%s: lattice frames %d exceed feats/ali",
                            key, dl.T)
                continue
            w[key] = DiscEg(feats=feats[:dl.T], num_ali=ali[:dl.T],
                            src=dl.src, dst=dl.dst, pdf=dl.pdf,
                            w=dl.w, mask=dl.mask, final=dl.final)
            n += 1
    log.info("nnet3-discriminative-get-egs: wrote %d examples", n)
    return 0


@tool("nnet3-discriminative-copy-egs")
def nnet3_discriminative_copy_egs_tool(argv):
    """Copy (head-subset with --n) discriminative egs
    (nnet3bin/nnet3-discriminative-copy-egs.cc)."""
    po = ParseOptions("nnet3-discriminative-copy-egs [--n=0] "
                      "<degs-rspec> <degs-wspec>")
    po.register("n", int, 0, "copy only the first n (0 = all)")
    args = po.read(argv)
    n = 0
    with TableWriter(args[1], holder="deg") as w:
        for key, eg in SequentialTableReader(args[0], holder="deg"):
            if po["n"] and n >= po["n"]:
                break
            w[key] = eg
            n += 1
    log.info("nnet3-discriminative-copy-egs: copied %d", n)
    return 0


@tool("nnet3-discriminative-shuffle-egs")
def nnet3_discriminative_shuffle_egs_tool(argv):
    """Randomize discriminative egs order
    (nnet3bin/nnet3-discriminative-shuffle-egs.cc)."""
    po = ParseOptions("nnet3-discriminative-shuffle-egs [--srand=0] "
                      "<degs-rspec> <degs-wspec>")
    po.register("srand", int, 0, "shuffle seed")
    args = po.read(argv)
    entries = list(SequentialTableReader(args[0], holder="deg"))
    rng = np.random.default_rng(po["srand"])
    rng.shuffle(entries)
    with TableWriter(args[1], holder="deg") as w:
        for key, eg in entries:
            w[key] = eg
    log.info("nnet3-discriminative-shuffle-egs: %d egs", len(entries))
    return 0


def _read_raw_auto(path: str):
    """Raw nnet3 file → (params, batch_stats, TdnnConfig)."""
    import kaldi_tpu.am.nnet3_io as n3
    with open(path, "rb") as f:
        if f.read(2) != b"\0B":
            raise KaldiError(f"{path}: not binary kaldi")
        model = n3.read_nnet3(f)
    cfg = n3.infer_tdnn_config(model, frame_subsampling_factor=1)
    params, bs = n3.nnet3_to_tdnn(model, cfg)
    return params, bs, cfg


@tool("nnet3-discriminative-train")
def nnet3_discriminative_train_tool(argv):
    """MMI/sMBR sequence training from discriminative egs
    (nnet3bin/nnet3-discriminative-train.cc): per-eg adam steps on
    −objf, acoustics re-derived from the CURRENT model each pass (the
    reference recomputes nnet outputs per minibatch too)."""
    import jax
    import jax.numpy as jnp
    import optax
    from kaldi_tpu.am.discriminative import (DenseLattice, frame_accuracy,
                                             mmi_objf, smbr_objf)
    from kaldi_tpu.am.nnet3_io import write_raw_model
    from kaldi_tpu.am.tdnn import TdnnChain
    po = ParseOptions("nnet3-discriminative-train [opts] <raw-in> "
                      "<degs-rspec> <raw-out>")
    po.register("criterion", str, "smbr", "smbr|mmi")
    po.register("num-epochs", int, 2, "epochs over the egs")
    po.register("learning-rate", float, 5e-5, "adam lr")
    po.register("acoustic-scale", float, 0.1, "kappa")
    args = po.read(argv)
    params, bs, cfg = _read_raw_auto(args[0])
    model = TdnnChain(cfg)
    kappa = po["acoustic-scale"]
    crit = po["criterion"]
    if crit not in ("smbr", "mmi"):
        raise KaldiError(f"unknown criterion {crit}")
    tx = optax.adam(po["learning-rate"])
    opt_state = tx.init(params)

    def objf_fn(p, x, num, acc, lat):
        logits = model.apply({"params": p, "batch_stats": bs},
                             x[None], train=False)[0]
        scores = jax.nn.log_softmax(logits)
        if crit == "mmi":
            return -mmi_objf(lat, scores, num, kappa)
        return -smbr_objf(lat, scores, acc, kappa)

    @jax.jit
    def step(p, os_, x, num, acc, src, dst, pdfm, wt, mask, final):
        lat = DenseLattice(src=src, dst=dst, pdf=pdfm, w=wt, mask=mask,
                           final=final, num_states=None)
        loss, g = jax.value_and_grad(objf_fn)(p, x, num, acc, lat)
        upd, os_ = tx.update(g, os_)
        return optax.apply_updates(p, upd), os_, -loss

    egs = list(SequentialTableReader(args[1], holder="deg"))
    if not egs:
        raise KaldiError("nnet3-discriminative-train: no egs")
    for ep in range(po["num-epochs"]):
        tot = 0.0
        for key, eg in egs:
            lat = eg.dense_lattice()
            acc = (jnp.asarray(frame_accuracy(lat, eg.num_ali))
                   if crit == "smbr" else
                   jnp.zeros(lat.src.shape, jnp.float32))
            params, opt_state, objf = step(
                params, opt_state,
                jnp.asarray(eg.feats), jnp.asarray(eg.num_ali), acc,
                jnp.asarray(lat.src), jnp.asarray(lat.dst),
                jnp.asarray(lat.pdf), jnp.asarray(lat.w),
                jnp.asarray(lat.mask), jnp.asarray(lat.final))
            tot += float(objf)
        log.info("nnet3-discriminative-train: epoch %d %s objf/utt "
                 "%.4f", ep, crit, tot / len(egs))
    write_raw_model(args[2], params, bs, cfg)
    return 0


@tool("nnet3-discriminative-compute-objf")
def nnet3_discriminative_compute_objf_tool(argv):
    """Report the sequence objective of a model on discriminative egs
    (nnet3bin/nnet3-discriminative-compute-objf.cc)."""
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.am.discriminative import (frame_accuracy, mmi_objf,
                                             smbr_objf)
    from kaldi_tpu.am.tdnn import TdnnChain
    po = ParseOptions("nnet3-discriminative-compute-objf [opts] "
                      "<raw-in> <degs-rspec>")
    po.register("criterion", str, "smbr", "smbr|mmi")
    po.register("acoustic-scale", float, 0.1, "kappa")
    args = po.read(argv)
    params, bs, cfg = _read_raw_auto(args[0])
    model = TdnnChain(cfg)
    kappa = po["acoustic-scale"]
    tot, n = 0.0, 0
    for _key, eg in SequentialTableReader(args[1], holder="deg"):
        lat = eg.dense_lattice()
        logits = model.apply({"params": params, "batch_stats": bs},
                             jnp.asarray(eg.feats)[None],
                             train=False)[0]
        scores = jax.nn.log_softmax(logits)
        if po["criterion"] == "mmi":
            o = mmi_objf(lat, scores, jnp.asarray(eg.num_ali), kappa)
        else:
            o = smbr_objf(lat, scores,
                          jnp.asarray(frame_accuracy(lat, eg.num_ali)),
                          kappa)
        tot += float(o)
        n += 1
    print(f"objf-per-utt {tot / max(n, 1):.6f} over {n} egs")
    log.info("nnet3-discriminative-compute-objf: %s %.4f over %d",
             po["criterion"], tot / max(n, 1), n)
    return 0


# ---------------------------------------------------------------------------
# Model combination + egs subsets + progress.

@tool("nnet3-combine")
def nnet3_combine_tool(argv):
    """Combine models by objective-optimized softmax weights on
    validation examples (nnet3bin/nnet3-combine.cc: the reference
    optimizes combination weights with LBFGS on valid egs; here adam
    over the weight logits, xent objective)."""
    import jax
    import jax.numpy as jnp
    import optax
    from kaldi_tpu.am.nnet3_io import write_raw_model
    from kaldi_tpu.am.tdnn import TdnnChain
    po = ParseOptions("nnet3-combine [opts] <valid-feats-rspec> "
                      "<valid-pdf-ali-rspec> <raw-in1> [<raw-in2> ...] "
                      "<raw-out>")
    po.register("num-iters", int, 40, "weight-optimization steps")
    args = po.read(argv)
    if len(args) < 4:
        raise KaldiError("nnet3-combine: need >=1 input model")
    model_paths, out_path = args[2:-1], args[-1]
    loaded = [_read_raw_auto(p) for p in model_paths]
    cfg = loaded[0][2]
    bs = loaded[0][1]
    model = TdnnChain(cfg)
    stack = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[p for p, _b, _c in loaded])

    ali_r = RandomAccessTableReader(args[1], holder="ivec")
    feats, alis = [], []
    for key, f in SequentialTableReader(args[0], holder="mat"):
        if key in ali_r:
            feats.append(np.asarray(f, np.float32))
            alis.append(np.asarray(ali_r[key], np.int32))
    if not feats:
        raise KaldiError("nnet3-combine: no validation utterances")

    def combine(logits_w):
        wts = jax.nn.softmax(logits_w)
        return jax.tree_util.tree_map(
            lambda s: jnp.tensordot(wts, s, axes=1), stack)

    def loss_fn(logits_w, x, y):
        p = combine(logits_w)
        logits = model.apply({"params": p, "batch_stats": bs},
                             x[None], train=False)[0]
        lp = jax.nn.log_softmax(logits)
        return -jnp.mean(lp[jnp.arange(y.shape[0]), y])

    w_log = jnp.zeros(len(loaded))
    if len(loaded) > 1:
        tx = optax.adam(0.1)
        os_ = tx.init(w_log)
        step = jax.jit(lambda w, o, x, y: (
            lambda g_l: (optax.apply_updates(
                w, tx.update(g_l[1], o)[0]), tx.update(g_l[1], o)[1],
                g_l[0]))(jax.value_and_grad(loss_fn)(w, x, y)))
        for it in range(po["num-iters"]):
            i = it % len(feats)
            w_log, os_, l = step(w_log, os_, jnp.asarray(feats[i]),
                                 jnp.asarray(alis[i][:len(feats[i])]))
        log.info("nnet3-combine: weights %s",
                 np.round(np.asarray(jax.nn.softmax(w_log)), 3))
    params = jax.tree_util.tree_map(np.asarray, combine(w_log))
    write_raw_model(out_path, params, bs, cfg)
    return 0


@tool("nnet3-subset-egs")
def nnet3_subset_egs_tool(argv):
    """Random subset of xent egs (nnet3bin/nnet3-subset-egs.cc)."""
    po = ParseOptions("nnet3-subset-egs [--n=10] [--srand=0] "
                      "<egs-rspec> <egs-wspec>")
    po.register("n", int, 10, "subset size")
    po.register("srand", int, 0, "seed")
    args = po.read(argv)
    entries = list(SequentialTableReader(args[0], holder="xeg"))
    rng = np.random.default_rng(po["srand"])
    idx = rng.permutation(len(entries))[:po["n"]]
    with TableWriter(args[1], holder="xeg") as w:
        for i in sorted(idx):
            key, eg = entries[i]
            w[key] = eg
    log.info("nnet3-subset-egs: kept %d of %d", min(po["n"],
             len(entries)), len(entries))
    return 0


@tool("nnet3-chain-subset-egs")
def nnet3_chain_subset_egs_tool(argv):
    """Random subset of chain egs (chainbin role; the get_egs.sh
    valid/train-diagnostic subsets)."""
    po = ParseOptions("nnet3-chain-subset-egs [--n=10] [--srand=0] "
                      "<cegs-rspec> <cegs-wspec>")
    po.register("n", int, 10, "subset size")
    po.register("srand", int, 0, "seed")
    args = po.read(argv)
    entries = list(SequentialTableReader(args[0], holder="ceg"))
    rng = np.random.default_rng(po["srand"])
    idx = rng.permutation(len(entries))[:po["n"]]
    with TableWriter(args[1], holder="ceg") as w:
        for i in sorted(idx):
            key, eg = entries[i]
            w[key] = eg
    log.info("nnet3-chain-subset-egs: kept %d of %d",
             min(po["n"], len(entries)), len(entries))
    return 0


@tool("nnet3-chain-make-den-fst")
def nnet3_chain_make_den_fst_tool(argv):
    """Build + serialize the chain denominator graph from training
    phone sequences (chainbin/nnet3-chain-make-den-fst.cc writes
    den.fst/normalization.fst; one file here carries the flat arc
    arrays plus stationary-distribution initial probs)."""
    from kaldi_tpu.am.chain import (make_denominator_graph,
                                    write_denominator_graph)
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.core import io as kio
    po = ParseOptions("nnet3-chain-make-den-fst [opts] <trans-model> "
                      "<phone-seqs-rspec> <den-out>")
    po.register("lm-order", int, 3, "den phone-LM order")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    seqs = [[int(x) for x in v] for _, v in
            SequentialTableReader(args[1], holder="ivec")]
    den = make_denominator_graph(seqs, tm.tree, tm.topo,
                                 order=po["lm-order"])
    with kio.open_wxfilename(args[2]) as f:
        kio.init_kaldi_output_stream(f)
        write_denominator_graph(f, den)
    log.info("nnet3-chain-make-den-fst: %d states, %d arcs (order %d)",
             den.num_states, len(den.src), po["lm-order"])
    return 0


@tool("nnet3-show-progress")
def nnet3_show_progress_tool(argv):
    """Per-component parameter change between two models
    (nnet3bin/nnet3-show-progress.cc: relative l2 of the diff)."""
    import jax
    po = ParseOptions("nnet3-show-progress <raw-old> <raw-new>")
    args = po.read(argv)
    p_old, _bs, cfg = _read_raw_auto(args[0])
    p_new, _bs2, cfg2 = _read_raw_auto(args[1])
    if cfg != cfg2:
        raise KaldiError("nnet3-show-progress: model topologies differ")
    flat_old = jax.tree_util.tree_leaves_with_path(p_old)
    flat_new = dict(jax.tree_util.tree_leaves_with_path(p_new))
    for path, old in flat_old:
        new = flat_new[path]
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        denom = float(np.linalg.norm(old)) + 1e-20
        rel = float(np.linalg.norm(np.asarray(new)
                                   - np.asarray(old))) / denom
        print(f"{name}: rel-param-change {rel:.6f}")
    return 0


@tool("nnet3-acc-lda-stats")
def nnet3_acc_lda_stats_tool(argv):
    """Accumulate LDA stats from xent egs — the preconditioning
    LDA-like transform of the nnet3 recipes
    (nnet3bin/nnet3-acc-lda-stats.cc).  Acc file format matches
    acc-lda / est-lda (sum-lda-accs composes)."""
    from kaldi_tpu.am.transforms import LdaEstimate
    from kaldi_tpu.core import io as kio
    po = ParseOptions("nnet3-acc-lda-stats [--num-pdfs=N] <egs-rspec> "
                      "<acc-out>")
    po.register("num-pdfs", int, 0, "target count (0 = max seen + 1)")
    args = po.read(argv)
    chunks = list(SequentialTableReader(args[0], holder="xeg"))
    if not chunks:
        raise KaldiError("nnet3-acc-lda-stats: no egs")
    num_pdfs = po["num-pdfs"] or (
        max(int(eg.pdfs.max()) for _k, eg in chunks) + 1)
    dim = chunks[0][1].feats.shape[-1]
    lda = LdaEstimate(num_pdfs, dim)
    n = 0
    for _key, eg in chunks:
        feats = np.asarray(eg.feats, np.float64).reshape(-1, dim)
        pdfs = np.asarray(eg.pdfs).reshape(-1)
        for x, p in zip(feats, pdfs):
            lda.accumulate(x, int(p), 1.0)
        n += 1
    with kio.open_wxfilename(args[1]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<LDAACCS>")
        kio.write_matrix(f, lda.counts[None, :])
        kio.write_matrix(f, lda.first)
        kio.write_matrix(f, lda.total_second)
        kio.write_token(f, "</LDAACCS>")
    log.info("nnet3-acc-lda-stats: %d chunks, %d classes, dim %d",
             n, num_pdfs, dim)
    return 0


# ---------------------------------------------------------------------------
# x-vector binaries.

@tool("nnet3-xvector-get-egs")
def nnet3_xvector_get_egs_tool(argv):
    """Fixed-length speaker-labeled chunks for x-vector training
    (nnet3bin/nnet3-xvector-get-egs.cc); labels are speaker indices in
    the sorted speaker list (written with --spk-list)."""
    from kaldi_tpu.pipelines.egs_io import XentEg
    po = ParseOptions("nnet3-xvector-get-egs [opts] <feats-rspec> "
                      "<utt2spk-rspec> <egs-wspec>")
    po.register("chunk-size", int, 64, "frames per chunk")
    po.register("spk-list", str, "", "write speaker list (one/line)")
    args = po.read(argv)
    u2s = {k: v[0] for k, v in
           SequentialTableReader(args[1], holder="text")}
    spks = sorted(set(u2s.values()))
    spk_id = {s: i for i, s in enumerate(spks)}
    T = po["chunk-size"]
    n = 0
    with TableWriter(args[2], holder="xeg") as w:
        for key, feats in SequentialTableReader(args[0], holder="mat"):
            if key not in u2s:
                continue
            feats = np.asarray(feats, np.float32)
            sid = spk_id[u2s[key]]
            for i in range(len(feats) // T):
                chunk = feats[i * T:(i + 1) * T]
                w[f"{key}-{i}"] = XentEg(
                    feats=chunk[None],
                    pdfs=np.full((1, T), sid, np.int32))
                n += 1
    if po["spk-list"]:
        with open(po["spk-list"], "w") as f:
            f.write("\n".join(spks) + "\n")
    log.info("nnet3-xvector-get-egs: %d chunks, %d speakers", n,
             len(spks))
    return 0


@tool("nnet3-xvector-compute")
def nnet3_xvector_compute_tool(argv):
    """Extract x-vector embeddings for whole utterances
    (nnet3bin/nnet3-xvector-compute.cc)."""
    from kaldi_tpu.am.xvector import extract_xvector, load_xvector_model
    po = ParseOptions("nnet3-xvector-compute <model-in> <feats-rspec> "
                      "<vec-wspec>")
    args = po.read(argv)
    variables, model, _spks = load_xvector_model(args[0])
    n = 0
    with TableWriter(args[2], holder="vec") as w:
        for key, feats in SequentialTableReader(args[1], holder="mat"):
            w[key] = extract_xvector(variables, model,
                                     np.asarray(feats, np.float32))
            n += 1
    log.info("nnet3-xvector-compute: %d utterances", n)
    return 0


# ---------------------------------------------------------------------------
# Mapped decoding: loglike matrices in, no acoustic model
# (bin/latgen-faster-mapped.cc family — the seam between any score
# producer and the WFST decoders).

@tool("latgen-faster-mapped")
def latgen_faster_mapped_tool(argv):
    """Lattice decoding from precomputed loglike matrices
    (bin/latgen-faster-mapped.cc): rows are pdf loglikes; the
    transition model supplies tid→pdf."""
    from kaldi_tpu.am.serialize import read_mdl
    po = ParseOptions("latgen-faster-mapped [opts] <trans-model> <fst> "
                      "<loglikes-rspec> <lattice-wspec> [<words-wspec>]")
    po.register("beam", float, 13.0, "decoding beam")
    po.register("lattice-beam", float, 6.0, "lattice beam")
    po.register("max-active", int, 7000, "max active states")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("word-symbol-table", str, "", "words.txt")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    HCLG = _load_hclg(args[1])
    dec = _LatgenDecoder(HCLG, tm.tid_to_pdf_array, po["beam"],
                         po["lattice-beam"], po["acoustic-scale"],
                         max_active=po["max-active"])
    words_tab = None
    if po["word-symbol-table"]:
        from kaldi_tpu.fst.fst import SymbolTable
        words_tab = SymbolTable.read(po["word-symbol-table"])
    wwriter = (TableWriter(args[4], holder="text")
               if len(args) > 4 else None)
    n = 0
    with TableWriter(args[3], holder="clat") as lw:
        for key, ll in SequentialTableReader(args[2], holder="mat"):
            clat = dec.decode_to_clat(np.asarray(ll, np.float32))
            lw[key] = clat
            if wwriter:
                wseq = clat.best_path()[0]
                wwriter[key] = [words_tab.find(w) if words_tab
                                else str(w) for w in wseq]
            n += 1
    if wwriter:
        wwriter.close()
    log.info("latgen-faster-mapped: decoded %d utterances", n)
    return 0


@tool("decode-faster-mapped")
def decode_faster_mapped_tool(argv):
    """Best-path decoding from loglike matrices
    (bin/decode-faster-mapped.cc)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    po = ParseOptions("decode-faster-mapped [opts] <trans-model> <fst> "
                      "<loglikes-rspec> <words-wspec> [<ali-wspec>]")
    po.register("beam", float, 16.0, "decoding beam")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("word-symbol-table", str, "", "words.txt")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    HCLG = _load_hclg(args[1])
    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array, DenseDecoderConfig(
        beam=po["beam"], acoustic_scale=po["acoustic-scale"]))
    words_tab = None
    if po["word-symbol-table"]:
        from kaldi_tpu.fst.fst import SymbolTable
        words_tab = SymbolTable.read(po["word-symbol-table"])
    awriter = (TableWriter(args[4], holder="ivec")
               if len(args) > 4 else None)
    n = 0
    with TableWriter(args[3], holder="text") as w:
        for key, ll in SequentialTableReader(args[2], holder="mat"):
            tids, ols, _cost = dec.decode(np.asarray(ll, np.float32))
            w[key] = [words_tab.find(o) if words_tab else str(o)
                      for o in ols]
            if awriter:
                awriter[key] = np.asarray(tids, np.int32)
            n += 1
    if awriter:
        awriter.close()
    log.info("decode-faster-mapped: decoded %d utterances", n)
    return 0


@tool("align-mapped")
def align_mapped_tool(argv):
    """Forced alignment from loglike matrices + compiled training
    graphs (bin/align-mapped.cc)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.decoder.align import (DenseAligner, in_degrees,
                                         pack_dense_reverse)
    po = ParseOptions("align-mapped [opts] <trans-model> <graphs-rspec> "
                      "<loglikes-rspec> <ali-wspec>")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    graphs = dict(SequentialTableReader(args[1], holder="fst"))
    aligner = DenseAligner(tm.tid_to_pdf_array,
                           acoustic_scale=po["acoustic-scale"])
    ae = an = smax = 1
    for g in graphs.values():
        e, nn = in_degrees(g)
        ae, an = max(ae, e), max(an, nn)
        smax = max(smax, g.num_states)
    n = 0
    with TableWriter(args[3], holder="ivec") as w:
        for key, ll in SequentialTableReader(args[2], holder="mat"):
            if key not in graphs:
                log.warning("align-mapped: no graph for %s", key)
                continue
            g = pack_dense_reverse(graphs[key], smax, ae, an)
            (tids, _cost), = aligner.align_batch(
                [g], [np.asarray(ll, np.float32)])
            w[key] = np.asarray(tids, np.int32)
            n += 1
    log.info("align-mapped: aligned %d utterances", n)
    return 0
