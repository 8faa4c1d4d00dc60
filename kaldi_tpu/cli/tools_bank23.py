"""Twenty-third bank of CLI tools: nnet3/chainbin egs + model-utility
tails.

Canonical shapes mirrored (SURVEY.md §2.1 bins):
chainbin/{nnet3-chain-merge-egs, nnet3-chain-normalize-egs,
nnet3-chain-combine, nnet3-chain-compute-post,
nnet3-chain-acc-lda-stats}.cc,
nnet3bin/{nnet3-am-init, nnet3-am-adjust-priors,
nnet3-am-train-transitions, nnet3-compute-batch,
nnet3-latgen-faster-parallel, nnet3-discriminative-merge-egs,
nnet3-discriminative-subset-egs, nnet3-discriminative-compute-from-egs}.cc.
"""

from __future__ import annotations

import io as pio
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List

import numpy as np

from kaldi_tpu.cli.tools import tool, _load_hclg, _LatgenDecoder
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)

_TM_END = b"</TransitionModel>"


def _split_mdl(path: str):
    """nnet3 .mdl → (tm blob incl. end tag, nnet blob).  The priors
    marker (see nnet3-am-adjust-priors) is stripped from the nnet
    blob."""
    with open(path, "rb") as f:
        if f.read(2) != b"\0B":
            raise KaldiError(f"{path}: not binary kaldi")
        head = f.read()
    pos = head.find(_TM_END)
    tm_blob = head[:pos + len(_TM_END)] if pos >= 0 else b""
    nnet_blob = head[pos + len(_TM_END):] if pos >= 0 else head
    pmark = nnet_blob.find(b"<KTPriors>")
    priors = None
    if pmark >= 0:
        from kaldi_tpu.core import io as kio
        buf = pio.BytesIO(nnet_blob[pmark:])
        kio.expect_token(buf, "<KTPriors>")
        priors = np.asarray(kio.read_vector(buf))
        nnet_blob = nnet_blob[:pmark]
    return tm_blob, nnet_blob, priors


def _write_mdl_blobs(path: str, tm_blob: bytes, nnet_blob: bytes,
                     priors=None) -> None:
    from kaldi_tpu.core import io as kio
    with open(path, "wb") as f:
        f.write(b"\0B")
        f.write(tm_blob)
        f.write(nnet_blob)
        if priors is not None:
            kio.write_token(f, "<KTPriors>")
            kio.write_vector(f, np.asarray(priors, np.float64))


# ---------------------------------------------------------------------------
# chainbin egs tail
# ---------------------------------------------------------------------------

@tool("nnet3-chain-merge-egs")
def nnet3_chain_merge_egs_tool(argv):
    """Group chain egs into same-shape minibatches
    (chainbin/nnet3-chain-merge-egs.cc): downstream trainers batch
    consecutive entries, so this sorts by shape and renames keys
    mb<i>-<j>; shapes with fewer than --minibatch-size entries are
    kept as a short final minibatch unless --discard-partial=true."""
    po = ParseOptions("nnet3-chain-merge-egs [opts] <egs-rspec> "
                      "<egs-wspec>")
    po.register("minibatch-size", int, 16, "chunks per minibatch")
    po.register("discard-partial", bool, False,
                "drop trailing partial minibatches")
    args = po.read(argv)
    B = max(1, po["minibatch-size"])
    groups: Dict[tuple, List] = {}
    for key, eg in SequentialTableReader(args[0], holder="ceg"):
        groups.setdefault(eg.feats.shape, []).append((key, eg))
    n_out = n_drop = mb = 0
    with TableWriter(args[1], holder="ceg") as w:
        for shape in sorted(groups):
            entries = groups[shape]
            for i in range(0, len(entries), B):
                chunk = entries[i:i + B]
                if len(chunk) < B and po["discard-partial"]:
                    n_drop += len(chunk)
                    continue
                for j, (_k, eg) in enumerate(chunk):
                    w[f"mb{mb}-{j}"] = eg
                    n_out += 1
                mb += 1
    log.info("nnet3-chain-merge-egs: %d egs → %d minibatches "
             "(%d discarded)", n_out + n_drop, mb, n_drop)
    return 0


@tool("nnet3-chain-normalize-egs")
def nnet3_chain_normalize_egs_tool(argv):
    """(Re-)apply denominator-graph normalization weights to chain
    egs (chainbin/nnet3-chain-normalize-egs.cc composes the
    normalization FST into the supervision; here the weights are
    recomputed from the den graph along each eg's segment chain,
    with chunk-local phone history — the same approximation the
    reference's per-chunk composition makes)."""
    from kaldi_tpu.am.chain import read_denominator_graph
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.core import io as kio
    po = ParseOptions("nnet3-chain-normalize-egs <trans-model> "
                      "<den-graph> <egs-rspec> <egs-wspec>")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    with kio.open_rxfilename(args[1]) as f:
        kio.init_kaldi_input_stream(f)
        den = read_denominator_graph(f)
    # entry pdf → phone (chain trees: the forward pdf identifies the
    # phone for each left-context class; collisions are rejected)
    pdf_info = tm.tree.get_pdf_info(tm.topo)
    entry_phone = {}
    for pdf, pairs in enumerate(pdf_info):
        phones = {ph for ph, _pc in pairs}
        if len(phones) == 1:
            entry_phone[pdf] = phones.pop()
    lm = den.lm
    n = n_skip = 0
    with TableWriter(args[3], holder="ceg") as w:
        for key, eg in SequentialTableReader(args[2], holder="ceg"):
            if eg.entry_pdf is None:
                n_skip += 1
                w[key] = eg
                continue
            try:
                segs = [entry_phone[int(p)] for p in eg.entry_pdf]
            except KeyError:
                raise KaldiError("nnet3-chain-normalize-egs: entry pdf"
                                 " does not identify a unique phone — "
                                 "tree not chain-compatible")
            # the make_chain_egs norm_weights recursion with
            # chunk-local history (state of the chunk's first phone)
            S_out = len(eg.entry_w)
            segs = segs[:S_out]
            ew = np.zeros(S_out, np.float32)
            sw = np.zeros(S_out, np.float32)
            nv_init, nv_self, nv_fwd, nv_final = den.norm_view()
            st = lm.state_of((segs[0],))
            eg.init_w = float(den.initial_for((segs[0],)))
            sw[0] = nv_self[st]
            for i in range(1, len(segs)):
                c = lm.phones.index(segs[i])
                ew[i] = nv_fwd[st] + lm.next_logp[st, c]
                st = int(lm.next_state[st, c])
                sw[i] = nv_self[st]
            eg.entry_w = ew
            eg.self_w = sw
            eg.final_w = float(nv_final[st])
            w[key] = eg
            n += 1
    log.info("nnet3-chain-normalize-egs: %d normalized, %d without "
             "segments", n, n_skip)
    return 0


@tool("nnet3-chain-combine")
def nnet3_chain_combine_tool(argv):
    """Combine raw chain models by objective-optimized weights on
    validation chain egs (chainbin/nnet3-chain-combine.cc; adam over
    the combination logits, LF-MMI objective)."""
    import jax
    import jax.numpy as jnp
    import optax
    from kaldi_tpu.am.chain import (ChainTrainingOptions, chain_objf,
                                    read_denominator_graph)
    from kaldi_tpu.am.nnet3_io import write_raw_model
    from kaldi_tpu.am.tdnn import TdnnChain
    from kaldi_tpu.cli.tools_bank16 import _read_raw_auto
    from kaldi_tpu.core import io as kio
    from kaldi_tpu.pipelines.egs_io import read_egs_ark
    po = ParseOptions("nnet3-chain-combine [opts] <den-graph> "
                      "<valid-egs-rspec> <raw-in1> [<raw-in2> ...] "
                      "<raw-out>")
    po.register("num-iters", int, 30, "weight-optimization steps")
    po.register("frame-subsampling-factor", int, 3, "subsampling")
    args = po.read(argv)
    if len(args) < 4:
        raise KaldiError("nnet3-chain-combine: need >=1 input model")
    with kio.open_rxfilename(args[0]) as f:
        kio.init_kaldi_input_stream(f)
        den = read_denominator_graph(f)
    model_paths, out_path = args[2:-1], args[-1]
    loaded = [_read_raw_auto(p) for p in model_paths]
    cfg = loaded[0][2]
    cfg.frame_subsampling_factor = po["frame-subsampling-factor"]
    bs = loaded[0][1]
    net = TdnnChain(cfg)
    stack = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[p for p, _b, _c in loaded])
    egs = read_egs_ark(args[1])
    feats = jnp.asarray(egs.feats)
    opts = ChainTrainingOptions()

    def mix(logits):
        wgt = jax.nn.softmax(logits)
        return jax.tree_util.tree_map(
            lambda s: jnp.tensordot(wgt, s, axes=1), stack)

    pdf_ali = jnp.asarray(egs.pdf_ali)
    mask = jnp.asarray(egs.mask)

    def loss_fn(logits):
        params = mix(logits)
        scores = net.apply({"params": params, "batch_stats": bs},
                           feats, train=False)
        return chain_objf(den, scores, pdf_ali, mask, opts)[0]

    logits = jnp.zeros(len(loaded))
    tx = optax.adam(0.2)
    state = tx.init(logits)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    loss = None
    for _ in range(po["num-iters"]):
        loss, g = grad_fn(logits)
        upd, state = tx.update(g, state)
        logits = optax.apply_updates(logits, upd)
    write_raw_model(out_path, jax.tree_util.tree_map(np.asarray,
                                                     mix(logits)),
                    bs, cfg)
    log.info("nnet3-chain-combine: %d models, weights %s, objf %.4f",
             len(loaded),
             np.round(np.asarray(jax.nn.softmax(logits)), 3),
             -float(loss))
    return 0


@tool("nnet3-chain-compute-post")
def nnet3_chain_compute_post_tool(argv):
    """Per-frame pdf posteriors from a chain model over egs
    (chainbin/nnet3-chain-compute-post.cc: softmax of the chain
    output — used for silence-probability estimation and biased-LM
    cleanup)."""
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.am.tdnn import TdnnChain
    from kaldi_tpu.cli.tools_bank16 import _read_raw_auto
    po = ParseOptions("nnet3-chain-compute-post [opts] <raw-model> "
                      "<feats-rspec> <post-wspec>")
    po.register("frame-subsampling-factor", int, 3, "subsampling")
    args = po.read(argv)
    params, bs, cfg = _read_raw_auto(args[0])
    cfg.frame_subsampling_factor = po["frame-subsampling-factor"]
    net = TdnnChain(cfg)
    n = 0
    with TableWriter(args[2], holder="mat") as w:
        for key, feats in SequentialTableReader(args[1], holder="mat"):
            x = jnp.asarray(np.asarray(feats, np.float32))[None]
            scores = net.apply({"params": params, "batch_stats": bs},
                               x, train=False)[0]
            post = np.asarray(jax.nn.softmax(scores, axis=-1))
            w[key] = post.astype(np.float32)
            n += 1
    log.info("nnet3-chain-compute-post: %d utterances", n)
    return 0


@tool("nnet3-chain-acc-lda-stats")
def nnet3_chain_acc_lda_stats_tool(argv):
    """LDA stats from chain egs (chainbin/nnet3-chain-acc-lda-stats.cc
    — the LDA-like preconditioning transform at the network input):
    class = the eg's numerator pdf at each subsampled frame, sample =
    the frame's input features."""
    from kaldi_tpu.am.transforms import LdaEstimate
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.core import io as kio
    po = ParseOptions("nnet3-chain-acc-lda-stats <trans-model> "
                      "<egs-rspec> <lda-accs-out>")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    lda = None
    n = 0
    for _key, eg in SequentialTableReader(args[1], holder="ceg"):
        sub = max(1, eg.feats.shape[0] // max(len(eg.pdf_ali), 1))
        if lda is None:
            lda = LdaEstimate(tm.num_pdfs, eg.feats.shape[1])
        t_idx = np.minimum(np.arange(len(eg.pdf_ali)) * sub,
                           eg.feats.shape[0] - 1)
        mask = eg.mask.astype(bool)
        lda.accumulate_batch(np.asarray(eg.feats)[t_idx][mask],
                             np.asarray(eg.pdf_ali)[mask])
        n += 1
    if lda is None:
        raise KaldiError("nnet3-chain-acc-lda-stats: no egs")
    with kio.open_wxfilename(args[2]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<LDAACCS>")
        kio.write_matrix(f, lda.counts[None, :])
        kio.write_matrix(f, lda.first)
        kio.write_matrix(f, lda.total_second)
        kio.write_token(f, "</LDAACCS>")
    log.info("nnet3-chain-acc-lda-stats: %d egs", n)
    return 0


# ---------------------------------------------------------------------------
# nnet3bin model-utility tail
# ---------------------------------------------------------------------------

@tool("nnet3-am-init")
def nnet3_am_init_tool(argv):
    """Transition model + raw nnet → .mdl
    (nnet3bin/nnet3-am-init.cc)."""
    po = ParseOptions("nnet3-am-init <trans-model-mdl> <raw-in> "
                      "<mdl-out>\n<trans-model-mdl> may be any .mdl "
                      "whose TransitionModel should be reused")
    args = po.read(argv)
    tm_blob, _n, _p = _split_mdl(args[0])
    if not tm_blob:
        raise KaldiError(f"{args[0]}: no <TransitionModel> section")
    with open(args[1], "rb") as f:
        if f.read(2) != b"\0B":
            raise KaldiError(f"{args[1]}: not binary kaldi")
        nnet_blob = f.read()
    _write_mdl_blobs(args[2], tm_blob, nnet_blob)
    log.info("nnet3-am-init: wrote %s", args[2])
    return 0


@tool("nnet3-am-adjust-priors")
def nnet3_am_adjust_priors_tool(argv):
    """Attach pdf priors (from pdf-to-counts) to an nnet3 .mdl
    (nnet3bin/nnet3-am-adjust-priors.cc; priors ride a trailing
    framed section and nnet3-compute-batch subtracts log-priors when
    present)."""
    from kaldi_tpu.core import io as kio
    po = ParseOptions("nnet3-am-adjust-priors <mdl-in> "
                      "<counts-rxfilename> <mdl-out>")
    args = po.read(argv)
    tm_blob, nnet_blob, _old = _split_mdl(args[0])
    with kio.open_rxfilename(args[1]) as f:
        kio.init_kaldi_input_stream(f)
        counts = np.asarray(kio.read_vector(f), np.float64)
    priors = (counts + 0.5) / (counts.sum() + 0.5 * len(counts))
    _write_mdl_blobs(args[2], tm_blob, nnet_blob, priors=priors)
    log.info("nnet3-am-adjust-priors: %d pdfs, entropy %.3f",
             len(priors), -float((priors * np.log(priors)).sum()))
    return 0


@tool("nnet3-am-train-transitions")
def nnet3_am_train_transitions_tool(argv):
    """Re-estimate transition probabilities from alignments
    (nnet3bin/nnet3-am-train-transitions.cc)."""
    from kaldi_tpu.am.serialize import (read_transition_model,
                                        write_transition_model)
    from kaldi_tpu.core import io as kio
    po = ParseOptions("nnet3-am-train-transitions <mdl-in> <ali-rspec> "
                      "<mdl-out>")
    args = po.read(argv)
    tm_blob, nnet_blob, priors = _split_mdl(args[0])
    tm = read_transition_model(pio.BytesIO(tm_blob))
    counts = np.zeros(tm.num_transition_ids + 1)
    n = 0
    for _key, ali in SequentialTableReader(args[1], holder="ivec"):
        np.add.at(counts, np.asarray(ali, np.int64), 1.0)
        n += 1
    tm.mle_update(counts)
    buf = pio.BytesIO()
    write_transition_model(buf, tm)
    _write_mdl_blobs(args[2], buf.getvalue(), nnet_blob,
                     priors=priors)
    log.info("nnet3-am-train-transitions: %d alignments", n)
    return 0


@tool("nnet3-compute-batch")
def nnet3_compute_batch_tool(argv):
    """Batched nnet3 forward (nnet3bin/nnet3-compute-batch.cc): pads
    utterances to one (B, T) shape per length bucket so a stream
    compiles a handful of executables; subtracts log-priors when the
    model carries them."""
    import jax.numpy as jnp
    from kaldi_tpu.am.tdnn import TdnnChain
    from kaldi_tpu.cli.tools_bank16 import _read_raw_auto
    po = ParseOptions("nnet3-compute-batch [opts] <model> "
                      "<feats-rspec> <mat-wspec>\n<model> may be raw "
                      "or .mdl (with optional priors)")
    po.register("batch-size", int, 8, "utterances per device batch")
    po.register("bucket", int, 64, "frame-count padding multiple")
    po.register("frame-subsampling-factor", int, 1, "subsampling")
    args = po.read(argv)
    # _split_mdl handles both forms: a raw model has no
    # <TransitionModel> section, so the whole file is the nnet blob
    import kaldi_tpu.am.nnet3_io as n3
    _tm_blob, nnet_blob, priors = _split_mdl(args[0])
    model = n3.read_nnet3(pio.BytesIO(nnet_blob))
    cfg = n3.infer_tdnn_config(
        model, frame_subsampling_factor=po["frame-subsampling-factor"])
    params, bs = n3.nnet3_to_tdnn(model, cfg)
    log_priors = (np.log(np.maximum(priors, 1e-20))
                  if priors is not None else None)
    net = TdnnChain(cfg)
    B = max(1, po["batch-size"])
    bucket = max(1, po["bucket"])
    entries = list(SequentialTableReader(args[1], holder="mat"))
    entries.sort(key=lambda kv: (len(kv[1]), kv[0]))
    n = 0
    with TableWriter(args[2], holder="mat") as w:
        for i in range(0, len(entries), B):
            chunk = entries[i:i + B]
            T_pad = int(np.ceil(max(len(m) for _k, m in chunk)
                                / bucket) * bucket)
            D = chunk[0][1].shape[1]
            Xb = np.zeros((B, T_pad, D), np.float32)
            for b, (_k, m) in enumerate(chunk):
                Xb[b, :len(m)] = m
            out = np.asarray(net.apply(
                {"params": params, "batch_stats": bs},
                jnp.asarray(Xb), train=False))
            sub = cfg.frame_subsampling_factor
            for b, (k, m) in enumerate(chunk):
                rows = out[b, :max(1, len(m) // sub)]
                if log_priors is not None:
                    rows = rows - log_priors[None, :]
                w[k] = rows.astype(np.float32)
                n += 1
    log.info("nnet3-compute-batch: %d utterances", n)
    return 0


@tool("nnet3-latgen-faster-parallel")
def nnet3_latgen_faster_parallel_tool(argv):
    """Threaded nnet3 lattice decoding
    (nnet3bin/nnet3-latgen-faster-parallel.cc): acoustic scoring on
    device per utterance, lattice build/determinize in a worker
    pool."""
    import jax.numpy as jnp
    from kaldi_tpu.am.serialize import read_transition_model
    from kaldi_tpu.am.tdnn import TdnnChain
    from kaldi_tpu.cli.tools_bank16 import _read_raw_auto
    po = ParseOptions("nnet3-latgen-faster-parallel [opts] "
                      "<trans-model-mdl> <raw-model> <fst> "
                      "<feats-rspec> <lattice-wspec>")
    po.register("beam", float, 13.0, "decoding beam")
    po.register("lattice-beam", float, 6.0, "lattice beam")
    po.register("max-active", int, 7000, "max active states")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    po.register("frame-subsampling-factor", int, 3, "subsampling")
    po.register("num-threads", int, 4, "worker threads")
    args = po.read(argv)
    tm_blob, _nb, _pr = _split_mdl(args[0])
    tm = read_transition_model(pio.BytesIO(tm_blob))
    params, bs, cfg = _read_raw_auto(args[1])
    cfg.frame_subsampling_factor = po["frame-subsampling-factor"]
    net = TdnnChain(cfg)
    HCLG = _load_hclg(args[2])
    dec = _LatgenDecoder(HCLG, tm.tid_to_pdf_array, po["beam"],
                         po["lattice-beam"], po["acoustic-scale"],
                         max_active=po["max-active"])
    n = 0
    with TableWriter(args[4], holder="clat") as w, \
            ThreadPoolExecutor(max_workers=max(1, po["num-threads"])) \
            as pool:
        pend = []
        for key, feats in SequentialTableReader(args[3], holder="mat"):
            scores = np.asarray(net.apply(
                {"params": params, "batch_stats": bs},
                jnp.asarray(np.asarray(feats, np.float32))[None],
                train=False))[0]
            pend.append((key, pool.submit(
                dec.decode_to_clat, scores.astype(np.float32))))
        for key, fut in pend:
            w[key] = fut.result()
            n += 1
    log.info("nnet3-latgen-faster-parallel: %d utterances (%d "
             "threads)", n, po["num-threads"])
    return 0


# ---------------------------------------------------------------------------
# nnet3 discriminative egs tail
# ---------------------------------------------------------------------------

@tool("nnet3-discriminative-merge-egs")
def nnet3_discriminative_merge_egs_tool(argv):
    """Group discriminative egs into same-shape minibatches
    (nnet3bin/nnet3-discriminative-merge-egs.cc; key-renaming
    convention as nnet3-chain-merge-egs)."""
    po = ParseOptions("nnet3-discriminative-merge-egs [opts] "
                      "<egs-rspec> <egs-wspec>")
    po.register("minibatch-size", int, 8, "egs per minibatch")
    args = po.read(argv)
    B = max(1, po["minibatch-size"])
    groups: Dict[tuple, List] = {}
    for key, eg in SequentialTableReader(args[0], holder="deg"):
        groups.setdefault(eg.feats.shape, []).append(eg)
    n = mb = 0
    with TableWriter(args[1], holder="deg") as w:
        for shape in sorted(groups):
            for i in range(0, len(groups[shape]), B):
                for j, eg in enumerate(groups[shape][i:i + B]):
                    w[f"mb{mb}-{j}"] = eg
                    n += 1
                mb += 1
    log.info("nnet3-discriminative-merge-egs: %d egs → %d "
             "minibatches", n, mb)
    return 0


@tool("nnet3-discriminative-subset-egs")
def nnet3_discriminative_subset_egs_tool(argv):
    po = ParseOptions("nnet3-discriminative-subset-egs [--n=10] "
                      "<egs-rspec> <egs-wspec>")
    po.register("n", int, 10, "keep first n")
    args = po.read(argv)
    n = 0
    with TableWriter(args[1], holder="deg") as w:
        for key, eg in SequentialTableReader(args[0], holder="deg"):
            if n >= po["n"]:
                break
            w[key] = eg
            n += 1
    log.info("nnet3-discriminative-subset-egs: kept %d", n)
    return 0


@tool("nnet3-discriminative-compute-from-egs")
def nnet3_discriminative_compute_from_egs_tool(argv):
    """Forward discriminative egs through a raw model and write the
    per-frame output (nnet3bin/nnet3-discriminative-compute-from-
    egs.cc)."""
    import jax.numpy as jnp
    from kaldi_tpu.am.tdnn import TdnnChain
    from kaldi_tpu.cli.tools_bank16 import _read_raw_auto
    po = ParseOptions("nnet3-discriminative-compute-from-egs "
                      "<raw-model> <egs-rspec> <mat-wspec>")
    args = po.read(argv)
    params, bs, cfg = _read_raw_auto(args[0])
    net = TdnnChain(cfg)
    n = 0
    with TableWriter(args[2], holder="mat") as w:
        for key, eg in SequentialTableReader(args[1], holder="deg"):
            out = np.asarray(net.apply(
                {"params": params, "batch_stats": bs},
                jnp.asarray(np.asarray(eg.feats, np.float32))[None],
                train=False))[0]
            w[key] = out.astype(np.float32)
            n += 1
    log.info("nnet3-discriminative-compute-from-egs: %d egs", n)
    return 0


@tool("nnet3-chain-e2e-get-egs")
def nnet3_chain_e2e_get_egs_tool(argv):
    """End-to-end (flat-start) chain egs from TRANSCRIPTS — no prior
    alignment (chainbin/nnet3-chain-e2e-get-egs.cc): each utterance's
    supervision is its phone sequence with free boundary times,
    stored as a full FSA in the eg.  Train with nnet3-chain-train
    --supervision-tolerance >= the longest utterance's subsampled
    frame count."""
    from kaldi_tpu.am.chain import (make_denominator_graph,
                                    write_denominator_graph)
    from kaldi_tpu.am.chain_supervision import make_chain_egs_e2e
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.core import io as kio
    from kaldi_tpu.pipelines.egs_io import write_egs_ark
    po = ParseOptions("nnet3-chain-e2e-get-egs [opts] <chain-mdl> "
                      "<feats-rspec> <phone-transcript-rspec> "
                      "<egs-wspec> [<den-out>]\n"
                      "phone transcripts: int-vector tables "
                      "(sym2int'd pronunciations)")
    po.register("frame-subsampling-factor", int, 3, "subsampling")
    po.register("lm-order", int, 2, "den phone-LM order (den graph "
                "estimated from the transcripts themselves)")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    seqs = {k: [int(p) for p in v] for k, v in
            SequentialTableReader(args[2], holder="ivec")}
    feats = {k: np.asarray(v, np.float32) for k, v in
             SequentialTableReader(args[1], holder="mat")
             if k in seqs}
    if not feats:
        raise KaldiError("nnet3-chain-e2e-get-egs: no utterances "
                         "with both feats and transcripts")
    den = make_denominator_graph(list(seqs.values()), tm.tree, tm.topo,
                                 order=po["lm-order"])
    egs = make_chain_egs_e2e(feats, seqs, tm.tree, tm.topo,
                             subsample=po["frame-subsampling-factor"],
                             den=den)
    n = write_egs_ark(args[3], egs)
    if len(args) > 4:
        with kio.open_wxfilename(args[4]) as f:
            kio.init_kaldi_output_stream(f)
            write_denominator_graph(f, den)
    log.info("nnet3-chain-e2e-get-egs: %d egs (max %d subsampled "
             "frames — pass --supervision-tolerance >= that to "
             "nnet3-chain-train)", n, int(egs.mask.shape[1]))
    return 0
