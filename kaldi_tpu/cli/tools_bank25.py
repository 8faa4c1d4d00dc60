"""Twenty-fifth bank of CLI tools: the nnet1 ("Karel") tail incl.
sequence-discriminative training, nnet2 upstream-named utilities and
egs plumbing, and the sgmm2 decode-side tail.

Canonical shapes mirrored (SURVEY.md §2.1 bins):
nnetbin/{nnet-initialize, transf-to-nnet, paste-post,
nnet-train-perutt, nnet-train-mmi-sequential,
nnet-train-mpe-sequential}.cc,
nnet2bin/{nnet-am-copy, nnet-compute, nnet-am-fix, nnet-get-egs,
nnet-shuffle-egs, nnet-combine-fast}.cc,
sgmm2bin/{sgmm2-gselect, sgmm2-rescore-lattice}.cc.
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np

from kaldi_tpu.cli.tools import tool
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


# ---------------------------------------------------------------------------
# nnet1 tail
# ---------------------------------------------------------------------------

@tool("nnet-initialize")
def nnet_initialize_tool(argv):
    """Random-init an nnet1 from a text prototype
    (nnetbin/nnet-initialize.cc; proto = the
    utils/nnet/make_nnet_proto.py output: <AffineTransform> layers
    with <InputDim>/<OutputDim>, nonlinearity lines between)."""
    import jax
    from kaldi_tpu.am.nnet1 import SigmoidDnn, save_nnet1
    from kaldi_tpu.core import io as kio
    po = ParseOptions("nnet-initialize [--seed=777] <nnet-proto> "
                      "<nnet-out>")
    po.register("seed", int, 777, "init seed")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        text = f.read().decode()
    dims: List[tuple] = []
    for m in re.finditer(r"<AffineTransform>\s*<InputDim>\s*(\d+)"
                         r"\s*<OutputDim>\s*(\d+)", text):
        dims.append((int(m.group(1)), int(m.group(2))))
    if not dims:
        raise KaldiError("nnet-initialize: no <AffineTransform> "
                         "layers in proto")
    for (_, o1), (i2, _) in zip(dims, dims[1:]):
        if o1 != i2:
            raise KaldiError(f"nnet-initialize: dim mismatch {o1} vs "
                             f"{i2}")
    feat_dim = dims[0][0]
    hid_dims = tuple(o for _, o in dims[:-1])
    num_pdfs = dims[-1][1]
    model = SigmoidDnn(hid_dims, num_pdfs)
    variables = model.init(jax.random.PRNGKey(po["seed"]),
                           np.zeros((1, 4, feat_dim), np.float32))
    save_nnet1(args[1], variables["params"], hid_dims, num_pdfs)
    log.info("nnet-initialize: %d → %s → %d", feat_dim,
             list(hid_dims), num_pdfs)
    return 0


@tool("transf-to-nnet")
def transf_to_nnet_tool(argv):
    """Wrap an affine/linear feature transform as a one-component
    feature-transform nnet (nnetbin/transf-to-nnet.cc); consumed by
    nnet-forward --feature-transform."""
    from kaldi_tpu.core import io as kio
    po = ParseOptions("transf-to-nnet <transform-rxfilename> "
                      "<nnet-out>")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        kio.init_kaldi_input_stream(f)
        mat = np.asarray(kio.read_matrix(f), np.float64)
    with kio.open_wxfilename(args[1]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<Nnet1Transform>")
        kio.write_matrix(f, mat)
        kio.write_token(f, "</Nnet1Transform>")
    log.info("transf-to-nnet: %s transform", mat.shape)
    return 0


def read_nnet1_transform(path: str) -> np.ndarray:
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(path) as f:
        kio.init_kaldi_input_stream(f)
        kio.expect_token(f, "<Nnet1Transform>")
        mat = np.asarray(kio.read_matrix(f))
        kio.expect_token(f, "</Nnet1Transform>")
    return mat


@tool("paste-post")
def paste_post_tool(argv):
    """Combine posterior streams over disjoint id ranges
    (nnetbin/paste-post.cc: multi-task targets — stream k's ids are
    offset by the sum of earlier dims)."""
    po = ParseOptions("paste-post --dims=d1:d2[:d3...] <post-rspec1> "
                      "<post-rspec2> [...] <post-wspec>")
    po.register("dims", str, "", "colon-separated stream dims "
                "(required)")
    args = po.read(argv)
    dims = [int(x) for x in po["dims"].split(":") if x]
    ins = args[:-1]
    if len(dims) != len(ins):
        raise KaldiError("paste-post: need one dim per input stream")
    offsets = np.concatenate([[0], np.cumsum(dims)[:-1]])
    readers = [dict(SequentialTableReader(r, holder="post"))
               for r in ins]
    n = 0
    with TableWriter(args[-1], holder="post") as w:
        for key in readers[0]:
            if not all(key in r for r in readers):
                log.warning("paste-post: %s missing in some stream",
                            key)
                continue
            T = len(readers[0][key])
            if not all(len(r[key]) == T for r in readers):
                raise KaldiError(f"paste-post: {key}: frame-count "
                                 "mismatch")
            out = []
            for t in range(T):
                frame = []
                for k, r in enumerate(readers):
                    for i, wgt in r[key][t]:
                        if not 0 <= i < dims[k]:
                            raise KaldiError(
                                f"paste-post: id {i} >= dim {dims[k]}")
                        frame.append((int(i + offsets[k]), wgt))
                out.append(frame)
            w[key] = out
            n += 1
    log.info("paste-post: %d utterances, total dim %d", n, sum(dims))
    return 0


@tool("nnet-train-perutt")
def nnet_train_perutt_tool(argv):
    """Per-utterance (unshuffled) xent SGD on an nnet1
    (nnetbin/nnet-train-perutt.cc — recurrent-friendly ordering;
    contrast nnet-train-frmshuff)."""
    import jax
    import jax.numpy as jnp
    import optax
    from kaldi_tpu.am.nnet1 import SigmoidDnn, load_nnet1, save_nnet1
    po = ParseOptions("nnet-train-perutt [opts] <nnet-in> "
                      "<feats-rspec> <pdf-ali-rspec> <nnet-out>")
    po.register("learn-rate", float, 8e-3, "SGD learning rate")
    po.register("num-epochs", int, 1, "sweeps over the data")
    args = po.read(argv)
    params, hid_dims, num_pdfs, priors = load_nnet1(args[0])
    model = SigmoidDnn(tuple(int(h) for h in hid_dims), int(num_pdfs))
    ali_r = RandomAccessTableReader(args[2], holder="ivec")
    data = [(np.asarray(f, np.float32), np.asarray(ali_r[k], np.int32))
            for k, f in SequentialTableReader(args[1], holder="mat")
            if k in ali_r]
    if not data:
        raise KaldiError("nnet-train-perutt: no aligned utterances")
    tx = optax.sgd(po["learn-rate"])
    state = tx.init(params)

    @jax.jit
    def step(p, st, x, y):
        def loss_fn(p):
            logp = model.apply({"params": p}, x[None])[0]
            return -jnp.mean(jnp.take_along_axis(
                logp, y[:, None], axis=1))
        loss, g = jax.value_and_grad(loss_fn)(p)
        upd, st = tx.update(g, st)
        return optax.apply_updates(p, upd), st, loss

    loss = None
    for _ in range(po["num-epochs"]):
        for x, y in data:
            T = min(len(x), len(y))
            params, state, loss = step(params, state,
                                       jnp.asarray(x[:T]),
                                       jnp.asarray(y[:T]))
    save_nnet1(args[3], params, hid_dims, num_pdfs, priors)
    log.info("nnet-train-perutt: %d utts × %d epochs, last xent %.4f",
             len(data), po["num-epochs"], float(loss))
    return 0


def _nnet1_sequential(argv, name: str, criterion: str):
    """Shared MMI/MPE sequence-training flow
    (nnetbin/nnet-train-{mmi,mpe}-sequential.cc): per utterance,
    backprop the sequence objective through the DNN; denominator =
    the utterance's decode lattice, numerator = the alignment."""
    import jax
    import jax.numpy as jnp
    import optax
    from kaldi_tpu.am.discriminative import (lattice_to_dense,
                                             mmi_objf, smbr_objf)
    from kaldi_tpu.am.nnet1 import SigmoidDnn, load_nnet1, save_nnet1
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.lattice.lattice import compact_to_lattice
    po = ParseOptions(f"{name} [opts] <trans-model> <nnet-in> "
                      "<feats-rspec> <ali-rspec> <lat-rspec> "
                      "<nnet-out>")
    po.register("learn-rate", float, 1e-4, "SGD learning rate")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    params, hid_dims, num_pdfs, priors = load_nnet1(args[1])
    model = SigmoidDnn(tuple(int(h) for h in hid_dims), int(num_pdfs))
    ali_r = RandomAccessTableReader(args[3], holder="ivec")
    lat_r = RandomAccessTableReader(args[4], holder="clat")
    tx = optax.sgd(po["learn-rate"])
    state = tx.init(params)
    scale = po["acoustic-scale"]
    n = 0
    tot = 0.0
    for key, feats in SequentialTableReader(args[2], holder="mat"):
        if key not in ali_r or key not in lat_r:
            continue
        x = np.asarray(feats, np.float32)
        tids = np.asarray(ali_r[key], np.int64)
        num_pdf = tm.tid_to_pdf_array[tids]
        dense = lattice_to_dense(
            compact_to_lattice(lat_r[key]), tm.tid_to_pdf_array)
        T = min(len(x), len(num_pdf), dense.T)
        if T < dense.T:
            log.warning("%s: %s lattice spans %d frames > %d "
                        "available; skipped", name, key, dense.T, T)
            continue

        def objf_fn(p):
            scores = model.apply({"params": p}, jnp.asarray(x[:T])
                                 [None])[0]
            if criterion == "mmi":
                return -mmi_objf(dense, scores,
                                 jnp.asarray(num_pdf[:T]),
                                 acoustic_scale=scale)
            acc = jnp.asarray((np.asarray(dense.pdf)
                               == num_pdf[:dense.T, None])
                              .astype(np.float32))
            return -smbr_objf(dense, scores, acc,
                              acoustic_scale=scale)

        loss, g = jax.value_and_grad(objf_fn)(params)
        upd, state = tx.update(g, state)
        params = optax.apply_updates(params, upd)
        tot += -float(loss)
        n += 1
    if n == 0:
        raise KaldiError(f"{name}: no trainable utterances")
    save_nnet1(args[5], params, hid_dims, num_pdfs, priors)
    log.info("%s: %d utterances, mean objf %.4f", name, n, tot / n)
    return 0


@tool("nnet-train-mmi-sequential")
def nnet_train_mmi_sequential_tool(argv):
    """MMI sequence training of an nnet1
    (nnetbin/nnet-train-mmi-sequential.cc)."""
    return _nnet1_sequential(argv, "nnet-train-mmi-sequential", "mmi")


@tool("nnet-train-mpe-sequential")
def nnet_train_mpe_sequential_tool(argv):
    """MPE/sMBR sequence training of an nnet1
    (nnetbin/nnet-train-mpe-sequential.cc; state-level accuracy =
    sMBR, the --do-smbr=true flavor)."""
    return _nnet1_sequential(argv, "nnet-train-mpe-sequential", "mpe")


# ---------------------------------------------------------------------------
# nnet2 upstream-named utilities
# ---------------------------------------------------------------------------

@tool("nnet-am-copy")
def nnet_am_copy_tool(argv):
    """Copy/convert an nnet2 model — the upstream nnet2bin spelling
    (nnet2bin/nnet-am-copy.cc); same flow as nnet2-am-copy."""
    from kaldi_tpu.cli.tools_bank19 import nnet2_am_copy_tool
    return nnet2_am_copy_tool(argv)


@tool("nnet-compute")
def nnet_compute_tool(argv):
    """Forward features through an nnet2 model — upstream spelling
    (nnet2bin/nnet-compute.cc); same flow as nnet2-compute."""
    from kaldi_tpu.cli.tools_bank19 import nnet2_compute_tool
    return nnet2_compute_tool(argv)


@tool("nnet-am-fix")
def nnet_am_fix_tool(argv):
    """Repair an nnet2 model's parameters
    (nnet2bin/nnet-am-fix.cc): replace non-finite values and clip
    magnitudes to --max-param-value."""
    import jax
    from kaldi_tpu.am.nnet2 import load_nnet2, save_nnet2
    po = ParseOptions("nnet-am-fix [opts] <nnet2-in> <nnet2-out>")
    po.register("max-param-value", float, 20.0, "magnitude clip")
    args = po.read(argv)
    params, cfg = load_nnet2(args[0])
    cap = po["max-param-value"]
    n_fixed = [0]

    def fix(a):
        a = np.asarray(a)
        bad = ~np.isfinite(a)
        n_fixed[0] += int(bad.sum())
        a = np.where(bad, 0.0, a)
        over = np.abs(a) > cap
        n_fixed[0] += int(over.sum())
        return np.clip(a, -cap, cap)

    params = jax.tree_util.tree_map(fix, params)
    save_nnet2(args[1], params, cfg)
    log.info("nnet-am-fix: %d values repaired/clipped", n_fixed[0])
    return 0


@tool("nnet-get-egs")
def nnet_get_egs_tool(argv):
    """Cut aligned utterances into spliced-frame nnet2 training
    examples (nnet2bin/nnet-get-egs.cc): each output chunk is a
    minibatch of context windows + center-frame pdf targets, written
    as xent egs (the nnet2 trainer consumes these)."""
    from kaldi_tpu.features import splice_frames
    po = ParseOptions("nnet-get-egs [opts] <feats-rspec> "
                      "<pdf-ali-rspec> <egs-wspec>")
    po.register("left-context", int, 4, "frames of left context")
    po.register("right-context", int, 4, "frames of right context")
    po.register("batch-size", int, 128, "windows per example")
    po.register("provenance-keys", bool, False,
                "key each example '<utt>:<start-frame>' and flush at "
                "utterance boundaries so nnet-relabel-egs can map "
                "examples back to alignments")
    args = po.read(argv)
    from kaldi_tpu.pipelines.egs_io import XentEg
    ali_r = RandomAccessTableReader(args[1], holder="ivec")
    B = po["batch-size"]
    prov = po["provenance-keys"]
    xs, ys = [], []
    n_eg = 0
    cur = {"utt": "", "start": 0}
    with TableWriter(args[2], holder="xeg") as w:
        def flush():
            nonlocal xs, ys, n_eg
            if not xs:
                return
            feats = np.stack(xs)[:, None, :]        # (B, 1, D*)
            pdfs = np.asarray(ys, np.int32)[:, None]
            k = (f"{cur['utt']}:{cur['start']}" if prov
                 else f"eg{n_eg}")
            w[k] = XentEg(feats, pdfs)
            n_eg += 1
            cur["start"] += len(xs)
            xs, ys = [], []

        for key, feats in SequentialTableReader(args[0], holder="mat"):
            if key not in ali_r:
                continue
            if prov:
                flush()
                cur["utt"], cur["start"] = key, 0
            spl = np.asarray(splice_frames(
                np.asarray(feats, np.float32), po["left-context"],
                po["right-context"]))
            ali = np.asarray(ali_r[key], np.int64)
            T = min(len(spl), len(ali))
            for t in range(T):
                xs.append(spl[t])
                ys.append(int(ali[t]))
                if len(xs) == B:
                    flush()
        flush()
    log.info("nnet-get-egs: %d examples of %d windows", n_eg, B)
    return 0


@tool("nnet-shuffle-egs")
def nnet_shuffle_egs_tool(argv):
    """Shuffle nnet2/xent egs (nnet2bin/nnet-shuffle-egs.cc)."""
    po = ParseOptions("nnet-shuffle-egs [--srand=0] <egs-rspec> "
                      "<egs-wspec>")
    po.register("srand", int, 0, "shuffle seed")
    args = po.read(argv)
    entries = list(SequentialTableReader(args[0], holder="xeg"))
    order = np.random.default_rng(po["srand"]).permutation(len(entries))
    with TableWriter(args[1], holder="xeg") as w:
        for i in order:
            key, eg = entries[i]
            w[key] = eg
    log.info("nnet-shuffle-egs: %d examples", len(entries))
    return 0


@tool("nnet-combine-fast")
def nnet_combine_fast_tool(argv):
    """Combine nnet2 models by objective-optimized weights on
    validation egs (nnet2bin/nnet-combine-fast.cc; adam over the
    combination logits, xent objective)."""
    import jax
    import jax.numpy as jnp
    import optax
    from kaldi_tpu.am.nnet2 import Nnet2Model, load_nnet2, save_nnet2
    po = ParseOptions("nnet-combine-fast [opts] <valid-feats-rspec> "
                      "<valid-pdf-ali-rspec> <nnet2-in1> "
                      "[<nnet2-in2> ...] <nnet2-out>")
    po.register("num-iters", int, 30, "weight-optimization steps")
    args = po.read(argv)
    if len(args) < 4:
        raise KaldiError("nnet-combine-fast: need >=1 input model")
    loaded = [load_nnet2(p) for p in args[2:-1]]
    cfg = loaded[0][1]
    model = Nnet2Model(cfg)
    stack = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[p for p, _c in loaded])
    ali_r = RandomAccessTableReader(args[1], holder="ivec")
    feats, targets = [], []
    for key, f in SequentialTableReader(args[0], holder="mat"):
        if key in ali_r:
            x = np.asarray(f, np.float32)
            a = np.asarray(ali_r[key], np.int64)
            T = min(len(x), len(a))
            feats.append(x[:T])
            targets.append(a[:T])
    if not feats:
        raise KaldiError("nnet-combine-fast: no validation "
                         "utterances")
    X = jnp.asarray(np.concatenate(feats))[None]
    y = jnp.asarray(np.concatenate(targets).astype(np.int32))

    def mix(logits):
        wgt = jax.nn.softmax(logits)
        return jax.tree_util.tree_map(
            lambda s: jnp.tensordot(wgt, s, axes=1), stack)

    def loss_fn(logits):
        logp = model.apply({"params": mix(logits)}, X)[0]
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None],
                                             axis=1))

    logits = jnp.zeros(len(loaded))
    tx = optax.adam(0.2)
    state = tx.init(logits)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    loss = None
    for _ in range(po["num-iters"]):
        loss, g = grad_fn(logits)
        upd, state = tx.update(g, state)
        logits = optax.apply_updates(logits, upd)
    save_nnet2(args[-1],
               jax.tree_util.tree_map(np.asarray, mix(logits)), cfg)
    log.info("nnet-combine-fast: %d models, weights %s, xent %.4f",
             len(loaded),
             np.round(np.asarray(jax.nn.softmax(logits)), 3),
             float(loss))
    return 0


# ---------------------------------------------------------------------------
# sgmm2 decode-side tail
# ---------------------------------------------------------------------------

@tool("sgmm2-gselect")
def sgmm2_gselect_tool(argv):
    """Per-frame top-N shared-Gaussian selection for SGMM2
    (sgmm2bin/sgmm2-gselect.cc): ranks the I shared full-covariance
    (here diagonal) Gaussians by background likelihood."""
    from kaldi_tpu.am.sgmm2 import read_sgmm2
    po = ParseOptions("sgmm2-gselect [--gselect=15] <sgmm2-in> "
                      "<feats-rspec> <gselect-wspec>")
    po.register("gselect", int, 15, "Gaussians per frame")
    args = po.read(argv)
    model = read_sgmm2(args[0])
    var = model.var                                    # (I, D)
    # background means: average substate mean per Gaussian
    mu = model.means().mean(axis=(0, 1))               # (I, D)
    gconst = -0.5 * (model.dim * np.log(2 * np.pi)
                     + np.sum(np.log(var), axis=1))
    inv = 1.0 / var
    n = 0
    with TableWriter(args[2], holder="post") as w_tab:
        for key, feats in SequentialTableReader(args[1], holder="mat"):
            x = np.asarray(feats, np.float64)
            ll = (gconst[None, :]
                  - 0.5 * np.einsum("td,id->ti", x * x, inv)
                  + np.einsum("td,id->ti", x, mu * inv)
                  - 0.5 * np.sum(mu * mu * inv, axis=1)[None, :])
            N = min(po["gselect"], ll.shape[1])
            idx = np.argsort(-ll, axis=1)[:, :N]
            # the gselect archive convention gmm-gselect uses: per
            # frame (index, loglike) pairs, best first
            w_tab[key] = [[(int(i), float(ll[t, i])) for i in idx[t]]
                          for t in range(len(x))]
            n += 1
    log.info("sgmm2-gselect: %d utterances (N=%d)", n, po["gselect"])
    return 0


@tool("sgmm2-rescore-lattice")
def sgmm2_rescore_lattice_tool(argv):
    """Replace lattice acoustic scores with SGMM2 loglikes
    (sgmm2bin/sgmm2-rescore-lattice.cc; optional per-speaker vectors
    via --spk-vecs + --utt2spk)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.am.sgmm2 import read_sgmm2
    from kaldi_tpu.lattice.functions import state_times
    po = ParseOptions("sgmm2-rescore-lattice [opts] <trans-model> "
                      "<sgmm2-in> <lat-rspec> <feats-rspec> "
                      "<lat-wspec>")
    po.register("spk-vecs", str, "", "speaker-vector rspec")
    po.register("utt2spk", str, "", "utterance→speaker map rspec")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    model = read_sgmm2(args[1])
    feats = RandomAccessTableReader(args[3], holder="mat")
    vecs = (RandomAccessTableReader(po["spk-vecs"], holder="vec")
            if po["spk-vecs"] else None)
    utt2spk = {}
    if po["utt2spk"]:
        for u, s in SequentialTableReader(po["utt2spk"], holder="text"):
            utt2spk[u] = s[0]
    n = 0
    with TableWriter(args[4], holder="clat") as w:
        for key, clat in SequentialTableReader(args[2], holder="clat"):
            if key not in feats:
                log.warning("%s: no feats; copying unrescored", key)
                w[key] = clat
                continue
            u = None
            if vecs is not None:
                spk = utt2spk.get(key, key)
                if spk in vecs:
                    u = np.asarray(vecs[spk])
            ll = np.asarray(model.loglikes(np.asarray(feats[key]),
                                           spk_u=u))
            times = state_times(clat)
            for s in range(clat.num_states):
                for a in clat.arcs[s]:
                    ac = 0.0
                    for k, tid in enumerate(a.tids):
                        t = times[s] + k
                        if t < ll.shape[0]:
                            ac -= float(
                                ll[t, tm.tid_to_pdf_array[tid]])
                    a.acoustic_cost = ac
            for s, (g, _ac, tids) in list(clat.finals.items()):
                ac = 0.0
                for k, tid in enumerate(tids):
                    t = times[s] + k
                    if t < ll.shape[0]:
                        ac -= float(ll[t, tm.tid_to_pdf_array[tid]])
                clat.finals[s] = (g, ac, tids)
            w[key] = clat
            n += 1
    log.info("sgmm2-rescore-lattice: %d lattices", n)
    return 0
