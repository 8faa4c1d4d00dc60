"""Nineteenth bank of CLI tools: the nnet1 ("Karel") and nnet2
("Dan") binary families.

Canonical shapes mirrored (SURVEY.md §2.1 bins):
nnetbin/{nnet-info,nnet-copy,nnet-concat,nnet-forward,
rbm-train-cd1-frmshuff,rbm-convert-to-nnet,nnet-train-frmshuff,
cmvn-to-nnet}.cc,
nnet2bin/{nnet-am-info,nnet-am-init,nnet-am-copy2? → nnet-am-copy is
taken by nnet3; here nnet2-am-copy,nnet-am-average,nnet-train-simple,
nnet-latgen-faster,nnet-compute2? → nnet2-compute}.cc.
Where an upstream name collides with an already-registered nnet3 tool
the nnet2 variant gets a 'nnet2-' prefix (noted per tool).
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
# nnet1 (nnetbin/) — sigmoid DNN + RBM pretraining.

@tool("nnet-info")
def nnet_info_tool(argv):
    """Print nnet1 layer structure (nnetbin/nnet-info.cc)."""
    from kaldi_tpu.am.nnet1 import load_nnet1
    po = ParseOptions("nnet-info <nnet1-in>")
    args = po.read(argv)
    params, hid_dims, num_pdfs, priors = load_nnet1(args[0])
    in_dim = params["hidden1"]["kernel"].shape[0] if hid_dims else 0
    print(f"input-dim {in_dim}")
    for i, hd in enumerate(hid_dims):
        print(f"component {i + 1} : <AffineTransform> + <Sigmoid> "
              f"dim {hd}")
    print(f"output-dim {num_pdfs}")
    print(f"has-priors {priors is not None}")
    return 0


@tool("nnet-copy")
def nnet_copy_tool(argv):
    """Copy an nnet1 model (nnetbin/nnet-copy.cc)."""
    from kaldi_tpu.am.nnet1 import load_nnet1, save_nnet1
    po = ParseOptions("nnet-copy <nnet1-in> <nnet1-out>")
    args = po.read(argv)
    params, hid_dims, num_pdfs, priors = load_nnet1(args[0])
    save_nnet1(args[1], params, hid_dims, num_pdfs, priors)
    return 0


@tool("nnet-concat")
def nnet_concat_tool(argv):
    """Concatenate nnet1 stacks: the second net consumes the first's
    output (nnetbin/nnet-concat.cc).  The first net's output layer is
    dropped (it becomes a hidden layer boundary) only when
    --drop-output=true; default stacks hidden layers of net1 with ALL
    layers of net2."""
    from kaldi_tpu.am.nnet1 import load_nnet1, save_nnet1
    po = ParseOptions("nnet-concat [--drop-output=false] <nnet1-a> "
                      "<nnet1-b> <nnet1-out>")
    po.register("drop-output", bool, False,
                "drop net-a's output affine before stacking")
    args = po.read(argv)
    pa, ha, na, _pr = load_nnet1(args[0])
    pb, hb, nb, prb = load_nnet1(args[1])
    params: Dict = {}
    hid: List[int] = []
    for i, hd in enumerate(ha):
        params[f"hidden{len(hid) + 1}"] = dict(pa[f"hidden{i + 1}"])
        hid.append(hd)
    if not po["drop-output"]:
        params[f"hidden{len(hid) + 1}"] = dict(pa["output_affine"])
        hid.append(na)
    for i, hd in enumerate(hb):
        params[f"hidden{len(hid) + 1}"] = dict(pb[f"hidden{i + 1}"])
        hid.append(hd)
    params["output_affine"] = dict(pb["output_affine"])
    save_nnet1(args[2], params, hid, nb, prb)
    log.info("nnet-concat: %d + %d layers → %d", len(ha), len(hb),
             len(hid))
    return 0


@tool("nnet-forward")
def nnet_forward_tool(argv):
    """Forward features through an nnet1 model
    (nnetbin/nnet-forward.cc): log-posteriors, optionally minus
    log-priors (--no-softmax/--apply-log analogue: output is always
    log-domain here; priors stored in the model file are divided out
    with --divide-by-priors)."""
    import jax.numpy as jnp
    from kaldi_tpu.am.nnet1 import SigmoidDnn, load_nnet1
    po = ParseOptions("nnet-forward [opts] <nnet1-in> <feats-rspec> "
                      "<mat-wspec>")
    po.register("divide-by-priors", bool, False,
                "subtract log-priors (pseudo-loglikelihoods)")
    po.register("feature-transform", str, "",
                "transf-to-nnet feature-transform applied before the "
                "DNN (the upstream --feature-transform)")
    args = po.read(argv)
    params, hid_dims, num_pdfs, priors = load_nnet1(args[0])
    model = SigmoidDnn(tuple(int(h) for h in hid_dims), int(num_pdfs))
    ft = None
    if po["feature-transform"]:
        from kaldi_tpu.cli.tools_bank25 import read_nnet1_transform
        ft = np.asarray(read_nnet1_transform(po["feature-transform"]),
                        np.float32)
    logp_prior = None
    if po["divide-by-priors"]:
        if priors is None:
            raise KaldiError("nnet-forward: model has no priors")
        logp_prior = np.log(np.maximum(
            priors / priors.sum(), 1e-20)).astype(np.float32)
    n = 0
    with TableWriter(args[2], holder="mat") as w:
        for key, feats in SequentialTableReader(args[1], holder="mat"):
            feats = np.asarray(feats, np.float32)
            if ft is not None:
                from kaldi_tpu.am.transforms import apply_transform
                feats = apply_transform(feats, ft).astype(np.float32)
            x = jnp.asarray(feats)[None]
            logp = np.asarray(model.apply({"params": params}, x))[0]
            if logp_prior is not None:
                logp = logp - logp_prior[None, :]
            w[key] = logp.astype(np.float32)
            n += 1
    log.info("nnet-forward: %d utterances", n)
    return 0


@tool("rbm-train-cd1-frmshuff")
def rbm_train_cd1_tool(argv):
    """Train one RBM layer with CD-1 on shuffled frames
    (nnetbin/rbm-train-cd1-frmshuff.cc); writes the RBM as a 1-layer
    nnet1 whose hidden layer is the RBM's up-pass."""
    from kaldi_tpu.am.nnet1 import save_nnet1, train_rbm
    po = ParseOptions("rbm-train-cd1-frmshuff [opts] <feats-rspec> "
                      "<rbm-out>")
    po.register("hid-dim", int, 128, "hidden units")
    po.register("num-epochs", int, 4, "CD-1 epochs")
    po.register("gaussian-visible", bool, True,
                "Gaussian-Bernoulli first layer")
    args = po.read(argv)
    frames = np.concatenate(
        [np.asarray(m, np.float32) for _k, m in
         SequentialTableReader(args[0], holder="mat")])
    rbm, recon_errs = train_rbm(frames, po["hid-dim"],
                                num_epochs=po["num-epochs"],
                                gaussian_visible=po["gaussian-visible"])
    params = {"hidden1": {"kernel": np.asarray(rbm.W),
                          "bias": np.asarray(rbm.hid_bias)},
              "output_affine": {
                  "kernel": np.zeros((po["hid-dim"], 1), np.float32),
                  "bias": np.zeros(1, np.float32)}}
    save_nnet1(args[1], params, [po["hid-dim"]], 1)
    log.info("rbm-train-cd1-frmshuff: recon err %.4f over %d frames",
             recon_errs[-1], len(frames))
    return 0


@tool("rbm-convert-to-nnet")
def rbm_convert_to_nnet_tool(argv):
    """RBM file → nnet1 layer (nnetbin/rbm-convert-to-nnet.cc; our RBM
    files already carry the up-pass as hidden1, so this validates +
    re-frames)."""
    from kaldi_tpu.am.nnet1 import load_nnet1, save_nnet1
    po = ParseOptions("rbm-convert-to-nnet <rbm-in> <nnet1-out>")
    args = po.read(argv)
    params, hid_dims, _np_, _pr = load_nnet1(args[0])
    save_nnet1(args[1], {"hidden1": params["hidden1"],
                         "output_affine": params["output_affine"]},
               hid_dims[:1], 1)
    return 0


@tool("nnet-train-frmshuff")
def nnet_train_frmshuff_tool(argv):
    """Frame-shuffled cross-entropy SGD fine-tuning
    (nnetbin/nnet-train-frmshuff.cc); honors per-layer learning-rate
    factors set by nnet-set-learnrate."""
    from kaldi_tpu.am.nnet1 import (finetune_xent, load_nnet1_full,
                                    save_nnet1)
    po = ParseOptions("nnet-train-frmshuff [opts] <nnet1-in> "
                      "<feats-rspec> <pdf-ali-rspec> <nnet1-out>")
    po.register("num-epochs", int, 4, "epochs")
    po.register("learning-rate", float, 0.5, "SGD lr")
    po.register("minibatch-size", int, 256, "frames per minibatch")
    po.register("num-pdfs", int, 0,
                "resize (re-init) the output layer to this many "
                "targets (the nnet-initialize role when fine-tuning a "
                "pretrained stack whose output layer is a dummy)")
    args = po.read(argv)
    params, hid_dims, num_pdfs, priors, lr_vec = \
        load_nnet1_full(args[0])
    lr_factors = None
    if lr_vec is not None:
        names = [f"hidden{i + 1}" for i in range(len(hid_dims))] \
            + ["output_affine"]
        lr_factors = {nm: float(v) for nm, v in zip(names, lr_vec)}
    if po["num-pdfs"] and po["num-pdfs"] != num_pdfs:
        rng0 = np.random.default_rng(0)
        out_in = int(hid_dims[-1])
        params = dict(params)
        params["output_affine"] = {
            "kernel": (0.01 * rng0.standard_normal(
                (out_in, po["num-pdfs"]))).astype(np.float32),
            "bias": np.zeros(po["num-pdfs"], np.float32)}
        num_pdfs = po["num-pdfs"]
    ali_r = RandomAccessTableReader(args[2], holder="ivec")
    frames, targets = [], []
    for key, m in SequentialTableReader(args[1], holder="mat"):
        if key not in ali_r:
            continue
        m = np.asarray(m, np.float32)
        a = np.asarray(ali_r[key], np.int32)
        frames.append(m[:len(a)])
        targets.append(a[:len(m)])
    if not frames:
        raise KaldiError("nnet-train-frmshuff: no matched utterances")
    frames = np.concatenate(frames)
    targets = np.concatenate(targets)
    params, loss = finetune_xent(
        params, list(hid_dims), num_pdfs, frames, targets,
        num_epochs=po["num-epochs"], batch_size=po["minibatch-size"],
        lr=po["learning-rate"], lr_factors=lr_factors)
    # class priors from the training targets (the ali-to-post →
    # nnet-forward --class-frame-counts flow, folded in)
    counts = np.bincount(targets, minlength=num_pdfs).astype(
        np.float64) + 0.5
    save_nnet1(args[3], params, hid_dims, num_pdfs,
               priors=counts.astype(np.float32))
    log.info("nnet-train-frmshuff: final xent %.4f over %d frames",
             loss, len(frames))
    return 0


@tool("cmvn-to-nnet")
def cmvn_to_nnet_tool(argv):
    """Global CMVN stats → a normalization transform (D, D+1) affine
    [diag(1/σ) | −μ/σ] (nnetbin/cmvn-to-nnet.cc writes
    AddShift+Rescale; here one affine consumable by
    transform-feats)."""
    from kaldi_tpu.core import io as kio
    po = ParseOptions("cmvn-to-nnet <cmvn-stats-in> "
                      "<transform-out>\nstats: the compute-cmvn-stats "
                      "2×(D+1) matrix")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        kio.init_kaldi_input_stream(f)
        stats = np.asarray(kio.read_matrix(f), np.float64)
    cnt = stats[0, -1]
    mean = stats[0, :-1] / cnt
    var = np.maximum(stats[1, :-1] / cnt - mean ** 2, 1e-10)
    inv_std = 1.0 / np.sqrt(var)
    D = len(mean)
    mat = np.concatenate([np.diag(inv_std),
                          (-mean * inv_std)[:, None]], axis=1)
    with kio.open_wxfilename(args[1]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, mat.astype(np.float32))
    log.info("cmvn-to-nnet: dim %d normalization transform", D)
    return 0


# ---------------------------------------------------------------------------
# nnet2 (nnet2bin/) — p-norm nets, parallel SGD + averaging.

@tool("nnet-am-info")
def nnet_am_info_tool(argv):
    """Print nnet2 model structure (nnet2bin/nnet-am-info.cc)."""
    from kaldi_tpu.am.nnet2 import load_nnet2
    po = ParseOptions("nnet-am-info <nnet2-in>")
    args = po.read(argv)
    _params, cfg = load_nnet2(args[0])
    print(f"feat-dim {cfg.feat_dim}")
    print(f"num-pdfs {cfg.num_pdfs}")
    print(f"num-hidden-layers {cfg.num_hidden_layers}")
    print(f"pnorm-input-dim {cfg.pnorm_input_dim}")
    print(f"pnorm-output-dim {cfg.pnorm_output_dim}")
    print(f"splice {' '.join(str(s) for s in cfg.splice)}")
    return 0


@tool("nnet-am-init")
def nnet_am_init_tool(argv):
    """Random-initialize an nnet2 p-norm model
    (nnet2bin/nnet-am-init.cc role; topology from flags)."""
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.am.nnet2 import Nnet2Config, Nnet2Model, save_nnet2
    po = ParseOptions("nnet-am-init [opts] <nnet2-out>")
    po.register("feat-dim", int, 0, "input dim (required)")
    po.register("num-pdfs", int, 0, "output dim (required)")
    po.register("num-hidden-layers", int, 3, "p-norm layers")
    po.register("pnorm-input-dim", int, 160, "p-norm group input dim")
    po.register("pnorm-output-dim", int, 32, "p-norm output dim")
    po.register("srand", int, 0, "seed")
    args = po.read(argv)
    if po["feat-dim"] <= 0 or po["num-pdfs"] <= 0:
        raise KaldiError("nnet-am-init: --feat-dim/--num-pdfs required")
    cfg = Nnet2Config(feat_dim=po["feat-dim"],
                      num_pdfs=po["num-pdfs"],
                      num_hidden_layers=po["num-hidden-layers"],
                      pnorm_input_dim=po["pnorm-input-dim"],
                      pnorm_output_dim=po["pnorm-output-dim"])
    model = Nnet2Model(cfg)
    params = model.init(jax.random.PRNGKey(po["srand"]),
                        jnp.zeros((1, 8, cfg.feat_dim)))["params"]
    save_nnet2(args[0], params, cfg)
    return 0


@tool("nnet2-am-copy")
def nnet2_am_copy_tool(argv):
    """Copy an nnet2 model (nnet2bin/nnet-am-copy.cc; 'nnet2-' prefix
    because nnet3's nnet3-am-copy owns the unprefixed role here)."""
    from kaldi_tpu.am.nnet2 import load_nnet2, save_nnet2
    po = ParseOptions("nnet2-am-copy <nnet2-in> <nnet2-out>")
    args = po.read(argv)
    params, cfg = load_nnet2(args[0])
    save_nnet2(args[1], params, cfg)
    return 0


@tool("nnet-am-average")
def nnet_am_average_tool(argv):
    """Average nnet2 models — the parallel-SGD reduce step
    (nnet2bin/nnet-am-average.cc)."""
    import jax
    from kaldi_tpu.am.nnet2 import load_nnet2, save_nnet2
    po = ParseOptions("nnet-am-average <nnet2-out> <nnet2-in1> "
                      "[<nnet2-in2> ...]")
    args = po.read(argv)
    models = [load_nnet2(p) for p in args[1:]]
    cfg = models[0][1]
    avg = jax.tree_util.tree_map(
        lambda *xs: np.mean(np.stack([np.asarray(x) for x in xs]),
                            axis=0),
        *[p for p, _c in models])
    save_nnet2(args[0], avg, cfg)
    log.info("nnet-am-average: %d models", len(models))
    return 0


@tool("nnet-train-simple")
def nnet_train_simple_tool(argv):
    """One SGD pass over feats+ali (nnet2bin/nnet-train-simple.cc —
    the per-job worker the averaging loop fans out)."""
    import jax
    import jax.numpy as jnp
    import optax
    from kaldi_tpu.am.nnet2 import (Nnet2Model, load_nnet2, save_nnet2,
                                    scale_updates_per_layer)
    po = ParseOptions("nnet-train-simple [opts] <nnet2-in> "
                      "<feats-rspec> <pdf-ali-rspec> <nnet2-out>")
    po.register("learning-rate", float, 2e-3, "SGD lr")
    po.register("chunk-size", int, 32, "frames per training chunk")
    args = po.read(argv)
    params, cfg = load_nnet2(args[0])
    model = Nnet2Model(cfg)
    tx = optax.sgd(po["learning-rate"])
    opt = tx.init(params)

    @jax.jit
    def step(p, o, f, t):
        def loss_fn(p):
            logp = model.apply({"params": p}, f)
            return -jnp.mean(jnp.take_along_axis(
                logp, t[..., None], axis=-1))
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        up = scale_updates_per_layer(up, cfg, po["learning-rate"])
        return optax.apply_updates(p, up), o, loss

    ali_r = RandomAccessTableReader(args[2], holder="ivec")
    C = po["chunk-size"]
    n_chunks = 0
    loss = None
    for key, m in SequentialTableReader(args[1], holder="mat"):
        if key not in ali_r:
            continue
        m = np.asarray(m, np.float32)
        a = np.asarray(ali_r[key], np.int32)
        T = min(len(m), len(a))
        for i in range(T // C):
            f = jnp.asarray(m[i * C:(i + 1) * C][None])
            t = jnp.asarray(a[i * C:(i + 1) * C][None])
            params, opt, loss = step(params, opt, f, t)
            n_chunks += 1
    if loss is None:
        raise KaldiError("nnet-train-simple: no training chunks")
    save_nnet2(args[3], params, cfg)
    log.info("nnet-train-simple: %d chunks, final xent %.4f",
             n_chunks, float(loss))
    return 0


@tool("nnet2-compute")
def nnet2_compute_tool(argv):
    """Forward feats through an nnet2 model → log-posteriors
    (nnet2bin/nnet-compute.cc; prefixed, see module docstring)."""
    import jax.numpy as jnp
    from kaldi_tpu.am.nnet2 import Nnet2Model, load_nnet2
    po = ParseOptions("nnet2-compute <nnet2-in> <feats-rspec> "
                      "<mat-wspec>")
    args = po.read(argv)
    params, cfg = load_nnet2(args[0])
    model = Nnet2Model(cfg)
    n = 0
    with TableWriter(args[2], holder="mat") as w:
        for key, feats in SequentialTableReader(args[1], holder="mat"):
            x = jnp.asarray(np.asarray(feats, np.float32))[None]
            w[key] = np.asarray(model.apply({"params": params},
                                            x))[0].astype(np.float32)
            n += 1
    log.info("nnet2-compute: %d utterances", n)
    return 0


@tool("nnet-latgen-faster")
def nnet_latgen_faster_tool(argv):
    """Lattice decoding with nnet2 pseudo-loglikes
    (nnet2bin/nnet-latgen-faster.cc)."""
    from kaldi_tpu.am.nnet2 import Nnet2Model, load_nnet2
    from kaldi_tpu.am.serialize import read_mdl
    import jax.numpy as jnp
    po = ParseOptions("nnet-latgen-faster [opts] <trans-model> "
                      "<nnet2-in> <fst> <feats-rspec> <lattice-wspec>")
    po.register("beam", float, 13.0, "decoding beam")
    po.register("lattice-beam", float, 6.0, "lattice beam")
    po.register("max-active", int, 7000, "max active states")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    params, cfg = load_nnet2(args[1])
    model = Nnet2Model(cfg)
    HCLG = _load_hclg(args[2])
    dec = _LatgenDecoder(HCLG, tm.tid_to_pdf_array, po["beam"],
                         po["lattice-beam"], po["acoustic-scale"],
                         max_active=po["max-active"])
    n = 0
    with TableWriter(args[4], holder="clat") as lw:
        for key, feats in SequentialTableReader(args[3], holder="mat"):
            x = jnp.asarray(np.asarray(feats, np.float32))[None]
            ll = np.asarray(model.apply({"params": params}, x))[0]
            lw[key] = dec.decode_to_clat(ll.astype(np.float32))
            n += 1
    log.info("nnet-latgen-faster: decoded %d utterances", n)
    return 0
