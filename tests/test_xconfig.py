"""xconfig network-configuration language (am/xconfig.py) — parsing,
descriptor semantics, layer zoo forward shapes, and training-readiness
(gradients flow through a parsed model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_tpu.am.xconfig import (model_from_xconfig, parse_xconfig,
                                  _parse_descriptor)
from kaldi_tpu.core.logging import KaldiError

CHAIN_XCONFIG = """
# librispeech 1d-style factored TDNN (trimmed)
input name=input dim=40
relu-batchnorm-layer name=tdnn1 input=Append(-1,0,1) dim=64
tdnnf-layer name=tdnnf2 dim=64 bottleneck-dim=16 time-stride=1
tdnnf-layer name=tdnnf3 dim=64 bottleneck-dim=16 time-stride=3
relu-batchnorm-layer name=prefinal-chain dim=64
output-layer name=output dim=50 include-log-softmax=false
output-layer name=output-xent input=prefinal-chain dim=50
"""


def test_parse_descriptor_forms():
    assert _parse_descriptor("tdnn1") == (("tdnn1", 0),)
    assert _parse_descriptor("-3") == (("", -3),)
    assert _parse_descriptor("Offset(tdnn1, -3)") == (("tdnn1", -3),)
    assert _parse_descriptor("Append(-1,0,1)") == \
        (("", -1), ("", 0), ("", 1))
    assert _parse_descriptor("Append(Offset(a,-1), b, 2)") == \
        (("a", -1), ("b", 0), ("", 2))
    with pytest.raises(KaldiError):
        _parse_descriptor("Sum(a, b)")


def test_parse_validation():
    with pytest.raises(KaldiError):   # undefined reference
        parse_xconfig("input name=input dim=4\n"
                      "relu-batchnorm-layer name=a input=zzz dim=8\n"
                      "output-layer name=output dim=4")
    with pytest.raises(KaldiError):   # duplicate name
        parse_xconfig("input name=input dim=4\n"
                      "relu-batchnorm-layer name=a dim=8\n"
                      "relu-batchnorm-layer name=a dim=8\n"
                      "output-layer name=output dim=4")
    with pytest.raises(KaldiError):   # no output
        parse_xconfig("input name=input dim=4\n"
                      "relu-batchnorm-layer name=a dim=8")
    with pytest.raises(KaldiError):   # input not first
        parse_xconfig("relu-batchnorm-layer name=a dim=8\n"
                      "output-layer name=output dim=4")


def test_chain_model_shapes_and_grads():
    model, in_dim, out_dims = model_from_xconfig(
        CHAIN_XCONFIG, frame_subsampling_factor=3)
    assert in_dim == 40 and out_dims == {"output": 50, "output-xent": 50}
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 30, 40)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert outs["output"].shape == (2, 10, 50)       # ×3 subsampled
    assert outs["output-xent"].shape == (2, 10, 50)
    # xent head is log-softmax (rows sum to 1 in prob space)
    assert np.exp(np.asarray(outs["output-xent"][0, 0])).sum() == \
        pytest.approx(1.0, abs=1e-3)

    def loss(params):
        o, _ = model.apply({"params": params,
                            "batch_stats": variables["batch_stats"]}, x,
                           train=True, mutable=["batch_stats"])
        return jnp.sum(o["output"] ** 2)

    # the output affine is zero-init (reference output-layer default
    # param-stddev=0), which makes sum(output^2) gradients identically
    # zero — plant a nonzero kernel so gradients flow end to end
    params = jax.tree_util.tree_map(lambda v: v, variables["params"])
    params["output.affine"] = {
        "kernel": jnp.full_like(
            variables["params"]["output.affine"]["kernel"], 0.01),
        "bias": variables["params"]["output.affine"]["bias"]}
    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_descriptor_append_equals_manual_splice():
    """Append(-1,0,1) into a relu layer == manual edge-clamped splice
    through the same kernel (probed via capture_intermediates)."""
    text = ("input name=input dim=4\n"
            "relu-batchnorm-layer name=a input=Append(-1,0,1) dim=8\n"
            "output-layer name=output input=a dim=8 "
            "include-log-softmax=false\n")
    model, _, _ = model_from_xconfig(text)
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((1, 7, 4)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    _, state = model.apply(variables, x, capture_intermediates=True,
                           mutable=["intermediates"])
    dense_out = np.asarray(
        state["intermediates"]["a.affine"]["__call__"][0])
    kern = np.asarray(variables["params"]["a.affine"]["kernel"])
    bias = np.asarray(variables["params"]["a.affine"]["bias"])
    xs = np.asarray(x[0])
    idx = np.arange(7)
    spliced = np.concatenate(
        [xs[np.clip(idx + o, 0, 6)] for o in (-1, 0, 1)], axis=-1)
    assert np.allclose(dense_out[0], spliced @ kern + bias, atol=1e-4)


def test_lstm_attention_stats_layers():
    text = ("input name=input dim=6\n"
            "fast-lstmp-layer name=lstm1 cell-dim=16 "
            "recurrent-projection-dim=8\n"
            "attention-relu-batchnorm-layer name=att1 dim=8 num-heads=2 "
            "num-left-inputs=3 num-right-inputs=3\n"
            "stats-layer name=stats1 config=mean+stddev(-4:1:1:4)\n"
            "output-layer name=output dim=5\n")
    model, _, _ = model_from_xconfig(text)
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((2, 12, 6)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x)
    outs = model.apply(variables, x)
    assert outs["output"].shape == (2, 12, 5)
    # stats-layer doubles the width (mean+stddev) before the output
    kernel = variables["params"]["output.affine"]["kernel"]
    assert kernel.shape[0] == 16     # 8-dim attention -> mean+stddev


def test_xconfig_chain_training():
    """chain_model_from_xconfig plugs into ChainTrainer (the recipe's
    xconfig path): training on tiny synthetic egs learns (objf up) and
    the semi-orthogonal penalty sees the tdnnf factors."""
    from kaldi_tpu.am.chain import make_denominator_graph
    from kaldi_tpu.am.topology import HmmTopology
    from kaldi_tpu.am.tree import MonophoneContextDependency
    from kaldi_tpu.am.xconfig import chain_model_from_xconfig
    from kaldi_tpu.pipelines.chain import (ChainTrainConfig, ChainTrainer,
                                           make_chain_egs)
    rng = np.random.default_rng(7)
    phones = [1, 2]
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    den = make_denominator_graph([[1, 2, 1], [2, 1, 2]], tree, topo)
    runs = {"u0": [(1, 12), (2, 12), (1, 12)],
            "u1": [(2, 12), (1, 12), (2, 12)]}
    D = 6
    proto = {1: rng.standard_normal(D), 2: rng.standard_normal(D)}
    feats = {u: np.asarray(
        [proto[ph] + 0.1 * rng.standard_normal(D)
         for ph, dur in rr for _ in range(dur)], np.float32)
        for u, rr in runs.items()}
    egs = make_chain_egs(feats, runs, tree, topo, chunk_size=18,
                         subsample=3)
    model = chain_model_from_xconfig(f"""
input name=input dim={D}
relu-batchnorm-layer name=tdnn1 input=Append(-1,0,1) dim=16
tdnnf-layer name=tdnnf2 dim=16 bottleneck-dim=8 time-stride=1
output-layer name=output dim={tree.num_pdfs} include-log-softmax=false
""", frame_subsampling_factor=3)
    assert model.feat_dim == D
    tr = ChainTrainer(model, den, ChainTrainConfig(
        num_epochs=30, batch_size=4, learning_rate=5e-3))
    out = tr.train(egs, log_every=1000)
    assert np.isfinite(out["loss"])
    assert out["objf"] > -5.0
    with pytest.raises(KaldiError):   # chain head must be unnormalized
        chain_model_from_xconfig(
            f"input name=input dim={D}\n"
            f"output-layer name=output dim={tree.num_pdfs}\n")


def test_stats_layer_windowed_moments():
    """stats-layer == host-side windowed mean/stddev, checked by
    forcing the (zero-init) output kernel to identity so the model's
    output IS the stats tensor."""
    model, _, _ = model_from_xconfig(
        "input name=input dim=3\n"
        "stats-layer name=s config=mean+stddev(-2:1:1:2)\n"
        "output-layer name=output dim=6 include-log-softmax=false\n")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 9, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    p2 = jax.tree_util.tree_map(lambda v: v, dict(variables["params"]))
    p2["output.affine"] = {
        "kernel": jnp.eye(6, dtype=jnp.float32),
        "bias": jnp.zeros(6, jnp.float32)}
    out = model.apply({"params": p2}, x)["output"]
    xs = np.asarray(x[0])
    T = xs.shape[0]
    expect = []
    for t in range(T):
        lo, hi = max(0, t - 2), min(T - 1, t + 2)
        win = xs[lo:hi + 1]
        m = win.mean(axis=0)
        sd = np.sqrt(np.maximum(win.var(axis=0), 1e-6))
        expect.append(np.concatenate([m, sd]))
    assert np.allclose(np.asarray(out[0]), np.stack(expect), atol=1e-4)
