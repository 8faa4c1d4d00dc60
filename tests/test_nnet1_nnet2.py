"""nnet1 (RBM pretraining + sigmoid DNN) and nnet2 (p-norm + parallel
SGD with model averaging) — the legacy NN framework roles."""

import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_tpu.am.nnet1 import (SigmoidDnn, dnn_params_from_dbn,
                                finetune_xent, pretrain_dbn)
from kaldi_tpu.am.nnet2 import (Nnet2Config, Nnet2Model, normalize_rms,
                                pnorm, train_parallel_averaging)


def _frame_data(rng, n_per_class=300, D=10):
    """Two well-separated Gaussian classes of frames."""
    mus = [rng.standard_normal(D), rng.standard_normal(D) + 3.0]
    frames = np.concatenate([
        mus[c] + 0.3 * rng.standard_normal((n_per_class, D))
        for c in range(2)]).astype(np.float32)
    targets = np.repeat(np.arange(2), n_per_class).astype(np.int32)
    order = rng.permutation(len(frames))
    return frames[order], targets[order]


# ---------------------------------------------------------------------------
# nnet2
# ---------------------------------------------------------------------------

def test_pnorm_oracle():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 12))
    y = np.asarray(pnorm(x, 4))           # groups of 3
    ref = np.asarray([np.linalg.norm(np.arange(12)[3 * i: 3 * i + 3])
                      for i in range(4)])
    np.testing.assert_allclose(y[0], ref, atol=1e-5)
    with pytest.raises(ValueError):
        pnorm(x, 5)


def test_normalize_rms():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 7)), jnp.float32)
    y = np.asarray(normalize_rms(x))
    rms = np.sqrt((y ** 2).mean(axis=-1))
    np.testing.assert_allclose(rms, 1.0, atol=1e-5)


def test_nnet2_parallel_averaging_learns():
    rng = np.random.default_rng(1)
    frames, targets = _frame_data(rng, n_per_class=160, D=8)
    # chunks of T=4 frames
    feats = frames.reshape(-1, 4, 8)
    tgt = targets.reshape(-1, 4)
    cfg = Nnet2Config(feat_dim=8, num_pdfs=2, num_hidden_layers=2,
                      pnorm_input_dim=40, pnorm_output_dim=8,
                      splice=(-1, 0, 1))
    params, diag = train_parallel_averaging(
        cfg, feats, tgt, num_jobs=4, num_iters=25, learning_rate=0.5)
    assert diag["xent"] < 0.3              # near-separable task
    # averaged model classifies
    model = Nnet2Model(cfg)
    logp = np.asarray(model.apply({"params": params},
                                  jnp.asarray(feats)))
    acc = (logp.argmax(-1) == tgt).mean()
    assert acc > 0.9


# ---------------------------------------------------------------------------
# nnet1
# ---------------------------------------------------------------------------

def test_rbm_pretraining_reduces_reconstruction_error():
    rng = np.random.default_rng(2)
    frames, _ = _frame_data(rng, n_per_class=250, D=12)
    from kaldi_tpu.am.nnet1 import train_rbm
    _, errs = train_rbm(frames, hid_dim=16, num_epochs=5,
                        gaussian_visible=True, seed=0)
    assert errs[-1] < errs[0] * 0.9


def test_dbn_pretrain_then_finetune():
    rng = np.random.default_rng(3)
    frames, targets = _frame_data(rng, n_per_class=250, D=10)
    hid = (24, 24)
    rbms = pretrain_dbn(frames, hid, num_epochs=3, seed=1)
    assert [r.W.shape for r in rbms] == [(10, 24), (24, 24)]
    assert rbms[0].gaussian_visible and not rbms[1].gaussian_visible
    params = dnn_params_from_dbn(rbms, num_pdfs=2)
    params, xent = finetune_xent(params, hid, 2, frames, targets,
                                 num_epochs=10, batch_size=64, lr=1.0)
    assert xent < 0.2
    model = SigmoidDnn(hid, 2)
    logp = np.asarray(model.apply(
        {"params": params}, jnp.asarray(frames[:, None, :])))[:, 0]
    assert (logp.argmax(-1) == targets).mean() > 0.95
