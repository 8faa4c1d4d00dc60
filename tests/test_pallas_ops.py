"""Pallas kernels vs their XLA twins (interpret mode on CPU — the
cu-matrix-test CPU-oracle pattern; real-TPU runs happen in bench)."""

import numpy as np
import pytest

from kaldi_tpu.features.mel import MelBanks, MelBanksOptions
from kaldi_tpu.features.window import FrameExtractionOptions, \
    feature_window_function
from kaldi_tpu.ops.pallas_frontend import PallasFbank, _dft_matrices, fbank_xla
from kaldi_tpu.ops.pallas_gmm import gmm_loglikes_pallas, gmm_loglikes_xla


def test_gmm_loglikes_pallas_matches_xla(rng):
    import jax.numpy as jnp
    P, M, D, T = 37, 6, 39, 100
    gconst = rng.standard_normal((P, M)).astype(np.float32)
    mi = rng.standard_normal((P, M, D)).astype(np.float32)
    iv = (0.5 + rng.random((P, M, D))).astype(np.float32)
    x = rng.standard_normal((T, D)).astype(np.float32)
    ref = np.asarray(gmm_loglikes_xla(jnp.asarray(x), jnp.asarray(gconst),
                                      jnp.asarray(mi), jnp.asarray(iv)))
    got = np.asarray(gmm_loglikes_pallas(x, gconst, mi, iv, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_dft_matmul_equals_fft(rng):
    n_fft = 512
    cosm, sinm = _dft_matrices(n_fft, n_fft // 2 + 1)
    sig = rng.standard_normal((4, n_fft)).astype(np.float32)
    re = sig @ cosm
    im = sig @ sinm
    ref = np.fft.rfft(sig, axis=1)
    np.testing.assert_allclose(re, ref.real, atol=2e-2)
    np.testing.assert_allclose(im, ref.imag, atol=2e-2)


def test_fbank_pallas_matches_xla(rng):
    import jax.numpy as jnp
    fo = FrameExtractionOptions(dither=0.0)
    mo = MelBanksOptions(num_bins=23)
    k = PallasFbank(fo, mo, tile_t=128)
    frames = (rng.standard_normal((50, fo.window_size)) * 10).astype(
        np.float32)
    window = feature_window_function(fo)
    n_fft = fo.padded_window_size
    cosm, sinm = _dft_matrices(n_fft, n_fft // 2 + 1)
    mel = MelBanks(mo, fo).matrix.T
    ref = np.asarray(fbank_xla(
        jnp.asarray(frames), jnp.asarray(window),
        jnp.asarray(cosm[:fo.window_size]), jnp.asarray(sinm[:fo.window_size]),
        jnp.asarray(mel)))
    got = np.asarray(k(jnp.asarray(frames), interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
