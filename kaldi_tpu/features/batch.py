"""Fully-batched on-device feature frontend.

The offline computers in features/compute.py process one utterance per
call with host-side framing.  This module is the production decode/
training path: ONE jitted program takes a whole batch of waveforms
(B, L) resident on device and produces features (B, T, D) — framing is
a device gather, the FFT/mel/DCT pipeline is batched over (B·T) frames,
and deltas/splicing/CMVN fuse behind it.  This is the fusion the
reference implements by hand in src/cudafeat/ (GPU online batched
spectral features); here XLA does the fusing.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_tpu.features.compute import MfccOptions, FbankOptions, _EPS
from kaldi_tpu.features.compute import compute_dct_matrix, compute_lifter_coeffs
from kaldi_tpu.features.functions import DeltaFeaturesOptions, delta_scales
from kaldi_tpu.features.mel import MelBanks
from kaldi_tpu.features.window import feature_window_function, num_frames


class BatchedFrontend:
    """waves (B, L) → features (B, T, D) in one jit; optionally fused
    with per-utterance CMN and deltas."""

    def __init__(self, opts: Optional[MfccOptions] = None,
                 feature_type: str = "mfcc",
                 deltas: Optional[DeltaFeaturesOptions] = None,
                 cmn: bool = False):
        self.feature_type = feature_type
        if opts is None:
            opts = MfccOptions()
        self.opts = opts
        fo = opts.frame_opts
        self.frame_opts = fo
        self._window = np.asarray(feature_window_function(fo), np.float32)
        mel = MelBanks(opts.mel_opts, fo)
        self._mel = np.asarray(mel.matrix.T, np.float32)
        if feature_type == "mfcc":
            self._dct = np.asarray(
                compute_dct_matrix(opts.num_ceps, opts.mel_opts.num_bins).T)
            self._lifter = (np.asarray(compute_lifter_coeffs(
                opts.cepstral_lifter, opts.num_ceps))
                if opts.cepstral_lifter != 0 else None)
            base_dim = opts.num_ceps
        elif feature_type == "fbank":
            base_dim = opts.mel_opts.num_bins
        else:
            raise ValueError(feature_type)
        self.deltas = deltas
        self.cmn = cmn
        self.dim = base_dim * ((deltas.order + 1) if deltas else 1)
        self._jit = jax.jit(self._compute)

    def num_frames(self, num_samples: int) -> int:
        return num_frames(num_samples, self.frame_opts)

    def __call__(self, waves) -> jnp.ndarray:
        """waves: (B, L) float32 (padded; trailing frames of padded zeros
        are computed but harmless — mask downstream by frame count)."""
        return self._jit(jnp.asarray(waves, jnp.float32))

    def _compute(self, waves):
        fo = self.frame_opts
        B, L = waves.shape
        T = num_frames(L, fo)
        shift, size = fo.window_shift, fo.window_size
        idx = (jnp.arange(T)[:, None] * shift
               + jnp.arange(size)[None, :])          # (T, size)
        frames = waves[:, idx]                       # (B, T, size)
        if fo.remove_dc_offset:
            frames = frames - jnp.mean(frames, axis=2, keepdims=True)
        log_energy = jnp.log(jnp.maximum(
            jnp.sum(frames * frames, axis=2), _EPS))
        if fo.preemph_coeff != 0.0:
            shifted = jnp.concatenate([frames[:, :, :1], frames[:, :, :-1]],
                                      axis=2)
            frames = frames - fo.preemph_coeff * shifted
        frames = frames * self._window[None, None, :]
        pad = fo.padded_window_size - size
        if pad:
            frames = jnp.pad(frames, ((0, 0), (0, 0), (0, pad)))
        spec = jnp.fft.rfft(frames, axis=2)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        mel_e = jnp.maximum(power @ self._mel, _EPS)
        if self.feature_type == "fbank":
            feats = jnp.log(mel_e)
        else:
            feats = jnp.log(mel_e) @ self._dct
            if self._lifter is not None:
                feats = feats * self._lifter[None, None, :]
            if self.opts.use_energy:
                feats = feats.at[:, :, 0].set(log_energy)
        if self.cmn:
            feats = feats - jnp.mean(feats, axis=1, keepdims=True)
        if self.deltas is not None:
            feats = _batched_deltas(feats, self.deltas)
        return feats


def _batched_deltas(feats, opts: DeltaFeaturesOptions):
    scales = delta_scales(opts)
    max_off = (len(scales[-1]) - 1) // 2
    T = feats.shape[1]
    padded = jnp.concatenate(
        [jnp.repeat(feats[:, :1], max_off, axis=1), feats,
         jnp.repeat(feats[:, -1:], max_off, axis=1)], axis=1)
    outs = []
    for s in scales:
        off = (len(s) - 1) // 2
        acc = jnp.zeros_like(feats)
        for j, c in enumerate(s):
            if c == 0.0:
                continue
            start = max_off - off + j
            acc = acc + c * jax.lax.dynamic_slice_in_dim(padded, start, T,
                                                         axis=1)
        outs.append(acc)
    return jnp.concatenate(outs, axis=2)


class GmmDecodableProvider:
    """waves → per-pdf loglikes, one fused jit (frontend + GMM einsum).

    The decode-time analogue of the fork's feature+posterior GPU stage in
    BatchedThreadedNnet3CudaPipeline."""

    def __init__(self, frontend: BatchedFrontend, am):
        self.frontend = frontend
        self.am = am
        self._jit = None

    def __call__(self, waves) -> jnp.ndarray:
        gconst, mean_invvar, inv_var = self.am.device_params()
        if self._jit is None:
            fe = self.frontend

            @jax.jit
            def f(w, gc, mi, iv):
                x = fe._compute(w)                    # (B, T, D)
                B, T, D = x.shape
                P, M, _ = mi.shape
                a = mi.reshape(P * M, D)
                b = (-0.5 * iv).reshape(P * M, D)
                quad = x @ a.T + (x * x) @ b.T
                comp = quad.reshape(B, T, P, M) + gc[None, None]
                return jax.scipy.special.logsumexp(comp, axis=3)

            self._jit = f
        return self._jit(jnp.asarray(waves, jnp.float32), gconst,
                         mean_invvar, inv_var)
