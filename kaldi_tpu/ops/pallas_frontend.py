"""Fused feature-frontend Pallas kernel: window → DFT → power → mel → log.

Parity target: the fork-descendant's src/cudafeat/ GPU spectral
features; the BASELINE north star names 'fbank/MFCC feature extraction
(framing, STFT, mel filterbank) as fused Pallas kernels'.

TPU trick: for the 256–512-point windows of speech frontends the DFT is
cheapest as TWO MXU MATMULS against precomputed cos/sin matrices —
power[t, k] = (frames·C)² + (frames·S)² — which fuses with the window
multiply, the mel projection (another matmul), and the log, all in one
VMEM-resident kernel per frame tile.  No XLA FFT, no intermediate HBM
traffic.

The kernel consumes pre-gathered frames (B·T, window) — framing itself
is a strided gather the XLA side does for free while building the
batch.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kaldi_tpu.features.mel import MelBanks, MelBanksOptions
from kaldi_tpu.features.window import FrameExtractionOptions, \
    feature_window_function

_EPS = 1.1754944e-38


def _dft_matrices(n_fft: int, n_bins: int) -> tuple:
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_bins)[None, :]
    ang = -2.0 * math.pi * k * f / n_fft
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def fbank_xla(frames, window, cosm, sinm, mel, logfloor=_EPS):
    """Oracle: same math composed in XLA."""
    fw = frames * window[None, :]
    re = fw @ cosm
    im = fw @ sinm
    power = re * re + im * im
    return jnp.log(jnp.maximum(power @ mel, logfloor))


def _kernel(frames_ref, window_ref, cos_ref, sin_ref, mel_ref, out_ref):
    fw = frames_ref[:] * window_ref[:]
    re = jnp.dot(fw, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(fw, sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel_e = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(jnp.maximum(mel_e, _EPS))


class PallasFbank:
    """Precomputes the constant matrices; __call__ takes raw frames
    (N, window_size) (pre-windowing: DC removal/pre-emphasis are cheap
    elementwise ops left to XLA so they fuse into the framing gather)."""

    def __init__(self, frame_opts: FrameExtractionOptions = None,
                 mel_opts: MelBanksOptions = None, tile_t: int = 256):
        fo = frame_opts or FrameExtractionOptions()
        mo = mel_opts or MelBanksOptions()
        self.frame_opts = fo
        n_fft = fo.padded_window_size
        n_bins_full = n_fft // 2 + 1
        self.win_size = fo.window_size
        self.tile_t = tile_t
        # pad spectral bins and mel bins to lanes
        self.n_bins = ((n_bins_full + 127) // 128) * 128
        mel = MelBanks(mo, fo).matrix.T                  # (bins_full, n_mel)
        self.n_mel = mel.shape[1]
        self.n_mel_pad = ((self.n_mel + 127) // 128) * 128
        mel_pad = np.zeros((self.n_bins, self.n_mel_pad), np.float32)
        mel_pad[:n_bins_full, :self.n_mel] = mel
        self.win_pad = ((self.win_size + 127) // 128) * 128
        cosm, sinm = _dft_matrices(n_fft, n_bins_full)
        cos_pad = np.zeros((self.win_pad, self.n_bins), np.float32)
        sin_pad = np.zeros((self.win_pad, self.n_bins), np.float32)
        cos_pad[:self.win_size, :n_bins_full] = cosm[:self.win_size]
        sin_pad[:self.win_size, :n_bins_full] = sinm[:self.win_size]
        wfun = np.zeros((1, self.win_pad), np.float32)
        wfun[0, :self.win_size] = feature_window_function(fo)
        self._cos = jnp.asarray(cos_pad)
        self._sin = jnp.asarray(sin_pad)
        self._mel = jnp.asarray(mel_pad)
        self._window = jnp.asarray(wfun)

    def __call__(self, frames, interpret: bool = False):
        """frames: (N, window_size) already DC-removed/pre-emphasized."""
        N = frames.shape[0]
        N_pad = ((N + self.tile_t - 1) // self.tile_t) * self.tile_t
        fp = jnp.zeros((N_pad, self.win_pad), jnp.float32)
        fp = fp.at[:N, :self.win_size].set(frames)
        grid = (N_pad // self.tile_t,)
        out = pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((N_pad, self.n_mel_pad),
                                           jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((self.tile_t, self.win_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, self.win_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.win_pad, self.n_bins), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.win_pad, self.n_bins), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((self.n_bins, self.n_mel_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((self.tile_t, self.n_mel_pad),
                                   lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(fp, self._window, self._cos, self._sin, self._mel)
        return out[:N, :self.n_mel]


def fbank_pallas(frames, frame_opts=None, mel_opts=None, interpret=False):
    return PallasFbank(frame_opts, mel_opts)(frames, interpret=interpret)
