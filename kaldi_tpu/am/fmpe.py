"""fMPE: feature-space discriminative training (src/transform/fmpe.{h,cc},
Povey et al., "fMPE: Discriminatively trained features for speech
recognition", ICASSP 2005).

A global 'UBM' GMM turns each frame into a sparse high-dimensional
vector h_t (top-N Gaussian posteriors × per-Gaussian whitened offset
coordinates); a learned projection turns h_t into a small additive
feature offset:

    o_t = Σ_{g ∈ gselect(t)} γ_g(t) · M_gᵀ [1; z_g(t)],
    z_g = (x_t − μ_g) / σ_g,      x'_t = x_t + smooth(o)_t

with a triangular ±context smoothing of the offsets standing in for
the reference's context-expansion configs (a documented
simplification — same role, fixed weights).

Training follows the reference's pos/neg rule (fmpe.cc Update): the
MPE feature-space gradient ∂F/∂x_t = Σ_{jm} γ̃_jm(t) Σ⁻¹_jm (μ_jm − x_t)
(γ̃ = numerator − denominator posteriors, the 'direct differential')
is back-propagated through the smoothing and outer-producted with
h_t; positive and negative parts are accumulated separately and the
update is  M += lr · (pos − neg) / (pos + neg)  elementwise.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

from kaldi_tpu.core.logging import KaldiError, get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class Fmpe:
    ubm: "AmDiagGmm"             # 1-pdf global GMM, G gaussians
    proj: np.ndarray             # (G, D+1, D) per-gaussian projection
    gselect_n: int = 5
    context: int = 1             # offset smoothing half-width

    @property
    def num_gauss(self) -> int:
        return self.proj.shape[0]

    @property
    def dim(self) -> int:
        return self.proj.shape[2]


def fmpe_init(ubm, gselect_n: int = 5, context: int = 1) -> Fmpe:
    """Zero projection: apply() is the identity until training moves
    it (fmpe-init)."""
    if ubm.num_pdfs != 1:
        raise KaldiError("fmpe_init: UBM must be a single-pdf "
                         "(global) GMM")
    G = ubm.num_gauss()
    D = ubm.dim
    return Fmpe(ubm, np.zeros((G, D + 1, D)), gselect_n, context)


def _gselect(fmpe: Fmpe, feats: np.ndarray
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-N UBM components per frame → (idx (T,N), gamma (T,N),
    z (T,N,D))."""
    ubm = fmpe.ubm
    x = np.asarray(feats, np.float64)
    T = len(x)
    mu = ubm.means[0]                       # (G, D)
    var = ubm.vars[0]
    w = np.maximum(ubm.weights[0], 1e-20)
    ll = (np.log(w)
          - 0.5 * (np.log(2 * np.pi * var).sum(axis=1))
          - 0.5 * (((x[:, None, :] - mu) ** 2) / var).sum(axis=2))
    N = min(fmpe.gselect_n, ll.shape[1])
    idx = np.argpartition(-ll, N - 1, axis=1)[:, :N]        # (T, N)
    top = np.take_along_axis(ll, idx, axis=1)
    top -= top.max(axis=1, keepdims=True)
    gamma = np.exp(top)
    gamma /= gamma.sum(axis=1, keepdims=True)
    z = (x[:, None, :] - mu[idx]) / np.sqrt(var[idx])
    return idx, gamma, z


def _smooth_kernel(context: int) -> np.ndarray:
    k = np.arange(-context, context + 1)
    w = 1.0 / (1.0 + np.abs(k))
    return w / w.sum()


def _smooth(o: np.ndarray, context: int) -> np.ndarray:
    if context <= 0:
        return o
    w = _smooth_kernel(context)
    T = len(o)
    out = np.zeros_like(o)
    for j, k in enumerate(range(-context, context + 1)):
        lo, hi = max(0, -k), min(T, T - k)
        out[lo:hi] += w[j] * o[lo + k:hi + k]
    return out


def _smooth_transpose(g: np.ndarray, context: int) -> np.ndarray:
    """Adjoint of _smooth (the kernel is symmetric, but edge clipping
    makes the operator non-symmetric — implement the true transpose)."""
    if context <= 0:
        return g
    w = _smooth_kernel(context)
    T = len(g)
    out = np.zeros_like(g)
    for j, k in enumerate(range(-context, context + 1)):
        lo, hi = max(0, -k), min(T, T - k)
        out[lo + k:hi + k] += w[j] * g[lo:hi]
    return out


def _raw_offsets(fmpe: Fmpe, idx, gamma, z) -> np.ndarray:
    T, N = idx.shape
    D = fmpe.dim
    h = np.concatenate([np.ones((T, N, 1)), z], axis=2)      # (T,N,D+1)
    gh = gamma[:, :, None] * h
    return np.einsum("tnk,tnkd->td", gh, fmpe.proj[idx])


def fmpe_offsets(fmpe: Fmpe, feats: np.ndarray) -> np.ndarray:
    idx, gamma, z = _gselect(fmpe, feats)
    return _smooth(_raw_offsets(fmpe, idx, gamma, z), fmpe.context)


def apply_fmpe(fmpe: Fmpe, feats: np.ndarray) -> np.ndarray:
    """x + offsets (fmpe-apply-transform / gmm-fmpe-acc-stats's
    feature view)."""
    return (np.asarray(feats, np.float64)
            + fmpe_offsets(fmpe, feats)).astype(np.float32)


@dataclasses.dataclass
class FmpeAccs:
    """Positive/negative projection-gradient accumulators
    (FmpeStats)."""
    pos: np.ndarray              # (G, D+1, D)
    neg: np.ndarray

    @staticmethod
    def zeros(G: int, D: int) -> "FmpeAccs":
        return FmpeAccs(np.zeros((G, D + 1, D)), np.zeros((G, D + 1, D)))

    def __add__(self, other: "FmpeAccs") -> "FmpeAccs":
        return FmpeAccs(self.pos + other.pos, self.neg + other.neg)


def accumulate_fmpe(fmpe: Fmpe, am, feats: np.ndarray,
                    diff_post: Sequence[Sequence[Tuple[int, float]]],
                    accs: FmpeAccs) -> None:
    """Accumulate fMPE gradient stats for one utterance
    (gmm-fmpe-acc-stats).  diff_post is per-frame [(pdf, weight)] with
    numerator−denominator (MPE/MMI differenced) weights — positive
    pulls x_t toward that pdf, negative pushes away."""
    x = np.asarray(feats, np.float64)
    T, D = x.shape
    ts, pdfs, ws = [], [], []
    for t, items in enumerate(diff_post):
        for pdf, wgt in items:
            if wgt != 0.0:
                ts.append(t)
                pdfs.append(int(pdf))
                ws.append(float(wgt))
    if not ts:
        return
    t_arr = np.asarray(ts, np.int64)
    pdf_arr = np.asarray(pdfs, np.int32)
    w_arr = np.asarray(ws)
    xe = x[t_arr]
    post = np.asarray(am.component_posteriors(
        xe.astype(np.float32), pdf_arr), np.float64)       # (E, M)
    invv = 1.0 / am.vars[pdf_arr]                           # (E, M, D)
    g = w_arr[:, None] * (post[:, :, None] * invv
                          * (am.means[pdf_arr]
                             - xe[:, None, :])).sum(axis=1)
    grad = np.zeros((T, D))
    np.add.at(grad, t_arr, g)
    grad = _smooth_transpose(grad, fmpe.context)
    idx, gamma, z = _gselect(fmpe, feats)
    h = np.concatenate([np.ones(z.shape[:2] + (1,)), z], axis=2)
    gh = gamma[:, :, None] * h                              # (T,N,D+1)
    # dF/dM_g = Σ_t γ_g h_g ⊗ grad_t, split by sign
    contrib = gh[:, :, :, None] * grad[:, None, None, :]    # (T,N,D+1,D)
    flat_idx = idx.reshape(-1)
    flat = contrib.reshape(-1, *contrib.shape[2:])
    np.add.at(accs.pos, flat_idx, np.maximum(flat, 0.0))
    np.add.at(accs.neg, flat_idx, np.maximum(-flat, 0.0))


def fmpe_update(fmpe: Fmpe, accs: FmpeAccs,
                learning_rate: float = 0.1) -> float:
    """M += lr · (pos − neg)/(pos + neg) (fmpe.cc Update's per-element
    learning-rate normalization).  Returns the mean |ΔM|."""
    denom = accs.pos + accs.neg
    step = np.where(denom > 0,
                    learning_rate * (accs.pos - accs.neg)
                    / np.maximum(denom, 1e-20), 0.0)
    fmpe.proj += step
    return float(np.abs(step).mean())


# -- serialization ----------------------------------------------------------

def write_fmpe(path: str, fmpe: Fmpe) -> None:
    from kaldi_tpu.am.serialize import write_am_diag_gmm, write_pytree
    from kaldi_tpu.core import io as kio
    with kio.open_wxfilename(path) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<Fmpe>")
        kio.write_basic_int32(f, fmpe.gselect_n)
        kio.write_basic_int32(f, fmpe.context)
        write_am_diag_gmm(f, fmpe.ubm)
        write_pytree(f, {"proj": fmpe.proj})
        kio.write_token(f, "</Fmpe>")


def read_fmpe(path: str) -> Fmpe:
    from kaldi_tpu.am.serialize import read_am_diag_gmm, read_pytree
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(path) as f:
        kio.init_kaldi_input_stream(f)
        kio.expect_token(f, "<Fmpe>")
        gselect_n = kio.read_basic_int32(f)
        context = kio.read_basic_int32(f)
        ubm = read_am_diag_gmm(f)
        d = read_pytree(f)
        kio.expect_token(f, "</Fmpe>")
    return Fmpe(ubm, np.asarray(d["proj"], np.float64), gselect_n,
                context)
