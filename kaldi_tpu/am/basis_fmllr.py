"""Basis fMLLR: constrained MLLR restricted to a low-dimensional basis,
so speakers with seconds of data still adapt robustly.

Parity target: src/transform/basis-fmllr-diag-gmm.h
(BasisFmllrAccus/BasisFmllrEstimate, gmmbin/gmm-basis-fmllr-accs.cc,
gmm-basis-fmllr-training.cc, gmm-est-basis-fmllr.cc; Povey & Yao 2012,
"A basis representation of constrained MLLR transforms").

Design: training accumulates the scatter of per-utterance fMLLR
gradients at the identity transform, preconditioned row-wise by the
expected second-order statistics (Cholesky of G_i/β — a documented
simplification of the reference's model-derived preconditioner); the
basis is the top eigenvectors of that scatter.  Estimation maximizes
the exact fMLLR auxiliary function over basis coefficients by steepest
ascent with backtracking line search, using n = min(⌊η β⌋, N) bases so
the capacity grows with the amount of speaker data.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.am.transforms import FmllrAccs

log = get_logger(__name__)


def _identity_w(D: int) -> np.ndarray:
    return np.concatenate([np.eye(D), np.zeros((D, 1))], axis=1)


def fmllr_objf(accs: FmllrAccs, W: np.ndarray) -> float:
    """β log|A| + Σ_i W_i K_i − ½ W_i G_i W_iᵀ (the exact per-speaker
    fMLLR auxiliary function; fmllr-diag-gmm.cc)."""
    D = accs.K.shape[0]
    sign, logdet = np.linalg.slogdet(W[:, :D])
    if sign <= 0:
        return -np.inf
    val = accs.beta * logdet
    for i in range(D):
        val += W[i] @ accs.K[i] - 0.5 * W[i] @ accs.G[i] @ W[i]
    return float(val)


def fmllr_grad(accs: FmllrAccs, W: np.ndarray) -> np.ndarray:
    """∂F/∂W = β [A⁻ᵀ, 0] + K − (G_i W_i) rows."""
    D = accs.K.shape[0]
    grad = np.zeros_like(W)
    ainv_t = np.linalg.inv(W[:, :D]).T
    grad[:, :D] = accs.beta * ainv_t
    for i in range(D):
        grad[i] += accs.K[i] - accs.G[i] @ W[i]
    return grad


class GradientScatter:
    """Accumulated scatter of preconditioned per-utterance gradients
    (BasisFmllrAccus role)."""

    def __init__(self, dim: int):
        self.dim = dim
        self.scatter = np.zeros((dim * (dim + 1), dim * (dim + 1)))
        self.precond = np.zeros((dim, dim + 1, dim + 1))
        self.beta = 0.0
        self.count = 0

    def accumulate(self, accs: FmllrAccs) -> None:
        if accs.beta <= 0:
            return
        D = self.dim
        grad = fmllr_grad(accs, _identity_w(D)) / math.sqrt(accs.beta)
        self.scatter += np.outer(grad.ravel(), grad.ravel())
        self.precond += accs.G / max(accs.beta, 1e-10)
        self.beta += accs.beta
        self.count += 1


class BasisFmllr:
    """An ordered orthonormal basis of (D, D+1) transform directions."""

    def __init__(self, bases: np.ndarray):
        self.bases = np.asarray(bases, np.float64)   # (N, D, D+1)

    @property
    def num_bases(self) -> int:
        return self.bases.shape[0]

    @property
    def dim(self) -> int:
        return self.bases.shape[1]


def train_basis(scatter: GradientScatter,
                num_bases: Optional[int] = None) -> BasisFmllr:
    """Top eigenvectors of the row-preconditioned gradient scatter
    (gmm-basis-fmllr-training)."""
    D = scatter.dim
    if scatter.count == 0:
        raise KaldiError("train_basis: empty scatter")
    # Row-wise preconditioner: C_i = chol(E[G_i]/β + floor); whiten each
    # gradient row by C_i⁻¹ so high-count feature dims don't dominate.
    Ls = []
    for i in range(D):
        g = scatter.precond[i] / scatter.count
        g += np.eye(D + 1) * (1e-4 * np.trace(g) / (D + 1) + 1e-8)
        Ls.append(np.linalg.cholesky(g))
    # Whitened scatter: S̃ = P⁻¹ S P⁻ᵀ with P = blockdiag(L_i)
    n = D * (D + 1)
    S = scatter.scatter.reshape(D, D + 1, D, D + 1)
    St = np.zeros_like(S)
    for i in range(D):
        li = np.linalg.inv(Ls[i])
        for j in range(D):
            lj = np.linalg.inv(Ls[j])
            St[i, :, j, :] = li @ S[i, :, j, :] @ lj.T
    vals, vecs = np.linalg.eigh(St.reshape(n, n))
    order = np.argsort(vals)[::-1]
    N = num_bases if num_bases is not None else min(n, D * (D + 1))
    bases = np.zeros((N, D, D + 1))
    for b in range(N):
        v = vecs[:, order[b]].reshape(D, D + 1)
        # un-whiten: W_b rows = L_i⁻ᵀ v_i (so coefficients live in the
        # whitened space where the scatter is diagonal)
        for i in range(D):
            bases[b, i] = np.linalg.inv(Ls[i]).T @ v[i]
        bases[b] /= np.linalg.norm(bases[b])
    log.info("train_basis: %d bases from %d utterances "
             "(top eigenvalues %s)", N, scatter.count,
             np.round(vals[order[:4]], 3))
    return BasisFmllr(bases)


def estimate_basis_fmllr(accs: FmllrAccs, basis: BasisFmllr,
                         size_scale: float = 0.2,
                         num_iters: int = 10
                         ) -> Tuple[np.ndarray, float, int]:
    """Maximize the fMLLR auxiliary over W = I + Σ_b d_b W_b using
    n = min(⌊size_scale·β⌋, N) bases (gmm-est-basis-fmllr).
    → (W (D, D+1), objf improvement per frame, #bases used)."""
    D = basis.dim
    W0 = _identity_w(D)
    n = min(int(size_scale * accs.beta), basis.num_bases)
    if n <= 0 or accs.beta <= 0:
        return W0, 0.0, 0
    B = basis.bases[:n]                       # (n, D, D+1)
    d = np.zeros(n)

    def compose(d):
        return W0 + np.tensordot(d, B, axes=1)

    f0 = fmllr_objf(accs, W0)
    f = f0
    for _ in range(num_iters):
        W = compose(d)
        grad = fmllr_grad(accs, W)
        g = np.tensordot(B, grad, axes=([1, 2], [0, 1]))   # (n,)
        gnorm = np.linalg.norm(g)
        if gnorm < 1e-10 * max(accs.beta, 1.0):
            break
        step = 1.0 / max(accs.beta, 1.0)
        improved = False
        for _bt in range(20):
            nd = d + step * g
            nf = fmllr_objf(accs, compose(nd))
            if nf > f:
                d, f = nd, nf
                improved = True
                break
            step *= 0.5
        if not improved:
            break
    impr = (f - f0) / accs.beta
    return compose(d), float(impr), n


# ----------------------------------------------------------------------
# Serialization.

def write_basis(f, basis: BasisFmllr) -> None:
    from kaldi_tpu.core import io as kio
    kio.write_token(f, "<BasisFmllr>")
    kio.write_basic_int32(f, basis.num_bases)
    for b in range(basis.num_bases):
        kio.write_matrix(f, basis.bases[b].astype(np.float32))
    kio.write_token(f, "</BasisFmllr>")


def read_basis(f) -> BasisFmllr:
    from kaldi_tpu.core import io as kio
    kio.expect_token(f, "<BasisFmllr>")
    N = kio.read_basic_int32(f)
    mats = [np.asarray(kio.read_matrix(f), np.float64) for _ in range(N)]
    kio.expect_token(f, "</BasisFmllr>")
    return BasisFmllr(np.stack(mats))


def write_fmllr_accs(f, accs: FmllrAccs) -> None:
    from kaldi_tpu.core import io as kio
    kio.write_token(f, "<FmllrAccs>")
    kio.write_basic_float(f, accs.beta)
    kio.write_matrix(f, accs.K.astype(np.float64), dtype="float64")
    D = accs.K.shape[0]
    kio.write_basic_int32(f, D)
    for i in range(D):
        kio.write_matrix(f, accs.G[i].astype(np.float64), dtype="float64")
    kio.write_token(f, "</FmllrAccs>")


def read_fmllr_accs(f) -> FmllrAccs:
    from kaldi_tpu.core import io as kio
    kio.expect_token(f, "<FmllrAccs>")
    beta = kio.read_basic_float(f)
    K = np.asarray(kio.read_matrix(f), np.float64)
    D = kio.read_basic_int32(f)
    accs = FmllrAccs(D)
    accs.beta = beta
    accs.K = K
    accs.G = np.stack([np.asarray(kio.read_matrix(f), np.float64)
                       for _ in range(D)])
    kio.expect_token(f, "</FmllrAccs>")
    return accs


def write_scatter(f, sc: GradientScatter) -> None:
    from kaldi_tpu.core import io as kio
    kio.write_token(f, "<FmllrGradScatter>")
    kio.write_basic_int32(f, sc.dim)
    kio.write_basic_int32(f, sc.count)
    kio.write_basic_float(f, sc.beta)
    kio.write_matrix(f, sc.scatter.astype(np.float64), dtype="float64")
    for i in range(sc.dim):
        kio.write_matrix(f, sc.precond[i].astype(np.float64),
                         dtype="float64")
    kio.write_token(f, "</FmllrGradScatter>")


def read_scatter(f) -> GradientScatter:
    from kaldi_tpu.core import io as kio
    kio.expect_token(f, "<FmllrGradScatter>")
    dim = kio.read_basic_int32(f)
    sc = GradientScatter(dim)
    sc.count = kio.read_basic_int32(f)
    sc.beta = kio.read_basic_float(f)
    sc.scatter = np.asarray(kio.read_matrix(f), np.float64)
    sc.precond = np.stack([np.asarray(kio.read_matrix(f), np.float64)
                           for _ in range(dim)])
    kio.expect_token(f, "</FmllrGradScatter>")
    return sc
