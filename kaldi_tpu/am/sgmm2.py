"""Subspace GMM acoustic model (SGMM2).

Parity target: src/sgmm2/ (AmSgmm2, am-sgmm2.h; Povey et al. 2011,
"The subspace Gaussian mixture model").  The model shares a UBM-sized
set of I full-covariance-role Gaussians across ALL tied states; each
state j owns only a low-dimensional vector v_j ∈ R^S from which its
per-Gaussian means and mixture weights are expanded:

    μ_ji = M_i v_j            (M_i ∈ R^{D×S}, shared)
    w_ji = softmax_i(w_i·v_j) (w_i ∈ R^S, shared)
    p(x|j) = Σ_i w_ji N(x; μ_ji, Σ_i)   (Σ_i shared, diagonal here)

TPU-first shape: everything is batched einsums —
- all state means at once: μ = einsum('isd,js->jid', M, V)
- per-frame loglikes over ALL (j, i): one (T,I,D)×(J,I,D) contraction
  via the quadratic expansion, so scoring is two matmuls + logsumexp
  like the diag-GMM path (am/gmm.py), no per-state loops.
- EM statistics: posteriors-weighted einsums accumulated on device.

Simplifications vs the reference, by design (documented contract):
diagonal Σ_i (the reference supports full); one substate per state
(substate splitting is the reference's mixup analogue); the weight
vectors w_i are updated by the reference's quadratic-bound gradient
step rather than repeated Newton refinement; no speaker subspace
(N_i u_s) — speaker adaptation in this framework is fMLLR
(am/transforms.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_tpu.core.logging import KaldiError, get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class Sgmm2:
    """Parameters.  J states, I shared Gaussians, D feats, S subspace."""
    M: np.ndarray          # (I, D, S) subspace projections
    w: np.ndarray          # (I, S) weight projections
    var: np.ndarray        # (I, D) shared diagonal covariances
    V: np.ndarray          # (J, S) state vectors

    @property
    def num_pdfs(self) -> int:
        return self.V.shape[0]

    @property
    def dim(self) -> int:
        return self.M.shape[1]

    # -- expansion ---------------------------------------------------------
    def means(self) -> np.ndarray:
        """(J, I, D) expanded means."""
        return np.einsum("ids,js->jid", self.M, self.V)

    def log_weights(self) -> np.ndarray:
        """(J, I) log w_ji."""
        logits = self.V @ self.w.T                     # (J, I)
        return logits - jax.nn.logsumexp(
            jnp.asarray(logits), axis=1, keepdims=True)

    def loglikes(self, feats: np.ndarray) -> jnp.ndarray:
        """(T, D) → (T, J) log p(x_t | j): quadratic expansion keeps it
        two matmuls + logsumexp (MXU-shaped, like am/gmm.py)."""
        x = jnp.asarray(feats, jnp.float32)            # (T, D)
        mu = jnp.asarray(self.means(), jnp.float32)    # (J, I, D)
        var = jnp.asarray(self.var, jnp.float32)       # (I, D)
        logw = jnp.asarray(np.asarray(self.log_weights()), jnp.float32)
        inv = 1.0 / var
        gconst = -0.5 * (self.dim * jnp.log(2 * jnp.pi)
                         + jnp.sum(jnp.log(var), axis=1))     # (I,)
        # log N = gconst - ½(x²·inv) + x·(μ∘inv) - ½(μ²·inv)
        xq = -0.5 * (x ** 2) @ inv.T                   # (T, I)
        xl = jnp.einsum("td,jid->tji", x, mu * inv[None])
        mq = -0.5 * jnp.sum(mu * mu * inv[None], axis=2)      # (J, I)
        comp = (xq[:, None, :] + xl + mq[None] + gconst[None, None]
                + logw[None])                          # (T, J, I)
        return jax.nn.logsumexp(comp, axis=2)


@dataclasses.dataclass
class Sgmm2Accs:
    """EM sufficient statistics (MleAmSgmm2Accs role)."""
    gamma: np.ndarray      # (J, I) posteriors mass
    y: np.ndarray          # (J, I, D) Σ γ·x  (first-order, per j,i)
    S: np.ndarray          # (I, D) Σ γ·x²   (for Σ_i update)
    tot_like: float = 0.0
    tot_frames: float = 0.0


def init_sgmm(num_pdfs: int, dim: int, num_gauss: int, subspace: int,
              glob_mean: np.ndarray, glob_var: np.ndarray,
              seed: int = 0) -> Sgmm2:
    """sgmm2-init role: M_i's first column carries a perturbed global
    mean (so v = e1 reproduces a flat start), the rest small noise;
    v_j = e1 + noise so states start near the global model."""
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((num_gauss, dim, subspace)).astype(
        np.float64) * 0.1
    M[:, :, 0] = glob_mean[None] + rng.standard_normal(
        (num_gauss, dim)) * np.sqrt(glob_var)[None]
    w = rng.standard_normal((num_gauss, subspace)) * 0.1
    V = np.zeros((num_pdfs, subspace))
    V[:, 0] = 1.0
    V += rng.standard_normal(V.shape) * 0.01
    var = np.tile(glob_var[None], (num_gauss, 1))
    return Sgmm2(M=M, w=w, var=var, V=V)


def accumulate(model: Sgmm2, feats: np.ndarray, pdf_ali: np.ndarray
               ) -> Sgmm2Accs:
    """E-step with fixed state alignments (gmm-acc-stats-ali shape):
    per frame t aligned to state j_t, posteriors over the shared
    Gaussians γ_i(t) ∝ w_{j_t,i} N(x_t; μ_{j_t,i}, Σ_i)."""
    x = jnp.asarray(feats, jnp.float32)
    j = jnp.asarray(pdf_ali, jnp.int32)
    mu = jnp.asarray(model.means(), jnp.float32)[j]     # (T, I, D)
    var = jnp.asarray(model.var, jnp.float32)
    logw = jnp.asarray(np.asarray(model.log_weights()),
                       jnp.float32)[j]                  # (T, I)
    inv = 1.0 / var
    gconst = -0.5 * (model.dim * jnp.log(2 * jnp.pi)
                     + jnp.sum(jnp.log(var), axis=1))
    diff = x[:, None, :] - mu
    logn = gconst[None] - 0.5 * jnp.sum(diff * diff * inv[None],
                                        axis=2)         # (T, I)
    comp = logn + logw
    norm = jax.nn.logsumexp(comp, axis=1, keepdims=True)
    post = jnp.exp(comp - norm)                         # (T, I)
    J, I, D = model.num_pdfs, model.M.shape[0], model.dim
    gamma = jax.ops.segment_sum(post, j, num_segments=J)        # (J, I)
    y = jax.ops.segment_sum(post[:, :, None] * x[:, None, :], j,
                            num_segments=J)             # (J, I, D)
    S = jnp.einsum("ti,td->id", post, x * x)            # (I, D)
    return Sgmm2Accs(gamma=np.asarray(gamma, np.float64),
                     y=np.asarray(y, np.float64),
                     S=np.asarray(S, np.float64),
                     tot_like=float(jnp.sum(norm)),
                     tot_frames=float(x.shape[0]))


def update(model: Sgmm2, accs: Sgmm2Accs, min_var: float = 1e-3,
           w_step: float = 1.0) -> Sgmm2:
    """M-step (MleAmSgmm2Updater role).  Order matters as in the
    reference: v, then M, then w, then Σ."""
    J, I, D = model.num_pdfs, model.M.shape[0], model.dim
    S_dim = model.V.shape[1]
    inv = 1.0 / model.var                                # (I, D)

    # --- v_j: maximize Σ_i γ_ji log N(μ_ji) term: per-state SPD solve
    #   H_j = Σ_i γ_ji M_iᵀ Σ_i⁻¹ M_i,  g_j = Σ_i M_iᵀ Σ_i⁻¹ y_ji
    MtSi = np.einsum("ids,id->ids", model.M, inv)        # M∘Σ⁻¹ by col
    H = np.einsum("ji,idr,ids->jrs", accs.gamma,
                  MtSi, model.M)                         # (J, S, S)
    g = np.einsum("ids,jid->js", MtSi, accs.y)           # (J, S)
    V = model.V.copy()
    occ_j = accs.gamma.sum(axis=1)
    for jj in range(J):
        if occ_j[jj] < 1e-3:
            continue
        V[jj] = np.linalg.solve(
            H[jj] + 1e-4 * np.eye(S_dim), g[jj])

    # --- M_i: per-Gaussian least squares over states
    #   M_i = [Σ_j y_ji v_jᵀ][Σ_j γ_ji v_j v_jᵀ]⁻¹
    Ynum = np.einsum("jid,js->ids", accs.y, V)           # (I, D, S)
    Q = np.einsum("ji,jr,js->irs", accs.gamma, V, V)     # (I, S, S)
    M = model.M.copy()
    occ_i = accs.gamma.sum(axis=0)
    for ii in range(I):
        if occ_i[ii] < 1e-3:
            continue
        M[ii] = np.linalg.solve(
            Q[ii] + 1e-4 * np.eye(S_dim), Ynum[ii].T).T

    # --- w_i: one quadratic-bound step on the weight auxiliary
    #   ∂/∂w_i Σ_j [γ_ji - γ_j· w_ji] v_j  (reference eq. for w update)
    logits = V @ model.w.T
    cur = np.exp(logits - jax.nn.logsumexp(
        jnp.asarray(logits), axis=1, keepdims=True))     # (J, I)
    grad = np.einsum("ji,js->is", accs.gamma - occ_j[:, None] * cur, V)
    # bound Hessian: ¼ Σ_j γ_j· v vᵀ (reference's max-curvature bound)
    Hw = 0.25 * np.einsum("j,jr,js->rs", occ_j, V, V) \
        + 1e-4 * np.eye(S_dim)
    w = model.w + w_step * np.linalg.solve(Hw, grad.T).T

    # --- Σ_i: shared diagonal covariance from global scatter
    mu = np.einsum("ids,js->jid", M, V)
    var = model.var.copy()
    for ii in range(I):
        if occ_i[ii] < 1.0:
            continue
        ex2 = accs.S[ii] / occ_i[ii]
        cross = np.einsum("j,jd->d", accs.gamma[:, ii] / occ_i[ii],
                          mu[:, ii] ** 2) \
            - 2 * np.einsum("jd,jd->d", accs.y[:, ii] / occ_i[ii],
                            mu[:, ii]) + ex2
        var[ii] = np.maximum(cross, min_var)
    return Sgmm2(M=M, w=w, var=var, V=V)


def train_sgmm(feats: Dict[str, np.ndarray],
               pdf_alis: Dict[str, np.ndarray],
               num_pdfs: int, num_gauss: int = 8, subspace: int = 4,
               num_iters: int = 6, seed: int = 0
               ) -> Tuple[Sgmm2, list]:
    """EM with fixed alignments (steps/train_sgmm2.sh inner loop
    without realignment).  Returns (model, per-iter avg loglikes)."""
    allf = np.concatenate([feats[u] for u in sorted(feats)])
    alla = np.concatenate([np.asarray(pdf_alis[u], np.int32)
                           for u in sorted(feats)])
    if alla.max() >= num_pdfs:
        raise KaldiError("alignment pdf out of range")
    model = init_sgmm(num_pdfs, allf.shape[1], num_gauss, subspace,
                      allf.mean(0), allf.var(0) + 1e-3, seed=seed)
    likes = []
    for it in range(num_iters):
        accs = accumulate(model, allf, alla)
        likes.append(accs.tot_like / accs.tot_frames)
        model = update(model, accs)
        log.info("sgmm2 iter %d: avg loglike %.4f", it, likes[-1])
    return model, likes


def write_sgmm2(path: str, model: Sgmm2) -> None:
    """Kaldi-style token-framed SGMM2 serialization (<SGMM2> header,
    dims, then M/w/var/V as FM matrices; am-sgmm2.h Write role —
    token layout is ours, framing primitives are core/io)."""
    from kaldi_tpu.core import io as kio
    with kio.open_wxfilename(path) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<SGMM2>")
        for tok, v in (("<NUMPDFS>", model.V.shape[0]),
                       ("<NUMGAUSS>", model.M.shape[0]),
                       ("<DIM>", model.M.shape[1]),
                       ("<SUBSPACE>", model.M.shape[2])):
            kio.write_token(f, tok)
            kio.write_basic_int32(f, v)
        kio.write_token(f, "<M>")
        for i in range(model.M.shape[0]):
            kio.write_matrix(f, model.M[i])
        kio.write_token(f, "<W>")
        kio.write_matrix(f, model.w)
        kio.write_token(f, "<VARS>")
        kio.write_matrix(f, model.var)
        kio.write_token(f, "<V>")
        kio.write_matrix(f, model.V)
        kio.write_token(f, "</SGMM2>")


def read_sgmm2(path: str) -> Sgmm2:
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(path) as f:
        if not kio.init_kaldi_input_stream(f):
            raise KaldiError(f"{path}: not a binary kaldi file")
        kio.expect_token(f, "<SGMM2>")
        dims = {}
        for tok in ("<NUMPDFS>", "<NUMGAUSS>", "<DIM>", "<SUBSPACE>"):
            kio.expect_token(f, tok)
            dims[tok] = kio.read_basic_int32(f)
        kio.expect_token(f, "<M>")
        M = np.stack([kio.read_matrix(f)
                      for _ in range(dims["<NUMGAUSS>"])])
        kio.expect_token(f, "<W>")
        w = kio.read_matrix(f)
        kio.expect_token(f, "<VARS>")
        var = kio.read_matrix(f)
        kio.expect_token(f, "<V>")
        V = kio.read_matrix(f)
        kio.expect_token(f, "</SGMM2>")
        return Sgmm2(M=M, w=w, var=var, V=V)
