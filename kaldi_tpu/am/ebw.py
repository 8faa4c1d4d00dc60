"""Discriminative GMM training: MMI with Extended Baum-Welch updates.

Parity targets: src/gmm/ebw-diag-gmm.h (EbwUpdate), the
gmm-rescore-lattice / gmm-acc-stats2 MMI flow of steps/train_mmi.sh.

Numerator statistics come from the forced alignment; denominator
statistics from the decode lattice's sum forward-backward pdf
posteriors (the competing-hypothesis mass).  The EBW update

    μ' = (x_num − x_den + D μ) / (γ_num − γ_den + D)

uses the standard per-Gaussian smoothing D = max(E·γ_den, D_min·γ_num)
keeping variances positive.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

from kaldi_tpu.core.logging import get_logger
from kaldi_tpu.am.gmm import AmDiagGmm, GmmAccs, accumulate_stats
from kaldi_tpu.lattice.lattice import Lattice

log = get_logger(__name__)


def raw_lattice_pdf_posteriors(lat: Lattice, T: int, tid_to_pdf: np.ndarray,
                               num_pdfs: int, acoustic_scale: float = 1.0
                               ) -> np.ndarray:
    """Sum forward-backward over a raw (frame-level) lattice →
    per-frame pdf posteriors (T, num_pdfs) — the role of
    lattice-to-post in the MMI recipe."""
    n = lat.num_states
    order = lat.top_order()
    # frame index per node: emitting arcs advance one frame
    time = np.full(n, -1, np.int64)
    time[lat.start] = 0
    for s in order:
        if time[s] < 0:
            continue
        for a in lat.arcs[s]:
            t = time[s] + (1 if a.ilabel else 0)
            time[a.nextstate] = max(time[a.nextstate], t)

    def arc_ll(a):
        return -(a.graph_cost + acoustic_scale * a.acoustic_cost)

    alpha = np.full(n, -np.inf)
    alpha[lat.start] = 0.0
    for s in order:
        if alpha[s] == -np.inf:
            continue
        for a in lat.arcs[s]:
            v = alpha[s] + arc_ll(a)
            alpha[a.nextstate] = np.logaddexp(alpha[a.nextstate], v)
    beta = np.full(n, -np.inf)
    for s, (gc, ac) in lat.finals.items():
        beta[s] = -(gc + acoustic_scale * ac)
    for s in reversed(order):
        for a in lat.arcs[s]:
            beta[s] = np.logaddexp(beta[s], arc_ll(a) + beta[a.nextstate])
    total = beta[lat.start]
    post = np.zeros((T, num_pdfs))
    for s in order:
        if alpha[s] == -np.inf or time[s] < 0:
            continue
        for a in lat.arcs[s]:
            if a.ilabel == 0:
                continue
            t = time[s]
            if t >= T:
                continue
            lp = alpha[s] + arc_ll(a) + beta[a.nextstate] - total
            post[t, tid_to_pdf[a.ilabel]] += math.exp(min(lp, 0.0))
    return post


def accumulate_den_stats(am: AmDiagGmm, feats: np.ndarray,
                         pdf_post: np.ndarray, accs: GmmAccs) -> None:
    """Accumulate denominator stats weighted by per-frame pdf posteriors."""
    import jax.numpy as jnp
    from kaldi_tpu.am.gmm import _component_post_jit
    gconst, mean_invvar, inv_var = am.device_params()
    T = feats.shape[0]
    x = np.asarray(feats, np.float64)
    for p in range(am.num_pdfs):
        w = pdf_post[:, p]
        sel = w > 1e-6
        if not sel.any():
            continue
        xs = x[sel]
        comp_post = np.asarray(_component_post_jit(
            jnp.asarray(xs, jnp.float32),
            jnp.full(len(xs), p, jnp.int32), gconst, mean_invvar, inv_var))
        wp = comp_post * w[sel][:, None]
        accs.occ[p] += wp.sum(axis=0)
        accs.mean_acc[p] += wp.T @ xs
        accs.var_acc[p] += wp.T @ (xs * xs)


def ebw_update(am: AmDiagGmm, num: GmmAccs, den: GmmAccs,
               E: float = 2.0, d_min_factor: float = 0.5,
               var_floor: float = 1e-3) -> float:
    """EBW mean/variance update (ebw-diag-gmm.cc UpdateEbwDiagGmm).
    Returns the (approximate) MMI auxiliary-function improvement."""
    valid = am.weights > 0
    gamma_n = num.occ
    gamma_d = den.occ
    D = np.maximum(E * gamma_d, d_min_factor * np.maximum(gamma_n, 1e-10))
    # increase D where the variance would go negative
    impr_tot = 0.0
    for _ in range(10):
        denom = gamma_n - gamma_d + D
        ok = denom > 1e-10
        mean_new = np.where(
            ok[..., None],
            (num.mean_acc - den.mean_acc + D[..., None] * am.means)
            / np.maximum(denom[..., None], 1e-10), am.means)
        var_new = np.where(
            ok[..., None],
            (num.var_acc - den.var_acc
             + D[..., None] * (am.vars + am.means ** 2))
            / np.maximum(denom[..., None], 1e-10) - mean_new ** 2,
            am.vars)
        bad = (var_new <= var_floor / 2).any(axis=2) & valid & ok
        if not bad.any():
            break
        D = np.where(bad, D * 2.0, D)
    var_new = np.maximum(var_new, var_floor)
    update = valid & (gamma_n + gamma_d > 1e-3)
    am.means = np.where(update[..., None], mean_new, am.means)
    am.vars = np.where(update[..., None], var_new, am.vars)
    am.refresh()
    log.info("ebw_update: num occ %.0f den occ %.0f", gamma_n.sum(),
             gamma_d.sum())
    return float((gamma_n - gamma_d).sum())
