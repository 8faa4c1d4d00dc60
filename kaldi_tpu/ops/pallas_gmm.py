"""Fused GMM log-likelihood Pallas kernel.

Computes  out[t, p] = logsumexp_m( gconst[p,m] + x_t·(μ/σ²)_{p,m}
                                   − ½ x_t²·(1/σ²)_{p,m} )
one (frame-tile × pdf-tile) block at a time: per mixture index m, an
MXU matmul against that mixture's stacked natural parameters, folded
into an ONLINE logsumexp accumulator (flash-attention style running
max/sum) — the DecodableAmDiagGmm hot loop (SURVEY.md §3.3) as one
kernel with no (T, P·M) component-score round-trip through HBM.

Layout: parameters are m-major 3-D tensors (M, D, P) so each mixture's
slab is a clean 128-lane block; the mixture loop is a static unroll
(M ≤ 32 in practice).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1.0e30


def gmm_loglikes_xla(x, gconst, mean_invvar, inv_var):
    """Reference XLA implementation (same math as am/gmm.py)."""
    P, M, D = mean_invvar.shape
    a = mean_invvar.reshape(P * M, D)
    b = (-0.5 * inv_var).reshape(P * M, D)
    quad = x @ a.T + (x * x) @ b.T
    comp = quad.reshape(-1, P, M) + gconst[None]
    return jax.scipy.special.logsumexp(comp, axis=2)


def _kernel(x_ref, x2_ref, a_ref, b_ref, g_ref, out_ref, *, M):
    # x/x2: (Tt, D); a/b: (M, D, Pt); g: (M, 1, Pt); out: (Tt, Pt)
    Tt = x_ref.shape[0]
    Pt = out_ref.shape[1]
    mx = jnp.full((Tt, Pt), _NEG, jnp.float32)
    s = jnp.zeros((Tt, Pt), jnp.float32)
    for m in range(M):
        q = (jnp.dot(x_ref[:], a_ref[m], preferred_element_type=jnp.float32)
             + jnp.dot(x2_ref[:], b_ref[m],
                       preferred_element_type=jnp.float32)
             + g_ref[m])
        new_mx = jnp.maximum(mx, q)
        s = s * jnp.exp(mx - new_mx) + jnp.exp(q - new_mx)
        mx = new_mx
    out_ref[:] = mx + jnp.log(s)


def gmm_loglikes_pallas(x, gconst, mean_invvar, inv_var,
                        tile_t: int = 256, tile_p: int = 512,
                        interpret: bool = False):
    """x: (T, D) → (T, P).  Shapes are padded to tiles internally."""
    P, M, D = mean_invvar.shape
    T = x.shape[0]
    T_pad = ((T + tile_t - 1) // tile_t) * tile_t
    P_pad = ((P + tile_p - 1) // tile_p) * tile_p
    D_pad = ((D + 127) // 128) * 128

    a = np.zeros((M, D_pad, P_pad), np.float32)
    b = np.zeros((M, D_pad, P_pad), np.float32)
    g = np.full((M, 1, P_pad), _NEG, np.float32)
    a[:, :D, :P] = np.asarray(mean_invvar).transpose(1, 2, 0)
    b[:, :D, :P] = -0.5 * np.asarray(inv_var).transpose(1, 2, 0)
    g[:, 0, :P] = np.asarray(gconst).T

    xp = jnp.zeros((T_pad, D_pad), jnp.float32)
    xp = xp.at[:T, :D].set(jnp.asarray(x, jnp.float32))
    x2 = xp * xp

    grid = (T_pad // tile_t, P_pad // tile_p)
    out = pl.pallas_call(
        functools.partial(_kernel, M=M),
        out_shape=jax.ShapeDtypeStruct((T_pad, P_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_t, D_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, D_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, D_pad, tile_p), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, D_pad, tile_p), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1, tile_p), lambda i, j: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, tile_p), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(xp), jnp.asarray(x2), jnp.asarray(a), jnp.asarray(b),
      jnp.asarray(g))
    return out[:T, :P]
