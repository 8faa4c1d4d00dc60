"""Online natural-gradient preconditioning (ops/natural_gradient.py —
the OnlineNaturalGradient / NG-SGD role, natural-gradient-online.h)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kaldi_tpu.ops.natural_gradient import (ng_init, ng_precondition,
                                            ngsgd, scale_ng)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_skewed_samples(rng, N, D, top_eigs):
    """Gaussian with a few large eigendirections over a small floor."""
    Q, _ = np.linalg.qr(rng.standard_normal((D, D)))
    scales = np.full(D, 0.1)
    scales[:len(top_eigs)] = top_eigs
    return (rng.standard_normal((N, D)) * np.sqrt(scales)) @ Q.T, Q, scales


def test_estimate_tracks_top_eigenspace(rng):
    D, R = 16, 4
    X_all, Q, scales = make_skewed_samples(rng, 4000, D, [50.0, 30.0, 20.0,
                                                          10.0])
    st = ng_init(D, R)
    step = jax.jit(lambda s, x: ng_precondition(s, x))
    for i in range(0, 4000, 200):
        _, _, st = step(st, jnp.asarray(X_all[i:i + 200], jnp.float32))
    # the tracked subspace must align with the true top-R eigenvectors
    U = np.asarray(st.U)
    top = Q[:, :R]
    overlap = np.linalg.norm(top.T @ U, ord="fro") ** 2 / R
    assert overlap > 0.9, overlap
    # eigenvalue estimates in the right ballpark, descending
    d = np.asarray(st.d)
    assert np.all(np.diff(d) <= 1e-4)
    assert d[0] == pytest.approx(50.0, rel=0.5)
    # trace preserved into rho: total ≈ true total variance
    tot = d.sum() + float(st.rho) * (D - R)
    assert tot == pytest.approx(scales.sum(), rel=0.3)


def test_preconditioning_whitens_and_preserves_scale(rng):
    D, R = 12, 4
    X_all, _, _ = make_skewed_samples(rng, 3000, D, [100.0, 40.0])
    st = ng_init(D, R)
    for i in range(0, 2000, 250):
        _, _, st = ng_precondition(st, jnp.asarray(X_all[i:i + 250],
                                                   jnp.float32))
    X = jnp.asarray(X_all[2000:2250], jnp.float32)
    Xbar, gamma, _ = ng_precondition(st, X)
    # scale preservation: gamma * ||Xbar|| == ||X||
    assert float(gamma) * float(jnp.linalg.norm(Xbar)) == pytest.approx(
        float(jnp.linalg.norm(X)), rel=1e-4)
    # the dominant directions are strongly attenuated relative to the
    # floor: preconditioned variance anisotropy shrinks by >5x
    def anis(M):
        v = np.linalg.eigvalsh(np.asarray(M).T @ np.asarray(M))
        return v[-1] / np.maximum(v[v > 1e-6].min(), 1e-6)
    assert anis(Xbar) < anis(X) / 5.0


def test_first_call_passthrough():
    st = ng_init(6, 3)
    X = jnp.ones((4, 6))
    Xbar, gamma, st2 = ng_precondition(st, X)
    np.testing.assert_allclose(np.asarray(Xbar), np.asarray(X))
    assert float(gamma) == 1.0
    assert int(st2.t) == 1


def test_ngsgd_beats_sgd_on_ill_conditioned_quadratic(rng):
    # least squares with condition number ~1e3: plain SGD crawls along
    # the flat directions; NG preconditioning equalizes progress.
    D = 10
    scales = np.logspace(0, 3, D)
    A = rng.standard_normal((200, D)) * np.sqrt(scales)
    Wtrue = rng.standard_normal((D, 3))
    Y = A @ Wtrue

    def loss(W):
        r = jnp.asarray(A) @ W - jnp.asarray(Y)
        return 0.5 * jnp.mean(jnp.sum(r * r, axis=1))

    def train(tx, steps=150):
        W = jnp.zeros((D, 3))
        state = tx.init(W)
        lf = jax.jit(jax.value_and_grad(loss))

        @jax.jit
        def step(W, state):
            v, g = lf(W)
            u, state = tx.update(g, state, W)
            return optax.apply_updates(W, u), state, v

        for _ in range(steps):
            W, state, v = step(W, state)
        return float(loss(W))

    lr = 1e-4  # stable for plain SGD at this conditioning
    l_sgd = train(optax.sgd(lr))
    # alpha=0.5: sharper inverse than the reference's 4.0 default so
    # the equalization is visible within 150 steps on cond~1e3
    l_ng = train(ngsgd(lr, rank_in=8, rank_out=2, alpha=0.5))
    assert l_ng < l_sgd * 0.5, (l_ng, l_sgd)


def test_scale_ng_passthrough_non_matrix(rng):
    params = {"w": jnp.ones((4, 3)), "b": jnp.ones(4)}
    tx = scale_ng()
    st = tx.init(params)
    g = {"w": jnp.asarray(rng.standard_normal((4, 3)), jnp.float32),
         "b": jnp.asarray(rng.standard_normal(4), jnp.float32)}
    u, st2 = tx.update(g, st)
    np.testing.assert_allclose(np.asarray(u["b"]), np.asarray(g["b"]))
    assert u["w"].shape == (4, 3)
    # first call passes matrices through unchanged too
    np.testing.assert_allclose(np.asarray(u["w"]), np.asarray(g["w"]),
                               rtol=1e-5)
    u2, _ = tx.update(g, st2)
    assert not np.allclose(np.asarray(u2["w"]), np.asarray(g["w"]))


def test_scale_ng_update_period(rng):
    """Fisher estimates ADVANCE only every k-th step (the reference's
    OnlineNaturalGradient update_period); preconditioning still
    applies every step."""
    params = {"w": jnp.ones((6, 4))}
    tx = scale_ng(update_period=3)
    st = tx.init(params)
    g = {"w": jnp.asarray(rng.standard_normal((6, 4)), jnp.float32)}

    def t_of(state):
        return int(state.states["w"][0].t)

    assert t_of(st) == 0
    # first 10 steps advance UNCONDITIONALLY (the reference refines
    # the estimate before honoring update_period)
    for k in range(10):
        _, st = tx.update(g, st)
    assert t_of(st) == 10
    u10, st = tx.update(g, st)         # step 10: no advance (10%3==1)
    u11, st = tx.update(g, st)         # step 11: no advance
    assert t_of(st) == 10
    _, st = tx.update(g, st)           # step 12: advances (12%3==0)
    assert t_of(st) == 11
    # preconditioning applied on the non-advancing steps too
    assert not np.allclose(np.asarray(u10["w"]), np.asarray(g["w"]))
    np.testing.assert_allclose(np.asarray(u10["w"]),
                               np.asarray(u11["w"]), rtol=1e-6)
