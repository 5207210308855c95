"""Differentiable NLS (implicit function theorem) tests."""

import jax
import jax.numpy as jnp
import numpy as np

import pypose_tpu as pp
from pypose_tpu.optim.implicit import least_squares


def residual(theta, x):
    return (theta['T'] @ pp.SE3(x)).Log().tensor()


def test_solves_to_inverse():
    inp = pp.randn_SE3(sigma=0.5, key=jax.random.PRNGKey(0))
    sol = least_squares(residual, {'T': pp.identity_SE3()}, inp.tensor(),
                        steps=8)
    err = (sol['T'] @ inp).Log().tensor()
    assert float(jnp.abs(err).max()) < 1e-6


def test_gradient_matches_fd():
    inp = pp.randn_SE3(sigma=0.5, key=jax.random.PRNGKey(1))
    theta0 = {'T': pp.identity_SE3()}

    def loss(x):
        s = least_squares(residual, theta0, x, steps=8)
        return jnp.sum(s['T'].Log().tensor() ** 2)

    g = jax.grad(loss)(inp.tensor())
    rng = np.random.default_rng(0)
    delta = jnp.asarray(rng.normal(size=6).astype(np.float32))
    eps = 1e-3
    hi = loss((pp.se3(eps * delta).Exp() @ inp).tensor())
    lo = loss((pp.se3(-eps * delta).Exp() @ inp).tensor())
    fd = float((hi - lo) / (2 * eps))
    _, dstorage = jax.jvp(
        lambda t: (pp.se3(t * delta).Exp() @ inp).tensor(), (0.0,), (1.0,))
    an = float(jnp.vdot(g, dstorage))
    np.testing.assert_allclose(an, fd, rtol=5e-3)


def test_euclidean_curve_fit_gradient():
    """Learn data through a least-squares line fit: d(fit)/d(data)."""
    key = jax.random.PRNGKey(2)
    t = jnp.linspace(0, 1, 20)
    y = 2.0 * t + 1.0 + 0.01 * jax.random.normal(key, (20,))

    def residual(theta, y):
        return theta['ab'][0] * t + theta['ab'][1] - y

    def loss(y):
        sol = least_squares(residual, {'ab': jnp.zeros(2)}, y, steps=5)
        return sol['ab'][0]  # the slope

    g = jax.grad(loss)(y)
    # analytic: slope of LSQ is linear in y: g = (t - mean t)/var-sum
    tc = t - t.mean()
    expect = tc / jnp.sum(tc * tc)
    np.testing.assert_allclose(np.asarray(g), np.asarray(expect), atol=1e-4)


def test_jit_and_vmap_compose():
    theta0 = {'T': pp.identity_SE3()}
    inps = pp.randn_SE3(5, sigma=0.4, key=jax.random.PRNGKey(3))

    @jax.jit
    @jax.vmap
    def solve_one(x):
        return least_squares(residual, theta0, x, steps=6)['T'].tensor()

    out = solve_one(inps.tensor())
    err = (pp.SE3(out) @ inps).Log().tensor()
    assert float(jnp.abs(err).max()) < 1e-5
