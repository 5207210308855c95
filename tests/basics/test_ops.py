"""Tests for pm and the O(log N) cumulative group scans.

Oracle: sequential products, mirroring the semantics documented in
the reference (basics/ops.py:99-205).
"""

import jax
import jax.numpy as jnp
import numpy as np

import pypose_tpu as pp


def test_pm():
    x = jnp.array([0.1, 0.0, -0.2])
    np.testing.assert_array_equal(np.asarray(pp.pm(x)), [1., 1., -1.])


def _sequential(X, left):
    outs = [X[0]]
    acc = X[0]
    for i in range(1, len(X)):
        acc = (X[i] @ acc) if left else (acc @ X[i])
        outs.append(acc)
    return np.stack([np.asarray(o.tensor()) for o in outs])


def test_cumprod_left_right():
    X = pp.randn_SE3(7, key=jax.random.PRNGKey(0))
    for left in (True, False):
        got = np.asarray(pp.cumprod(X, dim=0, left=left).tensor())
        np.testing.assert_allclose(got, _sequential(X, left), atol=1e-5)


def test_cummul_equals_cumprod_for_groups():
    X = pp.randn_SO3(5, key=jax.random.PRNGKey(1))
    a = np.asarray(pp.cummul(X, dim=0).tensor())
    b = np.asarray(pp.cumprod(X, dim=0).tensor())
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_cumprod_batched_dim1():
    X = pp.randn_SO3(2, 6, key=jax.random.PRNGKey(2))
    out = pp.cumprod(X, dim=1, left=False)
    assert out.lshape == (2, 6)
    for b in range(2):
        got = np.asarray(out[b].tensor())
        np.testing.assert_allclose(got, _sequential(X[b], False), atol=1e-5)


def test_cumops_custom():
    x = pp.randn_so3(6, key=jax.random.PRNGKey(3))
    got = pp.cumops(x, 0, lambda a, b: a + b.tensor())
    expect = jnp.cumsum(x.tensor(), axis=0)
    np.testing.assert_allclose(np.asarray(got.tensor()), np.asarray(expect),
                               atol=1e-6)


def test_cumprod_jit_grad():
    X = pp.randn_SO3(8, key=jax.random.PRNGKey(4))

    @jax.jit
    def loss(X):
        return jnp.sum(pp.cumprod(X, dim=0).Log().tensor() ** 2)

    g = jax.grad(loss)(X)
    assert g.shape == (8, 4)
    assert np.isfinite(np.asarray(g.tensor())).all()


def test_inplace_aliases_return_new():
    # JAX arrays are immutable: the reference's in-place variants are
    # provided as returning-new aliases (ref basics/ops.py:27-205,
    # lietensor.py add_/identity_).
    import pypose_tpu as pp
    X = pp.randn_SE3(4)
    a = 0.1 * jnp.ones((4, 7))
    assert jnp.allclose(X.add_(a).tensor(), X.add(a).tensor())
    assert jnp.allclose(X.cumprod_(0).tensor(), X.cumprod(0).tensor())
    assert jnp.allclose(X.cummul_(0).tensor(), X.cummul(0).tensor())
    assert jnp.allclose(
        X.cumops_(0, lambda x, y: x @ y).tensor(),
        X.cumops(0, lambda x, y: x @ y).tensor())
    I = X.identity_()
    assert jnp.allclose(I.tensor()[..., :3], 0)
    assert jnp.allclose(pp.add_(X, a).tensor(), pp.add(X, a).tensor())
    # original unchanged
    assert not jnp.allclose(X.tensor(), I.tensor())
