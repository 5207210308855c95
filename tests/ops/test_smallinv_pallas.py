"""ops tests: closed-form small inverses; pallas kernels in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pypose_tpu.ops.smallinv import inv3x3, inv6x6, blockinv, solve3x3


def spd(n, k, seed):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, k, k)).astype(np.float32)
    return jnp.asarray(M @ np.transpose(M, (0, 2, 1))
                       + k * np.eye(k, dtype=np.float32))


def test_inv3x3():
    M = spd(50, 3, 0)
    out = inv3x3(M)
    np.testing.assert_allclose(np.asarray(out @ M),
                               np.broadcast_to(np.eye(3), (50, 3, 3)),
                               atol=1e-4)
    b = jnp.ones((50, 3))
    expect = np.linalg.solve(np.asarray(M), np.ones((50, 3, 1)))[..., 0]
    np.testing.assert_allclose(np.asarray(solve3x3(M, b)), expect,
                               atol=1e-4)


def test_inv6x6():
    M = spd(50, 6, 1)
    out = inv6x6(M)
    np.testing.assert_allclose(np.asarray(out @ M),
                               np.broadcast_to(np.eye(6), (50, 6, 6)),
                               atol=1e-3)
    assert blockinv(M).shape == (50, 6, 6)


def test_pallas_kernels_interpret(monkeypatch):
    """Run the SoA kernels in interpreter mode (no TPU in CI)."""
    from jax.experimental import pallas as pl
    import pypose_tpu as pp
    from pypose_tpu.ops import pallas_se3

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs['interpret'] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, 'pallas_call', interp_call)
    monkeypatch.setattr(pallas_se3.pl, 'pallas_call', interp_call)

    N = 1500  # not a multiple of the 1024 tile: exercises padding
    X = pp.randn_SE3(N, key=jax.random.PRNGKey(0)).tensor()
    Y = pp.randn_SE3(N, key=jax.random.PRNGKey(1)).tensor()
    p = jax.random.normal(jax.random.PRNGKey(2), (N, 3))

    from pypose_tpu.lietensor.operation import SE3_Mul, SE3_Act
    np.testing.assert_allclose(
        np.asarray(pallas_se3.se3_mul_fused(X, Y)),
        np.asarray(SE3_Mul(X, Y)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pallas_se3.se3_act_fused(X, p)),
        np.asarray(SE3_Act(X, p)), atol=1e-5)
