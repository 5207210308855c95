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


def test_scalarized_inverses_match_matrix_forms():
    """inv3x3_scalar / inv6x6_scalar (component-list forms, used by the
    SparseLM block-Jacobi preconditioner to avoid (8,128)-padded [N,3,3]
    temps) must match the matrix closed forms."""
    import numpy as np
    import jax.numpy as jnp
    from pypose_tpu.ops.smallinv import (inv3x3, inv6x6, inv3x3_scalar,
                                         inv6x6_scalar, blockinv_scalar)
    rng = np.random.default_rng(3)
    for d, matf, scalf in ((3, inv3x3, inv3x3_scalar),
                           (6, inv6x6, inv6x6_scalar)):
        M = rng.standard_normal((257, d, d)).astype(np.float32)
        M = M @ M.transpose(0, 2, 1) + d * np.eye(d, dtype=np.float32)
        comps = [jnp.asarray(M[:, i, j]) for i in range(d) for j in range(d)]
        out = scalf(comps)
        assert blockinv_scalar(comps)[0].shape == out[0].shape
        Ms = jnp.stack([jnp.stack(out[i * d:(i + 1) * d], -1)
                        for i in range(d)], -2)
        ref = matf(jnp.asarray(M))
        rel = float(jnp.max(jnp.abs(Ms - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < 1e-5, rel
        ident = jnp.einsum('nij,njk->nik', Ms, jnp.asarray(M))
        assert float(jnp.max(jnp.abs(ident - jnp.eye(d)))) < 1e-4
