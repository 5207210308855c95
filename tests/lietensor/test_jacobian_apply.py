"""Apply-form Jacobian/adjoint helpers match their matrix builders.

The r4 scalarization (jacobian.py header note) rewrote the matrix
builders in component form and added *_apply functions that evaluate
J @ v as jnp.cross chains with no [*, d, d] temp.  These tests pin
apply == (matrix @ v) over random, tiny-angle, and broadcast inputs,
plus AD finiteness at zero.  Ref parity of the matrices themselves is
covered by test_fuzz_parity / gold-parity tiers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pypose_tpu.lietensor import jacobian as J
from pypose_tpu.lietensor import operation as op


def _mv(M, v):
    return jnp.einsum('...ij,...j->...i', M, v,
                      precision=jax.lax.Precision.HIGHEST)


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32)
        * scale)


@pytest.mark.parametrize('scale', [1.0, 1e-6])
def test_jl_apply_forms_match_matrices(scale):
    x3 = _rand((13, 3), 0, scale)
    x6 = _rand((13, 6), 1, scale)
    x4 = _rand((13, 4), 2, scale)
    v3 = _rand((13, 3), 3)
    v6 = _rand((13, 6), 4)
    tol = 1e-5
    np.testing.assert_allclose(
        J.so3_Jl_apply(x3, v3), _mv(J.so3_Jl(x3), v3), atol=tol)
    np.testing.assert_allclose(
        J.so3_Jl_inv_apply(x3, v3), _mv(J.so3_Jl_inv(x3), v3), atol=tol)
    np.testing.assert_allclose(
        J.calcQ_apply(x6[..., :3], x6[..., 3:6], v3),
        _mv(J.calcQ(x6), v3), atol=tol)
    np.testing.assert_allclose(
        J.se3_Jl_apply(x6, v6), _mv(J.se3_Jl(x6), v6), atol=tol)
    np.testing.assert_allclose(
        J.se3_Jl_inv_apply(x6, v6), _mv(J.se3_Jl_inv(x6), v6), atol=tol)
    np.testing.assert_allclose(
        J.rxso3_Ws_apply(x4, v3), _mv(J.rxso3_Ws(x4), v3), atol=tol)


def test_adj_apply_forms_match_matrices():
    v3 = _rand((9, 3), 5)
    v4 = _rand((9, 4), 6)
    v6 = _rand((9, 6), 7)
    v7 = _rand((9, 7), 8)
    x3 = _rand((9, 3), 9)
    x4 = _rand((9, 4), 10)
    x6 = _rand((9, 6), 11)
    x7 = _rand((9, 7), 12)
    tol = 1e-5
    # algebra adjoints
    np.testing.assert_allclose(
        J.so3_adj_apply(x3, v3), _mv(J.so3_adj(x3), v3), atol=tol)
    np.testing.assert_allclose(
        J.se3_adj_apply(x6, v6), _mv(J.se3_adj(x6), v6), atol=tol)
    np.testing.assert_allclose(
        J.rxso3_adj_apply(x4, v4), _mv(J.rxso3_adj(x4), v4), atol=tol)
    np.testing.assert_allclose(
        J.sim3_adj_apply(x7, v7), _mv(J.sim3_adj(x7), v7), atol=tol)
    # group adjoints (private apply helpers in operation.py)
    import pypose_tpu as pp
    key = jax.random.PRNGKey(0)
    XSE3 = pp.randn_SE3(9, key=key).tensor()
    XRx = pp.randn_RxSO3(9, key=key).tensor()
    XSim = pp.randn_Sim3(9, key=key).tensor()
    np.testing.assert_allclose(
        op._SE3_Adj_apply(XSE3, v6), _mv(op.SE3_Adj(XSE3), v6),
        atol=tol, rtol=1e-5)
    np.testing.assert_allclose(
        op._RxSO3_Adj_apply(XRx, v4), _mv(op.RxSO3_Adj(XRx), v4),
        atol=tol, rtol=1e-5)
    np.testing.assert_allclose(
        op._Sim3_Adj_apply(XSim, v7), _mv(op.Sim3_Adj(XSim), v7),
        atol=tol, rtol=1e-5)


def test_apply_forms_broadcast_and_ad():
    # broadcasting: unbatched x against batched v and vice versa
    x = _rand((6,), 13)
    v = _rand((4, 6), 14)
    out = J.se3_Jl_apply(x, v)
    assert out.shape == (4, 6)
    ref = _mv(J.se3_Jl(x), v)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    # AD at exactly zero tangent stays finite to second order
    H = jax.jacfwd(jax.grad(
        lambda t: jnp.sum(J.se3_Jl_inv_apply(t, jnp.ones(6)) ** 2)))(
        jnp.zeros(6))
    assert bool(jnp.isfinite(H).all())
