"""Scalarized SE3 PGO blocks == the vmapped AoS closed form.

lietensor/scalarized.py recomputes pgo_factor's closed-form residual +
tangent Jacobian with all temps [E]-shaped (the TPU layout fix); these
tests pin exact agreement with the AoS chain it replaces, including the
quaternion double-cover branch and tiny-angle regime, plus a
finite-difference check of the Jacobian itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pypose_tpu as pp
from pypose_tpu.optim.sparse import pgo_factor
from pypose_tpu.lietensor.scalarized import se3_pgo_blocks


def _closed_form(Xi, Xj, Z):
    f = pgo_factor(jnp.zeros((Xi.lshape[0], 2), jnp.int32), Z)
    vals = {'poses': pp.SE3(jnp.stack([Xi.tensor(), Xj.tensor()], axis=1))}
    r, J = jax.vmap(f.jacobian)(vals, f.consts)
    return r, J['poses']


def _rand(E, sigma, seed):
    return (pp.randn_SE3(E, sigma=sigma, key=jax.random.PRNGKey(seed)),
            pp.randn_SE3(E, sigma=sigma, key=jax.random.PRNGKey(seed + 1)),
            pp.randn_SE3(E, sigma=0.8 * sigma,
                         key=jax.random.PRNGKey(seed + 2)))


@pytest.mark.parametrize('sigma', [1e-6, 0.1, 1.2])
def test_matches_closed_form(sigma):
    Xi, Xj, Z = _rand(64, sigma, 0)
    r_c, J_c = _closed_form(Xi, Xj, Z)
    r_s, J_s = se3_pgo_blocks(Xi.tensor(), Xj.tensor(), Z.tensor())
    np.testing.assert_allclose(np.asarray(r_s), np.asarray(r_c),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(J_s), np.asarray(J_c),
                               rtol=1e-4, atol=1e-5)


def test_double_cover_branch():
    Xi, Xj, Z = _rand(64, 1.0, 10)
    Xi = pp.SE3(Xi.tensor().at[:, 3:].multiply(-1.0))  # -q, same rotation
    r_c, J_c = _closed_form(Xi, Xj, Z)
    r_s, J_s = se3_pgo_blocks(Xi.tensor(), Xj.tensor(), Z.tensor())
    np.testing.assert_allclose(np.asarray(r_s), np.asarray(r_c),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(J_s), np.asarray(J_c),
                               rtol=1e-4, atol=1e-5)


def test_jacobian_finite_difference():
    """J[:, :, 1] == d Log(Z^-1 Xi^-1 (Exp(eps) Xj)) / d eps at eps=0."""
    Xi, Xj, Z = _rand(8, 0.7, 20)
    _, J = se3_pgo_blocks(Xi.tensor(), Xj.tensor(), Z.tensor())

    def res(eps):
        Xj_p = pp.se3(eps).Exp() @ Xj
        return (Z.Inv() @ (Xi.Inv() @ Xj_p)).Log().tensor()

    h = 1e-3
    for k in range(6):
        e = jnp.zeros((8, 6)).at[:, k].set(h)
        fd = (res(e) - res(-e)) / (2 * h)
        np.testing.assert_allclose(np.asarray(J[:, :, 1, k]),
                                   np.asarray(fd), rtol=2e-2, atol=2e-3)
    # and J[:, :, 0] = -J[:, :, 1] for the left perturbation of Xi
    np.testing.assert_allclose(np.asarray(J[:, :, 0]),
                               np.asarray(-J[:, :, 1]), rtol=0, atol=0)


def test_bal_reproj_blocks_match_jacrev():
    """Scalarized BAL reprojection blocks == vmapped jacrev of the
    residual (values, camera Jacobian, point Jacobian)."""
    from pypose_tpu.datasets import synthetic_bal
    from pypose_tpu.optim.ba import reproj_residual_bal
    from pypose_tpu.lietensor.scalarized import bal_reproj_blocks

    ds = synthetic_bal(n_cams=6, n_points=80, obs_per_point=3, seed=7)
    Tc = ds['poses'].tensor()[ds['cam_idx']]
    Xp = ds['points'][ds['pt_idx']]
    cams = ds['cameras']
    if cams.shape[0] == ds['poses'].lshape[0]:
        cams = cams[ds['cam_idx']]

    def one(tc, xp, cam, pix):
        def f(ec, ep):
            return reproj_residual_bal(pp.SE3(tc).add(ec), xp + ep,
                                       cam, pix)
        z6 = jnp.zeros(6, tc.dtype)
        z3 = jnp.zeros(3, tc.dtype)
        r = f(z6, z3)
        Jc, Jp = jax.jacrev(f, argnums=(0, 1))(z6, z3)
        return r, Jc, Jp

    r_ref, Jc_ref, Jp_ref = jax.vmap(one)(Tc, Xp, cams, ds['pixels'])
    r_s, Jc_s, Jp_s = bal_reproj_blocks(Tc, Xp, cams, ds['pixels'])
    for a, b in ((r_s, r_ref), (Jc_s, Jc_ref), (Jp_s, Jp_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)
