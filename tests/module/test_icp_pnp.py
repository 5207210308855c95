"""ICP and EPnP round-trip tests.  Ref style: tests/module/test_icp.py
(batching/broadcasting), tests/module/test_pnp.py (synthesized projections).
"""

import jax
import jax.numpy as jnp
import numpy as np

import pypose_tpu as pp
from pypose_tpu.module import ICP, EPnP
from pypose_tpu.utils import ReduceToBason


def test_icp_recovers_transform():
    key = jax.random.PRNGKey(0)
    source = jax.random.normal(key, (80, 3))
    T_true = pp.randn_SE3(sigma=(0.3, 0.1), key=jax.random.PRNGKey(1))
    target = T_true.Act(source)
    icp = ICP(stepper=ReduceToBason(steps=100, patience=8, tol=1e-8))
    T_est = icp(source, target)
    err = (T_est.Inv() @ T_true).Log().tensor()
    assert float(jnp.abs(err).max()) < 1e-2


def test_icp_batched():
    key = jax.random.PRNGKey(2)
    source = jax.random.normal(key, (2, 50, 3))
    T_true = pp.randn_SE3(2, sigma=(0.2, 0.1), key=jax.random.PRNGKey(3))
    target = T_true.unsqueeze(-2).Act(source)
    icp = ICP(stepper=ReduceToBason(steps=100, patience=8, tol=1e-8))
    T_est = icp(source, target)
    err = (T_est.Inv() @ T_true).Log().tensor()
    assert float(jnp.abs(err).max()) < 5e-2


def _pnp_problem(batch=(), n=10, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    points_cam = jax.random.uniform(
        k1, batch + (n, 3), minval=jnp.array([-2., -2., 4.]),
        maxval=jnp.array([2., 2., 12.]))
    pose = pp.randn_SE3(*batch, sigma=(0.5, 0.2), key=k2)  # cam <- world
    points_world = pose.Inv().unsqueeze(-2).Act(points_cam)
    f, cx, cy = 500.0, 320.0, 240.0
    K = jnp.array([[f, 0, cx], [0, f, cy], [0, 0, 1.]])
    pixels = pp.point2pixel(points_cam, K)
    return points_world, pixels, K, pose


def test_epnp_roundtrip():
    points, pixels, K, pose_true = _pnp_problem(n=12, seed=4)
    epnp = EPnP(intrinsics=K, refine=False)
    pose = epnp(points, pixels)
    err = (pose.Inv() @ pose_true).Log().tensor()
    assert float(jnp.abs(err).max()) < 1e-2
    # reprojection error small
    rep = pp.reprojerr(points, pixels, K, pose, reduction='norm')
    assert float(rep.mean()) < 1.0


def test_epnp_refine():
    points, pixels, K, pose_true = _pnp_problem(n=8, seed=5)
    epnp = EPnP(refine=True)
    pose = epnp(points, pixels, intrinsics=K)
    rep = pp.reprojerr(points, pixels, K, pose, reduction='norm')
    assert float(rep.mean()) < 1.0


def test_epnp_batched():
    points, pixels, K, pose_true = _pnp_problem(batch=(3,), n=10, seed=6)
    epnp = EPnP(intrinsics=K, refine=False)
    pose = epnp(points, pixels)
    rep = pp.reprojerr(points, pixels, K, pose, reduction='norm')
    assert float(rep.mean()) < 1.0


def test_geodesic_loss():
    a = pp.randn_SO3(5, key=jax.random.PRNGKey(7))
    loss = pp.module.geodesic_loss(a, a, reduction='none')
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-5)
    b = pp.randn_SO3(5, key=jax.random.PRNGKey(8))
    l2 = pp.module.geodesic_loss(a, b, reduction='mean')
    assert float(l2) > 0


def test_icp_jit_vmap_grad():
    # the device-side loop makes ICP jittable/vmap-able; gradients flow
    # through the fixed-point Kabsch surrogate
    import pypose_tpu as pp
    from pypose_tpu.module import ICP

    key = jax.random.PRNGKey(11)
    src = jax.random.normal(key, (4, 60, 3))
    T_gt = pp.randn_SE3(4, sigma=0.3, key=jax.random.PRNGKey(12))
    tgt = T_gt.unsqueeze(-2).Act(src)

    icp = ICP()
    T_jit = jax.jit(lambda s, t: icp(s, t).tensor())(src, tgt)
    err = (pp.SE3(T_jit).Inv() @ T_gt).Log().tensor()
    assert float(jnp.abs(err).max()) < 1e-3

    # vmap over a leading problem axis
    T_vm = jax.vmap(lambda s, t: icp(s, t).tensor())(src, tgt)
    err = (pp.SE3(T_vm).Inv() @ T_gt).Log().tensor()
    assert float(jnp.abs(err).max()) < 1e-3

    # grad w.r.t. source points is finite and nonzero
    g = jax.grad(lambda s: jnp.sum(icp(s, tgt).tensor() ** 2))(src)
    assert jnp.all(jnp.isfinite(g)) and float(jnp.abs(g).max()) > 0
