"""End-to-end camera pose estimation with the dense LM stack.

Mirrors the capability surface of the reference's
tests/optim/test_pose_estimation.py: a tuple residual (pose prior +
reprojection), per-part robust kernels, per-part weight matrices, and a
TrustRegion strategy — recovering a camera pose from noisy 2D detections.
"""

import jax
import jax.numpy as jnp

import pypose_tpu as pp
from pypose_tpu.function.geometry import reprojerr


class PoseEstimation(pp.Module):
    def __init__(self, prior_pose):
        super().__init__()
        self.pose = pp.Parameter(prior_pose.clone())

    def forward(self, intrinsics, points_3d, detected, prior_pose):
        prior_err = (self.pose.Inv() @ prior_pose).Log().tensor()
        reproj_err = reprojerr(points_3d, detected, intrinsics, self.pose)
        return prior_err, reproj_err


def _scene(point_noise=3.0, pose_noise=0.2, n=100):
    f, H, W = 200.0, 600.0, 600.0
    K = jnp.array([[f, 0, H / 2], [0, f, W / 2], [0, 0, 1.0]])
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(7), 3)
    pts = jnp.stack([
        2 * jax.random.uniform(k0, (n,)),
        2 * jax.random.uniform(k1, (n,)) + 1.0,
        jax.random.uniform(k2, (n,)) + 1.0,
    ], -1)
    true_pose = pp.SE3(jnp.array([1, 1.5, 0, 0, 0, 0, 1.0])).Inv()
    px = pp.point2pixel(true_pose.Act(pts), K)
    px = px + point_noise * (jax.random.uniform(
        jax.random.PRNGKey(8), px.shape) - 0.5)
    prior = true_pose * pp.randn_SE3(sigma=pose_noise,
                                     key=jax.random.PRNGKey(9))
    return K, pts, px, prior, true_pose


def test_pose_estimation_tuple_residual_kernels_weights():
    K, pts, px, prior, true_pose = _scene()
    model = PoseEstimation(prior)
    strategy = pp.optim.strategy.TrustRegion(radius=1e6)
    kernel = (pp.optim.kernel.Scale(), pp.optim.kernel.Huber())
    weight = (jnp.eye(6), jnp.eye(2))
    opt = pp.optim.LM(model, strategy=strategy, kernel=kernel)
    inputs = (K, pts, px, prior)

    last = float('inf')
    for _ in range(50):
        loss = float(opt.step(inputs, weight=weight))
        if loss < 1e-5 or (last - loss) < 1e-5:
            break
        last = loss

    err = (true_pose.Inv() @ model.pose).Log().tensor()
    assert float(jnp.abs(err).max()) < 1e-2, err


def test_pose_estimation_plain_gn():
    # same scene, reprojection-only, GaussNewton + LSTSQ
    K, pts, px, prior, true_pose = _scene(point_noise=0.0)

    class Reproj(pp.Module):
        def __init__(self, p0):
            super().__init__()
            self.pose = pp.Parameter(p0.clone())

        def forward(self, K, pts, px):
            return reprojerr(pts, px, K, self.pose)

    model = Reproj(prior)
    opt = pp.optim.GN(model, solver=pp.optim.solver.LSTSQ())
    for _ in range(10):
        opt.step((K, pts, px))
    err = (true_pose.Inv() @ model.pose).Log().tensor()
    assert float(jnp.abs(err).max()) < 1e-4, err
