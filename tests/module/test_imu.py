"""IMU preintegration tests: straight-line and rotational motion with known
closed-form ground truth; covariance propagation shape/psd checks; gradient
flow through preintegration.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pypose_tpu as pp
from pypose_tpu.module import IMUPreintegrator


def test_static_gravity_compensation():
    """Stationary IMU measuring only gravity must predict zero motion."""
    integ = IMUPreintegrator(reset=True, prop_cov=True)
    F = 20
    dt = jnp.full((1, F, 1), 0.01)
    gyro = jnp.zeros((1, F, 3))
    acc = jnp.broadcast_to(jnp.array([0., 0., 9.81007]), (1, F, 3))
    out = integ(dt, gyro, acc)
    np.testing.assert_allclose(np.asarray(out['pos'][0, -1]), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out['vel'][0, -1]), 0.0, atol=1e-4)
    err = (out['rot'][0, -1].Inv() @ pp.identity_SO3()).Log().tensor()
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-5)
    assert out['cov'].shape == (1, 9, 9)
    # covariance PSD
    w = np.linalg.eigvalsh(np.asarray(out['cov'][0], dtype=np.float64))
    assert (w > -1e-12).all()


def test_constant_acceleration():
    """Free-fall-compensated constant acceleration: p = 0.5 a t^2."""
    integ = IMUPreintegrator(reset=True, prop_cov=False)
    F, dtv, a = 50, 0.01, 2.0
    dt = jnp.full((1, F, 1), dtv)
    gyro = jnp.zeros((1, F, 3))
    acc = jnp.broadcast_to(jnp.array([a, 0., 9.81007]), (1, F, 3))
    out = integ(dt, gyro, acc)
    t = F * dtv
    np.testing.assert_allclose(float(out['pos'][0, -1, 0]), 0.5 * a * t ** 2,
                               rtol=1e-2)
    np.testing.assert_allclose(float(out['vel'][0, -1, 0]), a * t, rtol=1e-3)


def test_constant_rotation():
    """Pure z-rotation: integrated rotation equals wz * t about z."""
    integ = IMUPreintegrator(reset=True, prop_cov=False, gravity=0.0)
    F, dtv, wz = 100, 0.01, 0.5
    dt = jnp.full((1, F, 1), dtv)
    gyro = jnp.broadcast_to(jnp.array([0., 0., wz]), (1, F, 3))
    acc = jnp.zeros((1, F, 3))
    out = integ(dt, gyro, acc)
    phi = out['rot'][0, -1].Log().tensor()
    np.testing.assert_allclose(np.asarray(phi),
                               [0., 0., wz * F * dtv], atol=1e-5)


def test_stateful_continuation():
    """Non-reset integrator continues from its buffered state."""
    integ = IMUPreintegrator(reset=False, prop_cov=True, gravity=0.0)
    F = 10
    dt = jnp.full((1, F, 1), 0.01)
    gyro = jnp.broadcast_to(jnp.array([0., 0., 1.0]), (1, F, 3))
    acc = jnp.zeros((1, F, 3))
    integ(dt, gyro, acc)
    out2 = integ(dt, gyro, acc)
    phi = out2['rot'][0, -1].Log().tensor()
    np.testing.assert_allclose(np.asarray(phi), [0., 0., 0.2], atol=1e-5)


def test_gradient_through_preintegration():
    integ = IMUPreintegrator(reset=True, prop_cov=False, gravity=0.0)
    F = 5
    dt = jnp.full((1, F, 1), 0.01)
    acc = jnp.ones((1, F, 3)) * 0.1

    def loss(gyro):
        out = integ(dt, gyro, acc)
        return jnp.sum(out['pos'] ** 2) + \
            jnp.sum(out['rot'].Log().tensor() ** 2)

    g = jax.grad(loss)(jnp.ones((1, F, 3)) * 0.2)
    assert g.shape == (1, F, 3)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_known_rotation_input():
    """When per-frame rotations are supplied, gravity is compensated in the
    given frame (imu_preintegrator.py:341-352 semantics)."""
    integ = IMUPreintegrator(reset=True, prop_cov=False)
    F = 10
    dt = jnp.full((1, F, 1), 0.01)
    gyro = jnp.zeros((1, F, 3))
    acc = jnp.broadcast_to(jnp.array([0., 0., 9.81007]), (1, F, 3))
    rot = pp.identity_SO3(1, F)
    out = integ(dt, gyro, acc, rot=rot)
    np.testing.assert_allclose(np.asarray(out['pos'][0, -1]), 0.0,
                               atol=1e-5)
