"""IMU preintegration example on KITTI raw data or a synthetic trajectory.

Workload parity: examples/module/imu/imu_integrator.py (KITTI raw IMU).
Point ``--kitti`` at an extracted drive directory (containing ``oxts/``,
e.g. ``.../2011_09_26/2011_09_26_drive_0005_sync``) to integrate the real
stream and report drift vs the OXTS ground truth; without it a smooth
trajectory is synthesized (no downloads in this environment).

    python examples/imu_integration.py [--frames 500] [--kitti DIR]
"""

import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import jax
import jax.numpy as jnp
import numpy as np


def synthesize_imu(frames, dt=0.01, seed=0):
    """Ground truth: circular drive with sinusoidal vertical bob."""
    t = np.arange(frames) * dt
    w = 0.5
    # angular velocity: constant yaw rate; accel in body frame
    import pypose_tpu as pp
    yaw = w * t
    gyro = np.zeros((frames, 3))
    gyro[:, 2] = w
    # body-frame acceleration for circular motion of radius R: centripetal
    R = 5.0
    acc = np.zeros((frames, 3))
    acc[:, 1] = R * w * w  # centripetal toward center (body +y)
    acc[:, 2] = 9.81007    # gravity compensation term measured by IMU
    rng = np.random.default_rng(seed)
    gyro += rng.normal(size=gyro.shape) * 1e-4
    acc += rng.normal(size=acc.shape) * 1e-3
    return (jnp.full((1, frames, 1), dt), jnp.asarray(gyro)[None],
            jnp.asarray(acc)[None])


def main():
    parser = argparse.ArgumentParser(description='IMU Preintegration')
    parser.add_argument('--frames', type=int, default=500)
    parser.add_argument('--device', type=str, default=None)
    parser.add_argument('--kitti', type=str, default=None,
                        help='path to an extracted KITTI raw drive '
                             '(directory containing oxts/)')
    args = parser.parse_args()
    if args.device:
        jax.config.update('jax_platforms', args.device)

    import pypose_tpu as pp
    from pypose_tpu.module import IMUPreintegrator

    if args.kitti:
        from pypose_tpu.datasets import load_kitti_imu
        data = load_kitti_imu(args.kitti)
        F = min(args.frames, data['dt'].shape[0])
        integrator = IMUPreintegrator(
            rot=data['gt_rot'][0], vel=data['gt_vel'][0],
            reset=True, prop_cov=True)
        # integrate frames 0..F-2: the state after k steps sits at frame
        # k, so the last comparable ground-truth entry is gt_pos[F-1]
        out = integrator(data['dt'][None, :F - 1],
                         data['gyro'][None, :F - 1],
                         data['acc'][None, :F - 1])
        drift = np.asarray(out['pos'][0, -1] - data['gt_pos'][F - 1])
        print('KITTI drive: %d frames' % F)
        print('integrated position:', np.asarray(out['pos'][0, -1]))
        print('ground-truth position:', np.asarray(data['gt_pos'][F - 1]))
        print('drift: %.3f m' % float(np.linalg.norm(drift)))
        print('covariance trace:', float(jnp.trace(out['cov'][0])))
        return

    dt, gyro, acc = synthesize_imu(args.frames)
    integrator = IMUPreintegrator(
        vel=jnp.array([2.5, 0., 0.]), reset=True, prop_cov=True)
    out = integrator(dt, gyro, acc)
    print('final position:', np.asarray(out['pos'][0, -1]))
    print('final velocity:', np.asarray(out['vel'][0, -1]))
    print('final rotation (rpy):', np.asarray(out['rot'][0, -1].euler()))
    print('covariance trace:', float(jnp.trace(out['cov'][0])))


if __name__ == '__main__':
    main()
