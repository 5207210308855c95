"""Learn an IMU bias corrector by backpropagating through preintegration.

Workload parity: examples/module/imu/imu_corrector.py (a small network
corrects raw IMU, trained through the differentiable IMUPreintegrator).
Here: a learned constant-bias + scale correction trained with optax
against ground-truth relative motion on synthetic data.

    python examples/imu_corrector.py [--iters 200] [--device cpu]
"""

import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser(description='IMU corrector training')
    parser.add_argument('--iters', type=int, default=200)
    parser.add_argument('--frames', type=int, default=50)
    parser.add_argument('--device', type=str, default=None)
    args = parser.parse_args()
    if args.device:
        jax.config.update('jax_platforms', args.device)

    import optax
    import pypose_tpu as pp
    from pypose_tpu.module import IMUPreintegrator

    F = args.frames
    true_gyro_bias = jnp.array([0.02, -0.01, 0.015])
    true_acc_bias = jnp.array([0.1, -0.05, 0.08])

    # ground truth motion: constant rotation + acceleration
    dt = jnp.full((1, F, 1), 0.01)
    gyro_clean = jnp.broadcast_to(jnp.array([0., 0., 0.7]), (1, F, 3))
    acc_clean = jnp.broadcast_to(jnp.array([0.5, 0., 9.81007]), (1, F, 3))
    integ = IMUPreintegrator(reset=True, prop_cov=False)
    gt = integ(dt, gyro_clean, acc_clean)
    gt_pos = gt['pos'][0, -1]
    gt_rot = gt['rot'][0, -1].tensor()

    # measured = clean + bias
    gyro_meas = gyro_clean + true_gyro_bias
    acc_meas = acc_clean + true_acc_bias

    def loss_fn(params):
        gyro = gyro_meas - params['gyro_bias']
        acc = acc_meas - params['acc_bias']
        out = integ(dt, gyro, acc)
        rot_err = (out['rot'][0, -1].Inv()
                   @ pp.SO3(gt_rot)).Log().tensor()
        pos_err = out['pos'][0, -1] - gt_pos
        return jnp.sum(rot_err ** 2) + jnp.sum(pos_err ** 2)

    params = {'gyro_bias': jnp.zeros(3), 'acc_bias': jnp.zeros(3)}
    opt = optax.adam(1e-2)
    state = opt.init(params)
    step = jax.jit(lambda p, s: _update(loss_fn, opt, p, s))
    for i in range(args.iters):
        params, state, loss = step(params, state)
        if i % 50 == 0:
            print(f'iter {i:4d}: loss {float(loss):.3e}')
    print('learned gyro bias:', np.asarray(params['gyro_bias']),
          'true:', np.asarray(true_gyro_bias))
    print('learned acc bias :', np.asarray(params['acc_bias']),
          'true:', np.asarray(true_acc_bias))


def _update(loss_fn, opt, params, state):
    loss, g = jax.value_and_grad(loss_fn)(params)
    updates, state = opt.update(g, state)
    import optax
    params = optax.apply_updates(params, updates)
    return params, state, loss


if __name__ == '__main__':
    main()
