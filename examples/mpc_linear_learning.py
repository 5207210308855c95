"""Learning LTI dynamics by differentiating through MPC.

Workload parity: /root/reference/examples/module/mpc/linear.py — an
"expert" MPC runs on the true linear system; a learner's (A, B) are
recovered by gradient descent on the imitation loss, with gradients
flowing through the differentiable MPC pass (the final LQR solve).

    python examples/mpc_linear_learning.py [--iters 60]
"""

import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser(description='MPC linear learning')
    parser.add_argument('--iters', type=int, default=60)
    parser.add_argument('--lr', type=float, default=2e-2)
    parser.add_argument('--device', type=str, default=None)
    args = parser.parse_args()
    if args.device:
        jax.config.update('jax_platforms', args.device)

    import pypose_tpu as pp
    from pypose_tpu.module import LTI, MPC
    from pypose_tpu.utils import ReduceToBason

    n_batch, n_state, n_ctrl, T = 5, 3, 3, 5
    n_sc = n_state + n_ctrl
    C = jnp.eye(n_state)
    D = jnp.zeros((n_state, n_ctrl))
    c1 = jnp.zeros(n_state)
    c2 = jnp.zeros(n_state)
    dt = 1

    # expert system (reference linear.py:33-41)
    Q = jnp.tile(jnp.eye(n_sc), (n_batch, T, 1, 1))
    p = jnp.tile(jnp.asarray([0.6336, -0.2203, -0.1395, -0.7664, 0.8874,
                              0.8153]), (n_batch, T, 1))
    A_true = jnp.asarray([[1.1267, -0.0441, -0.0279],
                          [-0.1533, 1.1775, 0.1631],
                          [0.1618, 0.1238, 0.9489]])
    B_true = jnp.asarray([[0.4567, 0.7805, 0.0319],
                          [-0.5938, -0.5724, 0.0422],
                          [-0.1804, -0.2535, 1.7218]])

    def run_mpc(A, B, x_init):
        lti = LTI(A, B, C, D, c1, c2)
        mpc = MPC(lti, Q, p, T, stepper=ReduceToBason(steps=1))
        return mpc(dt, x_init)

    def loss_fn(params, x_init, x_true, u_true):
        x_pred, u_pred, _ = run_mpc(params['A'], params['B'], x_init)
        return jnp.mean((u_true - u_pred) ** 2) + \
            jnp.mean((x_true - x_pred) ** 2)

    # learner init (reference linear.py:45-51)
    key = jax.random.PRNGKey(0)
    params = {'A': jnp.asarray([[1.2082, -0.1587, -0.3358],
                                [0.2137, 0.8831, -0.1797],
                                [0.1807, 0.2676, 0.7561]]),
              'B': jnp.asarray([[-0.3033, -0.4966, 0.0820],
                                [-0.9567, 1.0006, -0.9712],
                                [0.0227, -0.6663, 0.2731]])}

    grad_fn = jax.grad(loss_fn)
    m = jax.tree_util.tree_map(jnp.zeros_like, params)   # RMSprop state
    first = last = None
    for it in range(args.iters):
        key, k = jax.random.split(key)
        x_init = jax.random.normal(k, (n_batch, n_state))
        x_true, u_true, _ = run_mpc(A_true, B_true, x_init)
        l = float(loss_fn(params, x_init, x_true, u_true))
        g = grad_fn(params, x_init, x_true, u_true)
        m = jax.tree_util.tree_map(lambda m_, g_: 0.9 * m_ + 0.1 * g_ * g_,
                                   m, g)
        params = jax.tree_util.tree_map(
            lambda p_, g_, m_: p_ - args.lr * g_ / (jnp.sqrt(m_) + 1e-8),
            params, g, m)
        first = l if first is None else first
        last = l
        if it % 10 == 0:
            print(f'iter {it}: imitation loss {l:.4e}')
    print(f'loss {first:.4e} -> {last:.4e}; '
          f'|A - A_true| max {float(jnp.abs(params["A"] - A_true).max()):.3f}')
    assert last < first * 0.5, 'learning through MPC failed to improve'


if __name__ == '__main__':
    main()
