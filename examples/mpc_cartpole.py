"""MPC swing-up on a cart-pole-like system.

Workload parity: examples/module/mpc.

    python examples/mpc_cartpole.py [--horizon 20] [--device cpu]
"""

import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser(description='MPC on cartpole')
    parser.add_argument('--horizon', type=int, default=15)
    parser.add_argument('--iters', type=int, default=5)
    parser.add_argument('--device', type=str, default=None)
    args = parser.parse_args()
    if args.device:
        jax.config.update('jax_platforms', args.device)

    import pypose_tpu as pp
    from pypose_tpu.module import NLS, MPC
    from pypose_tpu.utils import ReduceToBason

    class CartPole(NLS):
        def state_transition(self, state, input, t=None):
            # state: [x, dx, th, dth]
            x, dx, th, dth = (state[..., 0], state[..., 1],
                              state[..., 2], state[..., 3])
            f = input[..., 0]
            dt, g, mc, mp, l = 0.05, 9.81, 1.0, 0.1, 0.5
            tmp = (f + mp * l * dth ** 2 * jnp.sin(th)) / (mc + mp)
            thacc = (g * jnp.sin(th) - jnp.cos(th) * tmp) / \
                (l * (4.0 / 3 - mp * jnp.cos(th) ** 2 / (mc + mp)))
            xacc = tmp - mp * l * thacc * jnp.cos(th) / (mc + mp)
            return jnp.stack([x + dt * dx, dx + dt * xacc,
                              th + dt * dth, dth + dt * thacc], axis=-1)

        def observation(self, state, input, t=None):
            return state

    sys = CartPole()
    T = args.horizon
    ns, nc = 4, 1
    Q = jnp.diag(jnp.array([1., 0.1, 10., 0.1, 0.01]))[None]
    p = jnp.zeros((1, ns + nc))
    mpc = MPC(sys, Q, p, T, stepper=ReduceToBason(steps=args.iters))
    x0 = jnp.array([[0.0, 0.0, 0.3, 0.0]])
    x, u, cost = mpc(0.05, x0)
    print('final state:', x[0, -1])
    print('cost:', float(cost[0]))


if __name__ == '__main__':
    main()
