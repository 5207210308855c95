"""Bicycle kinematics filtered with EKF / UKF / PF.

Workload parity: /root/reference/examples/module/filter/bicycle.py
(the 2D bicycle kinematic model driven with rotational + forward
velocity, estimated by the batteries-included filters; plotting is
replaced by printed error statistics — no display in this environment).

    python examples/bicycle.py [--steps 40] [--device cpu]
"""

import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser(description='Bicycle model filtering')
    parser.add_argument('--steps', type=int, default=40)
    parser.add_argument('--particles', type=int, default=400)
    parser.add_argument('--device', type=str, default=None)
    args = parser.parse_args()
    if args.device:
        jax.config.update('jax_platforms', args.device)

    import pypose_tpu as pp
    from pypose_tpu.module import NLS, EKF, UKF, PF

    class Bicycle(NLS):
        """2D bicycle kinematics (reference bicycle.py:9-37): state
        (x, y, theta), input (speed, steering rate)."""

        def state_transition(self, state, input, t=None):
            theta = state[..., 2] + input[..., 1]
            x = state[..., 0] + input[..., 0] * jnp.cos(theta)
            y = state[..., 1] + input[..., 0] * jnp.sin(theta)
            return jnp.stack([x, y, theta], axis=-1)

        def observation(self, state, input, t=None):
            return state

    N = 3
    q, r = 0.02, 0.05
    Q = jnp.eye(N) * q ** 2
    R = jnp.eye(N) * r ** 2
    filters = {
        'EKF': EKF(Bicycle(), Q, R),
        'UKF': UKF(Bicycle(), Q, R),
        'PF': PF(Bicycle(), Q, R, particles=args.particles),
    }

    model = Bicycle()
    key = jax.random.PRNGKey(0)
    state = jnp.zeros(N)                        # true state
    est = {k: jnp.zeros(N) for k in filters}
    P = {k: jnp.eye(N) * 0.1 for k in filters}
    sq = {k: 0.0 for k in filters}

    for i in range(args.steps):
        key, k1, k2 = jax.random.split(key, 3)
        # constant speed, sinusoidal steering — the reference's circuit
        u = jnp.array([0.3, 0.1 * jnp.sin(0.2 * i)])
        state = model.state_transition(state, u) \
            + jax.random.normal(k1, (N,)) * q
        obs = model.observation(state, u) + jax.random.normal(k2, (N,)) * r
        for name, f in filters.items():
            if name == 'PF':
                f.model.reset()
            est[name], P[name] = f(est[name], obs, u, P[name])
            sq[name] = sq[name] + jnp.sum((est[name] - state) ** 2)

    obs_only = float(jnp.sqrt(jnp.asarray(r ** 2 * N)))
    print(f'true final state: {state}')
    for name in filters:
        rmse = float(jnp.sqrt(sq[name] / args.steps))
        print(f'{name}: RMSE {rmse:.4f} (raw observation noise '
              f'{obs_only:.4f})')
        assert rmse < 0.5, f'{name} diverged'


if __name__ == '__main__':
    main()
