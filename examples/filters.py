"""State estimation with EKF / UKF / PF on a nonlinear system.

Workload parity: examples/module/ekf (and BASELINE config: EKF vs UKF vs
PF on an NLS nonlinear system).

    python examples/filters.py [--steps 100] [--device cpu]
"""

import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser(description='EKF vs UKF vs PF')
    parser.add_argument('--steps', type=int, default=100)
    parser.add_argument('--particles', type=int, default=1000)
    parser.add_argument('--device', type=str, default=None)
    args = parser.parse_args()
    if args.device:
        jax.config.update('jax_platforms', args.device)

    import pypose_tpu as pp
    from pypose_tpu.module import NLS, EKF, UKF, PF

    class Pendulum(NLS):
        def state_transition(self, state, input, t=None):
            th, om = state[..., 0], state[..., 1]
            dt = 0.05
            om = om + dt * (-9.81 * jnp.sin(th) + input[..., 0])
            th = th + dt * om
            return jnp.stack([th, om], axis=-1)

        def observation(self, state, input, t=None):
            return jnp.stack([jnp.sin(state[..., 0]),
                              jnp.cos(state[..., 0])], axis=-1)

    model = Pendulum()
    N, M = 2, 2
    q, r = 0.01, 0.05
    Q = jnp.eye(N) * q ** 2
    R = jnp.eye(M) * r ** 2

    filters = {
        'EKF': EKF(Pendulum(), Q, R),
        'UKF': UKF(Pendulum(), Q, R),
        'PF': PF(Pendulum(), Q, R, particles=args.particles),
    }

    key = jax.random.PRNGKey(0)
    state = jnp.array([0.8, 0.0])
    estim = {k: jnp.zeros(N) for k in filters}
    P = {k: jnp.eye(N) for k in filters}
    sq_err = {k: 0.0 for k in filters}

    for i in range(args.steps):
        key, k1, k2, k3 = jax.random.split(key, 4)
        u = jnp.zeros(1)
        state, _ = model(state + q * jax.random.normal(k1, (N,)), u)
        obs = model.observation(state, u) + r * jax.random.normal(k2, (M,))
        for name, filt in filters.items():
            kwargs = {'key': k3} if name == 'PF' else {}
            estim[name], P[name] = filt(estim[name], obs, u, P[name],
                                        **kwargs)
            sq_err[name] += float(jnp.sum((estim[name] - state) ** 2))

    for name in filters:
        rmse = (sq_err[name] / args.steps) ** 0.5
        print(f'{name}: RMSE {rmse:.4f}')


if __name__ == '__main__':
    main()
