"""Dynamics examples: Floquet-style LTV rollout and neural-network
dynamics learning.

Workload parity: examples/module/dynamics/{floquet,neuralnet,cartpole}.py.

    python examples/dynamics.py [--device cpu]
"""

import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser(description='Dynamics examples')
    parser.add_argument('--steps', type=int, default=100)
    parser.add_argument('--device', type=str, default=None)
    args = parser.parse_args()
    if args.device:
        jax.config.update('jax_platforms', args.device)

    import pypose_tpu as pp
    from pypose_tpu.module import LTV, NLS

    # ---- Floquet-style periodic LTV system ------------------------------
    class Floquet(LTV):
        def __init__(self):
            super().__init__(None, jnp.eye(2)[:, :1], jnp.eye(2),
                             jnp.zeros((2, 1)))

        @property
        def A(self):
            t = self.systime.astype(jnp.float32)
            c = jnp.cos(2 * jnp.pi * t / 100)
            return jnp.array([[1., c * 0.1], [c * 0.1, 1.]])

        @property
        def B(self):
            t = self.systime.astype(jnp.float32)
            return jnp.array([[jnp.sin(2 * jnp.pi * t / 50)], [1.0]])

    sys_ltv = Floquet()
    x = jnp.array([1., 1.])
    traj = [x]
    for k in range(args.steps):
        u = jnp.ones(1) * 0.1
        x, y = sys_ltv(x, u)
        traj.append(x)
    traj = jnp.stack(traj)
    print('Floquet LTV rollout:', traj.shape, 'final state', np.asarray(x))

    # ---- neural-network dynamics learning -------------------------------
    import optax

    class TrueSys(NLS):
        def state_transition(self, state, input, t=None):
            return jnp.stack([
                state[..., 0] + 0.1 * state[..., 1],
                state[..., 1] + 0.1 * (jnp.sin(state[..., 0])
                                       + input[..., 0])], axis=-1)

        def observation(self, state, input, t=None):
            return state

    def mlp(params, x):
        h = jnp.tanh(x @ params['w1'] + params['b1'])
        return h @ params['w2'] + params['b2']

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {'w1': 0.5 * jax.random.normal(k1, (3, 32)),
              'b1': jnp.zeros(32),
              'w2': 0.5 * jax.random.normal(k2, (32, 2)),
              'b2': jnp.zeros(2)}

    true_sys = TrueSys()
    # training data: random transitions
    xs = jax.random.normal(jax.random.PRNGKey(1), (512, 2))
    us = jax.random.normal(jax.random.PRNGKey(2), (512, 1))
    ys = true_sys.state_transition(xs, us)

    def loss_fn(p):
        pred = mlp(p, jnp.concatenate([xs, us], -1))
        return jnp.mean((pred - ys) ** 2)

    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        upd, s = opt.update(g, s)
        return optax.apply_updates(p, upd), s, l

    for i in range(300):
        params, state, l = step(params, state)
    print(f'NN dynamics fit: final MSE {float(l):.2e}')

    # plug the learned net into an NLS for linearization-based control
    class LearnedSys(NLS):
        def state_transition(self, state, input, t=None):
            return mlp(params, jnp.concatenate([state, input], -1))

        def observation(self, state, input, t=None):
            return state

    lsys = LearnedSys()
    x0 = jnp.array([0.5, -0.2])
    u0 = jnp.array([0.1])
    lsys.forward(x0, u0)
    lsys.set_refpoint(state=x0, input=u0)
    A_learned = lsys.A
    true_sys.forward(x0, u0)
    true_sys.set_refpoint(state=x0, input=u0)
    A_true = true_sys.A
    print('linearization A (learned vs true) max diff:',
          float(jnp.abs(A_learned - A_true).max()))


if __name__ == '__main__':
    main()
