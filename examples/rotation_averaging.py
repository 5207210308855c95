"""Rotation averaging (SO3 synchronization) and Sim3 scale-drift pose
graphs through the group-generic factor-graph stack.

Capability beyond the reference's SE3-only pgo example
(examples/module/pgo/pgo.py): `pgo_factor` accepts any group type whose
storage supports Inv/@/Log — the SparseLM machinery (tangent dims,
retraction, CG) follows the ltype.

    python examples/rotation_averaging.py [--nodes 200] [--device cpu]
"""

import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))
import time

import jax
import jax.numpy as jnp
import numpy as np


def solve_graph(name, truth, noisy, edges, steps):
    import pypose_tpu as pp
    from pypose_tpu.optim.sparse import SparseLM, pgo_factor
    from pypose_tpu.optim.strategy import TrustRegion

    N = truth.lshape[0]
    Z = truth[edges[:, 0]].Inv() @ truth[edges[:, 1]]
    opt = SparseLM({'x': noisy}, [pgo_factor(edges, Z, name='x')],
                   strategy=TrustRegion(radius=1e4),
                   fixed={'x': jnp.zeros(N, bool).at[0].set(True)},
                   cg_iter=100, cg_tol=1e-10)
    t0 = time.perf_counter()
    final = opt.optimize(steps=steps, decreasing=1e-10, patience=3)
    X = opt.params['x']
    G = X[0] @ truth[0].Inv()          # global left gauge
    err = ((G.Inv() @ X).Inv() @ truth).Log().tensor()
    print(f'[{name}] chi2 {opt.history[0]:.3e} -> {final:.3e} in '
          f'{len(opt.history)} LM steps ({time.perf_counter()-t0:.2f}s); '
          f'max tangent error vs truth {float(jnp.abs(err).max()):.2e}')
    return final


def main():
    parser = argparse.ArgumentParser(
        description='SO3 rotation averaging + Sim3 pose graph')
    parser.add_argument('--nodes', type=int, default=200)
    parser.add_argument('--steps', type=int, default=10)
    parser.add_argument('--device', type=str, default=None)
    args = parser.parse_args()
    if args.device:
        jax.config.update('jax_platforms', args.device)

    import pypose_tpu as pp

    N = args.nodes
    ii = jnp.arange(N - 1)
    rng = np.random.default_rng(0)
    loops = rng.integers(0, N, size=(max(N // 10, 2), 2))
    loops = loops[loops[:, 0] != loops[:, 1]]
    edges = jnp.concatenate([jnp.stack([ii, ii + 1], 1),
                             jnp.array([[N - 1, 0]]),
                             jnp.asarray(loops, jnp.int32)], 0)

    # SO3: multi-view rotation synchronization
    truth = pp.randn_SO3(N, key=jax.random.PRNGKey(0))
    noisy = truth @ pp.randn_SO3(N, sigma=0.1, key=jax.random.PRNGKey(1))
    solve_graph('so3-averaging', truth, noisy, edges, args.steps)

    # Sim3: monocular-SLAM style scale drift correction
    truth = pp.randn_Sim3(N, sigma=(0.3, 0.2, 0.1),
                          key=jax.random.PRNGKey(2))
    noisy = truth @ pp.randn_Sim3(N, sigma=(0.1, 0.05, 0.05),
                                  key=jax.random.PRNGKey(3))
    solve_graph('sim3-pgo', truth, noisy, edges, args.steps)


if __name__ == '__main__':
    main()
