"""End-to-end SparseLM speed on the real TPU: coupling vs generic matvec.

Times the warm device-side optimize() loop on sphere2500 (the headline
bench protocol)."""

import sys
import time

import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

import jax  # noqa: E402


def run(mv):
    from pypose_tpu.datasets import synthetic_sphere
    from pypose_tpu.optim.sparse import SparseLM, pgo_factor, \
        split_chain_edges
    from pypose_tpu.optim.strategy import TrustRegion

    ds = synthetic_sphere(2500)
    fixed = {'poses': jnp.zeros(2500, bool).at[0].set(True)}
    edges = jnp.asarray(ds['edges'])
    runs, rest = split_chain_edges(edges)
    factors = [pgo_factor(edges[jnp.asarray(r)], ds['poses'][jnp.asarray(r)])
               for r in runs]
    factors.append(pgo_factor(edges[jnp.asarray(rest)],
                              ds['poses'][jnp.asarray(rest)]))
    opt = SparseLM({'poses': ds['nodes']}, factors,
                   strategy=TrustRegion(radius=1e4), fixed=fixed,
                   cg_iter=150, cg_tol=1e-6, matvec=mv)
    t0 = time.perf_counter()
    opt.optimize(steps=6, decreasing=1e-6, patience=2)
    cold = time.perf_counter() - t0
    hist_cold = list(opt.history)
    opt.params = {'poses': ds['nodes']}
    opt.strategy_state = opt.strategy.init(jnp.float32)
    best = 1e9
    for _ in range(3):
        opt.params = {'poses': ds['nodes']}
        opt.strategy_state = opt.strategy.init(jnp.float32)
        t0 = time.perf_counter()
        loss = opt.optimize(steps=6, decreasing=1e-6, patience=2)
        best = min(best, time.perf_counter() - t0)
    n = len(opt.history)
    print(f'[{mv}] cold {cold:.1f}s; warm best {best*1e3:.1f} ms '
          f'({n} steps, {best/n*1e3:.1f} ms/step), chi2 '
          f'{hist_cold[0]:.4e} -> {loss:.4e}', flush=True)
    return best


if __name__ == '__main__':
    print('devices:', jax.devices())
    tg = run('generic')
    tc = run('coupling')
    print(f'coupling speedup on warm optimize(): {tg/tc:.2f}x')
