r"""Does the 100k-pose PGO LM trajectory actually need cg_iter=250?

cg_tol=1e-6 is never hit at the 250-iteration cap (tools/pgo100k_prof.py
r4), so every LM step pays the full 250 x 143 us.  Inexact-Newton theory
says early LM steps tolerate loose solves; this sweeps the cap and
prints the chi2 trajectory + warm ms/step so the cap can be set by
evidence (same final chi2 = free speedup; worse = keep 250).

Run:  timeout 1800 python tools/cg_iter_sweep.py [N]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    print('devices:', jax.devices(), file=sys.stderr)
    from pypose_tpu.datasets import synthetic_sphere
    from pypose_tpu.optim.sparse import (SparseLM, pgo_factor,
                                         split_chain_edges)
    from pypose_tpu.optim.strategy import TrustRegion

    ds = synthetic_sphere(N)
    edges = jnp.asarray(ds['edges'])
    runs, rest = split_chain_edges(edges)

    def factors():
        fs = [pgo_factor(edges[jnp.asarray(r)], ds['poses'][jnp.asarray(r)])
              for r in runs]
        if len(rest):
            fs.append(pgo_factor(edges[jnp.asarray(rest)],
                                 ds['poses'][jnp.asarray(rest)]))
        return fs

    fixed = {'poses': jnp.zeros(N, bool).at[0].set(True)}
    for cg_iter in (60, 100, 150, 250):
        opt = SparseLM({'poses': ds['nodes']}, factors(),
                       strategy=TrustRegion(radius=1e4), fixed=fixed,
                       cg_iter=cg_iter, cg_tol=1e-6)
        opt.optimize(steps=6, decreasing=1e-6, patience=2)   # compile
        opt.params = {'poses': ds['nodes']}
        opt.strategy_state = opt.strategy.init(jnp.float32)
        t0 = time.perf_counter()
        loss = opt.optimize(steps=6, decreasing=1e-6, patience=2)
        dt = time.perf_counter() - t0
        traj = ' -> '.join(f'{h:.4e}' for h in opt.history)
        print(f'cg_iter={cg_iter:4d}: {dt/len(opt.history)*1e3:6.1f} '
              f'ms/step  chi2 {traj}', file=sys.stderr)


if __name__ == '__main__':
    main()
