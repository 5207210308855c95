r"""CG iteration-count levers on the 100k-pose PGO (r4 verdict #2).

Per-iteration bytes are proven at the glue roofline (four written
negatives: fused-CG kernel, bf16 operands, couple read-sharing, tiled
streaming) — the untouched axis is the NUMBER of iterations: 250 x
143 us = 35.8 ms of the ~85 ms LM step.  This sweeps, at identical
problem/strategy settings to bench.py's [pgo-100k]:

  1. the baseline (cg_iter=250, cg_tol=1e-6 — tol never hit, cap binds)
  2. loose fixed tolerances (1e-3, 1e-2): does the TrustRegion loop
     absorb inexact steps without losing the chi2 trajectory?
  3. cg_warm: warm-start each LM step's CG from the previous delta
  4. cg_forcing: Eisenstat-Walker schedule eta_k = clip(
     gamma sqrt(chi2_k/chi2_{k-1}), cg_tol, 0.1)
  5. combinations

Reported per config: warm wall/step over the 6-step optimize + the full
chi2 trajectory.  Equal trajectory at less time = free speedup.

Run:  timeout 3600 python tools/cg_forcing_prof.py [N]
"""

import sys
import time

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
    configs = [
        ('base-250/1e-6', dict(cg_iter=250, cg_tol=1e-6)),
        ('tol-1e-3', dict(cg_iter=250, cg_tol=1e-3)),
        ('tol-1e-2', dict(cg_iter=250, cg_tol=1e-2)),
        ('warm', dict(cg_iter=250, cg_tol=1e-6, cg_warm=True)),
        ('forcing-0.5', dict(cg_iter=250, cg_tol=1e-6, cg_forcing=0.5)),
        ('warm+forcing', dict(cg_iter=250, cg_tol=1e-6, cg_warm=True,
                              cg_forcing=0.5)),
        ('warm+tol-1e-3', dict(cg_iter=250, cg_tol=1e-3, cg_warm=True)),
    ]
    for name, kw in configs:
        try:
            opt = SparseLM({'poses': ds['nodes']}, factors(),
                           strategy=TrustRegion(radius=1e4), fixed=fixed,
                           **kw)
            t0 = time.perf_counter()
            opt.optimize(steps=6, decreasing=1e-6, patience=2)  # compile
            t_cold = time.perf_counter() - t0
            opt.params = {'poses': ds['nodes']}
            opt.strategy_state = opt.strategy.init(jnp.float32)
            t0 = time.perf_counter()
            loss = opt.optimize(steps=6, decreasing=1e-6, patience=2)
            dt = time.perf_counter() - t0
            n = max(len(opt.history), 1)
            print(f'[{name}] {n} steps in {dt*1e3:.1f} ms '
                  f'({dt/n*1e3:.1f} ms/step; cold {t_cold:.1f}s); chi2 '
                  + ' -> '.join(f'{h:.4e}' for h in opt.history),
                  file=sys.stderr, flush=True)
        except Exception as e:
            print(f'[{name}] FAILED: {e!r}', file=sys.stderr, flush=True)
    print('OK')


if __name__ == '__main__':
    main()
