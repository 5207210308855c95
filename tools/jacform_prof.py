"""Closed-form vs jacrev per-edge PGO Jacobian blocks at scale, on TPU.

The BA path measured vmapped jacrev BEATING the closed-form BAL chain
rule (10.5 vs 14.8 ms — CLAUDE.md).  pgo_factor attaches a closed-form
tangent Jacobian (Jl_inv(r) @ Adj(M)); its batched small-matrix algebra
carries ~1.25 GB of (8,128)-padded temps at E=1.8e5
(tools/formation_prof.py mem[blocks]).  This tool times both forms so
SparseLM keeps the faster one.

Usage: python tools/jacform_prof.py [--n 100000]
"""

import argparse
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=100_000)
    args = ap.parse_args()

    print('devices:', jax.devices(), flush=True)
    from pypose_tpu.datasets import synthetic_sphere
    from pypose_tpu.optim.sparse import (SparseLM, pgo_factor, Factor,
                                         split_chain_edges)
    from pypose_tpu.optim.strategy import TrustRegion

    ds = synthetic_sphere(args.n)
    edges = jnp.asarray(ds['edges'])
    runs, rest = split_chain_edges(edges)

    def build(closed):
        factors = []
        for r in list(runs) + ([rest] if len(rest) else []):
            f = pgo_factor(edges[jnp.asarray(r)], ds['poses'][jnp.asarray(r)])
            if not closed:
                f = Factor(f.residual, indices={'poses': edges[jnp.asarray(r)]},
                           consts=f.consts)  # jacrev fallback
            factors.append(f)
        return SparseLM({'poses': ds['nodes']}, factors,
                        strategy=TrustRegion(radius=1e4),
                        fixed={'poses': jnp.zeros(args.n, bool).at[0]
                               .set(True)},
                        cg_iter=250, cg_tol=1e-6)

    results = {}
    for label, closed in (('closed-form', True), ('jacrev', False)):
        opt = build(closed)
        params, fdata = opt.params, opt._factor_data()

        @jax.jit
        def mk_blocks(params, fdata, opt=opt):
            return [opt._weighted(f, fd, *opt._edge_r_jac(params, f, fd, fi))
                    for fi, (f, fd) in enumerate(zip(opt.factors, fdata))]

        t = timeit(mk_blocks, params, fdata)
        try:
            mem = jax.jit(mk_blocks).lower(params, fdata) \
                .compile().memory_analysis()
            memtxt = f' temp={mem.temp_size_in_bytes/1e6:.0f}MB'
        except Exception:
            memtxt = ''
        print(f'{label}: blocks {t*1e3:.2f} ms{memtxt}', flush=True)
        results[label] = (t, mk_blocks(params, fdata))

    # value agreement
    (tc, bc), (tj, bj) = results['closed-form'], results['jacrev']
    for k, (fc, fj) in enumerate(zip(bc, bj)):
        err_r = float(jnp.abs(fc[0] - fj[0]).max())
        err_J = float(jnp.abs(fc[1]['poses'] - fj[1]['poses']).max())
        print(f'factor {k}: |dr|={err_r:.2e} |dJ|={err_J:.2e}', flush=True)
    print(f'speedup closed/jacrev: {tc/tj:.2f}x '
          f'({"jacrev wins" if tj < tc else "closed-form wins"})',
          flush=True)


if __name__ == '__main__':
    main()
