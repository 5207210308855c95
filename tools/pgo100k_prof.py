r"""Stage breakdown of the 100k-pose PGO LM step on the real TPU.

The r3 accounting put the CG solve at 74 ms/step (~300 us/CG-iter
"effective") while the standalone einsum CG with identically-shaped
operands measures 58-120 us/iter (tools/tiled_cg_prof.py) — a 2.5x gap
this profiler localizes.  Pieces timed with the bench.py sync recipe
(device_get drain + block differencing):

  1. formation: blocks + rhs + diag + block-diag accum + stencil channels
  2. raw matvec (SparseLM._matvec via spmv couple), per call
  3. CG solve (jax.scipy, the real path) at fixed damping, per iteration
     + a counting replica to get the actual iteration count
  4. chi2 / retract / pred_reduction
  5. the full _core step and the 6-step optimize for reference

Run:  timeout 900 python tools/pgo100k_prof.py   (takes the TPU tunnel)
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

_HI = jax.lax.Precision.HIGHEST


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0])


def warm_time(fn, n_lo=2, n_hi=12, repeats=3):
    sync(fn())
    def block(n):
        best = float('inf')
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best
    return max(block(n_hi) - block(n_lo), 1e-12) / (n_hi - n_lo)


def main():
    print('devices:', jax.devices(), file=sys.stderr)
    from pypose_tpu.datasets import synthetic_sphere
    from pypose_tpu.optim.sparse import (SparseLM, pgo_factor,
                                         split_chain_edges)
    from pypose_tpu.optim.strategy import TrustRegion

    N = 100_000
    ds = synthetic_sphere(N)
    edges = jnp.asarray(ds['edges'])
    runs, rest = split_chain_edges(edges)
    factors = [pgo_factor(edges[jnp.asarray(r)],
                          ds['poses'][jnp.asarray(r)]) for r in runs]
    if len(rest):
        factors.append(pgo_factor(edges[jnp.asarray(rest)],
                                  ds['poses'][jnp.asarray(rest)]))
    fixed = {'poses': jnp.zeros(N, bool).at[0].set(True)}
    opt = SparseLM({'poses': ds['nodes']}, factors,
                   strategy=TrustRegion(radius=1e4), fixed=fixed,
                   cg_iter=250,
                   cg_tol=float(__import__('os').environ.get(
                       'PPT_PROF_CGTOL', '1e-3')))
    params = opt.params
    fdata = opt._factor_data()
    print(f'N={N} E={edges.shape[0]} factors={len(factors)} '
          f'spmv={opt._spmv_name} stencil_all='
          f'{opt._stencil_all and opt._stencil_all.offsets}',
          file=sys.stderr)

    # ---- 1. formation ---------------------------------------------------
    @jax.jit
    def formation(params, fdata):
        blocks = [opt._weighted(f, fd, *opt._edge_r_jac(params, f, fd, fi))
                  for fi, (f, fd) in enumerate(zip(opt.factors, fdata))]
        b = opt._rhs(blocks, fdata)
        diag_raw = opt._diag(blocks, fdata)
        accum = opt._block_diag_accum(blocks, fdata)
        nm = opt._spmv_name
        states = [sp.precompute(blk[1][nm], blk[3][nm])
                  for sp, blk in zip(opt._spmv, blocks)]
        return blocks, b, diag_raw, accum, states

    t = warm_time(lambda: formation(params, fdata))
    print(f'[formation] {t*1e3:.2f} ms', file=sys.stderr)
    blocks, b, diag_raw, accum, states = formation(params, fdata)
    nm = opt._spmv_name
    diagA = {n: jnp.clip(v, opt.min, opt.max) for n, v in diag_raw.items()}

    # ---- 2. matvec ------------------------------------------------------
    D_spmv = accum[nm]

    def raw_matvec(x):
        xm = opt._mask(nm, x[nm])
        y = jnp.einsum('ntu,nu->nt', D_spmv, xm, precision=_HI)
        for sp, st in zip(opt._spmv, states):
            y = y + sp.couple(st, xm)
        return {nm: opt._mask(nm, y)}

    x0 = {nm: jnp.asarray(
        np.random.default_rng(0).standard_normal(b[nm].shape), jnp.float32)}

    @functools.partial(jax.jit, static_argnames='iters')
    def mv_chain(x, iters):
        def body(i, x):
            y = raw_matvec(x)
            # normalize so the chain doesn't overflow
            s = jax.lax.rsqrt(jnp.sum(y[nm] * y[nm]) + 1e-30)
            return {nm: y[nm] * s}
        return jax.lax.fori_loop(0, iters, body, x)

    t80 = warm_time(lambda: mv_chain(x0, 80), n_lo=1, n_hi=3)
    t10 = warm_time(lambda: mv_chain(x0, 10), n_lo=1, n_hi=3)
    print(f'[matvec] {(t80 - t10)/70*1e6:.1f} us/call '
          f'(chain-differenced 80 vs 10)', file=sys.stderr)

    # ---- 3. CG solve ----------------------------------------------------
    damping = jnp.asarray(1e-4, jnp.float32)

    def make_solver(maxiter):
        @jax.jit
        def solve(damping, b):
            def Avp(x):
                y = raw_matvec(x)
                return {n: y[n] + (diagA[n] - diag_raw[n]
                                   + damping * diagA[n]) * opt._mask(n, x[n])
                        for n in y}
            from pypose_tpu.ops.smallinv import blockinv
            damped = opt._damped_blocks(accum, {nm: 1.0 + damping})
            Binv = {nm: blockinv(damped[nm])}

            def M(x):
                return {n: jnp.einsum('ntu,nu->nt', Binv[n], x[n],
                                      precision=_HI) for n in x}
            x, _ = jax.scipy.sparse.linalg.cg(
                Avp, b, tol=opt.cg_tol, maxiter=maxiter, M=M)
            return x
        return solve

    s250 = make_solver(250)
    s10 = make_solver(10)
    t250 = warm_time(lambda: s250(damping, b), n_lo=1, n_hi=3)
    t10s = warm_time(lambda: s10(damping, b), n_lo=1, n_hi=3)

    # counting replica (same recursion as jax.scipy.cg)
    @jax.jit
    def count_cg(damping, b):
        def Avp(x):
            y = raw_matvec(x)
            return {n: y[n] + (diagA[n] - diag_raw[n]
                               + damping * diagA[n]) * opt._mask(n, x[n])
                    for n in y}
        from pypose_tpu.ops.smallinv import blockinv
        damped = opt._damped_blocks(accum, {nm: 1.0 + damping})
        Binv = {nm: blockinv(damped[nm])}
        bv = b[nm]
        atol2 = (opt.cg_tol ** 2) * jnp.sum(bv * bv)

        def M(r):
            return jnp.einsum('ntu,nu->nt', Binv[nm], r, precision=_HI)

        r0 = bv
        z0 = M(r0)
        gamma0 = jnp.sum(r0 * z0)

        def cond(st):
            x, r, z, p, gamma, it = st
            return (jnp.sum(r * r) > atol2) & (it < 250)

        def body(st):
            x, r, z, p, gamma, it = st
            q = Avp({nm: p})[nm]
            alpha = gamma / jnp.sum(p * q)
            x = x + alpha * p
            r = r - alpha * q
            z = M(r)
            g2 = jnp.sum(r * z)
            p = z + (g2 / gamma) * p
            return (x, r, z, p, g2, it + 1)

        st = (jnp.zeros_like(bv), r0, z0, z0, gamma0,
              jnp.asarray(0, jnp.int32))
        x, _, _, _, _, it = jax.lax.while_loop(cond, body, st)
        return x, it

    _, iters = count_cg(damping, b)
    iters = int(jax.device_get(iters))
    per = (t250 - t10s) / max(iters - 10, 1) if iters > 10 else float('nan')
    print(f'[cg] jax.scipy solve(maxiter=250): {t250*1e3:.2f} ms; '
          f'maxiter=10: {t10s*1e3:.2f} ms; counting replica converged at '
          f'it={iters} -> {per*1e6:.1f} us/iter marginal', file=sys.stderr)
    tc = warm_time(lambda: count_cg(damping, b), n_lo=1, n_hi=3)
    print(f'[cg] counting replica full solve: {tc*1e3:.2f} ms '
          f'({tc/max(iters,1)*1e6:.1f} us/iter avg)', file=sys.stderr)

    # ---- 4. small stages ------------------------------------------------
    chi2 = jax.jit(lambda p: opt._chi2(p, fdata))
    t = warm_time(lambda: chi2(params))
    print(f'[chi2] {t*1e3:.2f} ms', file=sys.stderr)

    # ---- 5. whole step / optimize ---------------------------------------
    if opt.strategy_state is None:
        opt.strategy_state = opt.strategy.init(jnp.float32)
    core = jax.jit(opt._core)
    t = warm_time(lambda: core(params, opt.strategy_state, fdata),
                  n_lo=1, n_hi=3)
    print(f'[core] full LM step: {t*1e3:.2f} ms', file=sys.stderr)

    opt.params = {'poses': ds['nodes']}
    opt.optimize(steps=6, decreasing=1e-6, patience=2)
    opt.params = {'poses': ds['nodes']}
    opt.strategy_state = opt.strategy.init(jnp.float32)
    t0 = time.perf_counter()
    loss = opt.optimize(steps=6, decreasing=1e-6, patience=2)
    dt = time.perf_counter() - t0
    print(f'[optimize] {len(opt.history)} steps in {dt:.3f}s '
          f'({dt/len(opt.history)*1e3:.1f} ms/step), chi2 '
          f'{opt.history[0]:.3e} -> {loss:.3e}', file=sys.stderr)


if __name__ == '__main__':
    main()
