"""Per-stage TPU profile of a SparseLM step at 100k poses / ~180k edges.

The 100k-pose PGO runs at ~200 ms/LM-step after the r3 routing fix and
CLAUDE.md says the remaining cost is per-step FORMATION, not CG
(stencil matvec is ~30 us/iter).  This tool times each formation stage
of SparseLM._core as its own jitted program on the real chip so the
next optimization targets the actual sink:

  blocks   = _edge_r_jac + _weighted        (per-edge residual+Jacobian)
  rhs/diag = _rhs + _diag + _block_diag_accum
  precomp  = coupling-block precompute C_e = Ji^T W Jj  (per offset)
  chi2     = one full chi2 evaluation       (runs 2x per accepted step)
  predred  = pred_reduction
  step     = the full _core program          (reference total)

Usage: python tools/formation_prof.py [--n 100000] [--iters 20]
Run it alone — only ONE process may own the TPU tunnel.
"""

import argparse
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    best = float('inf')
    for _ in range(3):  # best-of-3 blocks: tunnel jitter (CLAUDE.md)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=100_000)
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--cg-iter', type=int, default=250)
    args = ap.parse_args()

    print('devices:', jax.devices(), flush=True)
    from pypose_tpu.datasets import synthetic_sphere
    from pypose_tpu.optim.sparse import (SparseLM, pgo_factor,
                                         split_chain_edges)
    from pypose_tpu.optim.strategy import TrustRegion

    ds = synthetic_sphere(args.n)
    edges = jnp.asarray(ds['edges'])
    E = int(edges.shape[0])
    print(f'N={args.n} E={E}', flush=True)
    runs, rest = split_chain_edges(edges)
    factors = [pgo_factor(edges[jnp.asarray(r)],
                          ds['poses'][jnp.asarray(r)]) for r in runs]
    if len(rest):
        factors.append(pgo_factor(edges[jnp.asarray(rest)],
                                  ds['poses'][jnp.asarray(rest)]))
    fixed = {'poses': jnp.zeros(args.n, bool).at[0].set(True)}
    opt = SparseLM({'poses': ds['nodes']}, factors,
                   strategy=TrustRegion(radius=1e4), fixed=fixed,
                   cg_iter=args.cg_iter, cg_tol=1e-6)
    print(f'matvec path: spmv={opt._spmv is not None} '
          f'stencil_all={opt._stencil_all is not None} '
          f'precond={opt.precond}', flush=True)

    params = opt.params
    fdata = opt._factor_data()
    if opt.strategy_state is None:
        opt.strategy_state = opt.strategy.init(jnp.float32)

    # ---- stage: blocks (per-edge residual + closed-form Jacobian + W) ----
    @jax.jit
    def mk_blocks(params, fdata):
        return [opt._weighted(f, fd, *opt._edge_r_jac(params, f, fd, fi))
                for fi, (f, fd) in enumerate(zip(opt.factors, fdata))]

    t = timeit(mk_blocks, params, fdata, iters=args.iters)
    print(f'blocks (_edge_r_jac + _weighted): {t*1e3:.2f} ms', flush=True)
    blocks = jax.block_until_ready(mk_blocks(params, fdata))

    # ---- stage: rhs + diag + block-diag accumulation ----
    @jax.jit
    def mk_rhs(blocks, fdata):
        return (opt._rhs(blocks, fdata), opt._diag(blocks, fdata),
                opt._block_diag_accum(blocks, fdata))

    t = timeit(mk_rhs, blocks, fdata, iters=args.iters)
    print(f'rhs + diag + block_diag_accum: {t*1e3:.2f} ms', flush=True)

    # ---- stage: coupling-block precompute ----
    if opt._spmv is not None:
        nm = opt._spmv_name

        @jax.jit
        def mk_pre(blocks):
            return [sp.precompute(blk[1][nm], blk[3][nm])
                    for sp, blk in zip(opt._spmv, blocks)]

        t = timeit(mk_pre, blocks, iters=args.iters)
        print(f'coupling precompute (C_e per offset): {t*1e3:.2f} ms',
              flush=True)

        # ---- stage: one stencil matvec (for scale) ----
        states = jax.block_until_ready(mk_pre(blocks))
        accum = jax.jit(opt._block_diag_accum)(blocks, fdata)
        x0 = {nm: jnp.zeros_like(opt._rhs(blocks, fdata)[nm])}

        @jax.jit
        def mv(states, accum, x):
            xm = opt._mask(nm, x[nm])
            y = jnp.einsum('ntu,nu->nt', accum[nm], xm)
            for sp, st in zip(opt._spmv, states):
                y = y + sp.couple(st, xm)
            return y

        t = timeit(mv, states, accum, x0, iters=args.iters)
        print(f'one stencil/coupling matvec: {t*1e6:.1f} us '
              f'(x{args.cg_iter} CG = {t*args.cg_iter*1e3:.1f} ms)',
              flush=True)

    # ---- fine: split rhs / diag / block_diag and per-factor paths ----
    for name, fn in (('rhs', opt._rhs), ('diag', opt._diag),
                     ('block_diag_accum', opt._block_diag_accum)):
        t = timeit(jax.jit(fn), blocks, fdata, iters=args.iters)
        print(f'  fine {name}: {t*1e3:.2f} ms', flush=True)

    # in-program matvec cost: 100 matvecs inside ONE jitted fori_loop
    if opt._spmv is not None:
        @jax.jit
        def mv_loop(states, accum, x):
            def body(_, x):
                xm = opt._mask(nm, x)
                y = jnp.einsum('ntu,nu->nt', accum[nm], xm)
                for sp, st in zip(opt._spmv, states):
                    y = y + sp.couple(st, xm)
                return opt._mask(nm, y)
            return jax.lax.fori_loop(0, 100, body, x[nm])

        t = timeit(mv_loop, states, accum, x0, iters=3)
        print(f'matvec inside fori_loop x100: {t/100*1e6:.1f} us/matvec',
              flush=True)

        # bf16 channel variant: C and D in bf16 (halved HBM bytes), x and
        # accumulation in f32 via preferred_element_type
        states_bf = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), states)
        accum_bf = {nm: accum[nm].astype(jnp.bfloat16)}

        @jax.jit
        def mv_loop_bf(states, accum, x):
            def body(_, x):
                xm = opt._mask(nm, x)
                xb = xm.astype(jnp.bfloat16)
                y = jnp.einsum('ntu,nu->nt', accum[nm], xb,
                               preferred_element_type=jnp.float32)
                for sp, st in zip(opt._spmv, states):
                    y = y + sp.couple(st, xb).astype(jnp.float32)
                return opt._mask(nm, y)
            return jax.lax.fori_loop(0, 100, body, x[nm])

        t = timeit(mv_loop_bf, states_bf, accum_bf, x0, iters=3)
        print(f'bf16-channel matvec inside fori_loop x100: '
              f'{t/100*1e6:.1f} us/matvec', flush=True)

        # scalarized stencil matvec: flat [n_off, N, 36] channels, all
        # row ops as [N]-vector columns (no ntu einsum at all)
        sps = [sp for sp in opt._spmv
               if type(sp).__name__ == 'StencilSpMV']
        if len(sps) == len(opt._spmv):
            t_ = 6
            states_flat = [st.reshape(st.shape[0], st.shape[1], 36)
                           for st in states]
            Dflat = accum[nm].reshape(-1, 36)

            @jax.jit
            def mv_loop_cols(states_flat, Dflat, x):
                def one(Cf, sp, xm):
                    y = jnp.zeros_like(xm)
                    for k, dd in enumerate(sp.offsets):
                        xr = jnp.roll(xm, -dd, axis=0)
                        fwd = [sum(Cf[k][:, ti * t_ + u] * xr[:, u]
                                   for u in range(t_)) for ti in range(t_)]
                        bck = [sum(Cf[k][:, ti * t_ + u] * xm[:, ti]
                                   for ti in range(t_)) for u in range(t_)]
                        y = y + jnp.stack(fwd, axis=-1) \
                            + jnp.roll(jnp.stack(bck, axis=-1), dd, axis=0)
                    return y

                def body(_, x):
                    xm = opt._mask(nm, x)
                    y = jnp.stack(
                        [sum(Dflat[:, ti * t_ + u] * xm[:, u]
                             for u in range(t_)) for ti in range(t_)],
                        axis=-1)
                    for sp, Cf in zip(opt._spmv, states_flat):
                        y = y + one(Cf, sp, xm)
                    return opt._mask(nm, y)
                return jax.lax.fori_loop(0, 100, body, x[nm])

            t = timeit(mv_loop_cols, states_flat, Dflat, x0, iters=3)
            print(f'scalarized-column matvec inside fori_loop x100: '
                  f'{t/100*1e6:.1f} us/matvec '
                  f'(offsets per factor: '
                  f'{[list(sp.offsets) for sp in sps]})', flush=True)

    # compiled-buffer diagnostics: padded layouts show up as temp sizes
    # far above the logical bytes (CLAUDE.md: two-small-minor-dims trap)
    for name, fn, fargs in (
            ('blocks', mk_blocks, (params, fdata)),
            ('rhs+diag+accum', mk_rhs, (blocks, fdata))):
        try:
            mem = jax.jit(fn).lower(*fargs).compile().memory_analysis()
            print(f'  mem[{name}]: temp={mem.temp_size_in_bytes/1e6:.1f}MB '
                  f'out={mem.output_size_in_bytes/1e6:.1f}MB '
                  f'arg={mem.argument_size_in_bytes/1e6:.1f}MB', flush=True)
        except Exception as e:
            print(f'  mem[{name}]: unavailable ({e})', flush=True)

    # ---- stage: chi2 ----
    t = timeit(jax.jit(opt._chi2), params, fdata, iters=args.iters)
    print(f'chi2 (runs 2x per accepted step): {t*1e3:.2f} ms', flush=True)

    # ---- stage: pred_reduction-equivalent + retract (body residue) ----
    nm0 = list(params.keys())[0]
    delta = {nm0: jnp.zeros_like(opt._rhs(blocks, fdata)[nm0])}

    @jax.jit
    def predred(blocks, fdata, delta):
        total = 0.0
        for fi2, (f, fd, (r, J, WR, WJ)) in enumerate(
                zip(opt.factors, fdata, blocks)):
            Jd = 0.0
            for n in f.indices:
                xg = opt._gather_rows(fi2, n, opt._mask(n, delta[n]),
                                      fd['indices'][n])
                Jd = Jd + jnp.einsum('edat,eat->ed', J[n], xg)
            WJd = jnp.einsum('eij,ej->ei', jnp.broadcast_to(
                fd['weight'], (r.shape[0],) + (r.shape[-1],) * 2
            ), Jd) if fd['weight'] is not None else Jd
            total = total + jnp.sum(WJd * (2.0 * r + Jd))
        return -total

    t = timeit(predred, blocks, fdata, delta, iters=args.iters)
    print(f'pred_reduction: {t*1e3:.2f} ms', flush=True)

    @jax.jit
    def retract(p, delta):
        out = {}
        for n, v in p.items():
            d = opt._mask(n, delta[n])
            out[n] = v.add(d) if hasattr(v, 'add') else v + d
        return out

    t = timeit(retract, params, delta, iters=args.iters)
    print(f'retract_all: {t*1e3:.2f} ms', flush=True)

    # ---- one CG solve alone (damping fixed) to bound the CG share ----
    if opt._spmv is not None:
        from pypose_tpu.optim.sparse import _HI
        diagA = {n: jnp.clip(v, opt.min, opt.max)
                 for n, v in jax.jit(opt._diag)(blocks, fdata).items()}
        bb = jax.jit(opt._rhs)(blocks, fdata)

        @jax.jit
        def one_solve(states, accum, bb, diagA):
            damping = jnp.asarray(1e-4, jnp.float32)

            def Avp(x):
                xm = opt._mask(nm, x[nm])
                y = jnp.einsum('ntu,nu->nt', accum[nm], xm)
                for sp, st in zip(opt._spmv, states):
                    y = y + sp.couple(st, xm)
                return {nm: opt._mask(nm, y)
                        + (damping * diagA[nm]) * opt._mask(nm, x[nm])}

            from pypose_tpu.ops.smallinv import blockinv
            damped = opt._damped_blocks(accum, {nm: 1.0 + damping})
            Binv = blockinv(damped[nm])

            def M(x):
                return {nm: jnp.einsum('ntu,nu->nt', Binv, x[nm])}

            x, _ = jax.scipy.sparse.linalg.cg(
                Avp, bb, tol=opt.cg_tol, maxiter=args.cg_iter, M=M)
            return x

        t = timeit(one_solve, states, accum, bb, diagA, iters=3)
        print(f'one full CG solve (maxiter={args.cg_iter}, '
              f'tol={opt.cg_tol}): {t*1e3:.2f} ms', flush=True)

    # ---- full step ----
    @jax.jit
    def full(params, strat, fdata):
        return opt._core(params, strat, fdata)

    t = timeit(full, params, opt.strategy_state, fdata,
               iters=max(3, args.iters // 4))
    print(f'FULL _core step (incl. CG x{args.cg_iter}): {t*1e3:.2f} ms',
          flush=True)


if __name__ == '__main__':
    main()
