r"""On-chip timing of the block-Jacobi preconditioner BUILD paths and the
_core-routed CG solve at N=1e5 (the r4 scalar_pc commit did not move the
end-to-end step: localize why).

Sections:
  [build-mat]     matrix-form _damped_blocks + ops.smallinv.blockinv
  [build-scalar]  _core's scalar_pc path: transpose-once + blockinv_scalar
  [solve-mat]     jax.scipy CG, matrix-form M build inside (250 iters)
  [solve-scalar]  jax.scipy CG, scalarized M build inside (250 iters)

Run:  timeout 900 python tools/pc_build_prof.py
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
                   cg_iter=250, cg_tol=1e-6)
    params = opt.params
    fdata = opt._factor_data()
    nm = opt._spmv_name
    t0 = 6

    @jax.jit
    def formation(params, fdata):
        blocks = [opt._weighted(f, fd, *opt._edge_r_jac(params, f, fd, fi))
                  for fi, (f, fd) in enumerate(zip(opt.factors, fdata))]
        b = opt._rhs(blocks, fdata)
        diag_raw = opt._diag(blocks, fdata)
        accum = opt._block_diag_accum(blocks, fdata)
        states = [sp.precompute(blk[1][nm], blk[3][nm])
                  for sp, blk in zip(opt._spmv, blocks)]
        return blocks, b, diag_raw, accum, states

    blocks, b, diag_raw, accum, states = formation(params, fdata)
    diagA = {n: jnp.clip(v, opt.min, opt.max) for n, v in diag_raw.items()}
    damping = jnp.asarray(1e-4, jnp.float32)

    # ---- builds ---------------------------------------------------------
    from pypose_tpu.ops.smallinv import blockinv, blockinv_scalar

    @jax.jit
    def build_mat(accum_n, damping):
        damped = opt._damped_blocks({nm: accum_n}, {nm: 1.0 + damping})
        return blockinv(damped[nm])

    t = warm_time(lambda: build_mat(accum[nm], damping), n_lo=1, n_hi=5)
    print(f'[build-mat] {t*1e3:.2f} ms', file=sys.stderr)

    @jax.jit
    def build_scalar(accum_n, damping):
        acc_T = jnp.transpose(accum_n, (1, 2, 0))
        comps = [acc_T[i, j] for i in range(t0) for j in range(t0)]
        for i in range(t0):
            d = jnp.clip(comps[i * t0 + i], opt.min, opt.max)
            comps[i * t0 + i] = d * (1.0 + damping) + 1e-8
        return blockinv_scalar(comps)

    t = warm_time(lambda: build_scalar(accum[nm], damping), n_lo=1, n_hi=5)
    print(f'[build-scalar] {t*1e3:.2f} ms', file=sys.stderr)

    # transpose alone
    tr = jax.jit(lambda a: jnp.transpose(a, (1, 2, 0)))
    t = warm_time(lambda: tr(accum[nm]), n_lo=1, n_hi=5)
    print(f'[transpose [N,6,6]->[6,6,N]] {t*1e3:.2f} ms', file=sys.stderr)

    # ---- solves ---------------------------------------------------------
    D_spmv = accum[nm]

    def raw_matvec(x):
        xm = opt._mask(nm, x[nm])
        y = jnp.einsum('ntu,nu->nt', D_spmv, xm, precision=_HI)
        for sp, st in zip(opt._spmv, states):
            y = y + sp.couple(st, xm)
        return {nm: opt._mask(nm, y)}

    def Avp_of(damping):
        def Avp(x):
            y = raw_matvec(x)
            return {n: y[n] + (diagA[n] - diag_raw[n]
                               + damping * diagA[n]) * opt._mask(n, x[n])
                    for n in y}
        return Avp

    @jax.jit
    def solve_mat(damping, b):
        Binv = build_mat(accum[nm], damping)
        def M(x):
            return {nm: jnp.einsum('ntu,nu->nt', Binv, x[nm],
                                   precision=_HI)}
        x, _ = jax.scipy.sparse.linalg.cg(
            Avp_of(damping), b, tol=opt.cg_tol, maxiter=250, M=M)
        return x

    @jax.jit
    def solve_scalar(damping, b):
        binv = build_scalar(accum[nm], damping)
        def M(x):
            xv = x[nm]
            y = jnp.stack([sum(binv[i * t0 + u] * xv[..., u]
                               for u in range(t0)) for i in range(t0)],
                          axis=-1)
            return {nm: y}
        x, _ = jax.scipy.sparse.linalg.cg(
            Avp_of(damping), b, tol=opt.cg_tol, maxiter=250, M=M)
        return x

    @jax.jit
    def solve_hybrid(damping, b):
        """Scalarized BUILD + one repack + einsum APPLY (the r4 fix)."""
        binv = build_scalar(accum[nm], damping)
        Binv = jnp.stack(binv).reshape(t0, t0, -1).transpose(2, 0, 1)
        def M(x):
            return {nm: jnp.einsum('ntu,nu->nt', Binv, x[nm],
                                   precision=_HI)}
        x, _ = jax.scipy.sparse.linalg.cg(
            Avp_of(damping), b, tol=opt.cg_tol, maxiter=250, M=M)
        return x

    ta = warm_time(lambda: solve_mat(damping, b), n_lo=1, n_hi=3)
    print(f'[solve-mat] {ta*1e3:.2f} ms', file=sys.stderr)
    tb = warm_time(lambda: solve_scalar(damping, b), n_lo=1, n_hi=3)
    print(f'[solve-scalar] {tb*1e3:.2f} ms', file=sys.stderr)
    th = warm_time(lambda: solve_hybrid(damping, b), n_lo=1, n_hi=3)
    print(f'[solve-hybrid] {th*1e3:.2f} ms', file=sys.stderr)
    xh = solve_hybrid(damping, b)[nm]
    xa = solve_mat(damping, b)[nm]
    xb = solve_scalar(damping, b)[nm]
    err = float(jnp.linalg.norm(xa - xb) / (jnp.linalg.norm(xa) + 1e-30))
    print(f'[check] solve-mat vs solve-scalar rel diff {err:.2e}',
          file=sys.stderr)
    errh = float(jnp.linalg.norm(xa - xh) / (jnp.linalg.norm(xa) + 1e-30))
    print(f'[check] solve-mat vs solve-hybrid rel diff {errh:.2e}',
          file=sys.stderr)

    # _core as routed (scalar_pc expected True)
    if opt.strategy_state is None:
        opt.strategy_state = opt.strategy.init(jnp.float32)
    core = jax.jit(opt._core)
    t = warm_time(lambda: core(params, opt.strategy_state, fdata),
                  n_lo=1, n_hi=3)
    print(f'[core] full LM step: {t*1e3:.2f} ms', file=sys.stderr)


if __name__ == '__main__':
    main()
