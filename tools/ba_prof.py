"""Per-stage TPU profile of a BundleAdjustment step at trafalgar scale.

Counterpart of tools/formation_prof.py for the BA path: times each
formation stage, one Schur solve, and the full _core so the next
optimization targets the measured sink.

Usage: python tools/ba_prof.py [--cams 257 --points 65132]
Run it alone — only ONE process may own the TPU tunnel.
"""

import argparse
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0])


def timeit(f, *args, iters=10, warmup=2):
    """bench.py sync recipe: blocks END in a device_get (block_until_ready
    does not sync through the tunnel — CLAUDE.md r3) and two block sizes
    are differenced to cancel the ~25 ms roundtrip."""
    for _ in range(warmup):
        out = f(*args)
    _sync(out)
    n_lo = max(1, iters // 4)

    def block(n):
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                out = f(*args)
            _sync(out)
            best = min(best, time.perf_counter() - t0)
        return best

    return max(block(iters) - block(n_lo), 1e-12) / (iters - n_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cams', type=int, default=257)
    ap.add_argument('--points', type=int, default=65132)
    ap.add_argument('--obs', type=float, default=225911 / 65132)
    ap.add_argument('--iters', type=int, default=10)
    args = ap.parse_args()

    print('devices:', jax.devices(), flush=True)
    from pypose_tpu.datasets import synthetic_bal
    from pypose_tpu.optim.ba import (BundleAdjustment, _gram_cols,
                                     _vec_cols)

    ds = synthetic_bal(n_cams=args.cams, n_points=args.points,
                       obs_per_point=args.obs, seed=0,
                       pose_noise=(0.3, 0.1), point_noise=0.5)
    ba = BundleAdjustment(ds['poses'], ds['points'], ds['cam_idx'],
                          ds['pt_idx'], ds['pixels'], ds['cameras'],
                          fix_first_pose=True, cg_iter=40, cg_tol=1e-6)
    print(f'C={ba.C} P={ba.P} O={ds["pixels"].shape[0]} '
          f'dense_schur={ba._use_dense_schur}', flush=True)
    obs = ba._obs_data()
    poses_data, points = ba.poses.tensor(), ba.points
    if ba.strategy_state is None:
        ba.strategy_state = ba.strategy.init(points.dtype)

    # ---- stage: residuals + Jacobians ----
    rj = jax.jit(lambda pd, pt: ba._r_jac(obs, pd, pt))
    t = timeit(rj, poses_data, points, iters=args.iters)
    print(f'r_jac (scalarized closed form): {t*1e3:.2f} ms', flush=True)
    r, Jc, Jp = jax.block_until_ready(rj(poses_data, points))

    # ---- stage: gradient + block Hessians ----
    @jax.jit
    def grads(r, Jc, Jp):
        return (ba._acc_cams(obs, _vec_cols(Jc, r)),
                ba._acc_points(obs, _vec_cols(Jp, r)),
                ba._acc_cams(obs, _gram_cols(Jc, Jc)),
                ba._acc_points(obs, _gram_cols(Jp, Jp)))

    t = timeit(grads, r, Jc, Jp, iters=args.iters)
    print(f'bc/bp/Hcc/Hpp (column grams + acc): {t*1e3:.2f} ms',
          flush=True)

    # ---- stage: G + point-gather + one-hot prep ----
    if ba._use_dense_schur:
        @jax.jit
        def gprep(Jc, Jp):
            G18 = _gram_cols(Jc, Jp).reshape(-1, 18)
            inc, incm = obs['pt_inc']
            Gp18 = G18[inc] * incm[..., None]
            ohp = jax.nn.one_hot(ba.cam_idx[inc], ba.C, dtype=Jc.dtype) \
                * incm[..., None]
            return Gp18, ohp

        t = timeit(gprep, Jc, Jp, iters=args.iters)
        print(f'G/Gp/one-hot prep: {t*1e3:.2f} ms', flush=True)

    # ---- stage: chi2 ----
    t = timeit(jax.jit(lambda pd, pt: ba._chi2(pd, pt, obs)),
               poses_data, points, iters=args.iters)
    print(f'chi2: {t*1e3:.2f} ms', flush=True)

    # ---- solve-stage breakdown (dense Schur path) -----------------------
    if ba._use_dense_schur:
        from pypose_tpu.ops.smallinv import inv3x3, chol3x3
        from pypose_tpu.optim.ba import _mv_cols
        import jax.scipy.linalg as jsl
        _HI = jax.lax.Precision.HIGHEST
        damping = jnp.asarray(1e-4, points.dtype)
        ci, pi = obs['cam_idx'], obs['pt_idx']
        C = ba.C

        @jax.jit
        def stage_prep(Jc, Jp, r):
            bc = -ba._mask_cam(ba._acc_cams(obs, _vec_cols(Jc, r)))
            bp = -ba._acc_points(obs, _vec_cols(Jp, r))
            Hcc = ba._acc_cams(obs, _gram_cols(Jc, Jc))
            Hpp = ba._acc_points(obs, _gram_cols(Jp, Jp))
            G18 = _gram_cols(Jc, Jp).reshape(-1, 18)
            inc, incm = obs['pt_inc']
            Gp18 = G18[inc] * incm[..., None]
            _oh_dt = Jc.dtype if ba.schur_precision == \
                jax.lax.Precision.HIGHEST else jnp.bfloat16
            ohp = jax.nn.one_hot(ci[inc], C, dtype=_oh_dt) \
                * incm[..., None].astype(_oh_dt)
            return bc, bp, Hcc, Hpp, Gp18, ohp

        bc, bp, Hcc, Hpp, Gp18, ohp = jax.block_until_ready(
            stage_prep(Jc, Jp, r))

        def damped(H, dmp):
            d = jnp.clip(jnp.diagonal(H, axis1=-2, axis2=-1),
                         ba.min, ba.max) * (1.0 + dmp)
            eye = jnp.eye(H.shape[-1], dtype=H.dtype)
            return H + (d - jnp.diagonal(H, axis1=-2, axis2=-1))[..., None] \
                * eye

        @jax.jit
        def stage_form_S(Hcc, Hpp, Gp18, ohp, dmp):
            Hcc_d = damped(Hcc, dmp)
            Hpp_d = damped(Hpp, dmp)
            Hpp_inv = inv3x3(Hpp_d)
            L = chol3x3(Hpp_inv)
            Yl18 = jnp.stack(
                [sum(L[:, k, j][:, None] * Gp18[:, :, a * 3 + k]
                     for k in range(3))
                 for j in range(3) for a in range(6)], axis=-1)
            lo = ba.schur_precision != jax.lax.Precision.HIGHEST
            cdt = jnp.bfloat16 if lo else Yl18.dtype
            T1 = jnp.einsum(
                'pdc,pdm->pmc', ohp.astype(cdt), Yl18.astype(cdt),
                precision=None if lo else _HI,
                preferred_element_type=jnp.float32).astype(
                    cdt).reshape(ba.P, 3, 6, C)
            M6 = jax.lax.dot_general(
                T1, T1, (((0, 1), (0, 1)), ((), ())),
                precision=ba.schur_precision,
                preferred_element_type=jnp.float32)
            Mfull = jnp.transpose(M6, (1, 0, 3, 2)).reshape(C * 6, C * 6)
            Sd = jnp.zeros((C, 6, C, 6), Hcc_d.dtype).at[
                jnp.arange(C), :, jnp.arange(C), :].set(Hcc_d)
            S = Sd.reshape(C * 6, C * 6) - Mfull
            return S, Hpp_inv

        S, Hpp_inv = jax.block_until_ready(
            stage_form_S(Hcc, Hpp, Gp18, ohp, damping))
        t = timeit(stage_form_S, Hcc, Hpp, Gp18, ohp, damping,
                   iters=args.iters)
        print(f'  [solve] form S (T1 + MXU Gram): {t*1e3:.2f} ms',
              flush=True)

        @jax.jit
        def stage_chol(S):
            dS = jnp.diagonal(S)
            boost = 1e-2 * dS + 4e-3 * jnp.mean(dS)
            return jsl.cho_factor(S + jnp.diag(boost))[0]

        t = timeit(stage_chol, S, iters=args.iters)
        print(f'  [solve] cho_factor({C*6}): {t*1e3:.2f} ms', flush=True)
        cf = jax.block_until_ready(stage_chol(S))

        @jax.jit
        def stage_chosolve(cf, bc):
            return jsl.cho_solve((cf, False), bc.reshape(-1))

        t = timeit(stage_chosolve, cf, bc, iters=args.iters)
        print(f'  [solve] cho_solve: {t*1e3:.2f} ms', flush=True)

        @jax.jit
        def stage_svp(x, Hcc, Hpp_inv, dmp):
            Hcc_d = damped(Hcc, dmp)
            x = ba._mask_cam(x)
            hx = jnp.einsum('cab,cb->ca', Hcc_d, x, precision=_HI)
            Jcx = _mv_cols(Jc, x[ci])
            w = ba._acc_points(obs, jnp.einsum(
                'oda,od->oa', Jp, Jcx, precision=_HI))
            w = _mv_cols(Hpp_inv, w)
            JpW = _mv_cols(Jp, w[pi])
            hx = hx - ba._acc_cams(obs, _vec_cols(Jc, JpW))
            return ba._mask_cam(hx)

        t = timeit(stage_svp, bc, Hcc, Hpp_inv, damping, iters=args.iters)
        print(f'  [solve] exact Svp (refinement matvec): {t*1e3:.2f} ms '
              f'(x{ba.schur_refine} refine passes)', flush=True)

    # ---- full step ----
    @jax.jit
    def full(pd, pt, strat):
        return ba._core(pd, pt, strat, obs)

    t = timeit(full, poses_data, points, ba.strategy_state,
               iters=max(3, args.iters // 3))
    print(f'FULL _core step: {t*1e3:.2f} ms', flush=True)

    try:
        mem = full.lower(poses_data, points,
                         ba.strategy_state).compile().memory_analysis()
        print(f'  mem[full]: temp={mem.temp_size_in_bytes/1e6:.1f}MB '
              f'arg={mem.argument_size_in_bytes/1e6:.1f}MB', flush=True)
    except Exception as e:
        print('  mem unavailable:', e, flush=True)


if __name__ == '__main__':
    main()
