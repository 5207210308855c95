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
