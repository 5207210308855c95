"""Per-stage TPU profile of the AUTO-routed Schur-CG BA path at the
[ba-large] scale (C=2048, P=49152, O=294912).

The bench records ~601 ms/LM-step while a glue-traffic roofline for the
Schur matvec (~60-80 MB/CG-iter at 820 GB/s ~= 100 us) predicts ~10 ms
per 100-iter solve — a 60x gap this profiler accounts for.  Stages:

  r_jac     scalarized BAL residual+Jacobian blocks          [O]
  grams     bc/bp/Hcc/Hpp accumulations                      [C],[P]
  matvec    ONE Schur-complement application Svp(x)
  cg        full jax.scipy CG solve at cg_iter=100 (and 25)
  chi2      candidate-parameter re-projection chi2
  core      one full _core LM step (reports the reject count —
            each rejection re-runs solve+chi2 inside the while_loop)

Usage: timeout 1800 python tools/ba_large_prof.py  (takes the TPU tunnel)
"""

import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0])


def timeit(f, *args, iters=10):
    """bench.py sync recipe (CLAUDE.md r3): blocks END in a device_get
    and two block sizes are differenced to cancel the tunnel roundtrip."""
    for _ in range(2):
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
    print('devices:', jax.devices(), flush=True)
    from pypose_tpu.datasets import synthetic_bal
    from pypose_tpu.optim.ba import BundleAdjustment, _vec_cols, _gram_cols, _mv_cols
    from pypose_tpu.ops.smallinv import inv3x3, inv6x6
    _HI = jax.lax.Precision.HIGHEST

    ds = synthetic_bal(n_cams=2048, n_points=49152, obs_per_point=6,
                       seed=0, pose_noise=(0.2, 0.05), point_noise=0.3)
    ba = BundleAdjustment(ds['poses'], ds['points'], ds['cam_idx'],
                          ds['pt_idx'], ds['pixels'], ds['cameras'],
                          fix_first_pose=True, cg_iter=100, cg_tol=1e-6)
    assert not ba._use_dense_schur
    obs = ba._obs_data()
    T = ds['poses'].tensor()
    X = ds['points']
    O = ds['pixels'].shape[0]
    D_cam = obs['cam_inc'][0].shape[1] if obs['cam_inc'] is not None else -1
    print(f'C={ba.C} P={ba.P} O={O} cam-incidence D={D_cam}', flush=True)

    # ---- stage probes (obs arrays as jit ARGUMENTS — closures ship in
    # the remote-compile payload) ----
    @jax.jit
    def p_rjac(obs, T, X):
        return ba._r_jac(obs, T, X)

    @jax.jit
    def p_grams(obs, T, X):
        r, Jc, Jp = ba._r_jac(obs, T, X)
        bc = ba._mask_cam(-ba._acc_cams(obs, _vec_cols(Jc, r)))
        bp = -ba._acc_points(obs, _vec_cols(Jp, r))
        Hcc = ba._acc_cams(obs, _gram_cols(Jc, Jc))
        Hpp = ba._acc_points(obs, _gram_cols(Jp, Jp))
        return bc, bp, Hcc, Hpp

    r, Jc, Jp = p_rjac(obs, T, X)
    bc, bp, Hcc, Hpp = p_grams(obs, T, X)

    def damped(H, damping):
        d = jnp.clip(jnp.diagonal(H, axis1=-2, axis2=-1),
                     ba.min, ba.max) * (1.0 + damping)
        eye = jnp.eye(H.shape[-1], dtype=H.dtype)
        return H + (d - jnp.diagonal(H, axis1=-2, axis2=-1))[..., None] * eye

    def make_svp(obs, Jc, Jp, Hcc_d, Hpp_inv):
        ci, pi = obs['cam_idx'], obs['pt_idx']

        def Svp(x):
            x = ba._mask_cam(x)
            hx = jnp.einsum('cab,cb->ca', Hcc_d, x, precision=_HI)
            Jcx = _mv_cols(Jc, x[ci])
            w = ba._acc_points(obs, jnp.einsum('oda,od->oa', Jp, Jcx,
                                               precision=_HI))
            w = _mv_cols(Hpp_inv, w)
            JpW = _mv_cols(Jp, w[pi])
            hx = hx - ba._acc_cams(obs, _vec_cols(Jc, JpW))
            return ba._mask_cam(hx)
        return Svp

    @jax.jit
    def p_matvec(obs, Jc, Jp, Hcc_d, Hpp_inv, x):
        return make_svp(obs, Jc, Jp, Hcc_d, Hpp_inv)(x)

    def p_cg(maxiter):
        @jax.jit
        def f(obs, Jc, Jp, Hcc_d, Hpp_inv, bs):
            Svp = make_svp(obs, Jc, Jp, Hcc_d, Hpp_inv)
            Minv = inv6x6(Hcc_d)

            def M(x):
                return ba._mask_cam(jnp.einsum(
                    'cab,cb->ca', Minv, ba._mask_cam(x), precision=_HI))
            dc, _ = jax.scipy.sparse.linalg.cg(
                Svp, bs, tol=ba.cg_tol, maxiter=maxiter, M=M)
            return dc
        return f

    @jax.jit
    def p_chi2(obs, T, X):
        return ba._chi2(T, X, obs)

    strat0 = ba.strategy.init(T.dtype)

    @jax.jit
    def p_core(obs, T, X, strat):
        return ba._core(T, X, strat, obs)

    for damping in (1e-2, 1e-4, 1e-6):
        Hcc_d = damped(Hcc, jnp.asarray(damping, T.dtype))
        Hpp_d = damped(Hpp, jnp.asarray(damping, T.dtype))
        Hpp_inv = inv3x3(Hpp_d)
        x0 = bc / (jnp.linalg.norm(bc) + 1.0)
        dt_mv = timeit(p_matvec, obs, Jc, Jp, Hcc_d, Hpp_inv, x0, iters=20)
        dc100 = p_cg(100)(obs, Jc, Jp, Hcc_d, Hpp_inv, bc)
        rel = jnp.linalg.norm(
            p_matvec(obs, Jc, Jp, Hcc_d, Hpp_inv, dc100) - bc) \
            / jnp.linalg.norm(bc)
        dt_cg100 = timeit(p_cg(100), obs, Jc, Jp, Hcc_d, Hpp_inv, bc, iters=5)
        dt_cg25 = timeit(p_cg(25), obs, Jc, Jp, Hcc_d, Hpp_inv, bc, iters=5)
        print(f'damping={damping:.0e}: matvec {dt_mv*1e6:8.1f} us | '
              f'cg100 {dt_cg100*1e3:7.2f} ms (rel {float(rel):.2e}) | '
              f'cg25 {dt_cg25*1e3:7.2f} ms | '
              f'per-iter {(dt_cg100-dt_cg25)/75*1e6:7.1f} us', flush=True)

    dt_rjac = timeit(p_rjac, obs, T, X, iters=20)
    dt_grams = timeit(p_grams, obs, T, X, iters=20)
    dt_chi2 = timeit(p_chi2, obs, T, X, iters=20)
    print(f'r_jac {dt_rjac*1e3:.2f} ms | grams(incl r_jac) '
          f'{dt_grams*1e3:.2f} ms | chi2 {dt_chi2*1e3:.2f} ms', flush=True)

    # full _core: time + the reject count actually paid at strat0
    out = p_core(obs, T, X, strat0)
    rejects = int(out[5])
    dt_core = timeit(p_core, obs, T, X, strat0, iters=5)
    print(f'core(step 0) {dt_core*1e3:.2f} ms with {rejects} rejections '
          f'(each rejection re-runs solve+chi2 in the while_loop)',
          flush=True)

    # reject ladder across a short optimize trajectory: run 10 host-side
    # steps, recording count_f per step to see how many solves each step
    # actually pays
    Tc, Xc, strat = T, X, strat0
    for k in range(10):
        Tc, Xc, loss, last, strat, cnt = p_core(obs, Tc, Xc, strat)
        print(f'  step {k}: chi2 {float(loss):.4e} rejects {int(cnt)} '
              f'damping {float(strat["damping"]):.3e}', flush=True)


if __name__ == '__main__':
    main()
