"""Why did [ba-large] CG convergence flip when observations were
cam-sorted (r5)?

Before the r5 windowed-cam-ops change, block-Jacobi CG on the C=2048
Schur system stagnated at rel ~8e-2 after 100 iters at every damping
(tools/ba_large_prof.py, first run); after it, the same problem
converges to 1e-6 in ~35 iters and the LM trajectory reaches the
DOF-corrected noise floor (1.0763e5) in 2 steps.  Two things changed
at once: observation ORDER (cam-sorted) and the cam-side accumulate
IMPLEMENTATION (windowed one-hot MXU dots vs masked incidence-gather
sums).  Both compute the same sums; only the f32 rounding differs.

Three arms, identical math:
  A  original obs order (point-major), gather/incidence ops
  B  cam-sorted order,                 gather/incidence ops
  C  cam-sorted order,                 windowed one-hot ops

Each arm: form grams, damp, run cg(maxiter=100) at damping 1e-4/1e-6,
report the true relative residual |S dc - b|/|b|.

Usage: timeout 1800 python tools/ba_order_exp.py   (takes the tunnel)
"""

import sys
import numpy as np

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def build_incidence(idx, N, cap):
    idx = np.asarray(idx)
    deg = np.bincount(idx, minlength=N)
    D = int(deg.max()) if len(idx) else 0
    assert D <= cap, (D, cap)
    inc = np.zeros((N, max(D, 1)), np.int32)
    mask = np.zeros((N, max(D, 1)), bool)
    fill = np.zeros(N, np.int64)
    for o, i in enumerate(idx):
        inc[i, fill[i]] = o
        mask[i, fill[i]] = True
        fill[i] += 1
    return jnp.asarray(inc), jnp.asarray(mask)


def main():
    print('devices:', jax.devices(), flush=True)
    from pypose_tpu.datasets import synthetic_bal
    from pypose_tpu.optim.ba import (BundleAdjustment, _gram_cols,
                                     _vec_cols, _mv_cols)
    from pypose_tpu.ops.smallinv import inv3x3, inv6x6

    ds = synthetic_bal(n_cams=2048, n_points=49152, obs_per_point=6,
                       seed=0, pose_noise=(0.2, 0.05), point_noise=0.3)
    ba = BundleAdjustment(ds['poses'], ds['points'], ds['cam_idx'],
                          ds['pt_idx'], ds['pixels'], ds['cameras'],
                          fix_first_pose=True, cg_iter=100, cg_tol=1e-6)
    C, P = ba.C, ba.P
    T = ds['poses'].tensor()
    X = ds['points']

    # arm observation dicts: A = original (point-major) order, B/C = the
    # ba instance's cam-sorted order
    def obs_for(ci, pi, pix, cams, win):
        return dict(cam_idx=jnp.asarray(ci, jnp.int32),
                    pt_idx=jnp.asarray(pi, jnp.int32),
                    pixels=jnp.asarray(pix), cameras=jnp.asarray(cams),
                    obs_valid=None,
                    pt_inc=build_incidence(pi, P, 64),
                    cam_inc=build_incidence(ci, C, 8192),
                    cam_win=win)

    cams_orig = np.asarray(ds['cameras'])
    if cams_orig.shape[0] == C:
        cams_orig = cams_orig[np.asarray(ds['cam_idx'])]
    obs_A = obs_for(ds['cam_idx'], ds['pt_idx'], ds['pixels'], cams_orig,
                    None)
    obs_B = dict(ba._obs_data(), cam_win=None)
    obs_C = ba._obs_data()

    def run_arm(name, obs):
        @jax.jit
        def solve(obs, T, X, damping):
            r, Jc, Jp = ba._r_jac(obs, T, X)
            bc = ba._mask_cam(-ba._acc_cams(obs, _vec_cols(Jc, r)))
            bp = -ba._acc_points(obs, _vec_cols(Jp, r))
            Hcc = ba._acc_cams(obs, _gram_cols(Jc, Jc))
            Hpp = ba._acc_points(obs, _gram_cols(Jp, Jp))

            def damped(H):
                d = jnp.clip(jnp.diagonal(H, axis1=-2, axis2=-1),
                             ba.min, ba.max) * (1.0 + damping)
                eye = jnp.eye(H.shape[-1], dtype=H.dtype)
                return H + (d - jnp.diagonal(H, axis1=-2, axis2=-1)
                            )[..., None] * eye

            Hcc_d = damped(Hcc)
            Hpp_inv = inv3x3(damped(Hpp))
            pi = obs['pt_idx']

            def Svp(x):
                x = ba._mask_cam(x)
                hx = jnp.einsum('cab,cb->ca', Hcc_d, x, precision=_HI)
                Jcx = _mv_cols(Jc, ba._bcast_cams(obs, x))
                w = ba._acc_points(obs, jnp.einsum(
                    'oda,od->oa', Jp, Jcx, precision=_HI))
                w = _mv_cols(Hpp_inv, w)
                JpW = _mv_cols(Jp, w[pi])
                hx = hx - ba._acc_cams(obs, _vec_cols(Jc, JpW))
                return ba._mask_cam(hx)

            y = _mv_cols(Hpp_inv, bp)
            JpY = _mv_cols(Jp, y[pi])
            bs = bc - ba._mask_cam(ba._acc_cams(obs, _vec_cols(Jc, JpY)))
            Minv = inv6x6(Hcc_d)

            def M(x):
                return ba._mask_cam(jnp.einsum(
                    'cab,cb->ca', Minv, ba._mask_cam(x), precision=_HI))

            dc, _ = jax.scipy.sparse.linalg.cg(
                Svp, bs, tol=1e-6, maxiter=100, M=M)
            rel = jnp.linalg.norm(Svp(dc) - bs) / jnp.linalg.norm(bs)
            return rel, jnp.linalg.norm(bs)

        for damping in (1e-4, 1e-6):
            rel, nb = solve(obs, T, X, jnp.asarray(damping, jnp.float32))
            rel, nb = jax.device_get((rel, nb))
            print(f'  {name} damping={damping:.0e}: cg100 rel '
                  f'{float(rel):.3e}  (|b| {float(nb):.6e})', flush=True)

    # C first: if the tunnel crashes mid-run we still learn whether the
    # windowed arm matches before losing the process
    run_arm('C sorted/windowed   ', obs_C)
    run_arm('B sorted/gather     ', obs_B)
    run_arm('A orig-order/gather ', obs_A)


if __name__ == '__main__':
    main()
