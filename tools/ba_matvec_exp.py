"""Gather-row-count attack on the [ba-large] Schur matvec (r5).

tools/ba_large_prof.py measured the matvec at 6.28 ms/call, gather-row
bound: x[ci] 295k rows + pt_inc 295k + w[pi] 295k + cam_inc 383k =
1.27M rows x 3.4-5 ns/row.  With observations SORTED BY cam_idx the two
cam-side passes gain segment locality: a tile of To consecutive obs
touches a narrow WINDOW of <= W cameras, so

  broadcast x[ci]  ->  per-column einsum('tol,tl->to', onehot, x_window)
  acc_cams(contrib) -> einsum('tol,tok->tlk', onehot, contrib-tiles)
                       + a tiny static scatter of n_tiles*W partials

with onehot[t,o,l] = (li[t,o] == l) built from a static local-index
array (0/1 exact in bf16).  MACs are O*W*k ~ 1e8 (free on the MXU/VPU);
the gathers shrink from O(O) rows to O(n_tiles*W) rows.

This experiment measures, at C=2048/P=49152/O=294912 on the real chip:
  bcast: gather x[ci] vs windowed one-hot          (+ correctness)
  acc6:  cam_inc incidence gather vs windowed      (+ correctness)
  svp:   the full Schur matvec, current vs windowed cam side

Usage: timeout 1800 python tools/ba_matvec_exp.py   (takes the tunnel)
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0])


def timeit(f, *args, iters=20):
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


def build_windows(ci_sorted, C, To=1024):
    """Static tile/window metadata for cam-SORTED observation order."""
    O = len(ci_sorted)
    n_tiles = -(-O // To)
    Opad = n_tiles * To
    ci_pad = np.concatenate(
        [ci_sorted, np.full(Opad - O, ci_sorted[-1], ci_sorted.dtype)])
    tiles = ci_pad.reshape(n_tiles, To)
    c0 = tiles[:, 0].astype(np.int32)                    # window starts
    W = int((tiles[:, -1] - c0).max()) + 1
    li = (tiles - c0[:, None]).astype(np.int32)          # local cam index
    # flat window->cam map for the accumulate scatter; oob -> drop
    widx = c0[:, None] + np.arange(W, dtype=np.int32)[None, :]
    wvalid = widx < C
    widx = np.where(wvalid, widx, C)                     # drop slot
    return dict(To=To, n_tiles=n_tiles, Opad=Opad, W=W,
                li=jnp.asarray(li), widx=jnp.asarray(widx),
                wvalid=jnp.asarray(wvalid), c0=jnp.asarray(c0))


def main():
    print('devices:', jax.devices(), flush=True)
    from pypose_tpu.datasets import synthetic_bal
    from pypose_tpu.optim.ba import BundleAdjustment, _vec_cols, _mv_cols
    from pypose_tpu.ops.smallinv import inv3x3

    ds = synthetic_bal(n_cams=2048, n_points=49152, obs_per_point=6,
                       seed=0, pose_noise=(0.2, 0.05), point_noise=0.3)
    # SORT observations by camera (order-invariant semantics)
    ci_np = np.asarray(ds['cam_idx'])
    order = np.argsort(ci_np, kind='stable')
    ds = dict(ds)
    for k in ('cam_idx', 'pt_idx', 'pixels'):
        ds[k] = np.asarray(ds[k])[order]
    cams = np.asarray(ds['cameras'])
    if cams.shape[0] == len(order):
        ds['cameras'] = cams[order]

    ba = BundleAdjustment(ds['poses'], ds['points'], ds['cam_idx'],
                          ds['pt_idx'], ds['pixels'], ds['cameras'],
                          fix_first_pose=True, cg_iter=100, cg_tol=1e-6)
    assert not ba._use_dense_schur
    obs = ba._obs_data()
    T = ds['poses'].tensor()
    X = ds['points']
    O = ds['pixels'].shape[0]
    C, P = ba.C, ba.P

    win = build_windows(np.asarray(ba.cam_idx), C, To=1024)
    print(f'C={C} P={P} O={O}: n_tiles={win["n_tiles"]} W={win["W"]} '
          f'(onehot {win["Opad"]*win["W"]*2/1e6:.1f} MB bf16)', flush=True)

    key = jax.random.PRNGKey(0)
    x6 = jax.random.normal(key, (C, 6), jnp.float32)
    contrib6 = jax.random.normal(key, (O, 6), jnp.float32)

    li, widx, wvalid = win['li'], win['widx'], win['wvalid']
    n_tiles, To, W, Opad = win['n_tiles'], win['To'], win['W'], win['Opad']

    def onehot():
        return (li[..., None] ==
                jnp.arange(W, dtype=li.dtype)).astype(jnp.bfloat16)

    # ---- broadcast variants ----
    @jax.jit
    def bcast_gather(obs, x):
        return x[obs['cam_idx']]

    @jax.jit
    def bcast_win(x):
        oh = onehot()                                    # [t, To, W]
        xw = x[jnp.where(wvalid, widx, 0)]               # [t, W, 6] tiny
        xw = jnp.where(wvalid[..., None], xw, 0.0)
        cols = [jnp.einsum('tol,tl->to', oh, xw[:, :, k], precision=_HI)
                for k in range(x.shape[1])]
        out = jnp.stack([c.reshape(Opad) for c in cols], axis=-1)
        return out[:O]

    a = bcast_gather(obs, x6)
    b = bcast_win(x6)
    err = float(jnp.max(jnp.abs(a - b)))
    dt_g = timeit(bcast_gather, obs, x6)
    dt_w = timeit(bcast_win, x6)
    print(f'bcast  x[ci]: gather {dt_g*1e6:8.1f} us | windowed '
          f'{dt_w*1e6:8.1f} us | maxerr {err:.2e}', flush=True)

    # ---- accumulate variants ----
    @jax.jit
    def acc_inc(obs, contrib):
        return ba._acc_cams(obs, contrib)

    @jax.jit
    def acc_win(contrib):
        oh = onehot()
        k = contrib.shape[1]
        pad = jnp.zeros((Opad - O, k), contrib.dtype)
        ct = jnp.concatenate([contrib, pad], 0).reshape(n_tiles, To, k)
        part = jnp.einsum('tol,tok->tlk', oh, ct, precision=_HI)
        out = jnp.zeros((C + 1, k), contrib.dtype)
        out = out.at[widx.reshape(-1)].add(
            part.reshape(n_tiles * W, k), mode='drop')
        return out[:C]

    a = acc_inc(obs, contrib6)
    b = acc_win(contrib6)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30))
    dt_g = timeit(acc_inc, obs, contrib6)
    dt_w = timeit(acc_win, contrib6)
    print(f'acc6  O->C : incidence {dt_g*1e6:8.1f} us | windowed '
          f'{dt_w*1e6:8.1f} us | relerr {err:.2e}', flush=True)

    # ---- full Schur matvec ----
    r, Jc, Jp = jax.jit(lambda o, t, x: ba._r_jac(o, t, x))(obs, T, X)
    from pypose_tpu.optim.ba import _gram_cols
    Hcc = ba._acc_cams(obs, _gram_cols(Jc, Jc))
    Hpp = ba._acc_points(obs, _gram_cols(Jp, Jp))

    def damped(H, damping):
        d = jnp.clip(jnp.diagonal(H, axis1=-2, axis2=-1),
                     ba.min, ba.max) * (1.0 + damping)
        eye = jnp.eye(H.shape[-1], dtype=H.dtype)
        return H + (d - jnp.diagonal(H, axis1=-2, axis2=-1))[..., None] * eye

    Hcc_d = damped(Hcc, 1e-4)
    Hpp_inv = inv3x3(damped(Hpp, 1e-4))
    x0 = jax.random.normal(key, (C, 6), jnp.float32)

    @jax.jit
    def svp_cur(obs, Jc, Jp, Hcc_d, Hpp_inv, x):
        ci, pi = obs['cam_idx'], obs['pt_idx']
        x = ba._mask_cam(x)
        hx = jnp.einsum('cab,cb->ca', Hcc_d, x, precision=_HI)
        Jcx = _mv_cols(Jc, x[ci])
        w = ba._acc_points(obs, jnp.einsum('oda,od->oa', Jp, Jcx,
                                           precision=_HI))
        w = _mv_cols(Hpp_inv, w)
        JpW = _mv_cols(Jp, w[pi])
        hx = hx - ba._acc_cams(obs, _vec_cols(Jc, JpW))
        return ba._mask_cam(hx)

    @jax.jit
    def svp_win(obs, Jc, Jp, Hcc_d, Hpp_inv, x):
        pi = obs['pt_idx']
        x = ba._mask_cam(x)
        hx = jnp.einsum('cab,cb->ca', Hcc_d, x, precision=_HI)
        Jcx = _mv_cols(Jc, bcast_win(x))
        w = ba._acc_points(obs, jnp.einsum('oda,od->oa', Jp, Jcx,
                                           precision=_HI))
        w = _mv_cols(Hpp_inv, w)
        JpW = _mv_cols(Jp, w[pi])
        hx = hx - acc_win(_vec_cols(Jc, JpW))
        return ba._mask_cam(hx)

    a = svp_cur(obs, Jc, Jp, Hcc_d, Hpp_inv, x0)
    b = svp_win(obs, Jc, Jp, Hcc_d, Hpp_inv, x0)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30))
    dt_c = timeit(svp_cur, obs, Jc, Jp, Hcc_d, Hpp_inv, x0)
    dt_n = timeit(svp_win, obs, Jc, Jp, Hcc_d, Hpp_inv, x0)
    print(f'svp   full : current {dt_c*1e6:8.1f} us | windowed cam side '
          f'{dt_n*1e6:8.1f} us | relerr {err:.2e}', flush=True)


if __name__ == '__main__':
    main()
