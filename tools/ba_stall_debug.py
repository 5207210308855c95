"""Why does synthetic-trafalgar BA stall after one LM step?

Runs the bench problem with per-step diagnostics (loss, damping,
reject count) under different configs on the TPU.
Usage: python tools/ba_stall_debug.py [--steps 12]
"""

import argparse
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=12)
    ap.add_argument('--cams', type=int, default=257)
    ap.add_argument('--points', type=int, default=65132)
    ap.add_argument('--obs', type=float, default=225911 / 65132)
    args = ap.parse_args()

    print('devices:', jax.devices(), flush=True)
    from pypose_tpu.datasets import synthetic_bal
    from pypose_tpu.optim.ba import BundleAdjustment

    ds = synthetic_bal(n_cams=args.cams, n_points=args.points,
                       obs_per_point=args.obs, seed=0,
                       pose_noise=(0.3, 0.1), point_noise=0.5)
    O = ds['pixels'].shape[0]

    def run(tag, **kw):
        ba = BundleAdjustment(ds['poses'], ds['points'], ds['cam_idx'],
                              ds['pt_idx'], ds['pixels'], ds['cameras'],
                              fix_first_pose=True, cg_iter=40,
                              cg_tol=1e-6, **kw)
        chi0 = float(ba._chi2(ds['poses'].tensor(), ds['points']))
        t0 = time.perf_counter()
        hist = []
        for k in range(args.steps):
            loss = ba.step()
            d = ba.strategy_state.get('damping') \
                if isinstance(ba.strategy_state, dict) else None
            hist.append(float(loss))
            print(f'  [{tag}] step {k}: loss {float(loss):.6e} '
                  f'damping {float(d) if d is not None else float("nan"):.3e} '
                  f'rejects {int(ba.reject_count)}', flush=True)
        print(f'[{tag}] chi0 {chi0:.4e} -> {hist[-1]:.4e} '
              f'({time.perf_counter()-t0:.1f}s, O={O}, '
              f'rmse {float(jnp.sqrt(hist[-1]/O)):.3f} px)', flush=True)

    run('default-bf16-schur')
    run('schur-highest', schur_precision=jax.lax.Precision.HIGHEST,
        schur_refine=0)
    run('cg', schur='never')


if __name__ == '__main__':
    main()
