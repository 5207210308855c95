"""Bundle adjustment example (Schur-complement LM).

Workload parity: examples/module/ba/bundle_adjustment.py (BAL problems,
20 LM steps).  Runs on a BAL file if given, else a synthetic ring-of-cameras
problem.

    python examples/bundle_adjustment.py [--bal problem.txt] [--steps 20]
"""

import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import time

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser(description='Bundle Adjustment')
    parser.add_argument('--bal', type=str, default=None,
                        help='path to a BAL problem file')
    parser.add_argument('--cams', type=int, default=32)
    parser.add_argument('--points', type=int, default=2000)
    parser.add_argument('--steps', type=int, default=20)
    parser.add_argument('--huber', type=float, default=None)
    parser.add_argument('--device', type=str, default=None)
    args = parser.parse_args()
    if args.device:
        jax.config.update('jax_platforms', args.device)

    from pypose_tpu.datasets import load_bal, synthetic_bal
    from pypose_tpu.optim.ba import BundleAdjustment
    from pypose_tpu.optim.kernel import Huber

    if args.bal:
        ds = load_bal(args.bal)
    else:
        ds = synthetic_bal(n_cams=args.cams, n_points=args.points)
    O = ds['pixels'].shape[0]
    print(f'cameras: {ds["poses"].lshape[0]}, points: '
          f'{ds["points"].shape[0]}, observations: {O}')

    kernel = Huber(delta=args.huber) if args.huber else None
    ba = BundleAdjustment(ds['poses'], ds['points'], ds['cam_idx'],
                          ds['pt_idx'], ds['pixels'], ds['cameras'],
                          kernel=kernel, fix_first_pose=True,
                          cg_iter=50, cg_tol=1e-6)
    t0 = time.time()
    for i in range(args.steps):
        loss = ba.step()
        print(f'step {i:2d}: chi2 {loss:.6e}  (rejects {ba.reject_count})')
        if ba.reject_count >= ba.reject:
            break
    print(f'done in {time.time()-t0:.2f}s; '
          f'mean reproj error {jnp.sqrt(loss / O):.4f} px')


if __name__ == '__main__':
    main()
