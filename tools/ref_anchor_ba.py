r"""Compute the PyTorch reference's converged chi^2 on an identical
bundle-adjustment problem, and vendor it as a JSON artifact for bench.py.

Runs the actual reference implementation (/root/reference, torch CPU) with
its DENSE LM pipeline — LM + Cholesky + TrustRegion(radius) +
StopOnPlateau — on the same synthetic BAL problem our BundleAdjustment
optimizes (pypose_tpu.datasets.synthetic_bal: BAL -X/Z projection, f-only
intrinsics).  Model parity: examples/module/ba/bundle_adjustment.py:22-42
(reprojection residual over SE3 camera Parameters + point Parameters);
optimizer parity: pypose/optim/optimizer.py:330-680.

Size note: the reference's dense path materializes J = [2*O, 6*C+3*P]
through modjac (optim/functional.py:9-153), so anchor problems must stay
small (the trafalgar-scale problem would need a 452k x 197k dense Jacobian
~ 356 GB — the reference itself only handles that scale through its
external CUDA `bae` backend, which is unavailable here).  The anchor
therefore proves OBJECTIVE/SEMANTICS parity at a dense-feasible size;
bench.py separately measures speed at trafalgar scale.

Usage:  python tools/ref_anchor_ba.py [--cams 16 --points 300 --opp 4]
Writes: data/ref_anchor_bal_<C>_<P>.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, '/root/reference')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# never touch the TPU tunnel from this CPU-only tool
import jax
jax.config.update('jax_platforms', 'cpu')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cams', type=int, default=16)
    ap.add_argument('--points', type=int, default=300)
    ap.add_argument('--opp', type=float, default=4,
                    help='observations per point')
    ap.add_argument('--pose-noise', type=float, nargs=2, default=(0.3, 0.1))
    ap.add_argument('--point-noise', type=float, default=0.5)
    ap.add_argument('--pixel-noise', type=float, default=0.5)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--steps', type=int, default=20)
    ap.add_argument('--patience', type=int, default=5)
    ap.add_argument('--decreasing', type=float, default=1e-4)
    ap.add_argument('--radius', type=float, default=1e4)
    ap.add_argument('--out', type=str, default=None)
    args = ap.parse_args()

    import numpy as np
    import torch
    torch.set_num_threads(max(1, os.cpu_count()))
    import pypose as pp
    import pypose.optim.solver as ppos
    import pypose.optim.strategy as ppost
    from pypose.optim.scheduler import StopOnPlateau
    from torch import nn

    from pypose_tpu.datasets import synthetic_bal

    ds = synthetic_bal(n_cams=args.cams, n_points=args.points,
                       obs_per_point=args.opp,
                       pose_noise=tuple(args.pose_noise),
                       point_noise=args.point_noise,
                       pixel_noise=args.pixel_noise, seed=args.seed)

    def t(x):
        return torch.from_numpy(np.asarray(x, np.float64)).float()

    poses = pp.SE3(t(ds['poses'].tensor()))
    points = t(ds['points'])
    cam_idx = torch.from_numpy(np.asarray(ds['cam_idx'], np.int64))
    pt_idx = torch.from_numpy(np.asarray(ds['pt_idx'], np.int64))
    pixels = t(ds['pixels'])
    f = float(np.asarray(ds['cameras'])[0, 0])

    class BAGraph(nn.Module):
        # reference-style reprojection graph: SE3 camera Parameters +
        # euclidean point Parameters; residual = BAL projection - pixel
        # (examples/module/ba/bundle_adjustment.py:22-42 without the
        # sparse-backend decorations)
        def __init__(self, poses, points):
            super().__init__()
            self.poses = pp.Parameter(poses)
            self.points = nn.Parameter(points)

        def forward(self, cam_idx, pt_idx, pixels):
            Xc = self.poses[cam_idx] @ self.points[pt_idx]
            p = -Xc[..., :2] / Xc[..., 2:3]
            return f * p - pixels

    graph = BAGraph(poses, points)
    optimizer = pp.optim.LM(graph, solver=ppos.Cholesky(),
                            strategy=ppost.TrustRegion(radius=args.radius),
                            min=1e-6, vectorize=True)
    scheduler = StopOnPlateau(optimizer, steps=args.steps,
                              patience=args.patience,
                              decreasing=args.decreasing, verbose=True)

    with torch.no_grad():
        r0 = graph(cam_idx, pt_idx, pixels)
        chi2_0 = float(r0.square().sum())
    O = pixels.shape[0]
    print(f'[ref-ba] C={args.cams} P={args.points} O={O} '
          f'initial chi2 {chi2_0:.6e}', flush=True)

    history = []
    t0 = time.perf_counter()
    while scheduler.continual():
        ts = time.perf_counter()
        loss = optimizer.step(input=(cam_idx, pt_idx, pixels))
        scheduler.step(loss)
        history.append(float(loss))
        print(f'[ref-ba] step {len(history)}: loss {float(loss):.6e} '
              f'({time.perf_counter()-ts:.1f}s)', flush=True)
    elapsed = time.perf_counter() - t0

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'data', f'ref_anchor_bal_{args.cams}_{args.points}.json')
    os.makedirs(os.path.dirname(out), exist_ok=True)
    payload = {
        'problem': f'synthetic_bal(n_cams={args.cams}, '
                   f'n_points={args.points}, obs_per_point={args.opp}, '
                   f'pose_noise={tuple(args.pose_noise)}, '
                   f'point_noise={args.point_noise}, '
                   f'pixel_noise={args.pixel_noise}, seed={args.seed})',
        'n_cams': args.cams, 'n_points': args.points, 'n_obs': int(O),
        'pose_noise': list(args.pose_noise),
        'point_noise': args.point_noise,
        'pixel_noise': args.pixel_noise,
        'obs_per_point': args.opp,
        'seed': args.seed,
        'reference': 'pypose v0.9.5 dense LM+Cholesky+'
                     f'TrustRegion({args.radius:g})+'
                     f'StopOnPlateau(steps={args.steps}, '
                     f'patience={args.patience}, '
                     f'decreasing={args.decreasing})',
        'dtype': 'float32',
        'device': 'cpu',
        'initial_chi2': chi2_0,
        'history': history,
        'final_chi2': history[-1] if history else None,
        'wall_seconds': elapsed,
        'loss_definition': 'chi2 = sum_o |f*(-X_c[:2]/X_c[2]) - pixel|^2 '
                           '(reference RobustModel.loss; identical to '
                           'BundleAdjustment._chi2)',
        'provenance': 'reference-computed (this file written by '
                      'tools/ref_anchor_ba.py running /root/reference '
                      'on CPU)',
    }
    with open(out, 'w') as fobj:
        json.dump(payload, fobj, indent=1)
    print(f'[ref-ba] wrote {out}: final chi2 '
          f'{payload["final_chi2"]:.6e} in {elapsed:.1f}s', flush=True)


if __name__ == '__main__':
    main()
