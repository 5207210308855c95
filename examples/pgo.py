"""Pose-graph optimization example.

Workload parity: examples/module/pgo/pgo.py (parking-garage.g2o with
LM + TrustRegion + StopOnPlateau).  Runs on a g2o file if given, else on
the synthetic sphere world (no downloads in this environment).

    python examples/pgo.py [--g2o FILE] [--poses 2500] [--device cpu]
"""

import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import time

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser(description='Pose Graph Optimization')
    parser.add_argument('--g2o', type=str, default=None,
                        help='path to a g2o file (VERTEX_SE3:QUAT)')
    parser.add_argument('--poses', type=int, default=2500)
    parser.add_argument('--steps', type=int, default=10)
    parser.add_argument('--device', type=str, default=None,
                        help="e.g. 'cpu' to force the CPU backend")
    parser.add_argument('--radius', type=float, default=1e4,
                        help='trust region radius')
    args = parser.parse_args()
    if args.device:
        jax.config.update('jax_platforms', args.device)

    import pypose_tpu as pp
    from pypose_tpu.datasets import load_g2o, synthetic_sphere
    from pypose_tpu.optim.sparse import pgo
    from pypose_tpu.optim.strategy import TrustRegion

    if args.g2o:
        ds = load_g2o(args.g2o)
    else:
        ds = synthetic_sphere(args.poses)
    print(f'poses: {ds["nodes"].lshape[0]}, edges: {ds["edges"].shape[0]}')

    t0 = time.time()
    nodes, hist = pgo(ds['nodes'], ds['edges'], ds['poses'],
                      infos=ds.get('infos'), steps=args.steps,
                      strategy=TrustRegion(radius=args.radius),
                      cg_iter=150, cg_tol=1e-6, verbose=True)
    print(f'chi2: {hist[0]:.4e} -> {hist[-1]:.4e} in {time.time()-t0:.2f}s')

    if 'gt' in ds:
        from pypose_tpu.metric import ape
        import numpy as _np; stamps = _np.arange(nodes.lshape[0], dtype=_np.float64)
        result = ape(stamps, ds['gt'], stamps, nodes, etype='translation',
                     align=True, otype='RMSE')
        print(f'APE RMSE vs ground truth (aligned): {float(result):.4f}')


if __name__ == '__main__':
    main()
