"""Spline interpolation example: cubic Hermite on R^3 and SE3 B-spline.

Workload parity: examples/module/spline.

    python examples/splines.py [--device cpu]
"""

import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser(description='Splines')
    parser.add_argument('--interval', type=float, default=0.2)
    parser.add_argument('--device', type=str, default=None)
    args = parser.parse_args()
    if args.device:
        jax.config.update('jax_platforms', args.device)

    import pypose_tpu as pp

    # Cubic Hermite on R^3
    knots = jax.random.normal(jax.random.PRNGKey(0), (6, 3))
    curve = pp.chspline(knots, interval=args.interval)
    print('chspline:', knots.shape, '->', curve.shape)
    k = int(1 / args.interval)
    print('  knot residual:',
          float(jnp.abs(curve[::k] - knots).max()))

    # SE3 B-spline over control poses
    poses = pp.randn_SE3(8, sigma=(0.5, 0.2), key=jax.random.PRNGKey(1))
    traj = pp.bspline(poses, interval=args.interval)
    print('bspline:', poses.lshape, '->', traj.lshape)
    step = (traj[:-1].Inv() @ traj[1:]).Log().tensor()
    print('  max inter-pose tangent step:', float(jnp.abs(step).max()))

    # extrapolated variant covers the full range
    traj2 = pp.bspline(poses, interval=args.interval, extrapolate=True)
    print('bspline extrapolate:', traj2.lshape)


if __name__ == '__main__':
    main()
