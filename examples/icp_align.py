"""ICP point-cloud alignment example.

Workload parity: examples/module/icp.

    python examples/icp_align.py [--points 500] [--device cpu]
"""

import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser(description='ICP alignment')
    parser.add_argument('--points', type=int, default=500)
    parser.add_argument('--noise', type=float, default=0.005)
    parser.add_argument('--device', type=str, default=None)
    args = parser.parse_args()
    if args.device:
        jax.config.update('jax_platforms', args.device)

    import pypose_tpu as pp
    from pypose_tpu.module import ICP
    from pypose_tpu.utils import ReduceToBason

    key = jax.random.PRNGKey(0)
    # a synthetic "scan": ring + noise
    t = jnp.linspace(0, 2 * jnp.pi, args.points)
    source = jnp.stack([jnp.cos(t), jnp.sin(t), 0.1 * jnp.sin(5 * t)], -1)
    source = source + args.noise * jax.random.normal(key, source.shape)

    T_true = pp.randn_SE3(sigma=(0.4, 0.2), key=jax.random.PRNGKey(1))
    target = T_true.Act(source)

    icp = ICP(stepper=ReduceToBason(steps=150, patience=8, tol=1e-9,
                                    verbose=False))
    T_est = icp(source, target)
    err = (T_est.Inv() @ T_true).Log().tensor()
    print('true  :', np.asarray(T_true.tensor()))
    print('est   :', np.asarray(T_est.tensor()))
    print('tangent error:', float(jnp.abs(err).max()))


if __name__ == '__main__':
    main()
