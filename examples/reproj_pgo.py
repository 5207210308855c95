"""Reprojection-constrained pose graph: odometry factors + landmark
observation factors in ONE factor graph.

Workload parity: examples/module/reprojpgo (the reference's third sparse
workload).  Demonstrates the general multi-group Factor API: SE3 poses and
R^3 landmarks optimized jointly.

    python examples/reproj_pgo.py [--device cpu]
"""

import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser(description='Reprojection PGO')
    parser.add_argument('--poses', type=int, default=40)
    parser.add_argument('--landmarks', type=int, default=120)
    parser.add_argument('--steps', type=int, default=12)
    parser.add_argument('--device', type=str, default=None)
    args = parser.parse_args()
    if args.device:
        jax.config.update('jax_platforms', args.device)

    import pypose_tpu as pp
    from pypose_tpu.optim.sparse import SparseLM, Factor, pgo_factor

    key = jax.random.PRNGKey(0)
    N, L = args.poses, args.landmarks
    # ground-truth trajectory: circle; landmarks scattered around it
    t = jnp.linspace(0, 2 * jnp.pi, N, endpoint=False)
    xyz = jnp.stack([8 * jnp.cos(t), 8 * jnp.sin(t), jnp.zeros_like(t)], -1)
    rpy = jnp.stack([jnp.zeros_like(t), jnp.zeros_like(t),
                     t + jnp.pi / 2], -1)
    gt_pose = pp.SE3(jnp.concatenate([xyz, pp.euler2SO3(rpy).tensor()], -1))
    gt_lm = 6.0 * jax.random.normal(jax.random.PRNGKey(1), (L, 3))

    # odometry edges
    ii = jnp.arange(N)
    jj = (ii + 1) % N
    Z = (gt_pose[ii].Inv() @ gt_pose[jj]) @ pp.randn_SE3(
        N, sigma=0.01, key=jax.random.PRNGKey(2))
    odo = pgo_factor(jnp.stack([ii, jj], -1), Z)

    # landmark observations: each pose sees 6 random landmarks (bearing+range
    # in the camera frame)
    obs_per = 6
    pi = jnp.repeat(jnp.arange(N), obs_per)
    li = jax.random.randint(jax.random.PRNGKey(3), (N * obs_per,), 0, L)
    meas = gt_pose[pi].Act(gt_lm[li]) + 0.01 * jax.random.normal(
        jax.random.PRNGKey(4), (N * obs_per, 3))

    def obs_residual(values, meas):
        X = values['poses'][0]
        lm = values['landmarks'][0]
        return X.Act(lm) - meas

    obs = Factor(obs_residual,
                 indices={'poses': pi[:, None], 'landmarks': li[:, None]},
                 consts=meas)

    # noisy initialization (anchor pose 0)
    init_pose = pp.randn_SE3(N, sigma=0.2, key=jax.random.PRNGKey(5)) @ \
        gt_pose
    init_pose = pp.SE3(init_pose.tensor().at[0].set(gt_pose.tensor()[0]))
    init_lm = gt_lm + 0.5 * jax.random.normal(jax.random.PRNGKey(6), (L, 3))

    fixed = {'poses': jnp.zeros(N, bool).at[0].set(True),
             'landmarks': jnp.zeros(L, bool)}
    opt = SparseLM({'poses': init_pose, 'landmarks': init_lm},
                   [odo, obs], fixed=fixed, cg_iter=150, cg_tol=1e-7)
    for i in range(args.steps):
        loss = opt.step()
        print(f'step {i:2d}: chi2 {loss:.5e}')
        if opt.reject_count > 0:
            break

    err_p = (opt.params['poses'].Inv() @ gt_pose).Log().tensor()
    err_l = opt.params['landmarks'] - gt_lm
    print('mean pose err:', float(jnp.abs(err_p).mean()))
    print('mean landmark err:', float(jnp.abs(err_l).mean()))


if __name__ == '__main__':
    main()
