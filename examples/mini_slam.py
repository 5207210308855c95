"""Mini structure-from-motion pipeline: EPnP initialization -> Schur
bundle adjustment -> APE evaluation.

Shows the library's components composing end-to-end on one synthetic
scene (the per-frame EPnP solves run as one vmapped program).

    python examples/mini_slam.py [--frames 12] [--device cpu]
"""

import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser(description='mini SfM pipeline')
    parser.add_argument('--frames', type=int, default=12)
    parser.add_argument('--points', type=int, default=200)
    parser.add_argument('--pix-noise', type=float, default=1.0)
    parser.add_argument('--device', type=str, default=None)
    args = parser.parse_args()
    if args.device:
        jax.config.update('jax_platforms', args.device)

    import pypose_tpu as pp
    from pypose_tpu.module import EPnP
    from pypose_tpu.optim.ba import (BundleAdjustment,
                                     reproj_residual_pinhole)
    from pypose_tpu.metric import ape

    C, P = args.frames, args.points
    f, cx, cy = 500.0, 320.0, 240.0
    K = jnp.array([[f, 0, cx], [0, f, cy], [0, 0, 1.]])

    # scene: camera ring looking at a point cloud
    ang = 2 * jnp.pi * jnp.arange(C) / C
    centers = jnp.stack([6 * jnp.cos(ang), 6 * jnp.sin(ang),
                         1.5 + 0 * ang], -1)
    # world->cam: camera z looks at origin
    fwd = -centers / jnp.linalg.norm(centers, axis=-1, keepdims=True)
    up = jnp.broadcast_to(jnp.array([0., 0., 1.]), fwd.shape)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right, axis=-1, keepdims=True)
    down = jnp.cross(fwd, right)
    R_wc = jnp.stack([right, down, fwd], axis=-2)
    t_wc = -jnp.einsum('cij,cj->ci', R_wc, centers)
    gt_pose = pp.SE3(jnp.concatenate(
        [t_wc, pp.mat2SO3(R_wc, check=False).tensor()], -1))
    # compact cloud: keep every point safely in front of every camera
    world = 1.5 * jax.random.normal(jax.random.PRNGKey(0), (P, 3))
    world = world.at[:, 2].multiply(0.5)

    # observations: every camera sees every point (pinhole, noisy pixels)
    pts_cam = gt_pose.unsqueeze(-2).Act(world)          # [C, P, 3]
    pixels = pp.point2pixel(pts_cam, K)
    pixels = pixels + args.pix_noise * jax.random.normal(
        jax.random.PRNGKey(1), pixels.shape)

    # 1) per-frame EPnP initialization (all frames in one batched call)
    epnp = EPnP(intrinsics=K, refine=False)
    init_pose = epnp(jnp.broadcast_to(world, (C, P, 3)), pixels)
    err0 = pp.reprojerr(jnp.broadcast_to(world, (C, P, 3)), pixels, K,
                        init_pose, reduction='norm')
    print(f'EPnP init: mean reproj {float(err0.mean()):.3f} px')

    # 2) bundle adjustment over poses + points (noisy triangulation init)
    ci = jnp.repeat(jnp.arange(C), P)
    pi = jnp.tile(jnp.arange(P), C)
    init_pts = world + 0.05 * jax.random.normal(jax.random.PRNGKey(2),
                                                world.shape)
    cam_params = jnp.broadcast_to(jnp.array([f, cx, cy]), (C, 3))
    ba = BundleAdjustment(init_pose, init_pts, ci, pi,
                          pixels.reshape(-1, 2), cam_params,
                          residual=reproj_residual_pinhole,
                          fix_first_pose=True, cg_iter=40, cg_tol=1e-6)
    chi2 = ba.optimize(steps=8, patience=8, decreasing=0.0)
    O = C * P
    print(f'BA refined: chi2 {chi2:.4e} '
          f'(reproj RMSE {float(jnp.sqrt(chi2 / O)):.3f} px)')

    # 3) trajectory evaluation (aligned APE, since gauge may drift)
    stamps = np.arange(C, dtype=np.float64)
    for name, est in [('EPnP ', init_pose), ('BA   ', ba.poses)]:
        r = ape(stamps, gt_pose, stamps, est, etype='translation',
                align=True, otype='RMSE')
        print(f'{name} APE RMSE: {float(r):.5f}')


if __name__ == '__main__':
    main()
