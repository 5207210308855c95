"""Point-cloud registration beyond ICP: filtering + direct alignment.

Workload parity: /root/reference/examples/module/pcr/pointcloud.py (the
bunny-cloud demo: downsample with the point-cloud filters, then align).
No downloads in this environment, so the cloud is a synthesized
structured surface; the demo exercises ``voxel_filter`` /
``random_filter`` / ``knn_filter`` / ``nbr_filter`` and both alignment
routes: ``svdtf`` (Kabsch, known correspondences -> SE3) and ``svdstf``
(Umeyama with scale -> Sim3).

    python examples/pointcloud_registration.py [--points 2000]
"""

import argparse
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import jax
import jax.numpy as jnp


def bunny_like(n, key):
    """Structured surface (torus + noise) standing in for the bunny."""
    k1, k2, k3 = jax.random.split(key, 3)
    u = jax.random.uniform(k1, (n,)) * 2 * jnp.pi
    v = jax.random.uniform(k2, (n,)) * 2 * jnp.pi
    R, r = 1.0, 0.35
    pts = jnp.stack([(R + r * jnp.cos(v)) * jnp.cos(u),
                     (R + r * jnp.cos(v)) * jnp.sin(u),
                     r * jnp.sin(v)], axis=-1)
    return pts + jax.random.normal(k3, (n, 3)) * 0.005


def main():
    parser = argparse.ArgumentParser(description='Point-cloud registration')
    parser.add_argument('--points', type=int, default=2000)
    parser.add_argument('--device', type=str, default=None)
    args = parser.parse_args()
    if args.device:
        jax.config.update('jax_platforms', args.device)

    import pypose_tpu as pp

    key = jax.random.PRNGKey(0)
    source = bunny_like(args.points, key)

    # --- the reference demo's filter chain (pointcloud.py) -------------
    vox = pp.voxel_filter(source, voxel=jnp.array([0.2, 0.2, 0.2]))
    rnd = pp.random_filter(source, num=min(500, args.points))
    knnf = pp.knn_filter(source, k=4)
    nbr = pp.nbr_filter(source, nbr=4, radius=0.3)
    print(f'filters: voxel {source.shape[0]} -> {vox.shape[0]}; '
          f'random -> {rnd.shape[0]}; knn-smooth -> {knnf.shape[0]}; '
          f'nbr -> {nbr.shape[0]}')

    # --- rigid alignment with known correspondences (svdtf/Kabsch) -----
    T_true = pp.randn_SE3(sigma=(0.5, 0.3), key=jax.random.PRNGKey(1))
    target = T_true.Act(source)
    T_est = pp.svdtf(source, target)
    err = float(jnp.abs((T_est.Inv() @ T_true).Log().tensor()).max())
    print(f'svdtf (Kabsch): pose error {err:.2e}')
    assert err < 1e-4

    # --- similarity alignment (svdstf/Umeyama -> Sim3) ------------------
    scale = 1.7
    tgt_s = scale * T_true.Act(source)
    S_est = pp.svdstf(source, tgt_s)
    s_err = abs(float(S_est.tensor()[..., 7]) - scale)
    print(f'svdstf (Umeyama): recovered scale '
          f'{float(S_est.tensor()[..., 7]):.4f} (true {scale}), '
          f'err {s_err:.2e}')
    assert s_err < 1e-3

    # --- unknown correspondences: ICP on the filtered cloud ------------
    from pypose_tpu.module import ICP
    T_small = pp.randn_SE3(sigma=(0.1, 0.05), key=jax.random.PRNGKey(2))
    T_icp = ICP()(source, T_small.Act(source))
    icp_err = float(jnp.abs((T_icp.Inv() @ T_small).Log().tensor()).max())
    print(f'ICP (unknown correspondences): pose error {icp_err:.2e}')
    assert icp_err < 1e-2


if __name__ == '__main__':
    main()
