r"""Dataset utilities: g2o pose-graph parsing and synthetic generators.

The reference downloads benchmark graphs at runtime
(examples/module/pgo/pgo_dataset.py:15-20); this module parses the same g2o
format locally and additionally provides deterministic synthetic generators
(sphere / grid worlds) so benchmarks run in egress-free environments.
"""

import numpy as np

import jax
import jax.numpy as jnp

from .lietensor.utils import SE3, randn_SE3
from .lietensor.convert import euler2SO3


def load_g2o(path, dtype=jnp.float32):
    """Parse a g2o file with VERTEX_SE3:QUAT / EDGE_SE3:QUAT records.

    Returns dict(nodes=SE3[N], edges=int[E,2], poses=SE3[E] relative
    measurements, infos=float[E,6,6] information matrices).
    """
    verts, vids = [], []
    eii, ejj, emeas, einfo = [], [], [], []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == 'VERTEX_SE3:QUAT':
                vids.append(int(tok[1]))
                verts.append([float(x) for x in tok[2:9]])
            elif tok[0] == 'EDGE_SE3:QUAT':
                eii.append(int(tok[1]))
                ejj.append(int(tok[2]))
                emeas.append([float(x) for x in tok[3:10]])
                upper = [float(x) for x in tok[10:31]]
                info = np.zeros((6, 6))
                iu = np.triu_indices(6)
                info[iu] = upper
                info = info + np.triu(info, 1).T
                einfo.append(info)
    order = np.argsort(vids)
    id2row = {vids[i]: r for r, i in enumerate(order)}
    nodes = np.asarray(verts)[order]
    edges = np.stack([[id2row[i] for i in eii],
                      [id2row[j] for j in ejj]], axis=1)
    return dict(
        nodes=SE3(jnp.asarray(nodes, dtype)),
        edges=jnp.asarray(edges, jnp.int32),
        poses=SE3(jnp.asarray(emeas, dtype)),
        infos=jnp.asarray(np.stack(einfo), dtype),
    )


def synthetic_sphere(n_poses=2500, radius=25.0, loops_per_pose=0.8,
                     meas_sigma=(0.05, 0.02), init_sigma=(1.0, 0.3),
                     seed=42, dtype=jnp.float32):
    """Deterministic sphere-world pose graph (sphere2500-like).

    Poses spiral over a sphere; odometry edges chain consecutive poses and
    loop closures connect spatially nearby poses on adjacent rings.  Returns
    the same structure as :func:`load_g2o` plus ``gt`` (ground truth) —
    ``nodes`` is the noisy initialization.
    """
    n = n_poses
    idx = np.arange(n)
    # spherical spiral (golden-angle)
    z = 1.0 - 2.0 * (idx + 0.5) / n
    phi = np.arccos(z)
    theta = np.pi * (1 + 5 ** 0.5) * idx
    xyz = radius * np.stack([np.sin(phi) * np.cos(theta),
                             np.sin(phi) * np.sin(theta),
                             np.cos(phi)], axis=-1)
    # orientation: roughly tangent heading
    yaw = np.arctan2(np.diff(xyz[:, 1], append=xyz[0:1, 1]),
                     np.diff(xyz[:, 0], append=xyz[0:1, 0]))
    rpy = np.stack([np.zeros(n), np.zeros(n), yaw], axis=-1)
    rot = euler2SO3(jnp.asarray(rpy, dtype)).tensor()
    gt = SE3(jnp.concatenate([jnp.asarray(xyz, dtype), rot], axis=-1))

    # edges: odometry chain + loop closures to nearest previous ring
    ii = idx[:-1]
    jj = idx[1:]
    n_loops = int(loops_per_pose * n)
    rng = np.random.default_rng(seed)
    li = rng.integers(0, n, n_loops)
    # ring spacing ~ sqrt(n): connect to pose one ring earlier
    stride = int(np.sqrt(n) * np.pi)
    lj = (li + stride) % n
    keep = li != lj
    ii = np.concatenate([ii, li[keep]])
    jj = np.concatenate([jj, lj[keep]])
    edges = jnp.asarray(np.stack([ii, jj], axis=1), jnp.int32)

    E = edges.shape[0]
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    noise = randn_SE3(E, sigma=meas_sigma, key=k1, dtype=dtype)
    Z = (gt[edges[:, 0]].Inv() @ gt[edges[:, 1]]) @ noise
    init_noise = randn_SE3(n, sigma=init_sigma, key=k2, dtype=dtype)
    nodes = init_noise @ gt
    nodes = SE3(nodes.tensor().at[0].set(gt.tensor()[0]))
    infos = jnp.broadcast_to(jnp.eye(6, dtype=dtype), (E, 6, 6))
    return dict(nodes=nodes, edges=edges, poses=Z, infos=infos, gt=gt)
