r"""Dataset utilities: g2o pose-graph parsing and synthetic generators.

The reference downloads benchmark graphs at runtime
(examples/module/pgo/pgo_dataset.py:15-20); this module parses the same g2o
format locally and additionally provides deterministic synthetic generators
(sphere / grid worlds) so benchmarks run in egress-free environments.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from .lietensor.utils import SE3, randn_SE3
from .lietensor.convert import euler2SO3


def find_data(name):
    """Locate a benchmark data file (e.g. ``sphere2500.g2o``,
    ``parking-garage.g2o``, ``problem-257-65132-pre.txt``).

    Searches ``$PYPOSE_TPU_DATA`` then the repo-level ``data/`` directory.
    Returns the path or None.  The reference downloads these at runtime
    (examples/module/pgo/pgo_dataset.py:15-20); in egress-free environments
    drop the files into ``data/`` and every bench/test picks them up.
    """
    cands = []
    env = os.environ.get('PYPOSE_TPU_DATA')
    if env:
        cands.append(os.path.join(env, name))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cands.append(os.path.join(here, 'data', name))
    for c in cands:
        if os.path.exists(c):
            return c
    return None


def save_g2o(path, nodes, edges, poses, infos=None):
    """Write a pose graph in g2o VERTEX_SE3:QUAT / EDGE_SE3:QUAT format
    (row-major upper-triangular 6x6 information, the format parsed by
    the reference's loader, examples/module/pgo/pgo_dataset.py:22-45)."""
    nodes = np.asarray(nodes.tensor() if hasattr(nodes, 'tensor')
                       else nodes, np.float64)
    poses = np.asarray(poses.tensor() if hasattr(poses, 'tensor')
                       else poses, np.float64)
    edges = np.asarray(edges)
    iu = np.triu_indices(6)
    if infos is None:
        infos = np.broadcast_to(np.eye(6), (edges.shape[0], 6, 6))
    infos = np.asarray(infos, np.float64)
    with open(path, 'w') as f:
        for i, v in enumerate(nodes):
            f.write('VERTEX_SE3:QUAT %d ' % i
                    + ' '.join('%.12g' % x for x in v) + '\n')
        for (i, j), z, w in zip(edges, poses, infos):
            f.write('EDGE_SE3:QUAT %d %d ' % (i, j)
                    + ' '.join('%.12g' % x for x in z) + ' '
                    + ' '.join('%.12g' % x for x in w[iu]) + '\n')


def save_bal(path, poses, points, cam_idx, pt_idx, pixels, cameras):
    """Write a problem in BAL text format (header ``C P O``; per-obs
    ``cam pt u v``; per-camera Rodrigues(3)+t(3)+f,k1,k2; per-point 3)."""
    from .lietensor.utils import SO3
    data = np.asarray(poses.tensor(), np.float64)
    t, q = data[:, :3], data[:, 3:]
    rod = np.asarray(SO3(jnp.asarray(q)).Log().tensor(), np.float64)
    cameras = np.asarray(cameras, np.float64)
    C = data.shape[0]
    if cameras.shape[0] != C:  # per-obs intrinsics: collapse per camera
        cams_per = np.zeros((C, 3))
        cams_per[np.asarray(cam_idx)] = cameras
        cameras = cams_per
    points = np.asarray(points, np.float64)
    cam_idx = np.asarray(cam_idx)
    pt_idx = np.asarray(pt_idx)
    pixels = np.asarray(pixels, np.float64)
    with open(path, 'w') as f:
        f.write(f'{C} {points.shape[0]} {pixels.shape[0]}\n')
        for c, p, (u, v) in zip(cam_idx, pt_idx, pixels):
            f.write(f'{c} {p} {u:.12g} {v:.12g}\n')
        for c in range(C):
            for x in (*rod[c], *t[c], *cameras[c]):
                f.write('%.12g\n' % x)
        for p in points:
            for x in p:
                f.write('%.12g\n' % x)


def load_g2o(path, dtype=jnp.float32):
    """Parse a g2o file with VERTEX_SE3:QUAT / EDGE_SE3:QUAT records.

    Uses the native C++ tokenizer (pypose_tpu.native) when available
    (~20x faster on large graphs), with a pure-Python fallback.  Returns
    dict(nodes=SE3[N], edges=int[E,2], poses=SE3[E] relative measurements,
    infos=float[E,6,6] information matrices).
    """
    from . import native
    parsed = native.parse_g2o(path)
    if parsed is not None:
        vids_a, verts_a, edges_a, meas_a, infos_u = parsed
        order = np.argsort(vids_a)
        nodes = verts_a[order]
        sorted_ids = vids_a[order]
        edges = np.searchsorted(sorted_ids, edges_a) \
            if len(edges_a) else edges_a
        iu = np.triu_indices(6)
        infos = np.zeros((len(infos_u), 6, 6))
        infos[:, iu[0], iu[1]] = infos_u
        infos = infos + np.triu(infos, 1).transpose(0, 2, 1)
        return dict(
            nodes=SE3(jnp.asarray(nodes, dtype)),
            edges=jnp.asarray(edges, jnp.int32),
            poses=SE3(jnp.asarray(meas_a, dtype)),
            infos=jnp.asarray(infos, dtype),
        )
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


def load_bal(path, dtype=jnp.float32):
    """Parse a BAL (Bundle Adjustment in the Large) problem file.

    Format: header ``n_cams n_points n_obs``; per-obs ``cam pt u v``;
    then per-camera 9 params (Rodrigues(3), t(3), f, k1, k2); per-point 3.
    Returns dict(poses=SE3[C], points=[P,3], cam_idx, pt_idx, pixels,
    cameras=[C,3] (f,k1,k2)).  Uses the native C++ tokenizer when
    available.  Workload parity: examples/module/ba/bundle_adjustment.py:49-60.
    """
    from . import native
    parsed = native.parse_bal(path)
    if parsed is not None:
        cam_idx, pt_idx, pixels, cams, points = parsed
        from .lietensor.utils import so3
        q = so3(jnp.asarray(cams[:, :3], dtype)).Exp().tensor()
        poses = SE3(jnp.concatenate(
            [jnp.asarray(cams[:, 3:6], dtype), q], axis=-1))
        return dict(poses=poses, points=jnp.asarray(points, dtype),
                    cam_idx=jnp.asarray(cam_idx, jnp.int32),
                    pt_idx=jnp.asarray(pt_idx, jnp.int32),
                    pixels=jnp.asarray(pixels, dtype),
                    cameras=jnp.asarray(cams[:, 6:9], dtype))
    with open(path) as f:
        tokens = f.read().split()
    it = iter(tokens)
    C, P, O = int(next(it)), int(next(it)), int(next(it))
    cam_idx = np.empty(O, np.int32)
    pt_idx = np.empty(O, np.int32)
    pixels = np.empty((O, 2))
    for o in range(O):
        cam_idx[o] = int(next(it))
        pt_idx[o] = int(next(it))
        pixels[o] = (float(next(it)), float(next(it)))
    cams = np.array([float(next(it)) for _ in range(9 * C)]).reshape(C, 9)
    points = np.array([float(next(it)) for _ in range(3 * P)]).reshape(P, 3)
    # rodrigues -> quaternion via so3 Exp
    from .lietensor.utils import so3
    q = so3(jnp.asarray(cams[:, :3], dtype)).Exp().tensor()
    poses = SE3(jnp.concatenate([jnp.asarray(cams[:, 3:6], dtype), q],
                                axis=-1))
    return dict(poses=poses, points=jnp.asarray(points, dtype),
                cam_idx=jnp.asarray(cam_idx), pt_idx=jnp.asarray(pt_idx),
                pixels=jnp.asarray(pixels, dtype),
                cameras=jnp.asarray(cams[:, 6:9], dtype))


def synthetic_bal(n_cams=16, n_points=800, obs_per_point=4, f=500.0,
                  pose_noise=(0.05, 0.02), point_noise=0.05,
                  pixel_noise=0.5, seed=0, dtype=jnp.float32):
    """Deterministic synthetic BAL-style bundle-adjustment problem.

    Cameras ring around a point cloud; every point observed by
    ``obs_per_point`` nearby cameras.  Returns ground truth plus noisy
    initialization in the same structure as :func:`load_bal` (+ ``gt_poses``,
    ``gt_points``).
    """
    rng = np.random.default_rng(seed)
    # cameras on a ring looking at the origin
    ang = 2 * np.pi * np.arange(n_cams) / n_cams
    centers = np.stack([10 * np.cos(ang), 10 * np.sin(ang),
                        2 * np.ones(n_cams)], axis=-1)
    # camera z-axis looks at origin: build rotation world->cam
    fwd = -centers / np.linalg.norm(centers, axis=-1, keepdims=True)
    up = np.broadcast_to(np.array([0., 0., 1.]), fwd.shape)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right, axis=-1, keepdims=True)
    down = np.cross(fwd, right)
    R_wc = np.stack([right, down, fwd], axis=-2)  # rows = cam axes
    t_wc = -np.einsum('cij,cj->ci', R_wc, centers)
    from .lietensor.convert import mat2SO3
    q = mat2SO3(jnp.asarray(R_wc, dtype), check=False).tensor()
    gt_poses = SE3(jnp.concatenate([jnp.asarray(t_wc, dtype), q], axis=-1))

    gt_points = jnp.asarray(rng.normal(size=(n_points, 3)) * 2.0, dtype)

    # observations: each point seen by obs_per_point random cameras
    # (fractional obs_per_point matches real BAL observation counts, e.g.
    # trafalgar problem-257-65132-pre's 225,911 obs = 3.468/point)
    if float(obs_per_point) == int(obs_per_point):
        obs_per_point = int(obs_per_point)
        cam_idx = rng.integers(0, n_cams, size=(n_points, obs_per_point))
        cam_idx = np.sort(cam_idx, axis=1)
        pt_idx = np.repeat(np.arange(n_points), obs_per_point)
        cam_idx = cam_idx.reshape(-1)
    else:
        base = int(np.floor(obs_per_point))
        extra = int(round((obs_per_point - base) * n_points))
        counts = np.full(n_points, base)
        counts[:extra] += 1
        pt_idx = np.repeat(np.arange(n_points), counts)
        cam_idx = rng.integers(0, n_cams, size=pt_idx.shape[0])
    cameras = jnp.broadcast_to(jnp.asarray([f, 0., 0.], dtype),
                               (n_cams, 3))

    from .lietensor.lietensor import LieTensor
    Xc = gt_poses[jnp.asarray(cam_idx)].Act(gt_points[jnp.asarray(pt_idx)])
    p = -Xc[:, :2] / Xc[:, 2:3]
    pixels = f * p + jnp.asarray(
        rng.normal(size=(len(cam_idx), 2)) * pixel_noise, dtype)

    key = jax.random.PRNGKey(seed)
    noise = randn_SE3(n_cams, sigma=pose_noise, key=key, dtype=dtype)
    poses0 = noise @ gt_poses
    poses0 = SE3(poses0.tensor().at[0].set(gt_poses.tensor()[0]))
    points0 = gt_points + jnp.asarray(
        rng.normal(size=(n_points, 3)) * point_noise, dtype)
    return dict(poses=poses0, points=points0,
                cam_idx=jnp.asarray(cam_idx, jnp.int32),
                pt_idx=jnp.asarray(pt_idx, jnp.int32),
                pixels=pixels, cameras=cameras,
                gt_poses=gt_poses, gt_points=gt_points)


def synthetic_sphere(n_poses=2500, radius=25.0, loops_per_pose=0.8,
                     meas_sigma=(0.05, 0.02), init_sigma=(1.0, 0.3),
                     seed=42, dtype=jnp.float32, info='identity'):
    """Deterministic sphere-world pose graph (sphere2500-like).

    Poses spiral over a sphere; odometry edges chain consecutive poses and
    loop closures connect spatially nearby poses on adjacent rings.  Returns
    the same structure as :func:`load_g2o` plus ``gt`` (ground truth) —
    ``nodes`` is the noisy initialization.

    ``info``: 'identity' (default) or 'natural' — the measurement-noise
    inverse covariance ``diag(1/sigma_t^2 x3, 1/sigma_r^2 x3)``, the
    weighting real g2o benchmark graphs carry (e.g. sphere2500's
    EDGE_SE3:QUAT information matrices).

    Example:
        >>> from pypose_tpu.datasets import synthetic_sphere
        >>> ds = synthetic_sphere(100)
        >>> ds['nodes'].lshape, ds['edges'].shape[1]
        ((100,), 2)

        Round-trip through the on-disk g2o format (the path every real
        benchmark graph takes):

        >>> import tempfile, os, jax.numpy as jnp
        >>> from pypose_tpu.datasets import save_g2o, load_g2o
        >>> p = os.path.join(tempfile.gettempdir(), 'doc_s100.g2o')
        >>> save_g2o(p, ds['nodes'], ds['edges'], ds['poses'], ds['infos'])
        >>> back = load_g2o(p)
        >>> bool(jnp.allclose(back['poses'].tensor(),
        ...                   ds['poses'].tensor(), atol=1e-6))
        True
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
    if info == 'natural':
        st, sr = meas_sigma
        diag = jnp.asarray([1.0 / st**2] * 3 + [1.0 / sr**2] * 3, dtype)
        infos = jnp.broadcast_to(jnp.diag(diag), (E, 6, 6))
    else:
        infos = jnp.broadcast_to(jnp.eye(6, dtype=dtype), (E, 6, 6))
    return dict(nodes=nodes, edges=edges, poses=Z, infos=infos, gt=gt)


# ---------------------------------------------------------------------------
# KITTI raw IMU (oxts).  Workload parity:
# /root/reference/examples/module/imu/imu_dataset.py:10-80 (KITTI_IMU via
# pykitti).  Self-contained parser — no pykitti dependency: reads
# oxts/timestamps.txt + oxts/data/*.txt (30-field packets) and derives the
# same quantities the reference dataset exposes (dt, gyro, acc, ground-
# truth rotation/velocity/position via the Mercator projection pykitti
# uses).
# ---------------------------------------------------------------------------

_OXTS_FIELDS = ('lat lon alt roll pitch yaw vn ve vf vl vu ax ay az af al '
                'au wx wy wz wf wl wu pos_accuracy vel_accuracy navstat '
                'numsats posmode velmode orimode').split()


def _parse_kitti_timestamps(path):
    """timestamps.txt: 'YYYY-MM-DD HH:MM:SS.nnnnnnnnn' per line -> seconds
    (float64, relative epoch is irrelevant — only dt is consumed)."""
    from datetime import datetime, timezone
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            base, frac = line.rsplit('.', 1)
            t = datetime.strptime(base, '%Y-%m-%d %H:%M:%S').replace(
                tzinfo=timezone.utc)
            out.append(t.timestamp() + float('0.' + frac))
    return np.asarray(out, np.float64)


def load_kitti_imu(root, dtype=jnp.float32):
    """Load a KITTI raw drive's oxts stream for IMU preintegration.

    Args:
        root: directory containing ``oxts/timestamps.txt`` and
            ``oxts/data/NNNNNNNNNN.txt`` (a pykitti-style extracted
            drive, e.g. ``.../2011_09_26/2011_09_26_drive_0005_sync``).

    Returns a dict with the same quantities the reference's KITTI_IMU
    dataset exposes (imu_dataset.py:23-43): ``dt [F, 1]``, ``gyro
    [F, 3]``, ``acc [F, 3]`` (body frame), ``gt_rot`` SO3 ``[F]``,
    ``gt_vel [F, 3]`` (world frame), ``gt_pos [F, 3]`` (Mercator-
    projected, first frame at origin), for F = frames - 1.
    """
    import os
    oxts = os.path.join(root, 'oxts')
    stamps = _parse_kitti_timestamps(os.path.join(oxts, 'timestamps.txt'))
    ddir = os.path.join(oxts, 'data')
    files = sorted(os.listdir(ddir))
    pk = np.stack([np.loadtxt(os.path.join(ddir, f)) for f in files])
    assert pk.shape[0] == stamps.shape[0], 'timestamps/data length mismatch'
    F = pk.shape[0] - 1
    idx = {k: i for i, k in enumerate(_OXTS_FIELDS)}

    dt = (stamps[1:] - stamps[:-1])[:, None]
    gyro = pk[:F, [idx['wx'], idx['wy'], idx['wz']]]
    acc = pk[:F, [idx['ax'], idx['ay'], idx['az']]]
    rpy = pk[:F, [idx['roll'], idx['pitch'], idx['yaw']]]
    from .lietensor.convert import euler2SO3
    gt_rot = euler2SO3(jnp.asarray(rpy, dtype))
    vbody = pk[:F, [idx['vf'], idx['vl'], idx['vu']]]
    gt_vel = gt_rot @ jnp.asarray(vbody, dtype)

    # Mercator projection at the first frame's latitude (pykitti's
    # convention), shifted so frame 0 sits at the origin
    er = 6378137.0
    lat, lon = pk[:, idx['lat']], pk[:, idx['lon']]
    scale = np.cos(lat[0] * np.pi / 180.0)
    px = scale * lon * np.pi * er / 180.0
    py = scale * er * np.log(np.tan((90.0 + lat) * np.pi / 360.0))
    pz = pk[:, idx['alt']]
    pos = np.stack([px, py, pz], -1)
    pos = pos - pos[0]

    return {'dt': jnp.asarray(dt, dtype),
            'gyro': jnp.asarray(gyro, dtype),
            'acc': jnp.asarray(acc, dtype),
            'gt_rot': gt_rot,
            'gt_vel': jnp.asarray(gt_vel, dtype),
            'gt_pos': jnp.asarray(pos[:F], dtype)}


def save_kitti_oxts(root, stamps, packets):
    """Write a KITTI-raw-format oxts directory (timestamps.txt +
    data/NNNNNNNNNN.txt) — the test/round-trip counterpart of
    :func:`load_kitti_imu`, like save_g2o/save_bal for the other
    loaders.  ``packets`` is [F, 30] in oxts field order."""
    import os
    from datetime import datetime, timezone
    ddir = os.path.join(root, 'oxts', 'data')
    os.makedirs(ddir, exist_ok=True)
    packets = np.asarray(packets, np.float64)
    with open(os.path.join(root, 'oxts', 'timestamps.txt'), 'w') as f:
        for t in np.asarray(stamps, np.float64):
            sec = float(np.floor(t))
            ns = round((float(t) - sec) * 1e9)
            if ns >= 1_000_000_000:  # carry: fraction within 0.5 ns of
                sec += 1.0           # the next second must not widen the
                ns = 0               # 9-digit field (parser reads 0.1 s)
            whole = datetime.fromtimestamp(sec, tz=timezone.utc)
            f.write(whole.strftime('%Y-%m-%d %H:%M:%S')
                    + ('.%09d' % ns) + '\n')
    for i, row in enumerate(packets):
        np.savetxt(os.path.join(ddir, '%010d.txt' % i), row[None],
                   fmt='%.12g')


def kitti_imu_windows(data, duration=10, step=1):
    """Slice a loaded KITTI IMU stream into fixed-length training windows
    (dt/gyro/acc plus init/gt states), mirroring the reference dataset's
    __getitem__ (imu_dataset.py:59-73).  Returns a list of dicts."""
    F = data['dt'].shape[0]
    out = []
    for s in range(0, F - duration, step):
        e = s + duration
        out.append({
            'dt': data['dt'][s:e],
            'gyro': data['gyro'][s:e],
            'acc': data['acc'][s:e],
            'gt_pos': data['gt_pos'][s + 1:e + 1],
            'gt_rot': data['gt_rot'][s + 1:e + 1],
            'gt_vel': data['gt_vel'][s + 1:e + 1],
            'init_pos': data['gt_pos'][s][None],
            'init_rot': data['gt_rot'][s:e],
            'init_vel': data['gt_vel'][s][None],
        })
    return out
