r"""Trajectory evaluation: Absolute/Relative Pose Error.

Ref: pypose/metric/ape_rpe.py.  Association and pair selection are
host-side (offline evaluation); error statistics are jnp.
"""

import warnings

import numpy as np
import jax.numpy as jnp

from ..lietensor.lietensor import LieTensor, SE3Type, Sim3Type
from ..lietensor.utils import SE3, Sim3, identity_Sim3
from ..lietensor.convert import mat2SO3
from ..function.geometry import svdstf


class StampedSE3:
    """Timestamped SE3 trajectory container.  Ref: ape_rpe.py:7-105."""

    def __init__(self, timestamps=None, poses_SE3=None, dtype=None):
        assert poses_SE3 is not None, 'The pose must be not None'
        assert poses_SE3.numel() != 0, 'The pose must be not empty'
        assert len(poses_SE3.lshape) == 1, \
            'Only one trajectory estimation is supported'
        self.poses = poses_SE3 if dtype is None else poses_SE3.astype(dtype)
        if timestamps is None:
            self.timestamps = np.arange(poses_SE3.lshape[0],
                                        dtype=np.float64)
        else:
            self.timestamps = np.asarray(timestamps, dtype=np.float64)
        assert self.timestamps.ndim == 1, \
            'The timestamp should be one array'
        assert self.timestamps.shape[0] == self.poses.lshape[0], \
            'timestamps and poses must have same length'
        assert np.all(np.sort(self.timestamps) == self.timestamps), \
            'timestamps must be ascending'

    def __getitem__(self, index):
        if isinstance(index, list):
            index = np.asarray(index, dtype=np.int64)
        return StampedSE3(self.timestamps[index], self.poses[index])

    def reduce_to_ids(self, ids):
        self.timestamps = self.timestamps[ids]
        self.poses = self.poses[ids]

    def align(self, trans):
        """Apply an SE3 or Sim3 alignment.  Ref: ape_rpe.py:44-56."""
        if isinstance(trans.ltype, SE3Type):
            self.poses = trans @ self.poses
        elif isinstance(trans.ltype, Sim3Type):
            ones = jnp.ones_like(self.poses.tensor()[..., 0:1])
            poses_sim = Sim3(jnp.concatenate(
                [self.poses.tensor(), ones], axis=-1))
            traned = trans @ poses_sim
            self.poses = SE3(traned.tensor()[..., 0:7])

    def translation(self):
        return self.poses.translation()

    def rotation(self):
        return self.poses.rotation()

    @property
    def num_poses(self):
        return self.poses.shape[0]

    @property
    def first_pose(self):
        return self.poses[0]

    @property
    def dtype(self):
        return self.poses.dtype

    @property
    def accumulated_distances(self):
        """Ref: ape_rpe.py:96-105."""
        trans = np.asarray(self.translation())
        norm = np.linalg.norm(trans[:-1] - trans[1:], axis=-1)
        return np.concatenate([np.zeros(1), np.cumsum(norm)])


def matching_time_indices(stamps_1, stamps_2, max_diff=0.01, offset_2=0.0):
    """Nearest-timestamp association.  Ref: ape_rpe.py:107-141."""
    stamps_2 = stamps_2 + offset_2
    diff_mat = np.abs(stamps_1[:, None] - stamps_2[None])
    indices_1 = np.arange(len(stamps_1))
    indices_2 = np.argmin(diff_mat, axis=-1)
    value = diff_mat[indices_1, indices_2]
    keep = value < max_diff
    return indices_1[keep].tolist(), indices_2[keep].tolist()


def associate_traj(rtraj, etraj, max_diff=0.01, offset_2=0.0, threshold=0.3):
    """Associate two trajectories by timestamps.  Ref: ape_rpe.py:142-203."""
    snd_longer = len(etraj.timestamps) > len(rtraj.timestamps)
    traj_long = etraj if snd_longer else rtraj
    traj_short = rtraj if snd_longer else etraj
    max_pairs = len(traj_short.timestamps)
    m_short, m_long = matching_time_indices(
        traj_short.timestamps, traj_long.timestamps, max_diff,
        offset_2 if snd_longer else -offset_2)
    assert len(m_short) == len(m_long), \
        'matching_time_indices returned unequal number of indices'
    num_matches = len(m_long)
    traj_short = traj_short[m_short]
    traj_long = traj_long[m_long]
    rtraj_aligned = traj_short if snd_longer else traj_long
    etraj_aligned = traj_long if snd_longer else traj_short
    assert num_matches != 0, \
        f'found no matching timestamps with max diff {max_diff} (s) ' \
        f'and offset {offset_2} (s)'
    if num_matches < threshold * max_pairs:
        warnings.warn('The estimated trajectory has not enough timestamps '
                      'within the GT timestamps; results may be inaccurate.',
                      category=Warning, stacklevel=2)
    return rtraj_aligned, etraj_aligned


def compute_error(rtraj, etraj, output='translation', mtype='ape',
                  otype='All'):
    """Error statistics.  Ref: ape_rpe.py:204-289."""
    E = None
    if mtype == 'ape':
        if output == 'translation':
            E = etraj.translation() - rtraj.translation()
        else:
            E = (etraj.poses.Inv() @ rtraj.poses).matrix()
    elif mtype == 'rpe':
        E = (rtraj.poses.Inv() @ etraj.poses).matrix()

    if output == 'translation':
        if mtype == 'ape':
            error = jnp.linalg.norm(E, axis=-1)
        else:
            error = jnp.linalg.norm(E[..., :3, 3], axis=-1)
    elif output == 'rotation':
        I = jnp.eye(3, dtype=E.dtype)
        error = jnp.linalg.norm(E[:, :3, :3] - I, axis=(-2, -1))
    elif output == 'pose':
        I = jnp.eye(4, dtype=E.dtype)
        error = jnp.linalg.norm(E - I, axis=(-2, -1))
    elif output == 'radian':
        error = jnp.linalg.norm(
            mat2SO3(E[:, :3, :3], check=False).Log().tensor(), axis=-1)
    elif output == 'degree':
        error = jnp.rad2deg(jnp.linalg.norm(
            mat2SO3(E[:, :3, :3], check=False).Log().tensor(), axis=-1))
    else:
        raise ValueError(f'Unknown output type: {output}')

    options = ['All', 'Max', 'Min', 'Mean', 'Median', 'RMSE', 'SSE', 'STD']
    if otype not in options:
        raise ValueError(f'Unknown output metric type, select one in '
                         f'{options}')
    results = {
        'Max': jnp.max(jnp.abs(error)),
        'Min': jnp.min(jnp.abs(error)),
        'Mean': jnp.mean(jnp.abs(error)),
        # NOTE: for even-length errors jnp.median averages the two middle
        # values; the reference's torch.median returns the lower one.
        'Median': jnp.median(jnp.abs(error)),
        'RMSE': jnp.sqrt(jnp.mean(error ** 2)),
        'SSE': jnp.sum(error ** 2),
        'STD': jnp.std(jnp.abs(error), ddof=1),
    }
    return results if otype == 'All' else results[otype]


def pairs_by_frames(traj, delta, all=False):
    """Ref: ape_rpe.py:290-319."""
    traj_len = traj.num_poses
    delta = int(delta)
    assert delta >= 1, 'delta must >= 1'
    if all:
        ids_1 = np.arange(traj_len)
        ids_2 = ids_1 + delta
        keep = ids_2 < traj_len
        return ids_1[keep].tolist(), ids_2[keep].tolist()
    ids = np.arange(0, traj_len, delta)
    return ids[:-1].tolist(), ids[1:].tolist()


def pairs_by_dist(traj, delta, tol=0.0, all=False):
    """Ref: ape_rpe.py:320-366."""
    if all:
        idx_0, idx_1 = [], []
        distances = traj.accumulated_distances
        for i in range(len(distances) - 1):
            offset = i + 1
            dist_from_here = distances[offset:] - distances[i]
            cand = int(np.argmin(np.abs(dist_from_here - delta)))
            if abs(dist_from_here[cand] - delta) > tol:
                continue
            idx_0.append(i)
            idx_1.append(cand + offset)
        return idx_0, idx_1
    idx = []
    trans = np.asarray(traj.translation())
    prev = trans[0]
    current_path = 0.0
    for i, cur in enumerate(trans):
        current_path += float(np.linalg.norm(cur - prev))
        prev = cur
        if current_path >= delta:
            idx.append(i)
            current_path = 0.0
    return idx[:-1], idx[1:]


def pair_id(traj, delta=1.0, associate='frame', rtol=0.1, all=False):
    """Ref: ape_rpe.py:368-406."""
    if associate == 'frame':
        id_pairs = pairs_by_frames(traj, int(delta), all)
    elif associate == 'distance':
        id_pairs = pairs_by_dist(traj, delta, delta * rtol, all)
    else:
        raise ValueError(f'unsupported delta unit: {associate}')
    if len(id_pairs[0]) == 0:
        raise ValueError(
            f'delta = {delta} ({associate}) produced an empty index list - '
            'try lower values or a less strict tolerance')
    return id_pairs


def ape(rstamp=None, rpose=None, estamp=None, epose=None,
        etype='translation', diff=0.01, offset=0.0, align=False, scale=False,
        nposes=-1, origin=False, thresh=0.3, otype='All'):
    r"""Absolute pose error between a reference and an estimated
    trajectory, after nearest-timestamp association and (optionally)
    SE3 (``align=True``) or Sim3 (``scale=True``) Umeyama alignment.

    Args:
        rstamp, rpose: reference timestamps (or None for frame indices)
            and SE3 poses.
        estamp, epose: estimated trajectory.
        etype: error type — 'translation' | 'rotation' | 'full' |
            'rad' | 'deg'.
        otype: 'All' for the stats dict (Max/Min/Mean/Median/RMSE/SSE/
            STD) or one stat name.

    Returns:
        dict of statistics (or a scalar when ``otype`` names one).

    Note: ``Median`` averages the two middle values on even counts
    (jnp.median), where torch.median takes the lower — pinned by
    tests/metric/test_reference_parity_metric.py.

    Ref: pypose/metric/ape_rpe.py:407-537.

    Example:
        >>> import jax, pypose_tpu as pp
        >>> pose = pp.randn_SE3(20, sigma=0.1, key=jax.random.PRNGKey(0))
        >>> stats = pp.metric.ape(rpose=pose, epose=pose)   # identical
        >>> round(float(stats['RMSE']), 6)
        0.0
    """
    rtraj, etraj = StampedSE3(rstamp, rpose), StampedSE3(estamp, epose)
    rtraj, etraj = associate_traj(rtraj, etraj, diff, offset, thresh)
    trans_mat = identity_Sim3(1, dtype=etraj.dtype)
    if align or scale:
        nposes = etraj.num_poses if nposes == -1 else nposes
        est_trans = np.asarray(etraj.translation())[:nposes]
        ref_trans = np.asarray(rtraj.translation())[:nposes]
        trans_mat = svdstf(jnp.asarray(est_trans), jnp.asarray(ref_trans),
                           scale)
    elif origin:
        first = (rtraj.first_pose @ etraj.first_pose.Inv()).tensor()
        trans_mat = Sim3(trans_mat.tensor().at[..., :7].set(first))
    etraj.align(trans_mat)
    return compute_error(rtraj, etraj, etype, mtype='ape', otype=otype)


def rpe(rstamp=None, rpose=None, estamp=None, epose=None,
        etype='translation', diff=0.01, offset=0.0, align=False, scale=False,
        nposes=-1, origin=False, associate='frame', delta=1.0, rtol=0.1,
        all=False, thresh=0.3, rpair=False, otype='All'):
    r"""Relative pose error: APE over relative motions
    :math:`(P_i^{-1} P_j)` with pairs selected by frame delta
    (``associate='frame'``) or traveled distance
    (``associate='distance'``); drift per unit motion rather than
    absolute drift.

    Ref: pypose/metric/ape_rpe.py:539-691.

    Example:
        >>> import jax, pypose_tpu as pp
        >>> pose = pp.randn_SE3(20, sigma=0.1, key=jax.random.PRNGKey(0))
        >>> stats = pp.metric.rpe(rpose=pose, epose=pose, delta=1.0)
        >>> round(float(stats['Max']), 6)
        0.0
    """
    rtraj, etraj = StampedSE3(rstamp, rpose), StampedSE3(estamp, epose)
    rtraj, etraj = associate_traj(rtraj, etraj, diff, offset, thresh)
    trans_mat = identity_Sim3(1, dtype=etraj.dtype)
    if align or scale:
        nposes = etraj.num_poses if nposes == -1 else nposes
        est_trans = np.asarray(etraj.translation())[:nposes]
        ref_trans = np.asarray(rtraj.translation())[:nposes]
        trans_mat = svdstf(jnp.asarray(est_trans), jnp.asarray(ref_trans),
                           scale)
    elif origin:
        first = (rtraj.first_pose @ etraj.first_pose.Inv()).tensor()
        trans_mat = Sim3(trans_mat.tensor().at[..., :7].set(first))
    etraj.align(trans_mat)
    sour_id, tar_id = pair_id(rtraj if rpair else etraj, delta, associate,
                              rtol, all)
    rpose_rela = rtraj[sour_id].poses.Inv() @ rtraj[tar_id].poses
    epose_rela = etraj[sour_id].poses.Inv() @ etraj[tar_id].poses
    rtraj_rela = StampedSE3(rtraj[sour_id].timestamps, rpose_rela)
    etraj_rela = StampedSE3(etraj[sour_id].timestamps, epose_rela)
    return compute_error(rtraj_rela, etraj_rela, etype, mtype='rpe',
                         otype=otype)
