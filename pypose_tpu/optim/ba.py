r"""Bundle adjustment with Schur-complement LM, TPU-native.

Workload parity: examples/module/ba/bundle_adjustment.py (BAL problems via
``LM(model, solver=PCG, sparse=True)`` on the external CUDA backend,
optimizer.py:629-643).  TPU redesign exploits BA's two-block structure
(cameras x points):

* per-observation Jacobians (2x6 camera, 2x3 point) from ``vmap(jacrev)``
  in tangent space;
* the point-block Hessian ``Hpp`` is block-diagonal with 3x3 blocks ->
  eliminated in closed form (batched 3x3 inverses);
* the reduced camera system (Schur complement ``S = Hcc - Hcp Hpp^-1 Hpc``)
  is solved matvec-only with CG + block-Jacobi(``Hcc``) preconditioning —
  each matvec is a gather -> small-einsum -> segment-sum chain over
  observations, which XLA fuses into a few TPU kernels;
* point updates by back-substitution;
* the LM damping/reject loop runs in ``lax.while_loop`` exactly like
  the dense/sparse paths (optimizer.py:662-679 semantics).
"""

import numpy as np

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

from ..lietensor.lietensor import LieTensor
from ..lietensor.utils import SE3
from .strategy import TrustRegion
from ..ops.smallinv import inv3x3, inv6x6, chol3x3


def _gram_cols(A, B):
    """``einsum('oda,odb->oab')`` built as stacked [O] columns.

    The einsum form materializes an (8, 128)-padded [O, a, b] temp that
    moves ~21x the logical bytes on TPU when a, b are small (same trap
    as SparseLM's block contractions — tools/formation_prof.py, r3).
    Python loops run over a*b <= 36, not O."""
    O, d, a = A.shape
    b = B.shape[2]
    cols = [jnp.sum(A[:, :, i] * B[:, :, j], axis=1)
            for i in range(a) for j in range(b)]
    return jnp.stack(cols, axis=-1).reshape(O, a, b)


def _vec_cols(A, r):
    """``einsum('oda,od->oa')`` as stacked [O] columns (see _gram_cols)."""
    a = A.shape[2]
    cols = [jnp.sum(A[:, :, i] * r, axis=1) for i in range(a)]
    return jnp.stack(cols, axis=-1)


def _mv_cols(A, x):
    """``einsum('oda,oa->od')`` as stacked [O] columns (see _gram_cols)."""
    d = A.shape[1]
    cols = [jnp.sum(A[:, i, :] * x, axis=1) for i in range(d)]
    return jnp.stack(cols, axis=-1)


def reproj_residual_bal(pose, point, camera, pixel):
    """BAL convention reprojection residual for ONE observation.

    pose: SE3 (world->cam); point: (3,); camera: (f, k1, k2); pixel: (2,).
    BAL projects with P = -X/Z and radial distortion.
    """
    Xc = pose.Act(point)
    p = -Xc[:2] / Xc[2]
    r2 = jnp.sum(p * p)
    distortion = 1.0 + camera[1] * r2 + camera[2] * r2 * r2
    return camera[0] * distortion * p - pixel


def reproj_residual_pinhole(pose, point, intrinsics, pixel):
    """Simple pinhole reprojection residual (f, cx, cy)."""
    Xc = pose.Act(point)
    p = Xc[:2] / Xc[2]
    return intrinsics[0] * p + intrinsics[1:3] - pixel


class BundleAdjustment:
    r"""Schur-complement Levenberg-Marquardt for bundle adjustment.

    The point blocks are eliminated analytically (3x3 adjugate inverses,
    ops/smallinv.py).  The reduced camera system is solved EXACTLY when
    the camera count permits (``schur='auto'``): S = Hcc - Hcp Hpp^-1 Hpc
    is formed as one scatter-free Gram matmul on the MXU (bf16 single
    pass + iterative refinement against the exact operator) and
    Cholesky-factored — measured 85 ms/LM-step at trafalgar scale
    (257 cams / 65k pts / 226k obs) on one v5e chip, 3.6x the matvec-CG
    fallback that larger camera counts use.  Every LM step — residuals,
    per-observation 2x6/2x3 Jacobians, Schur reduction, solve,
    retraction, reject loop — is one jitted XLA program, matching the
    capability of the reference's external CUDA ``bae`` backend
    (pypose/optim/optimizer.py:428-432) on TPU.

    Args:
        poses: SE3 [C] camera poses (world -> camera).
        points: [P, 3] world points.
        cam_idx, pt_idx: int [O] observation index lists.
        pixels: [O, 2] observations.
        cameras: [O, k] or [C, k] per-observation/per-camera intrinsics
            passed to ``residual``.
        residual: ``residual(pose, point, camera, pixel) -> (2,)``
            (default: BAL convention).
        fix_first_pose: gauge-fix camera 0.

    Example:
        >>> import jax, pypose_tpu as pp
        >>> from pypose_tpu.datasets import synthetic_bal
        >>> from pypose_tpu.optim.ba import BundleAdjustment
        >>> ds = synthetic_bal(n_cams=4, n_points=60, obs_per_point=3,
        ...                    seed=0)
        >>> ba = BundleAdjustment(ds['poses'], ds['points'], ds['cam_idx'],
        ...                       ds['pt_idx'], ds['pixels'], ds['cameras'],
        ...                       fix_first_pose=True, cg_iter=20)
        >>> loss = ba.optimize(steps=5, patience=5, decreasing=1e-3)
        >>> bool(loss <= ba.history[0])   # exact solve: 1-step converge
        True
    """

    def __init__(self, poses, points, cam_idx, pt_idx, pixels, cameras,
                 residual=None, strategy=None, reject=16, min=1e-6,
                 max=1e32, cg_iter=50, cg_tol=1e-5, fix_first_pose=False,
                 kernel=None, schur='auto', schur_precision=None,
                 schur_refine=3):
        self.poses, self.points = poses, jnp.asarray(points)
        self.cam_idx = jnp.asarray(cam_idx, jnp.int32)
        self.pt_idx = jnp.asarray(pt_idx, jnp.int32)
        self.pixels = jnp.asarray(pixels)
        cameras = jnp.asarray(cameras)
        if cameras.shape[0] == poses.lshape[0]:
            cameras = cameras[self.cam_idx]
        # sort observations by camera (semantics are order-invariant:
        # every consumer reduces over obs).  The cam-side broadcast /
        # accumulate passes of the Schur-CG matvec then have segment
        # locality and run as windowed one-hot einsums on the MXU
        # instead of O-row gathers (tools/ba_matvec_exp.py, r5); sharded
        # subclasses permute their obs_valid mask via ``_obs_perm``.
        perm = np.argsort(np.asarray(self.cam_idx), kind='stable')
        self._obs_perm = perm
        if not np.array_equal(perm, np.arange(len(perm))):
            self.cam_idx = jnp.asarray(
                np.asarray(self.cam_idx)[perm], jnp.int32)
            self.pt_idx = jnp.asarray(
                np.asarray(self.pt_idx)[perm], jnp.int32)
            self.pixels = jnp.asarray(np.asarray(self.pixels)[perm])
            cameras = jnp.asarray(np.asarray(cameras)[perm])
        self.cameras = cameras
        self.residual = reproj_residual_bal if residual is None else residual
        self.strategy = TrustRegion() if strategy is None else strategy
        self.kernel = kernel
        self.min, self.max = min, max
        self.reject = reject
        self.cg_iter, self.cg_tol = cg_iter, cg_tol
        self.fix_first_pose = fix_first_pose
        self.schur = schur
        # the Gram matmul forming S runs in fast single-pass bf16 (2e-3
        # rel err on TPU); `schur_refine` iterative-refinement steps with
        # the EXACT matvec restore f32-quality solutions at ~6 ms each —
        # far cheaper than a HIGHEST-precision Gram (+110 ms measured)
        self.schur_precision = jax.lax.Precision.DEFAULT \
            if schur_precision is None else schur_precision
        self.schur_refine = schur_refine
        # optional bool [O] mask: invalid observations contribute zero chi2
        # (their residual/Jacobian must already vanish, e.g. zero-focal
        # padding in the sharded path)
        self.obs_valid = None
        self.C = poses.lshape[0]
        self.P = self.points.shape[0]
        self.strategy_state = None
        self.loss = None
        self.last = None
        self.reject_count = 0
        self._step_fn = None
        self._build_point_incidence()
        self._build_cam_windows()
        self._pick_schur_mode()

    # dense-Schur memory budget for the [P, 18, C] Gram operand (bytes)
    DENSE_SCHUR_BYTES = 5e9
    DENSE_SCHUR_MAX_C = 1024

    def _pick_schur_mode(self):
        """Dense reduced-camera-system path: form S = Hcc - Hcp Hpp^-1 Hpc
        explicitly as one Gram matmul and Cholesky-solve it exactly.
        Beats matvec-CG whenever C is small enough that S fits (trafalgar:
        41 ms formation + 7 ms solve vs 40 CG iters x 4.5 ms); 'auto'
        gates on C and the Gram-operand footprint and falls back to CG."""
        if self.schur == 'cg':
            self._use_dense_schur = False
            return
        ok = self._pt_inc is not None and self.C <= self.DENSE_SCHUR_MAX_C
        if ok:
            D = self._pt_inc[0].shape[1]
            # ohp [P,D,C] + T1 [P,3,6,C] f32, lane-padded C -> mult of 128
            cpad = -(-self.C // 128) * 128
            ok = self.P * (D + 18) * cpad * 4 < self.DENSE_SCHUR_BYTES
        if self.schur == 'dense' and not ok:
            raise ValueError('dense Schur requested but problem exceeds '
                             'the dense-S budget (C=%d, P=%d)' %
                             (self.C, self.P))
        self._use_dense_schur = ok

    MAX_POINT_DEGREE = 64
    MAX_CAM_DEGREE = 8192

    def _build_point_incidence(self):
        """Static per-point incidence table (gather-based accumulation —
        TPU scatters with duplicate indices serialize; point degree is
        small, camera degree is not, so only the point side uses this)."""
        pi = np.asarray(self.pt_idx)
        deg = np.bincount(pi, minlength=self.P)
        D = int(deg.max()) if len(pi) else 0
        if D > self.MAX_POINT_DEGREE:
            self._pt_inc = None
            return
        inc = np.zeros((self.P, max(D, 1)), np.int32)
        mask = np.zeros((self.P, max(D, 1)), bool)
        fill = np.zeros(self.P, np.int64)
        for o, p in enumerate(pi):
            inc[p, fill[p]] = o
            mask[p, fill[p]] = True
            fill[p] += 1
        self._pt_inc = (jnp.asarray(inc), jnp.asarray(mask))
        # camera-side incidence (degrees are large but bounded; the gather
        # formulation still beats duplicate-index scatters on TPU)
        ci = np.asarray(self.cam_idx)
        deg = np.bincount(ci, minlength=self.C)
        D = int(deg.max()) if len(ci) else 0
        if D > self.MAX_CAM_DEGREE:
            self._cam_inc = None
            return
        inc = np.zeros((self.C, max(D, 1)), np.int32)
        mask = np.zeros((self.C, max(D, 1)), bool)
        fill = np.zeros(self.C, np.int64)
        for o, c in enumerate(ci):
            inc[c, fill[c]] = o
            mask[c, fill[c]] = True
            fill[c] += 1
        self._cam_inc = (jnp.asarray(inc), jnp.asarray(mask))

    # windowed one-hot cam ops: minimum obs count to bother, window cap
    CAM_WINDOW_MIN_O = 8192
    CAM_WINDOW_MAX_W = 256
    CAM_WINDOW_TILE = 1024

    def _build_cam_windows(self):
        """Static tile/window metadata for the cam-SORTED observation
        order (established in ``__init__``): a tile of ``To`` consecutive
        observations touches a narrow window of <= W cameras, so the
        cam-side broadcast/accumulate run as tiny one-hot einsums on the
        MXU instead of O-row gathers — the [ba-large] Schur matvec is
        gather-ROW-bound at 3.4-5 ns/row (tools/ba_large_prof.py), and
        the windowed form measured 6.25 -> 3.47 ms/matvec at C=2048/
        O=294912 (tools/ba_matvec_exp.py, r5)."""
        self._cam_win = None
        ci = np.asarray(self.cam_idx)
        O, To = len(ci), self.CAM_WINDOW_TILE
        if O < self.CAM_WINDOW_MIN_O:
            return
        n_tiles = -(-O // To)
        Opad = n_tiles * To
        ci_pad = np.concatenate([ci, np.full(Opad - O, ci[-1], ci.dtype)])
        tiles = ci_pad.reshape(n_tiles, To)
        c0 = tiles[:, 0].astype(np.int32)
        W = int((tiles[:, -1] - c0).max()) + 1
        if W > self.CAM_WINDOW_MAX_W:
            return
        li = (tiles - c0[:, None]).astype(np.int32)
        widx = c0[:, None] + np.arange(W, dtype=np.int32)[None, :]
        wvalid = widx < self.C
        widx = np.where(wvalid, widx, self.C)          # C = drop slot
        # arrays only: this dict rides through jit as an ARGUMENT, so
        # python ints would trace to arrays; the static sizes (n_tiles,
        # To, W) are recovered from the array shapes
        self._cam_win = dict(
            li=jnp.asarray(li), widx=jnp.asarray(widx),
            wvalid=jnp.asarray(wvalid))

    def _cam_onehot(self, win):
        """[n_tiles, To, W] 0/1 tile one-hots (exact in bf16; XLA fuses
        the compare into the consuming dots)."""
        W = win['widx'].shape[1]
        return (win['li'][..., None] ==
                jnp.arange(W, dtype=win['li'].dtype)
                ).astype(jnp.bfloat16)

    def _bcast_cams(self, obs, x):
        """Per-camera rows to per-observation rows: ``x[cam_idx]``,
        windowed when metadata is present (per-COLUMN einsums — a
        batched [t, To, k] output lane-pads k to 128)."""
        win = obs.get('cam_win')
        if win is None:
            return x[obs['cam_idx']]
        n_tiles, To = win['li'].shape
        oh = self._cam_onehot(win)
        xw = x[jnp.where(win['wvalid'], win['widx'], 0)]  # [t, W, k] tiny
        xw = jnp.where(win['wvalid'][..., None], xw, 0.0)
        cols = [jnp.einsum('tol,tl->to', oh, xw[:, :, k],
                           precision=_HI).reshape(n_tiles * To)
                for k in range(x.shape[1])]
        return jnp.stack(cols, axis=-1)[:obs['cam_idx'].shape[0]]

    def _obs_data(self):
        """Per-observation DYNAMIC arrays, threaded through the jitted
        programs as ARGUMENTS.  Closed-over arrays become compile-time
        constants: GSPMD drops their committed shardings (ShardedBA would
        silently compile to fully replicated compute) and 226k-obs
        constants ship inside the remote-compile payload (HTTP 413)."""
        return dict(cam_idx=self.cam_idx, pt_idx=self.pt_idx,
                    pixels=self.pixels, cameras=self.cameras,
                    obs_valid=self.obs_valid,
                    pt_inc=self._pt_inc, cam_inc=self._cam_inc,
                    cam_win=self._cam_win)

    def _acc_cams(self, obs, contrib):
        """[O, ...] -> [C, ...] camera-side accumulation.

        Multi-dim tails are flattened around the gather/scatter: XLA
        tiles the two minor dims to (8, 128), so a [C, D, 6, 6]
        incidence gather moves ~21x the logical bytes (same trap as
        SparseLM._accumulate — tools/formation_prof.py, r3)."""
        tail = contrib.shape[1:]
        if len(tail) > 1:
            flat = self._acc_cams(obs, contrib.reshape(contrib.shape[0], -1))
            return flat.reshape((self.C,) + tail)
        win = obs.get('cam_win')
        if win is not None:
            # windowed one-hot transpose: per-tile [W, k] partials on the
            # MXU + a tiny static scatter (n_tiles*W rows, dup factor ~2)
            oh = self._cam_onehot(win)
            n_tiles, To = win['li'].shape
            k = contrib.shape[1] if tail else 1
            ct = contrib.reshape(contrib.shape[0], k)
            pad = jnp.zeros((n_tiles * To - ct.shape[0], k), ct.dtype)
            ct = jnp.concatenate([ct, pad], 0).reshape(n_tiles, To, k)
            part = jnp.einsum('tol,tok->tlk', oh, ct, precision=_HI)
            out = jnp.zeros((self.C + 1, k), contrib.dtype)
            out = out.at[win['widx'].reshape(-1)].add(
                part.reshape(-1, k), mode='drop')[:self.C]
            return out.reshape((self.C,) + tail)
        if obs['cam_inc'] is None:
            out = jnp.zeros((self.C,) + tail, dtype=contrib.dtype)
            return out.at[obs['cam_idx']].add(contrib)
        inc, mask = obs['cam_inc']
        gathered = contrib[inc]
        m = mask.reshape(mask.shape + (1,) * (contrib.ndim - 1))
        return jnp.sum(jnp.where(m, gathered, 0), axis=1)

    def _acc_points(self, obs, contrib):
        """Sum per-observation contributions into per-point rows:
        [O, ...] -> [P, ...] (multi-dim tails flattened — see
        _acc_cams)."""
        tail = contrib.shape[1:]
        if len(tail) > 1:
            flat = self._acc_points(obs,
                                    contrib.reshape(contrib.shape[0], -1))
            return flat.reshape((self.P,) + tail)
        if obs['pt_inc'] is None:
            out = jnp.zeros((self.P,) + tail, dtype=contrib.dtype)
            return out.at[obs['pt_idx']].add(contrib)
        inc, mask = obs['pt_inc']
        gathered = contrib[inc]
        m = mask.reshape(mask.shape + (1,) * (contrib.ndim - 1))
        return jnp.sum(jnp.where(m, gathered, 0), axis=1)

    # ------------------------------------------------------------------
    def _r_jac(self, obs, poses_data, points):
        """Residuals + per-observation tangent Jacobians Jc [O,2,6],
        Jp [O,2,3].

        BAL residuals use the SCALARIZED closed form ([O]-vector
        component algebra, lietensor/scalarized.py) — the AoS closed-form
        chain rule measured SLOWER than jacrev (14.8 vs 10.5 ms at 226k
        obs), but the scalarized form avoids both AD overhead and the
        (8,128)-padded [O,3,3] temps both carry.  Custom residuals keep
        the vmapped-jacrev fallback."""
        Tc = self._bcast_cams(obs, poses_data)
        Xp = points[obs['pt_idx']]

        if self.residual is reproj_residual_bal:
            from ..lietensor.scalarized import bal_reproj_blocks
            return bal_reproj_blocks(Tc, Xp, obs['cameras'], obs['pixels'])

        def one(tc, xp, cam, pix):
            def f(eps_c, eps_p):
                pose = SE3(tc).add(eps_c)
                return self.residual(pose, xp + eps_p, cam, pix)
            z6 = jnp.zeros(6, dtype=tc.dtype)
            z3 = jnp.zeros(3, dtype=tc.dtype)
            r = f(z6, z3)
            Jc, Jp = jax.jacrev(f, argnums=(0, 1))(z6, z3)
            return r, Jc, Jp

        return jax.vmap(one)(Tc, Xp, obs['cameras'], obs['pixels'])

    def _robust_scale(self, r):
        if self.kernel is None:
            return jnp.ones((r.shape[0], 1), dtype=r.dtype)
        chi = jnp.sum(r * r, -1, keepdims=True)
        g1 = jax.grad(lambda v: jnp.sum(self.kernel(v)))(chi)
        return jnp.sqrt(jnp.maximum(g1, 0.0))

    def _chi2(self, poses_data, points, obs=None):
        obs = self._obs_data() if obs is None else obs
        Tc = SE3(self._bcast_cams(obs, poses_data))
        Xp = points[obs['pt_idx']]
        r = jax.vmap(self.residual)(Tc, Xp, obs['cameras'], obs['pixels'])
        chi = jnp.sum(r * r, -1)
        if self.kernel is not None:
            chi = self.kernel(chi)
        if obs['obs_valid'] is not None:
            chi = jnp.where(obs['obs_valid'], chi, 0.0)
        return jnp.sum(chi)

    def _mask_cam(self, x):
        if self.fix_first_pose:
            return x.at[0].set(0.0)
        return x

    # ------------------------------------------------------------------
    def _core(self, poses_data, points, strat_state, obs):
        r, Jc, Jp = self._r_jac(obs, poses_data, points)
        # current chi2 from the residuals already in hand (saves a full
        # re-projection pass; _chi2 is only needed for candidate params)
        chi_raw = jnp.sum(r * r, -1)
        if self.kernel is not None:
            chi_raw = self.kernel(chi_raw)
        if obs['obs_valid'] is not None:
            chi_raw = jnp.where(obs['obs_valid'], chi_raw, 0.0)
        last = jnp.sum(chi_raw)
        s = self._robust_scale(r)
        r = s * r
        Jc = s[..., None] * Jc
        Jp = s[..., None] * Jp

        ci, pi = obs['cam_idx'], obs['pt_idx']
        C, P = self.C, self.P

        # gradient blocks (column-stacked contractions; the einsum forms
        # materialize (8,128)-padded [O, a, b] temps — see _gram_cols)
        bc = -self._acc_cams(obs, _vec_cols(Jc, r))
        bp = -self._acc_points(obs, _vec_cols(Jp, r))
        bc = self._mask_cam(bc)

        # block-diagonal Hessians
        Hcc = self._acc_cams(obs, _gram_cols(Jc, Jc))
        Hpp = self._acc_points(obs, _gram_cols(Jp, Jp))

        if self._use_dense_schur:
            # damping-invariant pieces of the dense reduced camera system,
            # hoisted out of the reject loop: per-observation camera-point
            # coupling blocks gathered per point (FLAT [O, 18] layout
            # through the incidence gather), and the camera one-hot
            G18 = _gram_cols(Jc, Jp).reshape(-1, 18)               # [O,18]
            inc, incm = obs['pt_inc']
            Gp18 = G18[inc] * incm[..., None]          # [P,D,18] (a*3+k)
            # 0/1 incidence mask: exact in bf16, and [P, D, C] is ~1 GB
            # of f32 at trafalgar scale — store it at the Gram precision
            _oh_dt = Jc.dtype if self.schur_precision == \
                jax.lax.Precision.HIGHEST else jnp.bfloat16
            ohp = jax.nn.one_hot(ci[inc], C, dtype=_oh_dt) \
                * incm[..., None].astype(_oh_dt)                   # [P,D,C]

        def damped(H, damping):
            d = jnp.clip(jnp.diagonal(H, axis1=-2, axis2=-1),
                         self.min, self.max) * (1.0 + damping)
            eye = jnp.eye(H.shape[-1], dtype=H.dtype)
            return H + (d - jnp.diagonal(H, axis1=-2, axis2=-1))[..., None] \
                * eye

        def solve(damping):
            Hcc_d = damped(Hcc, damping)
            Hpp_d = damped(Hpp, damping)
            Hpp_inv = inv3x3(Hpp_d)

            # Schur rhs: bs = bc - Hcp Hpp^-1 bp
            y = _mv_cols(Hpp_inv, bp)                                       # [P, 3]
            JpY = _mv_cols(Jp, y[pi])                                       # [O, 2]
            bs = bc - self._mask_cam(self._acc_cams(obs, _vec_cols(Jc, JpY)))

            def Svp(x):
                x = self._mask_cam(x)
                # Hcc x (diag blocks + damping already inside Hcc_d)
                hx = jnp.einsum('cab,cb->ca', Hcc_d, x, precision=_HI)
                # Hpc x accumulated at points
                Jcx = _mv_cols(Jc, self._bcast_cams(obs, x))                # [O, 2]
                w = self._acc_points(obs, jnp.einsum(
                    'oda,od->oa', Jp, Jcx, precision=_HI))   # Hpc x
                w = _mv_cols(Hpp_inv, w)                                    # Hpp^-1 Hpc x
                JpW = _mv_cols(Jp, w[pi])
                hx = hx - self._acc_cams(obs, _vec_cols(Jc, JpW))
                return self._mask_cam(hx)

            if self._use_dense_schur:
                # S = Hcc_d - (L^T Hpc)^T (L^T Hpc) with Hpp_inv = L L^T,
                # formed as one Gram matmul on the MXU; exact Cholesky
                # solve replaces the CG loop entirely.  Layout note: every
                # intermediate keeps C as the minor dim — trailing dims of
                # 3/6 get lane-padded 128x on TPU (measured 34 GB blowup
                # for the scatter form of Z).
                L = chol3x3(Hpp_inv)                               # [P,3,3]
                # Yl[p,d,j,a] = sum_k L[p,k,j] Gp[p,d,a,k], built as
                # FLAT [P, D, 18] columns (m = j*6+a) — the einsum form
                # materializes (8,128)-padded [P,D,3,6] temps
                Yl18 = jnp.stack(
                    [sum(L[:, k, j][:, None] * Gp18[:, :, a * 3 + k]
                         for k in range(3))
                     for j in range(3) for a in range(6)], axis=-1)
                # T1 [P, 18, C] is THE HBM sink of the step (1.2 GB f32
                # at trafalgar scale; form-S measured 19.5 of the 43 ms
                # step, tools/ba_prof.py r4).  When the Gram runs bf16
                # (schur_precision DEFAULT) the factor is a refined
                # preconditioner anyway, so T1 is built AND stored bf16
                # (f32 accumulation over d) — half the write+read bytes;
                # ohp is a 0/1 mask times incm, exact in bf16.
                lo = self.schur_precision != jax.lax.Precision.HIGHEST
                cdt = jnp.bfloat16 if lo else Yl18.dtype
                T1 = jnp.einsum(
                    'pdc,pdm->pmc', ohp.astype(cdt), Yl18.astype(cdt),
                    precision=None if lo else _HI,
                    preferred_element_type=jnp.float32).astype(
                        cdt).reshape(self.P, 3, 6, C)              # [P,3,6,C]
                M6 = jax.lax.dot_general(
                    T1, T1, (((0, 1), (0, 1)), ((), ())),
                    precision=self.schur_precision,
                    preferred_element_type=jnp.float32)            # [6,C,6,C]
                Mfull = jnp.transpose(M6, (1, 0, 3, 2)).reshape(C * 6, C * 6)
                Sd = jnp.zeros((C, 6, C, 6), Hcc_d.dtype).at[
                    jnp.arange(C), :, jnp.arange(C), :].set(Hcc_d)
                S = Sd.reshape(C * 6, C * 6) - Mfull
                if self.fix_first_pose:
                    # gauge: remove camera 0's unknowns (identity rows)
                    S = S.at[:6, :].set(0.0).at[:, :6].set(0.0)
                    S = S.at[jnp.arange(6), jnp.arange(6)].set(1.0)
                import jax.scipy.linalg as jsl
                if self.schur_refine > 0 and \
                        self.schur_precision != jax.lax.Precision.HIGHEST:
                    # the bf16-formed S can lose positive-definiteness at
                    # small damping (bf16 rounding ~4e-3 rel perturbs the
                    # smallest eigenvalues): Cholesky -> NaN -> the step
                    # is skipped and LM stalls until damping grows
                    # (measured: synthetic trafalgar froze 5 steps at
                    # chi2 2.57e8, tools/ba_stall_debug.py r3).  With
                    # refinement the factor is only a PRECONDITIONER for
                    # the exact-operator iteration, so boost its diagonal
                    # for guaranteed PD; refinement restores accuracy.
                    dS = jnp.diagonal(S)
                    boost = 1e-2 * dS + 4e-3 * jnp.mean(dS)
                    S = S + jnp.diag(boost)
                cf = jsl.cho_factor(S)
                dc = jsl.cho_solve(cf, bs.reshape(-1)).reshape(C, 6)
                # iterative refinement against the EXACT operator recovers
                # f32 accuracy from the bf16-formed S at ~6 ms/pass
                for _ in range(self.schur_refine):
                    resid = bs - Svp(dc)
                    dc = dc + jsl.cho_solve(
                        cf, resid.reshape(-1)).reshape(C, 6)
                dc = self._mask_cam(dc)
                Jcdc = _mv_cols(Jc, self._bcast_cams(obs, dc))
                Hpcdc = self._acc_points(obs, jnp.einsum(
                    'oda,od->oa', Jp, Jcdc, precision=_HI))
                dp = _mv_cols(Hpp_inv, bp - Hpcdc)
                return dc, dp

            Minv = inv6x6(Hcc_d)

            def M(x):
                return self._mask_cam(
                    jnp.einsum('cab,cb->ca', Minv, self._mask_cam(x),
                               precision=_HI))

            dc, _ = jax.scipy.sparse.linalg.cg(
                Svp, bs, tol=self.cg_tol, maxiter=self.cg_iter, M=M)
            dc = self._mask_cam(dc)
            # back-substitute points: dp = Hpp^-1 (bp - Hpc dc)
            Jcdc = _mv_cols(Jc, self._bcast_cams(obs, dc))
            Hpcdc = self._acc_points(obs, jnp.einsum(
                'oda,od->oa', Jp, Jcdc, precision=_HI))
            dp = _mv_cols(Hpp_inv, bp - Hpcdc)
            return dc, dp

        def pred_reduction(dc, dp):
            Jd = _mv_cols(Jc, self._bcast_cams(obs, dc)) + _mv_cols(Jp, dp[pi])
            return -jnp.sum(Jd * (2.0 * r + Jd))

        def cond(state):
            return ~state[-1]

        def body(state):
            T0, X0, loss, strat, count, _ = state
            dc, dp = solve(strat['damping'])
            flat = jnp.concatenate([dc.reshape(-1), dp.reshape(-1)])
            bad = ~jnp.all(jnp.isfinite(flat))
            dc = jnp.where(bad, 0.0, dc)
            dp = jnp.where(bad, 0.0, dp)
            T_new = SE3(T0).add(dc).tensor()
            X_new = X0 + dp
            loss_new = self._chi2(T_new, X_new, obs)
            # a non-finite candidate loss is as bad as a non-finite delta:
            # `worse = last < NaN` is False, which would force-accept it
            bad = bad | ~jnp.isfinite(loss_new)
            pred = pred_reduction(dc, dp)
            q = (last - loss_new) / jnp.where(pred == 0, 1e-31, pred)
            # non-positive predicted reduction = the local model says the
            # step does not descend (unconverged CG garbage): hard reject,
            # or the double-negative ratio scores it as HIGH quality, the
            # radius grows each rejection, and the post-reject
            # force-accept diverges (measured: C=2048 [ba-large], chi2
            # 3.7e8 -> 9.8e16, r5).  See strategy._quality (same guard);
            # the reference divides blindly (strategy.py:260-261).
            q = jnp.where(pred > 0, q, -1.0)
            strat_new = self._strategy_update(strat, q)
            worse = last < loss_new
            rejectable = worse & (count < self.reject) & ~bad
            done = ~rejectable
            take = done & ~bad
            T_out = jnp.where(take, T_new, T0)
            X_out = jnp.where(take, X_new, X0)
            loss_out = jnp.where(take, loss_new, last)
            return (T_out, X_out, loss_out, strat_new,
                    count + rejectable.astype(count.dtype), done)

        state0 = (poses_data, points, last, strat_state,
                  jnp.asarray(0, jnp.int32), jnp.asarray(False))
        T_f, X_f, loss_f, strat_f, count_f, _ = jax.lax.while_loop(
            cond, body, state0)
        return T_f, X_f, loss_f, last, strat_f, count_f

    def _strategy_update(self, strat, quality):
        s = self.strategy
        if hasattr(s, 'down0'):  # TrustRegion
            radius = 1.0 / strat['damping']
            down = strat['down']
            radius_new = jnp.where(
                quality > s.high, s.up * radius,
                jnp.where(quality > s.low, radius, radius * down))
            down_new = jnp.where(quality > s.low,
                                 jnp.asarray(s.down0, down.dtype),
                                 down * s.factor)
            return {'damping': 1.0 / jnp.clip(radius_new, s.min, s.max),
                    'down': jnp.clip(down_new, s.min, s.max)}
        if hasattr(s, 'up'):  # Adaptive
            d = strat['damping']
            d = jnp.where(quality > s.high, d * s.down,
                          jnp.where(quality > s.low, d, d * s.up))
            return {'damping': jnp.clip(d, s.min, s.max)}
        return strat

    def step(self):
        if self.strategy_state is None:
            self.strategy_state = self.strategy.init(self.points.dtype)
        if self._step_fn is None:
            self._step_fn = jax.jit(self._core)
        T, X, loss, last, strat, count = self._step_fn(
            self.poses.tensor(), self.points, self.strategy_state,
            self._obs_data())
        self.poses = SE3(T)
        self.points = X
        self.strategy_state = strat
        # one host round-trip for all scalars (a blocking transfer costs
        # ~20 ms through a remote-TPU tunnel; three of them dominated the
        # step time)
        loss, last, count = jax.device_get((loss, last, count))
        self.reject_count = int(count)
        self.last = float(last)
        self.loss = float(loss)
        return self.loss

    def optimize(self, steps=10, patience=5, decreasing=1e-3):
        """Run up to ``steps`` LM iterations fully on device — the outer
        StopOnPlateau loop (scheduler.py:64-160 semantics) wraps ``_core``
        in a ``lax.while_loop``, so the whole optimization costs ONE host
        sync instead of one per step (device compute is ~14 ms/step for
        64 cams/8k pts; a synced step pays ~40 ms of tunnel latency).
        Returns the final chi2; per-step losses land in ``self.history``."""
        if self.strategy_state is None:
            self.strategy_state = self.strategy.init(self.points.dtype)

        def run(T, X, strat, obs):
            hist0 = jnp.full((steps,), jnp.nan, dtype=jnp.float32)

            def cond(st):
                return (~st[-1]) & (st[4] < steps)

            def body(st):
                T0, X0, strat_s, hist, i, pat, _ = st
                T1, X1, loss, last, strat2, count = self._core(
                    T0, X0, strat_s, obs)
                hist = hist.at[i].set(loss.astype(jnp.float32))
                pat2 = jnp.where(last - loss < decreasing, pat + 1,
                                 jnp.zeros_like(pat))
                # the reference's StopOnPlateau quits on ANY rejection
                # (scheduler.py:153-159) — correct when rejection means
                # plateau (exact dense solves), wrong when it is
                # recoverable damping escalation: the large-C matvec-CG
                # path legitimately rejects a few times while the trust
                # region tightens, then takes a good step (measured
                # [ba-large], r5).  Quit on rejection only when the step
                # ALSO failed to make the required progress.
                stop = (pat2 >= patience) | \
                    ((count > 0) & (last - loss < decreasing))
                return (T1, X1, strat2, hist, i + 1, pat2, stop)

            init = (T, X, strat, hist0, jnp.asarray(0, jnp.int32),
                    jnp.asarray(0, jnp.int32), jnp.asarray(False))
            T_f, X_f, strat_f, hist, nsteps, _, _ = jax.lax.while_loop(
                cond, body, init)
            return T_f, X_f, strat_f, hist, nsteps

        key = ('optimize', steps, patience, decreasing)
        if not hasattr(self, '_opt_cache'):
            self._opt_cache = {}
        if key not in self._opt_cache:
            self._opt_cache[key] = jax.jit(run)
        T, X, strat, hist, nsteps = self._opt_cache[key](
            self.poses.tensor(), self.points, self.strategy_state,
            self._obs_data())
        self.poses = SE3(T)
        self.points = X
        self.strategy_state = strat
        hist, nsteps = jax.device_get((hist, nsteps))
        self.history = [float(h) for h in hist[:int(nsteps)]]
        self.loss = self.history[-1] if self.history else None
        return self.loss
