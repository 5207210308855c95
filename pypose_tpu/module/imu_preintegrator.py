r"""IMU preintegration (Forster et al.) on associative scans.

Ref: pypose/module/imu_preintegrator.py.  Both the SO3 increment product
(imu_preintegrator.py:342) and the 9x9 covariance recursion (:461-464) are
associative, so they run as O(log F) ``lax.associative_scan``s on TPU
(via pypose_tpu.basics.cumprod).
"""

import jax.numpy as jnp

from ..nn import Module
from ..basics.ops import cumprod
from ..lietensor.lietensor import LieTensor
from ..lietensor.utils import identity_SO3, so3


class IMUPreintegrator(Module):
    r"""Propagates IMU measurements (gyro + accelerometer) between
    discrete frames, with optional 9x9 covariance propagation.

    Both the SO3 increment product and the covariance recursion run as
    O(log F) ``lax.associative_scan`` programs (the reference loops in
    Python, pypose/imu_preintegrator.py:429-464), and the whole pipeline
    compiles into one cached jitted program.  Integration state persists
    across calls for resumable streams unless ``reset=True``.

    Ref: pypose/module/imu_preintegrator.py:8-465 (forward :128,
    integrate :314, predict :387, propagate_cov :429).

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> from pypose_tpu.module import IMUPreintegrator
        >>> integ = IMUPreintegrator(reset=True)
        >>> F = 10
        >>> dt = jnp.full((1, F, 1), 0.01)
        >>> gyro = jnp.zeros((1, F, 3))            # stationary IMU
        >>> acc = jnp.broadcast_to(jnp.array([0., 0., 9.81007]), (1, F, 3))
        >>> out = integ(dt, gyro, acc)
        >>> bool(jnp.abs(out['pos'][0, -1]).max() < 1e-5)   # no motion
        True
        >>> out['cov'].shape
        (1, 9, 9)
    """

    def __init__(self, pos=jnp.zeros(3), rot=identity_SO3(),
                 vel=jnp.zeros(3), gravity=9.81007,
                 gyro_cov=(3.2e-3) ** 2, acc_cov=(8e-2) ** 2,
                 prop_cov=True, reset=False):
        super().__init__()
        if not reset and not prop_cov:
            raise RuntimeError(
                '"prop_cov" and "reset" cannot be False simultaneously.')
        self.prop_cov, self.reset = prop_cov, reset
        if isinstance(acc_cov, float):
            acc_cov = jnp.array([[acc_cov] * 3])
        if isinstance(gyro_cov, float):
            gyro_cov = jnp.array([[gyro_cov] * 3])
        self.register_buffer('gravity', jnp.array([0., 0., gravity]))
        self.register_buffer('pos', self._check(jnp.asarray(pos)))
        self.register_buffer('rot', self._check(rot))
        self.register_buffer('vel', self._check(jnp.asarray(vel)))
        self.register_buffer('cov', jnp.zeros((1, 9, 9)))
        self.register_buffer('gyro_cov', gyro_cov)
        self.register_buffer('acc_cov', acc_cov)
        self.Rij = None

    @staticmethod
    def _check(obj):
        if obj is not None:
            if obj.ndim == 2:
                obj = obj[None, ...]
            elif obj.ndim == 1:
                obj = obj[None, None, ...]
        return obj

    def forward(self, dt, gyro, acc, rot=None, gyro_cov=None, acc_cov=None,
                init_state=None):
        """Ref: imu_preintegrator.py:128-312."""
        assert 0 < len(acc.shape) == len(jnp.asarray(dt).shape) \
            == len(gyro.shape) <= 3
        acc, gyro = self._check(jnp.asarray(acc)), self._check(
            jnp.asarray(gyro))
        dt = self._check(jnp.asarray(dt))
        rot = self._check(rot) if rot is not None else None
        B = dt.shape[0]

        if init_state is None:
            init_state = {'pos': self.pos, 'rot': self.rot, 'vel': self.vel}
        if self.prop_cov:
            if gyro_cov is None:
                gyro_cov = jnp.tile(self.gyro_cov, (B, 1, 1))
            if acc_cov is None:
                acc_cov = jnp.tile(self.acc_cov, (B, 1, 1))
            if 'cov' not in init_state or init_state['cov'] is None:
                init_cov = jnp.broadcast_to(self.cov, (B, 9, 9))
            else:
                init_cov = init_state['cov']
        else:
            init_cov = None
        Rij_prev = init_state.get('Rij', self.Rij)

        # one cached compiled program per argument structure (None-ness of
        # rot/Rij changes the pytree structure, so jax.jit re-specializes
        # transparently); the reference dispatches the scans eagerly
        import jax
        if not hasattr(self, '_compiled'):
            self._compiled = jax.jit(self._core)
        base = {k: init_state[k] for k in ('pos', 'rot', 'vel')}
        predict, cov, Rij = self._compiled(
            dt, gyro, acc, rot, gyro_cov, acc_cov, base, init_cov,
            Rij_prev)

        if not self.reset:
            self.pos = predict['pos'][..., -1:, :]
            self.rot = predict['rot'][..., -1:, :]
            self.vel = predict['vel'][..., -1:, :]
            self.cov = cov['cov']
            if Rij is not None:
                self.Rij = Rij[..., -1:, :]
        return {**predict, **cov}

    def _core(self, dt, gyro, acc, rot, gyro_cov, acc_cov, init_state,
              init_cov, Rij_prev):
        """Pure preintegration pipeline (integrate -> predict -> cov)."""
        import jax
        inte_state = self.integrate(dt, gyro, acc, rot=rot,
                                    init_rot=init_state['rot'])
        predict = self.predict(init_state, inte_state)
        if self.prop_cov:
            if Rij_prev is not None:
                Rij = Rij_prev * inte_state['Dr']
            else:
                Rij = inte_state['Dr']
            sg = jax.lax.stop_gradient
            cov_input = {
                'Rij': LieTensor(sg(Rij.tensor()), ltype=Rij.ltype),
                'Rk': LieTensor(sg(inte_state['w'].tensor()),
                                ltype=inte_state['w'].ltype),
                'a': sg(inte_state['a']),
                'dt': sg(dt)}
            cov = self.propagate_cov(cov_input, init_cov, gyro_cov, acc_cov)
        else:
            Rij = None
            cov = {'cov': None}
        return predict, cov, Rij

    def integrate(self, dt, gyro, acc, rot=None, init_rot=None):
        """Delta terms via cumulative SO3 product + cumsums.

        Ref: imu_preintegrator.py:314-385.
        """
        B, F = dt.shape[:2]
        dtype = dt.dtype
        dr = so3(gyro * dt).Exp()
        w = LieTensor(jnp.concatenate(
            [identity_SO3(B, 1, dtype=dtype).tensor(), dr.tensor()],
            axis=1), ltype=dr.ltype)
        incre_r = cumprod(w, dim=1, left=False)
        if isinstance(rot, LieTensor):
            a = acc - rot.Inv() @ self.gravity
        else:
            if init_rot is None:
                init_rot = identity_SO3(B, 1, dtype=dtype)
            inte_rot = init_rot * incre_r
            a = acc - inte_rot[:, 1:, :].Inv() @ self.gravity
        dv = jnp.concatenate(
            [jnp.zeros((B, 1, 3), dtype=dtype), (incre_r[:, :F, :] @ a) * dt],
            axis=1)
        incre_v = jnp.cumsum(dv, axis=1)
        dp = jnp.concatenate(
            [jnp.zeros((B, 1, 3), dtype=dtype),
             incre_v[:, :F, :] * dt + (incre_r[:, :F, :] @ a) * 0.5 * dt ** 2],
            axis=1)
        incre_p = jnp.cumsum(dp, axis=1)
        incre_t = jnp.cumsum(dt, axis=1)
        incre_t = jnp.concatenate(
            [jnp.zeros((B, 1, 1), dtype=dtype), incre_t], axis=1)
        return {'a': a, 'Dp': incre_p[:, 1:, :], 'Dv': incre_v[:, 1:, :],
                'Dr': incre_r[:, 1:, :], 'Dt': incre_t[:, 1:, :],
                'w': w[:, 1:, :]}

    def predict(self, init_state, integrate):
        """Compose deltas with the initial state.  Ref: imu_preintegrator.py:387-427."""
        return {
            'rot': init_state['rot'] * integrate['Dr'],
            'vel': init_state['vel'] + init_state['rot'] * integrate['Dv'],
            'pos': init_state['pos'] + init_state['rot'] * integrate['Dp']
                   + init_state['vel'] * integrate['Dt'],
        }

    # chunk length for the covariance scan: frames beyond this run as a
    # rolled lax.scan over chunks (the monolithic associative-scan tree
    # on [B, F, 9, 9] at F=1e6 exceeds the remote compiler's limits)
    COV_SCAN_CHUNK = 131072

    def propagate_cov(self, cov_input, init_cov, gyro_cov, acc_cov):
        """9x9 A/B recursion evaluated as one flipped cumprod + sum.

        COLUMN form: every 9x9 matrix batch lives as [B, F, 81] (81 lane
        columns) and products are stacked column sums — the [B, F, 9, 9]
        matmul form tiles the (9, 9) minors to (16, 128) and moves ~22x
        the logical bytes through HBM on TPU at every scan level
        (the same trap as the sparse-LM block contractions,
        tools/formation_prof.py r3).

        Ref: imu_preintegrator.py:429-465.
        """
        import jax
        from ..lietensor.scalarized import _quat2R, _skew, _mm3, _mscale
        from ..lietensor.jacobian import cosc, sinc3

        B, F = cov_input['dt'].shape[:2]
        dtype = cov_input['dt'].dtype
        dtf = cov_input['dt'][..., 0]                          # [B, F]
        qij = tuple(cov_input['Rij'].tensor()[..., k] for k in range(4))
        qk = tuple(cov_input['Rk'].tensor()[..., k] for k in range(4))
        av = tuple(cov_input['a'][..., k] for k in range(3))
        zero = jnp.zeros_like(dtf)
        one = jnp.ones_like(dtf)

        Rij = _quat2R(qij)
        RH = _mscale(-1.0, _mm3(Rij, _skew(av)))               # -Rij Ha

        # Jr(Rk) = Jl(-Log(Rk)) = I - cosc K + sinc3 K^2, K = skew(phi)
        from ..lietensor.scalarized import _so3_log
        phi = _so3_log(qk)
        theta = jnp.sqrt(jnp.maximum(
            phi[0] ** 2 + phi[1] ** 2 + phi[2] ** 2, 1e-36))
        K = _skew(phi)
        K2 = _mm3(K, K)
        c1, c2 = cosc(theta), sinc3(theta)
        Jr = tuple(tuple(
            (one if i == j else zero) - c1 * K[i][j] + c2 * K2[i][j]
            for j in range(3)) for i in range(3))

        gc = tuple(gyro_cov[..., k] for k in range(3))   # [B,1] or [B,F]
        ac = tuple(acc_cov[..., k] for k in range(3))
        # B_cov blocks (already divided by dt):
        #   (0,0) = dt * Jr diag(gc) Jr^T
        #   (1,1) = dt * W, (1,2) = (2,1) = dt^2/2 * W, (2,2) = dt^3/4 * W
        #   with W = Rij diag(ac) Rij^T
        JCJ = tuple(tuple(sum(Jr[i][k] * gc[k] * Jr[j][k] for k in range(3))
                          for j in range(3)) for i in range(3))
        W = tuple(tuple(sum(Rij[i][k] * ac[k] * Rij[j][k] for k in range(3))
                        for j in range(3)) for i in range(3))

        import os
        _cf = os.environ.get('PPT_IMU_COVFORM', 'auto')
        if _cf in ('auto', 'closed'):
            # O(F) closed form (default): collapses the 81-column scan
            # (2.44 s of the 2.45 s forward at F=1e6 on v5e,
            # tools/imu_prof.py r5) to one quaternion suffix scan +
            # reverse cumsums; see _cov_closed.
            return self._cov_closed(cov_input, qk, RH, JCJ, W, dtf,
                                    init_cov, B, dtype)
        Rkm = _quat2R(qk)

        def bgrid(i, j):
            bi, bj = i // 3, j // 3
            i2, j2 = i % 3, j % 3
            if bi == 0 and bj == 0:
                return dtf * JCJ[i2][j2]
            if bi == 1 and bj == 1:
                return dtf * W[i2][j2]
            if (bi, bj) in ((1, 2), (2, 1)):
                return 0.5 * dtf ** 2 * W[i2][j2]
            if bi == 2 and bj == 2:
                return 0.25 * dtf ** 3 * W[i2][j2]
            return zero

        def agrid(i, j):
            bi, bj = i // 3, j // 3
            i2, j2 = i % 3, j % 3
            if bi == 0:
                return Rkm[j2][i2] if bj == 0 else zero   # Rk^T
            if bi == 1:
                if bj == 0:
                    return RH[i2][j2] * dtf
                if bj == 1:
                    return one if i2 == j2 else zero
                return zero
            if bj == 0:
                return 0.5 * RH[i2][j2] * dtf ** 2
            if bj == 1:
                return dtf if i2 == j2 else zero
            return one if i2 == j2 else zero

        A81 = jnp.stack([agrid(i, j) for i in range(9) for j in range(9)],
                        axis=-1)                              # [B, F, 81]
        B81 = jnp.stack([bgrid(i, j) for i in range(9) for j in range(9)],
                        axis=-1)
        eye81 = jnp.stack(
            [one[:, :1] if i == j else zero[:, :1]
             for i in range(9) for j in range(9)], axis=-1)   # [B, 1, 81]
        P0c = init_cov.astype(dtype).reshape(B, 81)

        def mm9(X, Y):
            """Row-major 9x9 column matmul X @ Y on [..., 81]."""
            return jnp.stack(
                [sum(X[..., i * 9 + k] * Y[..., k * 9 + j]
                     for k in range(9))
                 for i in range(9) for j in range(9)], axis=-1)

        # legacy scan forms, kept selectable for parity pinning
        # (tests/module/test_imu_covform.py): the 81-column combine
        # unrolls to ~730 HLO ops PER SCAN LEVEL — fast on TPU HBM (no
        # (16, 128)-padded [.., 9, 9] temps) but ~39 s of XLA:CPU
        # compile at F=20 vs 0.9 s for the compact matmul combine
        # (measured r4).
        col_form = _cf == 'col'

        def cov_span(P0, A_core, B_core):
            """Final P of the recursion P_j = A_j P_{j-1} A_j^T + B_j
            over one span, via the flipped-cumprod closed form
            (out_j = A_j @ ... @ A_end) as an O(log m) associative scan
            (imu_preintegrator.py:461-462)."""
            if not col_form:
                m = A_core.shape[1]
                A_ext = jnp.concatenate(
                    [A_core.reshape(B, m, 9, 9),
                     jnp.broadcast_to(jnp.eye(9, dtype=dtype),
                                      (B, 1, 9, 9))], axis=1)
                B_ext = jnp.concatenate(
                    [P0.reshape(B, 1, 9, 9), B_core.reshape(B, m, 9, 9)],
                    axis=1)
                A_flip = jnp.flip(A_ext, axis=1)
                scan = jax.lax.associative_scan(
                    lambda a, b: jnp.matmul(b, a), A_flip, axis=1)
                A_left = jnp.flip(scan, axis=1)
                tmp = jnp.matmul(A_left, B_ext)
                out = jnp.einsum('bfil,bfjl->bij', tmp, A_left)
                return out.reshape(B, 81)
            A_ext = jnp.concatenate(
                [A_core, jnp.broadcast_to(eye81, (B, 1, 81))], axis=1)
            B_ext = jnp.concatenate([P0[:, None], B_core], axis=1)
            A_flip = jnp.flip(A_ext, axis=1)
            scan = jax.lax.associative_scan(lambda a, b: mm9(b, a), A_flip,
                                            axis=1)
            A_left = jnp.flip(scan, axis=1)
            tmp = mm9(A_left, B_ext)
            # out[i][j] = sum_frames sum_l tmp[i,l] A_left[j,l]
            return jnp.stack(
                [jnp.sum(sum(tmp[..., i * 9 + l] * A_left[..., j * 9 + l]
                             for l in range(9)), axis=1)
                 for i in range(9) for j in range(9)], axis=-1)   # [B, 81]

        M = self.COV_SCAN_CHUNK
        if F <= M:
            covc = cov_span(P0c, A81, B81)
        else:
            # the recursion is Markov in P, so long sequences run as a
            # rolled lax.scan over chunks (carry = P), each chunk an
            # O(log M) associative scan: the monolithic scan tree at
            # F=1e6 exceeds the remote compile service's limits
            pad = (-F) % M
            A_p = jnp.concatenate(
                [A81, jnp.broadcast_to(eye81, (B, pad, 81))], axis=1)
            B_p = jnp.concatenate(
                [B81, jnp.zeros((B, pad, 81), dtype=dtype)], axis=1)
            K_ = (F + pad) // M
            A_ch = jnp.moveaxis(A_p.reshape(B, K_, M, 81), 1, 0)
            B_ch = jnp.moveaxis(B_p.reshape(B, K_, M, 81), 1, 0)

            def body(P, chunk):
                Ak, Bk = chunk
                return cov_span(P, Ak, Bk), None

            covc, _ = jax.lax.scan(body, P0c, (A_ch, B_ch))
        cov = covc.reshape(B, 9, 9)
        return {'cov': cov, 'Rij': cov_input['Rij'][..., -1:, :]}

    def _cov_closed(self, cov_input, qk, RH, JCJ, W, dtf, init_cov, B,
                    dtype):
        r"""O(F) closed form of the covariance span (the default).

        The span's cumulative transition products have closed block
        structure: with the (reference-convention, ascending) products
        :math:`S_j = A_j A_{j+1} \cdots A_F`,

        .. math::
            S_j = \begin{bmatrix} Q_j & 0 & 0 \\ X_j & I & 0 \\
                  Y_j & T_j I & I \end{bmatrix},

        where :math:`Q_j = Rk_j^T Q_{j+1}` is a quaternion suffix
        product, :math:`T_j = \sum_{k\ge j} dt_k`, and
        :math:`X_j = \sum_{k\ge j} dt_k\,RH_k\,Q_{k+1}`,
        :math:`Y_j = \sum_{k\ge j} (dt_k X_{k+1} + \tfrac12 dt_k^2
        RH_k Q_{k+1})` are reverse cumsums.  The final covariance
        :math:`P = S_1 P_0 S_1^T + \sum_j S_{j+1} B_j S_{j+1}^T`
        expands into six 3x3 block sums over frames — one 4-lane
        quaternion ``associative_scan`` + 19 ``[B, F]`` cumsums + ~9
        scalarized 3x3 matmuls per frame, instead of the legacy
        81-column matrix scan (whose ~730-FMA combine at every scan
        level was 2.44 s of the 2.45 s forward at F=1e6 on one v5e,
        tools/imu_prof.py r5).  No scan tree also means no
        COV_SCAN_CHUNK remote-compile limit and cheap XLA:CPU compiles.

        Ref: pypose/module/imu_preintegrator.py:429-465 (same
        flipped-cumprod product convention; parity pinned by
        tests/module/test_imu_covform.py).
        """
        import jax
        from ..lietensor.scalarized import _qconj, _qmul, _quat2R, _mm3

        # Q_{j}: suffix quaternion products conj(qk_j) ⊗ ... ⊗ conj(qk_F)
        qs = jax.lax.associative_scan(_qmul, _qconj(qk), axis=1,
                                      reverse=True)
        qn = jax.lax.rsqrt(jnp.maximum(
            qs[0] ** 2 + qs[1] ** 2 + qs[2] ** 2 + qs[3] ** 2, 1e-30))
        qs = tuple(c * qn for c in qs)

        def shift_left(c, fill):
            return jnp.concatenate(
                [c[..., 1:], jnp.full((B, 1), fill, dtype)], axis=-1)

        def revcum(c):
            return jax.lax.cumsum(c, axis=1, reverse=True)

        def mmT(Am, Bm):
            return tuple(tuple(sum(Am[i][k] * Bm[j][k] for k in range(3))
                               for j in range(3)) for i in range(3))

        # S_{j+1} blocks, per frame j (exclusive shifts are exact: they
        # reindex the inclusive scans instead of subtracting)
        qsx = tuple(shift_left(c, 1.0 if k == 3 else 0.0)
                    for k, c in enumerate(qs))
        Q3 = _quat2R(qsx)                                     # Q_{j+1}
        D = tuple(tuple(dtf * m for m in row)
                  for row in _mm3(RH, Q3))                    # dt RH Q
        Xin = tuple(tuple(revcum(m) for m in row) for row in D)
        Xex = tuple(tuple(shift_left(m, 0.0) for m in row) for row in Xin)
        E = tuple(tuple(dtf * Xex[i][j] + 0.5 * dtf * D[i][j]
                        for j in range(3)) for i in range(3))
        Yin = tuple(tuple(revcum(m) for m in row) for row in E)
        Yex = tuple(tuple(shift_left(m, 0.0) for m in row) for row in Yin)
        Tin = revcum(dtf)
        Tex = shift_left(Tin, 0.0)

        b2 = 0.5 * dtf ** 2
        b3 = 0.25 * dtf ** 3
        N1 = mmT(_mm3(Q3, JCJ), Q3)    # Q JCJ Q^T
        N2 = _mm3(Q3, JCJ)             # reused below as Q JCJ
        QJX = mmT(N2, Xex)
        QJY = mmT(N2, Yex)
        XJ = _mm3(Xex, JCJ)
        XJX = mmT(XJ, Xex)
        XJY = mmT(XJ, Yex)
        YJY = mmT(_mm3(Yex, JCJ), Yex)

        def fsum(c):
            return jnp.sum(c, axis=1)

        blk00 = [[fsum(dtf * N1[i][j]) for j in range(3)] for i in range(3)]
        blk01 = [[fsum(dtf * QJX[i][j]) for j in range(3)] for i in range(3)]
        blk02 = [[fsum(dtf * QJY[i][j]) for j in range(3)] for i in range(3)]
        blk11 = [[fsum(dtf * (XJX[i][j] + W[i][j])) for j in range(3)]
                 for i in range(3)]
        blk12 = [[fsum(dtf * XJY[i][j] + (dtf * Tex + b2) * W[i][j])
                  for j in range(3)] for i in range(3)]
        blk22 = [[fsum(dtf * YJY[i][j]
                       + (b3 + 2.0 * Tex * b2 + Tex ** 2 * dtf) * W[i][j])
                  for j in range(3)] for i in range(3)]

        grid = [[blk00, blk01, blk02],
                [None, blk11, blk12],
                [None, None, blk22]]

        def entry(r, c):
            br, bc, i, j = r // 3, c // 3, r % 3, c % 3
            if br <= bc:
                return grid[br][bc][i][j]
            return grid[bc][br][j][i]                  # symmetric blocks

        covB = jnp.stack([entry(r, c) for r in range(9) for c in range(9)],
                         axis=-1).reshape(B, 9, 9)

        # + S_1 P_0 S_1^T  (one tiny [B, 9, 9] congruence)
        Q13 = _quat2R(tuple(c[:, 0] for c in qs))      # [B] components
        X1 = tuple(tuple(Xin[i][j][:, 0] for j in range(3)) for i in range(3))
        Y1 = tuple(tuple(Yin[i][j][:, 0] for j in range(3)) for i in range(3))
        T1 = Tin[:, 0]
        zb = jnp.zeros((B,), dtype)
        ob = jnp.ones((B,), dtype)

        def s1entry(r, c):
            br, bc, i, j = r // 3, c // 3, r % 3, c % 3
            if bc == 0:
                return (Q13, X1, Y1)[br][i][j]
            if br == 1:
                return (ob if i == j else zb) if bc == 1 else zb
            if br == 2:
                if bc == 1:
                    return T1 if i == j else zb
                return ob if i == j else zb
            return zb
        S1 = jnp.stack([s1entry(r, c) for r in range(9) for c in range(9)],
                       axis=-1).reshape(B, 9, 9)
        covB = covB + jnp.einsum('bij,bjk,blk->bil', S1,
                                 init_cov.astype(dtype), S1)
        return {'cov': covB, 'Rij': cov_input['Rij'][..., -1:, :]}
