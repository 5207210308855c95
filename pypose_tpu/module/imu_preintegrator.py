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
from ..lietensor.basics import vec2skew
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
                'Ha': vec2skew(sg(inte_state['a'])),
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

        Ref: imu_preintegrator.py:429-465.
        """
        B, F = cov_input['dt'].shape[:2]
        dtype = cov_input['dt'].dtype
        Cg = jnp.zeros((B, F, 3, 3), dtype=dtype) + \
            gyro_cov[..., None] * jnp.eye(3, dtype=dtype)
        Ca = jnp.zeros((B, F, 3, 3), dtype=dtype) + \
            acc_cov[..., None] * jnp.eye(3, dtype=dtype)
        dt = cov_input['dt']
        Rij = cov_input['Rij'].matrix()
        Rk = cov_input['Rk']
        Ha = cov_input['Ha']

        A = jnp.broadcast_to(jnp.eye(9, dtype=dtype),
                             (B, F + 1, 9, 9)).copy()
        A = A.at[:, :-1, 0:3, 0:3].set(jnp.swapaxes(Rk.matrix(), -1, -2))
        A = A.at[:, :-1, 3:6, 0:3].set(
            (-Rij @ Ha) * dt[..., None])
        A = A.at[:, :-1, 6:9, 0:3].set(
            (-0.5 * Rij @ Ha) * (dt ** 2)[..., None])
        A = A.at[:, :-1, 6:9, 3:6].set(
            jnp.eye(3, dtype=dtype) * dt[..., None])

        Bg = jnp.zeros((B, F, 9, 3), dtype=dtype)
        Ba = jnp.zeros((B, F, 9, 3), dtype=dtype)
        Bg = Bg.at[..., 0:3, 0:3].set(Rk.Jr() * dt[..., None])
        Ba = Ba.at[..., 3:6, 0:3].set(Rij * dt[..., None])
        Ba = Ba.at[..., 6:9, 0:3].set(0.5 * Rij * (dt ** 2)[..., None])

        B_cov = (Bg @ Cg @ jnp.swapaxes(Bg, -1, -2)
                 + Ba @ Ca @ jnp.swapaxes(Ba, -1, -2)) / dt[..., None]

        import jax

        def cov_span(P0, A_core, B_core):
            """Final P of the recursion P_j = A_j P_{j-1} A_j^T + B_j
            over one span, via the flipped-cumprod closed form
            (out_j = A_j @ ... @ A_end) as an O(log m) associative scan
            (imu_preintegrator.py:461-462)."""
            m = A_core.shape[1]
            eye = jnp.broadcast_to(jnp.eye(9, dtype=dtype),
                                   A_core.shape[:1] + (1, 9, 9))
            A_ext = jnp.concatenate([A_core, eye], axis=1)
            B_ext = jnp.concatenate([P0[:, None], B_core], axis=1)
            A_flip = jnp.flip(A_ext, axis=1)
            scan = jax.lax.associative_scan(lambda a, b: b @ a, A_flip,
                                            axis=1)
            A_left_cum = jnp.flip(scan, axis=1)
            A_right_cum = jnp.swapaxes(A_left_cum, -1, -2)
            return jnp.sum(A_left_cum @ B_ext @ A_right_cum, axis=1)

        A_core = A[:, :-1]                      # [B, F, 9, 9]
        M = self.COV_SCAN_CHUNK
        if F <= M:
            cov = cov_span(init_cov, A_core, B_cov)
        else:
            # the recursion is Markov in P, so long sequences run as a
            # rolled lax.scan over chunks (carry = P), each chunk an
            # O(log M) associative scan: the monolithic scan tree at
            # F=1e6 exceeds the remote compile service's limits
            pad = (-F) % M
            eye = jnp.broadcast_to(jnp.eye(9, dtype=dtype),
                                   (B, pad, 9, 9))
            A_p = jnp.concatenate([A_core, eye], axis=1)
            B_p = jnp.concatenate(
                [B_cov, jnp.zeros((B, pad, 9, 9), dtype=dtype)], axis=1)
            K = (F + pad) // M
            A_ch = jnp.moveaxis(A_p.reshape(B, K, M, 9, 9), 1, 0)
            B_ch = jnp.moveaxis(B_p.reshape(B, K, M, 9, 9), 1, 0)

            def body(P, chunk):
                Ak, Bk = chunk
                return cov_span(P, Ak, Bk), None

            cov, _ = jax.lax.scan(body, init_cov, (A_ch, B_ch))
        return {'cov': cov, 'Rij': cov_input['Rij'][..., -1:, :]}
