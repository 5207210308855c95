r"""System dynamics: base System, LTI, LTV, NLS with auto-linearization.

Ref: pypose/module/dynamics.py.  The reference's forward-hook time counter
(dynamics.py:17-24) becomes an explicit attribute updated after ``forward``
— time is also always accepted explicitly (``t=`` arguments), which is the
jit-safe path used by EKF/LQR.
"""

import jax
import jax.numpy as jnp

from ..nn import Module
from ..function.linalg import bmv


def _atleast_1d(x):
    return jnp.atleast_1d(jnp.asarray(x))


class System(Module):
    r"""Base class for discrete-time dynamics.  Ref: dynamics.py:7-115."""

    def __init__(self):
        super().__init__()
        self.register_buffer('_t', jnp.asarray(0, jnp.int32))

    def forward(self, state, input):
        self.state, self.input = _atleast_1d(state), _atleast_1d(input)
        state = self.state_transition(self.state, self.input)
        obs = self.observation(self.state, self.input)
        # forward-hook analog: advance system time (dynamics.py:22-24)
        self._t = self._t + 1
        return state, obs

    def state_transition(self, state, input, t=None):
        raise NotImplementedError(
            'The users need to define their own state transition method')

    def observation(self, state, input, t=None):
        raise NotImplementedError(
            'The users need to define their own observation method')

    def set_refpoint(self, state=None, input=None, t=None):
        return self

    def reset(self, t=0):
        self._t = jnp.asarray(t, jnp.int32)
        return self

    @property
    def systime(self):
        return self._t

    @systime.setter
    def systime(self, t):
        self._t = jnp.asarray(t)


class LTI(System):
    r"""Linear time-invariant system
    :math:`x' = Ax + Bu + c_1;\ y = Cx + Du + c_2` with batched matrix
    coefficients.

    Ref: pypose/module/dynamics.py:118-262.

    Example:
        >>> import jax.numpy as jnp
        >>> from pypose_tpu.module import LTI
        >>> A = jnp.eye(2); B = jnp.ones((2, 1))
        >>> C = jnp.eye(2); D = jnp.zeros((2, 1))
        >>> sys = LTI(A, B, C, D)
        >>> x1, y = sys(jnp.zeros(2), jnp.ones(1))
        >>> x1
        Array([1., 1.], dtype=float32)
    """

    def __init__(self, A, B, C, D, c1=None, c2=None):
        super().__init__()
        self.register_buffer('_A', A)
        self.register_buffer('_B', B)
        self.register_buffer('_C', C)
        self.register_buffer('_D', D)
        self.register_buffer('_c1', c1)
        self.register_buffer('_c2', c2)

    def forward(self, state, input):
        return super().forward(state, input)

    def state_transition(self, state, input, t=None):
        z = bmv(self.A, state) + bmv(self.B, input)
        return z if self.c1 is None else z + self.c1

    def observation(self, state, input, t=None):
        y = bmv(self.C, state) + bmv(self.D, input)
        return y if self.c2 is None else y + self.c2

    @property
    def A(self):
        return self._A

    @property
    def B(self):
        return self._B

    @property
    def C(self):
        return self._C

    @property
    def D(self):
        return self._D

    @property
    def c1(self):
        return self._c1

    @property
    def c2(self):
        return self._c2


class LTV(LTI):
    r"""Linear time-varying system: users override A..D properties indexed
    by ``self._t``.  Ref: dynamics.py:265-396.
    """

    def __init__(self, A=None, B=None, C=None, D=None, c1=None, c2=None):
        super().__init__(A, B, C, D, c1, c2)

    def set_refpoint(self, state=None, input=None, t=None):
        self.systime = t
        return self


class NLS(System):
    r"""Nonlinear system with auto-linearization at a reference point:
    A/B/C/D are Jacobians via jax.jacrev; c1/c2 affine remainders.

    Ref: dynamics.py:399-628.
    """

    def __init__(self):
        super().__init__()

    def forward(self, state, input):
        self.state, self.input = _atleast_1d(state), _atleast_1d(input)
        state = self.state_transition(self.state, self.input, self.systime)
        obs = self.observation(self.state, self.input, self.systime)
        self._t = self._t + 1
        return state, obs

    def set_refpoint(self, state=None, input=None, t=None):
        """Ref: dynamics.py:535-559."""
        self._ref_state = self.state if state is None else _atleast_1d(state)
        self._ref_input = self.input if input is None else _atleast_1d(input)
        self._ref_t = self.systime if t is None else jnp.atleast_1d(
            jnp.asarray(t))
        self._ref_f = self.state_transition(self._ref_state, self._ref_input,
                                            self._ref_t)
        self._ref_g = self.observation(self._ref_state, self._ref_input,
                                       self._ref_t)
        return self

    @property
    def A(self):
        func = lambda x: self.state_transition(x, self._ref_input,
                                               self._ref_t)
        return jax.jacrev(func)(self._ref_state)

    @property
    def B(self):
        func = lambda x: self.state_transition(self._ref_state, x,
                                               self._ref_t)
        return jax.jacrev(func)(self._ref_input)

    @property
    def C(self):
        func = lambda x: self.observation(x, self._ref_input, self._ref_t)
        return jax.jacrev(func)(self._ref_state)

    @property
    def D(self):
        func = lambda x: self.observation(self._ref_state, x, self._ref_t)
        return jax.jacrev(func)(self._ref_input)

    @property
    def c1(self):
        return self._ref_f - bmv(self.A, self._ref_state) \
            - bmv(self.B, self._ref_input)

    @property
    def c2(self):
        return self._ref_g - bmv(self.C, self._ref_state) \
            - bmv(self.D, self._ref_input)


def toBTN(vec, T):
    """Broadcast a vector to batch x time x dim.  Ref: dynamics.py:631-650."""
    vec = jnp.asarray(vec)
    if vec.ndim == 1:
        vec = vec[None]
    if vec.ndim == 2:
        vec = vec[None]
    if vec.shape[1] == 1:
        vec = jnp.tile(vec, (1, T, 1))
    return vec


def runsys(system, T, x_traj, u_traj):
    """Roll out a system trajectory.  Ref: dynamics.py:651-666."""
    x_traj = toBTN(x_traj, T)
    u_traj = toBTN(u_traj, T)
    xs = [x_traj[..., 0, :]]
    for i in range(T - 1):
        xs.append(system(xs[-1], u_traj[..., i, :])[0])
    return jnp.stack(xs, axis=-2)
