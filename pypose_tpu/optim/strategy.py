r"""LM damping strategies as pure state-transition functions.

Ref: pypose/optim/strategy.py.  The reference mutates the optimizer's
param-group dict; here each strategy owns an ``init()`` returning a small
jnp-scalar state pytree and a pure ``update(state, ...)`` so the whole LM
reject loop stays inside ``lax.while_loop`` on TPU.
"""

import jax.numpy as jnp


def _quality(last, loss, J, D, R):
    """Gain ratio (actual reduction / predicted reduction).

    Ref: strategy.py:140-141, 260-261 — with one deliberate deviation:
    a step whose PREDICTED reduction is non-positive (the local model
    says the step does not descend — e.g. an unconverged inner CG
    returned garbage) is scored -1, a hard reject.  The reference
    divides blindly, so a garbage step that increases the loss
    (numerator < 0) over a negative prediction (denominator < 0) scores
    as HIGH quality, the radius GROWS on every rejection, and the
    post-reject force-accept diverges — measured on the C=2048 BA
    matvec-CG path (chi2 3.7e8 -> 9.8e16; tools/ba_large_debug r5).
    Ceres treats model_cost_change <= 0 the same way (invalid step).

    A NaN loss also lands in the poor branch: NaN comparisons are False
    in both `q > high` and `q > low`, so the radius shrinks.
    """
    JD = J @ D
    pred = -(JD.T @ (2.0 * R + JD)).squeeze()
    q = (last - loss) / jnp.where(pred == 0, 1e-31, pred)
    return jnp.where(pred > 0, q, -1.0)


class Constant:
    """Constant LM damping (classic Levenberg).

    Ref: pypose/optim/strategy.py:5-47.

    Example:
        >>> from pypose_tpu.optim.strategy import Constant
        >>> s = Constant(damping=1e-4)
        >>> round(float(s.init()['damping']), 6)
        0.0001
    """

    def __init__(self, damping=1e-6):
        assert damping > 0, ValueError(
            'damping has to be positive: {}'.format(damping))
        self.damping = damping

    def init(self, dtype=jnp.float32):
        return {'damping': jnp.asarray(self.damping, dtype)}

    def update(self, state, last, loss, J, D, R):
        return state


class Adaptive:
    r"""Gain-ratio adaptive damping: multiply damping by ``down`` when the
    step quality :math:`q = (\text{actual reduction})/(\text{predicted
    reduction})` exceeds ``high``, by ``up`` when below ``low``.

    State is a tiny jnp-scalar pytree and ``update`` is pure, so the
    whole damping schedule lives inside the device-side LM
    ``lax.while_loop``.  Ref: pypose/optim/strategy.py:49-151.

    Example:
        >>> import jax.numpy as jnp
        >>> from pypose_tpu.optim.strategy import Adaptive
        >>> s = Adaptive(damping=1e-2, up=2.0, down=0.5)
        >>> st = s.init()
        >>> J = jnp.eye(2); D = -jnp.ones((2, 1)); R = jnp.ones((2, 1))
        >>> st2 = s.update(st, last=2.0, loss=0.1, J=J, D=D, R=R)
        >>> round(float(st2['damping']), 6)   # good step: damping halves
        0.005
    """

    def __init__(self, damping=1e-6, high=0.5, low=1e-3, up=2., down=0.5,
                 min=1e-6, max=1e16):
        assert damping > 0
        assert high > 0 and low > 0
        assert 0 < down < 1 and up > 1
        self.damping, self.high, self.low = damping, high, low
        self.up, self.down = up, down
        self.min, self.max = min, max

    def init(self, dtype=jnp.float32):
        return {'damping': jnp.asarray(self.damping, dtype)}

    def update(self, state, last, loss, J, D, R):
        q = _quality(last, loss, J, D, R)
        d = state['damping']
        d = jnp.where(q > self.high, d * self.down,
                      jnp.where(q > self.low, d, d * self.up))
        return {'damping': jnp.clip(d, self.min, self.max)}


class TrustRegion:
    r"""Ceres-style trust region: damping is the reciprocal radius, the
    radius grows by ``up`` on high-quality steps and shrinks by a
    ``down`` factor that itself decays (``factor``) on consecutive poor
    steps — fast recovery after a rejected step.

    Ref: pypose/optim/strategy.py:154-273.

    Example:
        >>> from pypose_tpu.optim.strategy import TrustRegion
        >>> s = TrustRegion(radius=1e4)
        >>> round(float(s.init()['damping']), 6)
        0.0001
    """

    def __init__(self, radius=1e6, high=0.5, low=1e-3, up=2., down=0.5,
                 factor=0.5, min=1e-6, max=1e16):
        assert radius > 0
        assert high > 0 and low > 0
        assert 0 < down < 1 and up > 1 and 0 < factor < 1
        self.radius, self.high, self.low = radius, high, low
        self.up, self.down0, self.factor = up, down, factor
        self.min, self.max = min, max

    def init(self, dtype=jnp.float32):
        return {'damping': jnp.asarray(1.0 / self.radius, dtype),
                'down': jnp.asarray(self.down0, dtype)}

    def update(self, state, last, loss, J, D, R):
        q = _quality(last, loss, J, D, R)
        radius = 1.0 / state['damping']
        down = state['down']
        radius_new = jnp.where(q > self.high, self.up * radius,
                               jnp.where(q > self.low, radius,
                                         radius * down))
        down_new = jnp.where(q > self.low, jnp.asarray(self.down0, down.dtype),
                             down * self.factor)
        down_new = jnp.clip(down_new, self.min, self.max)
        radius_new = jnp.clip(radius_new, self.min, self.max)
        return {'damping': 1.0 / radius_new, 'down': down_new}
