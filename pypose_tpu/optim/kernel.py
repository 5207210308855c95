r"""Robust M-estimator kernels on x = ||r||^2.

Ref: pypose/optim/kernel.py.  Pure elementwise callables (mask indexing
replaced by jnp.where so they vectorize on TPU and differentiate cleanly —
the correctors take jax.grad through them).
"""

import math

import jax.numpy as jnp


class Huber:
    r"""Huber kernel on the squared residual norm :math:`x = \|r\|^2`:

    .. math:: \rho(x) = \begin{cases} x & \sqrt{x} < \delta \\
              2\delta\sqrt{x} - \delta^2 & \text{otherwise} \end{cases}

    Quadratic near zero, linear in ``||r||`` for outliers.  The branch is
    a ``jnp.where`` (not mask indexing) so it vectorizes on TPU and
    ``jax.grad`` flows through it (the correctors differentiate kernels).

    Ref: pypose/optim/kernel.py:5-55.

    Example:
        >>> import jax.numpy as jnp
        >>> from pypose_tpu.optim.kernel import Huber
        >>> Huber(delta=2.0)(jnp.array([1.0, 9.0]))   # 1 < 4: quadratic
        Array([1., 8.], dtype=float32)
    """

    def __init__(self, delta=1.0):
        assert delta > 0, ValueError(
            'delta has to be positive: {}'.format(delta))
        self.delta = delta
        self.delta2 = delta ** 2

    def __call__(self, input):
        safe = jnp.maximum(input, 1e-36)
        return jnp.where(jnp.sqrt(safe) < self.delta, input,
                         2 * self.delta * jnp.sqrt(safe) - self.delta2)


class PseudoHuber:
    r"""Smooth Huber approximation
    :math:`\rho(x) = 2\delta^2(\sqrt{x/\delta^2 + 1} - 1)` —
    :math:`C^\infty` everywhere (unlike :class:`Huber`), same quadratic /
    linear asymptotics.  Ref: pypose/optim/kernel.py:56-96.

    Example:
        >>> import jax.numpy as jnp
        >>> from pypose_tpu.optim.kernel import PseudoHuber
        >>> PseudoHuber(delta=1.0)(jnp.array([0.0]))
        Array([0.], dtype=float32)
    """

    def __init__(self, delta=1.0):
        assert delta > 0, ValueError(
            'delta has to be positive: {}'.format(delta))
        self.delta2 = delta ** 2

    def __call__(self, input):
        return 2 * self.delta2 * (jnp.sqrt(input / self.delta2 + 1) - 1)


class Cauchy:
    r"""Cauchy (Lorentzian) kernel
    :math:`\rho(x) = \delta^2 \log(x/\delta^2 + 1)` — logarithmic outlier
    growth, the strongest down-weighting of the family.
    Ref: pypose/optim/kernel.py:97-136.

    Example:
        >>> import jax.numpy as jnp
        >>> from pypose_tpu.optim.kernel import Cauchy
        >>> float(Cauchy(delta=1.0)(jnp.asarray(jnp.e - 1)).round(5))
        1.0
    """

    def __init__(self, delta=1.0):
        assert delta > 0, ValueError(
            'delta has to be positive: {}'.format(delta))
        self.delta2 = delta ** 2

    def __call__(self, input):
        return self.delta2 * jnp.log(input / self.delta2 + 1)


class SoftLOne:
    r"""2 (delta sqrt(1/delta^2 + x) - 1).  Ref: kernel.py:137-177."""

    def __init__(self, delta=1.0):
        assert delta > 0, ValueError(
            'delta has to be positive: {}'.format(delta))
        self.delta1 = delta
        self.delta2 = delta ** 2

    def __call__(self, input):
        return 2 * (self.delta1 * jnp.sqrt(1 / self.delta2 + input) - 1)


class Arctan:
    r"""delta^2 arctan(x/delta^2).  Ref: kernel.py:178-216."""

    def __init__(self, delta=1.0):
        self.delta2 = delta ** 2

    def __call__(self, input):
        return self.delta2 * jnp.arctan(input / self.delta2)


class Tolerant:
    r"""b log(1 + exp((x-a)/b)) - b log(1 + exp(-a/b)).  Ref: kernel.py:217-260."""

    def __init__(self, a=1.0, b=-1.0):
        assert a > 0, ValueError('a has to be positive: {}'.format(a))
        assert b < 0, ValueError('b has to be negative: {}'.format(b))
        self.a, self.b = a, b

    def __call__(self, input):
        result = self.b * jnp.log(1 + jnp.exp((input - self.a) / self.b))
        offset = self.b * math.log(1 + math.exp(-self.a / self.b))
        return result - offset


class Scale:
    r"""delta * x.  Ref: kernel.py:261-297."""

    def __init__(self, delta=1.0):
        assert 0 < delta <= 1, ValueError(
            'delta has to be between 0 and 1: {}'.format(delta))
        self.delta = delta

    def __call__(self, input):
        return self.delta * input
