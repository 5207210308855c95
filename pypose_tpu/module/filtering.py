r"""Whole-trajectory filtering as one jitted ``lax.scan``.

BASELINE config workload: EKF vs UKF vs PF on an NLS system over a
1k-step rollout.  The reference iterates filter steps in Python; here the
scan keeps the entire rollout on device (one XLA program).
"""

import jax
import jax.numpy as jnp

from .pf import PF


def rollout(filt, x0, P0, ys, us, Q=None, R=None, key=None):
    r"""Run ``filt`` over T steps of observations/inputs.

    Args:
        filt: EKF/UKF/PF instance.
        x0: initial state estimate (n,).
        P0: initial covariance (n, n).
        ys: observations (T, m).
        us: inputs (T, k).
        Q, R: optional per-call covariances.
        key: PRNG key (required for PF).
    Returns:
        (xs, Ps): estimates (T, n) and covariances (T, n, n).
    """
    is_pf = isinstance(filt, PF)
    T = ys.shape[0]
    if is_pf:
        if key is None:
            from ..lietensor.lietensor import _next_key
            key = _next_key()
        keys = jax.random.split(key, T)
    else:
        keys = jnp.zeros((T, 2), jnp.uint32)

    def step(carry, inp):
        x, P = carry
        y, u, k = inp
        kwargs = {} if Q is None else {'Q': Q}
        if R is not None:
            kwargs['R'] = R
        if is_pf:
            kwargs['key'] = k
        x, P = filt(x, y, u, P, **kwargs)
        return (x, P), (x, P)

    (_, _), (xs, Ps) = jax.lax.scan(step, (x0, P0), (ys, us, keys))
    return xs, Ps
