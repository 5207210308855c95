r"""Group-aware closeness assertion.  Ref: pypose/testing/comparison.py:5-42."""

import numpy as np
import jax.numpy as jnp

from ..lietensor.lietensor import LieTensor


def assert_close(actual, expected, rtol=None, atol=None, **kwargs):
    """Assert closeness; for group LieTensors compares ``(a^-1 b).Log()`` to 0.

    Ref: pypose/testing/comparison.py:38-42.
    """
    if isinstance(actual, LieTensor) and isinstance(expected, LieTensor) \
            and not actual.ltype.on_manifold:
        error = (actual.Inv() @ expected).Log().tensor()
        zeros = np.zeros(np.asarray(error).shape)
        np.testing.assert_allclose(np.asarray(error), zeros,
                                   rtol=0 if rtol is None else rtol,
                                   atol=1e-5 if atol is None else atol)
        return
    a = actual.tensor() if isinstance(actual, LieTensor) else actual
    b = expected.tensor() if isinstance(expected, LieTensor) else expected
    a, b = np.asarray(a), np.asarray(b)
    dt = a.dtype if hasattr(a, 'dtype') else jnp.float32
    if rtol is None:
        rtol = 1.3e-6 if dt == np.float32 else 1e-7
    if atol is None:
        atol = 1e-5 if dt == np.float32 else 1e-7
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, **kwargs)
