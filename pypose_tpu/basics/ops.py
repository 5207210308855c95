r"""Generic batched ops: sign-with-plus-at-zero and O(log N) cumulative scans.

TPU-native redesign of pypose/basics/ops.py.  The reference implements the
inclusive scan by index-doubling in Python (ops.py:27-36); here the same
O(log N) behavior comes from :func:`jax.lax.associative_scan`, which XLA
lowers to a work-efficient parallel scan on TPU — and which operates over
pytrees, so LieTensor slices flow through the user-provided group op
directly.
"""

import jax
import jax.numpy as jnp


def pm(input):
    """Sign function returning +1 at 0 (vs ``jnp.sign`` which returns 0).

    Ref: pypose/basics/ops.py:4-24.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> pp.pm(jnp.array([-2., 0., 3.]))
        Array([-1.,  1.,  1.], dtype=float32)
    """
    from ..lietensor.lietensor import LieTensor
    x = input.tensor() if isinstance(input, LieTensor) else jnp.asarray(input)
    return jnp.where(x >= 0, jnp.ones_like(x), -jnp.ones_like(x))


def _check_dim(input, dim):
    ndim = len(input.lshape) if hasattr(input, 'lshape') else input.ndim - 1
    if dim < 0:
        dim += ndim + 1
    assert 0 <= dim < ndim + 1 and dim != ndim, \
        "Invalid dim: cannot scan over the storage dimension"
    return dim


def cumops(input, dim, ops):
    r"""Cumulative user-defined associative op along ``dim``:

    .. math:: y_i = x_1 \circ x_2 \circ \dots \circ x_i

    O(log N) depth via ``lax.associative_scan`` (the reference reaches the
    same complexity by Python index-doubling, pypose/basics/ops.py:27-36;
    here XLA compiles the whole scan into one fused program).  ``ops``
    must be associative for the parallel scan to be exact.

    Ref: pypose/basics/ops.py:59-96.

    Example:
        >>> import jax.numpy as jnp, pypose_tpu as pp
        >>> x = pp.so3(jnp.eye(3) * 0.1).Exp()    # three small rotations
        >>> y = pp.cumops(x, 0, lambda a, b: a @ b)
        >>> bool(jnp.allclose(y[2].tensor(), (x[0] @ x[1] @ x[2]).tensor()))
        True
    """
    dim = _check_dim(input, dim)
    return jax.lax.associative_scan(ops, input, axis=dim)


def cummul(input, dim, left=True):
    r"""Cumulative group multiplication along ``dim``.

    Left (default): :math:`y_i = x_i * x_{i-1} * \dots * x_1`;
    right: :math:`y_i = x_1 * \dots * x_i`.  O(log N).

    Ref: pypose/basics/ops.py:99-152.

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> x = pp.randn_SO3(4, key=jax.random.PRNGKey(0))
        >>> y = pp.cummul(x, dim=0)
        >>> bool(jnp.allclose((x[1] * x[0]).tensor(), y[1].tensor(),
        ...                   atol=1e-6))
        True
    """
    from ..lietensor.lietensor import LieTensor, SO3_type
    if isinstance(input, LieTensor) and input.ltype is SO3_type:
        return _cum_quat(input, _check_dim(input, dim), left)
    if left:
        return cumops(input, dim, lambda a, b: b * a)
    return cumops(input, dim, lambda a, b: a * b)


def _cum_quat(input, dim, left):
    """SO3 cumulative product on quaternion COMPONENT tuples.

    Scanning the whole ``[..., 4]`` storage puts the 4-wide quaternion
    in the TPU lane dimension (padded to 128 -> 32x the bytes at every
    scan level); scanning four ``[...]`` component arrays keeps the
    scan axis lane-major.  Same trap/fix family as the sparse-LM block
    contractions (CLAUDE.md r3) and the closed-form IMU covariance (r5).
    """
    from ..lietensor.lietensor import LieTensor
    from ..lietensor.scalarized import _qmul
    q = input.tensor()
    comps = tuple(q[..., k] for k in range(4))
    fn = (lambda a, b: _qmul(b, a)) if left else (lambda a, b: _qmul(a, b))
    out = jax.lax.associative_scan(fn, comps, axis=dim)
    return LieTensor(jnp.stack(out, axis=-1), ltype=input.ltype)


def cumprod(input, dim, left=True):
    r"""Cumulative group composition (``@``) along ``dim``.

    Left (default): :math:`y_i = x_i \cdot x_{i-1} \cdots x_1` — the
    pose-accumulation direction for odometry chains; right reverses the
    order.  O(log N) via the associative scan; powers IMU preintegration
    and SE3 B-splines over long horizons.

    Ref: pypose/basics/ops.py:153-205.

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> x = pp.randn_SE3(4, key=jax.random.PRNGKey(1))
        >>> y = pp.cumprod(x, dim=0, left=False)
        >>> bool(jnp.allclose(y[3].tensor(),
        ...                   (x[0] @ x[1] @ x[2] @ x[3]).tensor(),
        ...                   atol=1e-6))
        True
    """
    from ..lietensor.lietensor import LieTensor, SO3_type
    if isinstance(input, LieTensor) and input.ltype is SO3_type:
        return _cum_quat(input, _check_dim(input, dim), left)
    if left:
        return cumops(input, dim, lambda a, b: b @ a)
    return cumops(input, dim, lambda a, b: a @ b)


# JAX is functional — the reference's inplace variants (basics/ops.py:27-57)
# alias the pure ones.
cumops_ = cumops
cummul_ = cummul
cumprod_ = cumprod
