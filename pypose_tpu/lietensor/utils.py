r"""LieTensor constructors, factories, and module-level functional dispatch.

Ref: pypose/lietensor/utils.py (constructors :9-225, randn/identity
factories :226-1343, functional dispatch :1345-2660).

All examples are runnable doctests (executed by tests/test_doctests.py on
the CPU backend).
"""

import functools

from .lietensor import (
    LieTensor, SO3_type, so3_type, SE3_type, se3_type, Sim3_type, sim3_type,
    RxSO3_type, rxso3_type, liegroup, liealgebra,
)


# ---------------------------------------------------------------------------
# typed constructors: SO3(data) etc.  Ref: utils.py:9-225
# ---------------------------------------------------------------------------

_CTOR_DOC = {
    'SO3': ("rotation quaternion", 4, "(qx, qy, qz, qw)",
            "unit quaternion, scalar-last (Hamilton) convention"),
    'so3': ("rotation tangent", 3, "(wx, wy, wz)",
            "axis-angle rotation vector (angle = ||w||)"),
    'SE3': ("rigid transform", 7, "(tx, ty, tz, qx, qy, qz, qw)",
            "translation followed by a unit quaternion"),
    'se3': ("rigid-transform tangent", 6, "(vx, vy, vz, wx, wy, wz)",
            "linear velocity then rotation vector (twist coordinates)"),
    'Sim3': ("similarity transform", 8, "(tx, ty, tz, qx, qy, qz, qw, s)",
             "translation, unit quaternion, positive scale"),
    'sim3': ("similarity tangent", 7, "(vx, vy, vz, wx, wy, wz, sigma)",
             "twist plus log-scale"),
    'RxSO3': ("rotation-with-scale", 5, "(qx, qy, qz, qw, s)",
              "unit quaternion and positive scale"),
    'rxso3': ("rotation-with-scale tangent", 4, "(wx, wy, wz, sigma)",
              "rotation vector plus log-scale"),
}


def _constructor(ltype, name):
    what, dim, layout, note = _CTOR_DOC[name]
    def ctor(data, **kwargs):
        return LieTensor(data, ltype=ltype, **kwargs)
    ctor.__name__ = name
    ctor.__doc__ = f"""Construct a {name}-type LieTensor ({what}).

    Args:
        data: array-like of storage shape ``(*, {dim})`` laid out as
            ``{layout}`` — {note}.  The leading ``*`` dims are batch
            (``lshape``).  No normalization or validation is performed
            (matching the reference constructor,
            pypose/lietensor/utils.py:9-225); use the ``mat2*`` /
            ``from_matrix`` converters for validated input.

    Returns:
        A :class:`LieTensor` with ``ltype={name}_type``.

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> pp.{name}(jnp.zeros({dim})).lshape
        ()
    """
    return ctor


SO3 = _constructor(SO3_type, 'SO3')
so3 = _constructor(so3_type, 'so3')
SE3 = _constructor(SE3_type, 'SE3')
se3 = _constructor(se3_type, 'se3')
Sim3 = _constructor(Sim3_type, 'Sim3')
sim3 = _constructor(sim3_type, 'sim3')
RxSO3 = _constructor(RxSO3_type, 'RxSO3')
rxso3 = _constructor(rxso3_type, 'rxso3')


# ---------------------------------------------------------------------------
# randn_* / identity_* factories.  Ref: utils.py:226-1343
# ---------------------------------------------------------------------------

def randn_like(input, sigma=1.0, **kwargs):
    r"""Random LieTensor with the same ltype, lshape, and dtype as ``input``.

    Ref: pypose/lietensor/utils.py:226-260.

    Example:
        >>> import jax, pypose_tpu as pp
        >>> x = pp.identity_SE3(2, 3)
        >>> y = pp.randn_like(x, sigma=0.1, key=jax.random.PRNGKey(0))
        >>> y.ltype is x.ltype and y.lshape == (2, 3)
        True
    """
    return input.ltype.randn_like(input, sigma=sigma, **kwargs)


def identity_like(input, **kwargs):
    r"""Identity LieTensor with the same ltype and lshape as ``input``.

    Ref: pypose/lietensor/utils.py:262-290.

    Example:
        >>> import jax, pypose_tpu as pp
        >>> pp.identity_like(pp.randn_SO3(2, key=jax.random.PRNGKey(0)))
        SO3Type LieTensor:
        [[0. 0. 0. 1.]
         [0. 0. 0. 1.]]
    """
    return input.ltype.identity_like(input, **kwargs)


_RANDN_SIGMA_DOC = {
    'so3': "scalar sigma: the rotation angle is N(0, sigma) about a "
           "uniform random axis",
    'SO3': "scalar sigma (as so3, then Exp)",
    'se3': "sigma may be a scalar or a (sigma_t, sigma_r) pair for the "
           "translation and rotation channels",
    'SE3': "sigma as se3, then Exp",
    'sim3': "sigma may be a scalar or (sigma_t, sigma_r, sigma_s)",
    'Sim3': "sigma as sim3, then Exp",
    'rxso3': "sigma may be a scalar or (sigma_r, sigma_s)",
    'RxSO3': "sigma as rxso3, then Exp",
}


def _randn_factory(ltype, name):
    group = name.split('_')[1]
    def fn(*lsize, sigma=1.0, **kwargs):
        return ltype.randn(*lsize, sigma=sigma, **kwargs)
    fn.__name__ = name
    fn.__doc__ = f"""Random {group}-type LieTensor with batch shape ``lsize``.

    Ref: pypose/lietensor/utils.py:226-1343 ({name}).

    Args:
        *lsize: batch (lshape) dimensions, e.g. ``{name}(2, 3)``.
        sigma: {_RANDN_SIGMA_DOC[group]}.
        key: a ``jax.random.PRNGKey`` for explicit randomness; when
            omitted the global ``pp.seed`` stream is consumed (the JAX
            analog of torch's global RNG).
        dtype: optional storage dtype (default float32).

    Example:
        >>> import jax, pypose_tpu as pp
        >>> x = pp.{name}(2, sigma=0.1, key=jax.random.PRNGKey(0))
        >>> x.lshape
        (2,)
    """
    return fn


def _identity_factory(ltype, name):
    group = name.split('_')[1]
    def fn(*lsize, **kwargs):
        return ltype.identity(*lsize, **kwargs)
    fn.__name__ = name
    fn.__doc__ = f"""Identity {group}-type LieTensor with batch shape ``lsize``.

    Group identities are the identity transform; algebra identities are
    the zero tangent.  Ref: pypose/lietensor/utils.py:226-1343.

    Example:
        >>> import pypose_tpu as pp
        >>> x = pp.{name}(2, 3)
        >>> x.lshape
        (2, 3)
    """
    return fn


randn_so3 = _randn_factory(so3_type, 'randn_so3')
randn_SO3 = _randn_factory(SO3_type, 'randn_SO3')
randn_se3 = _randn_factory(se3_type, 'randn_se3')
randn_SE3 = _randn_factory(SE3_type, 'randn_SE3')
randn_sim3 = _randn_factory(sim3_type, 'randn_sim3')
randn_Sim3 = _randn_factory(Sim3_type, 'randn_Sim3')
randn_rxso3 = _randn_factory(rxso3_type, 'randn_rxso3')
randn_RxSO3 = _randn_factory(RxSO3_type, 'randn_RxSO3')

identity_so3 = _identity_factory(so3_type, 'identity_so3')
identity_SO3 = _identity_factory(SO3_type, 'identity_SO3')
identity_se3 = _identity_factory(se3_type, 'identity_se3')
identity_SE3 = _identity_factory(SE3_type, 'identity_SE3')
identity_sim3 = _identity_factory(sim3_type, 'identity_sim3')
identity_Sim3 = _identity_factory(Sim3_type, 'identity_Sim3')
identity_rxso3 = _identity_factory(rxso3_type, 'identity_rxso3')
identity_RxSO3 = _identity_factory(RxSO3_type, 'identity_RxSO3')


# ---------------------------------------------------------------------------
# functional dispatch.  Ref: utils.py:1345-2660
# ---------------------------------------------------------------------------

def assert_ltype(func):
    @functools.wraps(func)
    def checker(*args, **kwargs):
        assert isinstance(args[0], LieTensor), \
            f"Invalid LieTensor Type. To call {func.__name__}, the first " \
            "argument must be a LieTensor."
        return func(*args, **kwargs)
    return checker


@assert_ltype
def Exp(input):
    r"""Exponential map from a Lie algebra to its Lie group.

    .. math:: \mathrm{Exp}: \mathfrak{g} \to G,\qquad
              \mathrm{Exp}(\boldsymbol\xi) =
              \sum_{k\ge 0} \tfrac{1}{k!}\,\hat{\boldsymbol\xi}^k

    computed in closed form per type (Rodrigues for so3; so3 + the left
    Jacobian applied to the linear part for se3; with scale channels for
    rxso3/sim3).  Small angles take cancellation-free Taylor branches so
    the map and its JVP stay finite at zero
    (pypose_tpu/lietensor/operation.py).

    Shapes: so3 ``(*, 3)`` -> SO3 ``(*, 4)``; se3 ``(*, 6)`` -> SE3
    ``(*, 7)``; rxso3 ``(*, 4)`` -> RxSO3 ``(*, 5)``; sim3 ``(*, 7)`` ->
    Sim3 ``(*, 8)``.

    Args:
        input: an algebra-type LieTensor.

    Returns:
        The corresponding group-type LieTensor.  Differentiable to
        second order (forward and reverse).

    Ref: pypose/lietensor/utils.py:1355-1589.

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> pp.Exp(pp.so3(jnp.zeros(3)))      # Exp(0) = identity
        SO3Type LieTensor:
        [0. 0. 0. 1.]
        >>> x = pp.randn_se3(sigma=0.5, key=jax.random.PRNGKey(0))
        >>> bool(jnp.allclose(pp.Log(pp.Exp(x)).tensor(), x.tensor(),
        ...                   atol=1e-6))     # Log(Exp(x)) == x
        True
    """
    return input.Exp()


@assert_ltype
def Log(input):
    r"""Logarithm map from a Lie group to its Lie algebra.

    .. math:: \mathrm{Log}: G \to \mathfrak{g}

    Returns left-trivialized tangent coordinates; the quaternion double
    cover resolves to the shortest arc, so ``Log(q) == Log(-q)``.

    Shapes: SO3 ``(*, 4)`` -> so3 ``(*, 3)``; SE3 ``(*, 7)`` -> se3
    ``(*, 6)``; RxSO3 ``(*, 5)`` -> rxso3 ``(*, 4)``; Sim3 ``(*, 8)`` ->
    sim3 ``(*, 7)``.

    Ref: pypose/lietensor/utils.py:1591-1826.

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> pp.Log(pp.identity_SO3())
        so3Type LieTensor:
        [0. 0. 0.]
        >>> q = pp.randn_SO3(key=jax.random.PRNGKey(1))
        >>> nq = pp.SO3(-q.tensor())          # same rotation, other cover
        >>> bool(jnp.allclose(pp.Log(q).tensor(), pp.Log(nq).tensor(),
        ...                   atol=1e-6))
        True
    """
    return input.Log()


@assert_ltype
def Inv(x):
    r"""Inverse of a LieTensor.

    Group types return the group inverse (``X * X.Inv() == identity``);
    algebra types negate (``Exp(-x) == Exp(x).Inv()``).

    Ref: pypose/lietensor/utils.py:1828-2039.

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> X = pp.randn_SE3(key=jax.random.PRNGKey(2))
        >>> I = X * pp.Inv(X)
        >>> bool(jnp.allclose(I.tensor(), pp.identity_SE3().tensor(),
        ...                   atol=1e-6))
        True
    """
    return x.Inv()


@assert_ltype
def Mul(x, y):
    r"""Group multiplication (also available as ``x * y`` / ``x @ y``).

    When ``y`` is a group element of the same type, composes the two.
    When ``y`` is a raw point array of shape ``(*, 3)`` (or homogeneous
    ``(*, 4)``), acts on the points (see :func:`Act`).  Batch dims
    broadcast under the usual numpy rules.

    Ref: pypose/lietensor/utils.py:2041-2044.

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> X = pp.randn_SO3(2, key=jax.random.PRNGKey(3))
        >>> bool(jnp.allclose(pp.Mul(X, pp.Inv(X)).tensor(),
        ...                   pp.identity_SO3(2).tensor(), atol=1e-6))
        True
    """
    return x * y


@assert_ltype
def Retr(X, a):
    r"""Retraction: perturb a group element by an algebra step.

    .. math:: \mathrm{Retr}(X, a) = \mathrm{Exp}(a) \cdot X

    (left-perturbation convention, matching the gradient trivialization
    used throughout the optimizers).

    Ref: pypose/lietensor/utils.py:2046-2098.

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> X = pp.identity_SO3()
        >>> a = pp.so3(jnp.array([0.1, 0., 0.]))
        >>> bool(jnp.allclose(pp.Retr(X, a).tensor(),
        ...                   pp.Exp(a).tensor(), atol=1e-7))
        True
    """
    return X.Retr(a)


@assert_ltype
def Act(X, p):
    r"""Group action on 3D points or homogeneous 4-vectors.

    .. math::
        \mathrm{SO3}&: R\,p &\quad \mathrm{SE3}&: R\,p + t \\
        \mathrm{RxSO3}&: sR\,p &\quad \mathrm{Sim3}&: sR\,p + t

    ``p`` has shape ``(*, 3)`` (points) or ``(*, 4)`` (homogeneous: the
    last component rescales the translation and passes through).  Batch
    dims broadcast.  Equivalent to ``X @ p``.

    Ref: pypose/lietensor/utils.py:2100-2153.

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> T = pp.SE3(jnp.array([1., 2., 3., 0., 0., 0., 1.]))
        >>> pp.Act(T, jnp.zeros(3))           # identity rotation: p + t
        Array([1., 2., 3.], dtype=float32)
    """
    return X.Act(p)


@assert_ltype
def Adj(input, p):
    r"""Adjoint action of a group element on an algebra vector.

    .. math:: X \cdot \mathrm{Exp}(p) = \mathrm{Exp}(\mathrm{Adj}(X, p))
              \cdot X

    i.e. transports a right-perturbation to a left-perturbation.

    Ref: pypose/lietensor/utils.py:2155-2380.

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> X = pp.randn_SE3(key=jax.random.PRNGKey(4))
        >>> p = pp.randn_se3(sigma=0.1, key=jax.random.PRNGKey(5))
        >>> lhs = X * pp.Exp(p)
        >>> rhs = pp.Exp(pp.Adj(X, p.tensor())) * X
        >>> bool(jnp.allclose(lhs.tensor(), rhs.tensor(), atol=1e-6))
        True
    """
    return input.Adj(p)


@assert_ltype
def AdjT(X, p):
    r"""Inverse-adjoint action: ``Adj(X.Inv(), p)``, satisfying

    .. math:: \mathrm{Exp}(p) \cdot X = X \cdot
              \mathrm{Exp}(\mathrm{AdjT}(X, p))

    NOTE the reference's backward for this op uses Adj(X) where the true
    transpose is Adj(X^{-1})^T (wrong for SE3/Sim3/RxSO3, reference
    pypose/lietensor/operation.py:1047-1067); this implementation's
    gradient is the finite-difference-verified transpose of the forward
    (see PARITY.md).

    Ref: pypose/lietensor/utils.py:2382-2385.

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> X = pp.randn_SO3(key=jax.random.PRNGKey(6))
        >>> p = pp.randn_so3(sigma=0.1, key=jax.random.PRNGKey(7))
        >>> lhs = pp.Exp(p) * X
        >>> rhs = X * pp.Exp(pp.AdjT(X, p.tensor()))
        >>> bool(jnp.allclose(lhs.tensor(), rhs.tensor(), atol=1e-6))
        True
    """
    return X.AdjT(p)


@assert_ltype
def Jinvp(input, p):
    r"""Apply the inverse left Jacobian at ``Log(X)`` to an algebra vector.

    .. math:: \mathrm{Jinvp}(X, p) = J_l^{-1}(\mathrm{Log}(X))\, p

    This is the correction factor mapping group-level gradient
    perturbations to algebra steps in on-manifold optimization (used by
    second-order optimizers on LieTensor parameters).

    Ref: pypose/lietensor/utils.py:2387-2638.

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> X = pp.identity_SO3()
        >>> p = jnp.array([0.1, 0.2, 0.3])
        >>> pp.Jinvp(X, p)                    # J_l at identity == I
        so3Type LieTensor:
        [0.1 0.2 0.3]
    """
    return input.Jinvp(p)


@assert_ltype
def Jr(x):
    r"""Right Jacobian of an algebra element.

    .. math:: J_r(x) = J_l(-x)

    mapping right-perturbation derivatives of Exp to the tangent space:
    ``Exp(x + dx) ≈ Exp(x) * Exp(Jr(x) dx)``.  Shapes: so3 ``(*, 3)`` ->
    ``(*, 3, 3)``; se3 -> ``(*, 6, 6)``; sim3 -> ``(*, 7, 7)``;
    rxso3 -> ``(*, 4, 4)``.

    Ref: pypose/lietensor/utils.py:2640-2660.

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> bool(jnp.allclose(pp.Jr(pp.identity_so3()),
        ...                   jnp.eye(3)))    # J_r(0) == I
        True
    """
    return x.Jr()
