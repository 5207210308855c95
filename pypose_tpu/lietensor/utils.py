r"""LieTensor constructors, factories, and module-level functional dispatch.

Ref: pypose/lietensor/utils.py (constructors :9-225, randn/identity
factories :226-1343, functional dispatch :1345-2660).
"""

import functools

from .lietensor import (
    LieTensor, SO3_type, so3_type, SE3_type, se3_type, Sim3_type, sim3_type,
    RxSO3_type, rxso3_type, liegroup, liealgebra,
)


# ---------------------------------------------------------------------------
# typed constructors: SO3(data) etc.  Ref: utils.py:9-225
# ---------------------------------------------------------------------------

def _constructor(ltype, name, doc_dim):
    def ctor(data, **kwargs):
        return LieTensor(data, ltype=ltype, **kwargs)
    ctor.__name__ = name
    ctor.__doc__ = (
        f"Construct a {name}-type LieTensor from storage data "
        f"of shape (*, {doc_dim}).")
    return ctor


SO3 = _constructor(SO3_type, 'SO3', 4)
so3 = _constructor(so3_type, 'so3', 3)
SE3 = _constructor(SE3_type, 'SE3', 7)
se3 = _constructor(se3_type, 'se3', 6)
Sim3 = _constructor(Sim3_type, 'Sim3', 8)
sim3 = _constructor(sim3_type, 'sim3', 7)
RxSO3 = _constructor(RxSO3_type, 'RxSO3', 5)
rxso3 = _constructor(rxso3_type, 'rxso3', 4)


# ---------------------------------------------------------------------------
# randn_* / identity_* factories.  Ref: utils.py:226-1343
# ---------------------------------------------------------------------------

def randn_like(input, sigma=1.0, **kwargs):
    return input.ltype.randn_like(input, sigma=sigma, **kwargs)


def identity_like(input, **kwargs):
    return input.ltype.identity_like(input, **kwargs)


def _randn_factory(ltype, name):
    def fn(*lsize, sigma=1.0, **kwargs):
        return ltype.randn(*lsize, sigma=sigma, **kwargs)
    fn.__name__ = name
    fn.__doc__ = (
        f"Random {ltype} LieTensor with batch shape ``lsize``.\n\n"
        "Algebra types sample a random axis scaled by N(0, sigma) angles\n"
        "(per-channel sigma tuples supported where the reference supports\n"
        "them: se3 (t, r), sim3 (t, r, s), rxso3 (r, s)); group types\n"
        "sample the algebra and Exp it.  Pass ``key=jax.random.PRNGKey(n)``\n"
        "for explicit randomness, else the global pp.seed stream is used.")
    return fn


def _identity_factory(ltype, name):
    def fn(*lsize, **kwargs):
        return ltype.identity(*lsize, **kwargs)
    fn.__name__ = name
    fn.__doc__ = f"Identity {ltype} LieTensor with given batch shape."
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
    r"""Exponential map: Lie algebra -> Lie group.  Ref: utils.py:1355.

    .. math:: \mathrm{Exp}: \mathfrak{g} \to G

    Shapes: so3 (*, 3) -> SO3 (*, 4); se3 (*, 6) -> SE3 (*, 7);
    rxso3 (*, 4) -> RxSO3 (*, 5); sim3 (*, 7) -> Sim3 (*, 8).

    Example:
        >>> pp.Exp(pp.so3(jnp.zeros(3)))      # identity quaternion
        SO3Type LieTensor: [0. 0. 0. 1.]
    """
    return input.Exp()


@assert_ltype
def Log(input):
    r"""Logarithm map: Lie group -> Lie algebra.  Ref: utils.py:1591.

    Returns the left-trivialized tangent coordinates (shortest arc for the
    quaternion double cover: Log(q) == Log(-q)).

    Shapes: SO3 (*, 4) -> so3 (*, 3); SE3 (*, 7) -> se3 (*, 6);
    RxSO3 (*, 5) -> rxso3 (*, 4); Sim3 (*, 8) -> sim3 (*, 7).
    """
    return input.Log()


@assert_ltype
def Inv(x):
    r"""Inverse of a LieTensor.  Ref: utils.py:1828."""
    return x.Inv()


@assert_ltype
def Mul(x, y):
    r"""Group multiplication / action.  Ref: utils.py:2041."""
    return x * y


@assert_ltype
def Retr(X, a):
    r"""Retraction: Exp(a) * X.  Ref: utils.py:2046."""
    return X.Retr(a)


@assert_ltype
def Act(X, p):
    r"""Group action on points (*, 3) or homogeneous (*, 4).

    SO3: R p;  SE3: R p + t;  RxSO3: s R p;  Sim3: s R p + t.
    Batch dims broadcast.  Equivalent to ``X @ p``.  Ref: utils.py:2100.
    """
    return X.Act(p)


@assert_ltype
def Adj(input, p):
    r"""Adjoint action: Adj(X) @ p, satisfying
    ``X * Exp(p) == Exp(Adj(X, p)) * X``.  Ref: utils.py:2155.
    """
    return input.Adj(p)


@assert_ltype
def AdjT(X, p):
    r"""Inverse-adjoint action: Adj(X^{-1}) @ p, satisfying
    ``Exp(p) * X == X * Exp(AdjT(X, p))``.

    NOTE the reference's backward for this op uses Adj(X) where the true
    transpose is Adj(X^{-1})^T (wrong for SE3/Sim3/RxSO3,
    operation.py:1047-1067); this implementation's gradient is the
    finite-difference-verified transpose of the forward.  Ref: utils.py:2382.
    """
    return X.AdjT(p)


@assert_ltype
def Jinvp(input, p):
    r"""Apply the inverse left Jacobian: J^{-1}_l(Log(X)) @ p — the
    correction mapping group-level perturbations to algebra steps in
    on-manifold optimization.  Ref: utils.py:2387.
    """
    return input.Jinvp(p)


@assert_ltype
def Jr(x):
    r"""Right Jacobian.  Ref: utils.py:2640."""
    return x.Jr()
