r"""Differentiable nonlinear least squares via the implicit function theorem.

Lets an NLS solve sit inside a larger differentiable program (learning
with optimization in the loop — the setting the reference's EPnP handles
with a straight-through trick, pnp.py:103-112, and that Theseus builds its
API around).  Forward: LM iterations (not differentiated).  Backward: the
IFT with the Gauss-Newton Hessian approximation,

    d theta* / d x = -(J^T J)^{-1} J^T dr/dx     at theta = theta*(x),

where J = dr/d(delta) in the left-tangent coordinates of theta.  Cotangents
on Lie-group outputs arrive in the left-perturbation convention (zero-tail
storage shape), matching the rest of the library.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..lietensor.lietensor import LieTensor

_HI = jax.lax.Precision.HIGHEST


def _tan_dim(v):
    return v.ltype.manifold[0] if isinstance(v, LieTensor) else v.shape[-1]


def _tan_sizes(theta):
    leaves = jax.tree_util.tree_leaves(
        theta, is_leaf=lambda l: isinstance(l, LieTensor))
    return [int(np.prod(l.shape[:-1])) * _tan_dim(l) if l.ndim > 0
            else l.size for l in _struct_leaves(theta)]


def _struct_leaves(theta):
    """Leaves with LieTensors kept whole."""
    return jax.tree_util.tree_leaves(
        theta, is_leaf=lambda l: isinstance(l, LieTensor))


def _retract_tree(theta, delta_flat):
    """Retract a flat tangent vector onto the (possibly Lie) pytree."""
    leaves = _struct_leaves(theta)
    treedef = jax.tree_util.tree_structure(
        theta, is_leaf=lambda l: isinstance(l, LieTensor))
    out = []
    off = 0
    for l in leaves:
        if isinstance(l, LieTensor):
            t = _tan_dim(l)
            n = int(np.prod(l.shape[:-1]))
            d = delta_flat[off:off + n * t].reshape(l.lshape + (t,))
            out.append(l.add(d))
            off += n * t
        else:
            d = delta_flat[off:off + l.size].reshape(l.shape)
            out.append(l + d)
            off += l.size
    return jax.tree_util.tree_unflatten(treedef, out)


def _cotangent_flat(theta, g):
    """Extract the tangent-space cotangent of g (matching _retract_tree)."""
    leaves_t = _struct_leaves(theta)
    leaves_g = _struct_leaves(g)
    parts = []
    for lt, lg in zip(leaves_t, leaves_g):
        arr = lg.tensor() if isinstance(lg, LieTensor) else jnp.asarray(lg)
        if isinstance(lt, LieTensor):
            parts.append(arr[..., :_tan_dim(lt)].reshape(-1))
        else:
            parts.append(arr.reshape(-1))
    return jnp.concatenate(parts)


def least_squares(residual_fn, theta0, x, steps=10, damping=1e-6,
                  bwd_damping=1e-8):
    r"""Solve ``argmin_theta ||residual_fn(theta, x)||^2``, differentiably
    in ``x`` (implicit function theorem; the solve itself is not unrolled).

    Args:
        residual_fn: ``residual_fn(theta, x) -> array`` (any shape).
        theta0: initial guess pytree (may contain LieTensors).
        x: data pytree (may contain LieTensors).
        steps: LM iterations for the forward solve.
        damping: forward LM damping.
        bwd_damping: Tikhonov term for the backward normal-equation solve.
    Returns:
        theta*: solution pytree (same structure as theta0).
    """

    def rt(theta, delta_flat, x):
        return residual_fn(_retract_tree(theta, delta_flat), x).reshape(-1)

    def tan_total(theta):
        return sum(_tan_sizes(theta))

    @jax.custom_vjp
    def solve(theta0, x):
        return _forward(theta0, x)

    def _forward(theta0, x):
        T = tan_total(theta0)

        def body(i, theta):
            z = jnp.zeros(T, dtype=jnp.result_type(
                *[l.tensor() if isinstance(l, LieTensor) else l
                  for l in _struct_leaves(theta0)]))
            r = rt(theta, z, x)
            J = jax.jacobian(lambda d: rt(theta, d, x))(z)
            A = jnp.matmul(J.T, J, precision=_HI)
            A = A + damping * jnp.diag(jnp.clip(jnp.diagonal(A),
                                                1e-10, 1e32))
            b = -jnp.matmul(J.T, r, precision=_HI)
            delta = jnp.linalg.solve(A, b)
            return _retract_tree(theta, delta)

        return jax.lax.fori_loop(0, steps, body, theta0)

    def solve_fwd(theta0, x):
        theta_star = _forward(theta0, x)
        return theta_star, (theta_star, x)

    def solve_bwd(res, g):
        theta_star, x = res
        T = tan_total(theta_star)
        z = jnp.zeros(T, dtype=jnp.result_type(
            *[l.tensor() if isinstance(l, LieTensor) else l
              for l in _struct_leaves(theta_star)]))
        J = jax.jacobian(lambda d: rt(theta_star, d, x))(z)
        gtan = _cotangent_flat(theta_star, g)
        A = jnp.matmul(J.T, J, precision=_HI) + bwd_damping * jnp.eye(T)
        u = jnp.linalg.solve(A, gtan)
        w = jnp.matmul(J, u, precision=_HI)
        # vjp of r w.r.t. x at (theta*, x), applied to -w
        _, pullback = jax.vjp(lambda xx: residual_fn(theta_star,
                                                     xx).reshape(-1), x)
        (gx,) = pullback(-w)
        # at an exact optimum the solution is independent of the init
        gtheta0 = jax.tree_util.tree_map(jnp.zeros_like, theta0)
        return (gtheta0, gx)

    solve.defvjp(solve_fwd, solve_bwd)
    return solve(theta0, x)
