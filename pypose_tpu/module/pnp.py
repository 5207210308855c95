r"""EPnP: Efficient Perspective-n-Point solver.

Ref: pypose/module/pnp.py.  Batched over leading dims; the 12x12
eigen-decomposition uses ``eigh`` (M^T M is symmetric — the reference's
general ``eig`` + real-part extraction, pnp.py:214-220, is unnecessary);
optional Gauss-Newton refinement of beta with a straight-through gradient
trick (pnp.py:103-112).
"""

import jax
import jax.numpy as jnp

from ..nn import Module, Parameter
from ..function.linalg import bmv
from ..function.geometry import cart2homo, reprojerr, svdtf
from ..optim.optimizer import GaussNewton
from ..optim.solver import LSTSQ


class BetaObjective(Module):
    """Residual on distances between control points.  Ref: pnp.py:13-26."""

    def __init__(self, beta):
        super().__init__()
        self.beta = Parameter(jnp.asarray(beta))
        self.i = (0, 0, 0, 1, 1, 2)
        self.j = (1, 2, 3, 2, 3, 3)

    def forward(self, base_w, nullv):
        base_c = bmv(jnp.swapaxes(nullv, -1, -2), self.beta)
        base_c = base_c.reshape(base_c.shape[:-1] + (4, 3))
        i, j = jnp.array(self.i), jnp.array(self.j)
        dist_c = jnp.linalg.norm(base_c[..., i, :] - base_c[..., j, :],
                                 axis=-1)
        dist_w = jnp.linalg.norm(base_w[..., i, :] - base_w[..., j, :],
                                 axis=-1)
        return dist_w - dist_c


class EPnP(Module):
    r"""Batched EPnP perspective-n-point solver: expresses the n world
    points in a 4-control-point barycentric basis, solves the camera-frame
    control points from the 2n x 12 projection system (SVD null space +
    beta candidates), and optionally refines the betas by Gauss-Newton —
    the refinement is inlined into the same jitted program.

    Returns the world -> camera SE3.

    Ref: pypose/module/pnp.py:29-291 (forward :136).

    Example:
        >>> import jax, jax.numpy as jnp, pypose_tpu as pp
        >>> from pypose_tpu.module import EPnP
        >>> pts_cam = jax.random.uniform(
        ...     jax.random.PRNGKey(0), (12, 3),
        ...     minval=jnp.array([-2., -2., 4.]),
        ...     maxval=jnp.array([2., 2., 12.]))
        >>> T = pp.randn_SE3(sigma=(0.4, 0.2), key=jax.random.PRNGKey(1))
        >>> K = jnp.array([[500., 0., 320.], [0., 500., 240.], [0., 0., 1.]])
        >>> pix = pp.point2pixel(pts_cam, K)
        >>> world = T.Inv().unsqueeze(-2).Act(pts_cam)
        >>> pose = EPnP(intrinsics=K, refine=False)(world, pix)
        >>> err = (pose.Inv() @ T).Log().tensor()
        >>> bool(jnp.abs(err).max() < 1e-2)
        True
    """

    def __init__(self, intrinsics=None, refine=True):
        super().__init__()
        self.refine = refine
        self.solver = LSTSQ()
        if intrinsics is not None:
            self.register_buffer('intrinsics', intrinsics)

    def forward(self, points, pixels, intrinsics=None):
        assert pixels.shape[-2] == points.shape[-2] >= 4, \
            'Number of points/pixels cannot be smaller than 4.'
        intrinsics = self.intrinsics if intrinsics is None else intrinsics
        # the solve is a large eager op graph (SVDs, eigh, candidate
        # selection); cache one jitted program so repeated calls do not
        # re-dispatch/re-trace it op by op
        if not hasattr(self, '_compiled'):
            self._compiled = jax.jit(
                lambda pts, pix, K: self._solve(pts, pix, K).tensor())
        from ..lietensor.utils import SE3
        return SE3(self._compiled(points, pixels, intrinsics))

    def _solve(self, points, pixels, intrinsics):
        # EPnP's algebra (M^T M null space, barycentric inverse, control-
        # point Grams) is precision-critical: TPU f32 matmuls at DEFAULT
        # precision run as single-pass bf16 (CLAUDE.md), which degraded
        # the noiseless batched solve from 7e-5 to 4e-2 median pose error
        # (measured r3).  These matrices are tiny — HIGHEST costs nothing.
        with jax.default_matmul_precision('float32'):
            return self._solve_inner(points, pixels, intrinsics)

    def _solve_inner(self, points, pixels, intrinsics):
        bases = self._svd_basis(points)
        alpha = self._compute_alpha(points, bases)
        nullv = self._compute_nullv(pixels, alpha, intrinsics)
        l_mat, rho = self._compute_lrho(nullv, bases)
        betas = self._compute_betas(l_mat, rho)
        poses, scales = self._compute_solution(betas, nullv, alpha, points)
        errors = reprojerr(points, pixels, intrinsics, poses,
                           reduction='norm')
        pose, beta, scale = self._best_solution(errors, poses, betas, scales)
        if self.refine:
            beta = self._refine(beta * scale, nullv, bases)
            pose, scale = self._compute_solution(beta, nullv, alpha, points)
        return pose

    def _compute_solution(self, beta, nullv, alpha, points):
        """Ref: pnp.py:157-162."""
        bases = bmv(jnp.swapaxes(nullv, -1, -2), beta)
        bases, transp, scale = self._compute_scale(bases, alpha, points)
        pose = svdtf(points, transp)
        return pose, scale

    def _best_solution(self, errors, poses, betas, scales):
        """Pick the candidate with smallest mean reprojection error.

        Ref: pnp.py:164-171.
        """
        idx = jnp.argmin(errors.mean(axis=-1), axis=0)

        def sel(arr):
            full = jnp.broadcast_to(idx[(None,) + (Ellipsis,)
                                        + (None,) * (arr.ndim - idx.ndim - 1)],
                                    (1,) + arr.shape[1:])
            return jnp.take_along_axis(arr, full, axis=0)[0]

        from ..lietensor.utils import SE3
        return SE3(sel(poses.tensor())), sel(betas), sel(scales)

    def _refine(self, beta, nullv, bases):
        """GN refinement with straight-through gradients.  Ref: pnp.py:103-112.

        Uses the GN optimizer's pure loop core (trace-safe) so the whole
        refinement inlines into the jitted EPnP program."""
        model = BetaObjective(jax.lax.stop_gradient(beta))
        optim = GaussNewton(model, solver=LSTSQ())
        inp = (jax.lax.stop_gradient(bases), jax.lax.stop_gradient(nullv))
        p, _, _, _ = optim._optimize_run(optim._params(), inp, None, None,
                                         steps=10, patience=3,
                                         decreasing=1e-3)
        refined = p['beta']
        refined = refined.tensor() if hasattr(refined, 'tensor') else refined
        return beta + jax.lax.stop_gradient(refined - beta)

    def _svd_basis(self, points):
        """Control points from the SVD of the centered covariance.

        Ref: pnp.py:174-181.
        """
        center = points.mean(axis=-2, keepdims=True)
        translated = points - center
        u, s, vh = jnp.linalg.svd(
            jnp.swapaxes(translated, -1, -2) @ translated)
        controls = center + jnp.sqrt(s)[..., None] * jnp.swapaxes(vh, -1, -2)
        return jnp.concatenate([center, controls], axis=-2)

    def _compute_alpha(self, points, bases):
        """Barycentric coordinates: solve x @ bases = points.

        Ref: pnp.py:183-186.
        """
        points, bases = cart2homo(points), cart2homo(bases)
        return points @ jnp.linalg.inv(bases)

    def _compute_nullv(self, pixels, alpha, intrinsics, least=4):
        """Null 4-space of M via eigh of M^T M.  Ref: pnp.py:188-220."""
        batch, point = pixels.shape[:-2], pixels.shape[-2]
        u, v = pixels[..., 0], pixels[..., 1]
        fu, u0 = intrinsics[..., 0, 0, None], intrinsics[..., 0, 2, None]
        fv, v0 = intrinsics[..., 1, 1, None], intrinsics[..., 1, 2, None]
        a0, a1 = alpha[..., 0], alpha[..., 1]
        a2, a3 = alpha[..., 2], alpha[..., 3]
        O = jnp.zeros_like(a1)
        M = jnp.stack([
            a0 * fu, O, a0 * (u0 - u), a1 * fu, O, a1 * (u0 - u),
            a2 * fu, O, a2 * (u0 - u), a3 * fu, O, a3 * (u0 - u),
            O, a0 * fv, a0 * (v0 - v), O, a1 * fv, a1 * (v0 - v),
            O, a2 * fv, a2 * (v0 - v), O, a3 * fv, a3 * (v0 - v)],
            axis=-1).reshape(batch + (point * 2, 12))
        # M^T M is symmetric PSD: eigh returns ascending eigenvalues, so the
        # 4 smallest eigenvectors are the leading columns.
        _, eigenvectors = jnp.linalg.eigh(
            jnp.swapaxes(M, -1, -2) @ M)
        nullv = jnp.swapaxes(eigenvectors[..., :least], -1, -2)
        # match reference ordering: smallest eigenvalue LAST (pnp.py:218-220)
        return jnp.flip(nullv, axis=-2)

    def _compute_lrho(self, nullv, bases):
        """L matrix and rho vector of the beta system.  Ref: pnp.py:222-234."""
        nullv = nullv.reshape(nullv.shape[:-1] + (4, 3))
        i = jnp.array((1, 2, 3, 2, 3, 3))
        j = jnp.array((0, 0, 0, 1, 1, 2))
        dv = nullv[..., i, :] - nullv[..., j, :]
        a = jnp.array((0, 0, 1, 0, 1, 2, 0, 1, 2, 3))
        b = jnp.array((0, 1, 1, 2, 2, 2, 3, 3, 3, 3))
        dp = jnp.sum(dv[..., a, :, :] * dv[..., b, :, :], axis=-1)
        m = jnp.array([1, 2, 1, 2, 2, 1, 2, 2, 2, 1], dtype=dp.dtype)
        bi = jnp.array((0, 0, 0, 1, 1, 2))
        bj = jnp.array((1, 2, 3, 2, 3, 3))
        rho = jnp.sum((bases[..., bi, :] - bases[..., bj, :]) ** 2, axis=-1)
        return jnp.swapaxes(dp, -1, -2) * m, rho

    def _compute_betas(self, l_mat, rho):
        """Solve beta for N in {1..4}.  Ref: pnp.py:236-258."""
        betas = jnp.zeros((4,) + rho.shape[:-1] + (4,), dtype=rho.dtype)
        betas = betas.at[0, ..., -1].set(1)
        # N = 2
        L = l_mat[..., jnp.array((5, 8, 9))]
        S = self.solver(L, rho)
        betas = betas.at[1, ..., 2].set(jnp.sqrt(jnp.abs(S[..., 0])))
        betas = betas.at[1, ..., 3].set(
            jnp.sqrt(jnp.abs(S[..., 2])) * jnp.sign(S[..., 1])
            * jnp.sign(S[..., 0]))
        # N = 3
        L = l_mat[..., jnp.array((2, 4, 7, 5, 8, 9))]
        S = self.solver(L, rho)
        betas = betas.at[2, ..., 1].set(jnp.sqrt(jnp.abs(S[..., 0])))
        betas = betas.at[2, ..., 2].set(
            jnp.sqrt(jnp.abs(S[..., 3])) * jnp.sign(S[..., 1])
            * jnp.sign(S[..., 0]))
        betas = betas.at[2, ..., 3].set(
            jnp.sqrt(jnp.abs(S[..., 5])) * jnp.sign(S[..., 2])
            * jnp.sign(S[..., 0]))
        # N = 4
        S = self.solver(l_mat, rho)
        betas = betas.at[3, ..., 0].set(
            jnp.sqrt(jnp.abs(S[..., 9])) * jnp.sign(S[..., 6])
            * jnp.sign(S[..., 0]))
        betas = betas.at[3, ..., 1].set(
            jnp.sqrt(jnp.abs(S[..., 5])) * jnp.sign(S[..., 3])
            * jnp.sign(S[..., 0]))
        betas = betas.at[3, ..., 2].set(
            jnp.sqrt(jnp.abs(S[..., 2])) * jnp.sign(S[..., 1])
            * jnp.sign(S[..., 0]))
        betas = betas.at[3, ..., 3].set(jnp.sqrt(jnp.abs(S[..., 0])))
        return betas

    def _compute_scale(self, bases, alpha, points):
        """Scale and sign fix of the control points.  Ref: pnp.py:260-281."""
        bases = bases.reshape(bases.shape[:-1] + (4, 3))
        transp = alpha @ bases
        dw = jnp.linalg.norm(points - points.mean(axis=-2, keepdims=True),
                             axis=-1)
        dc = jnp.linalg.norm(transp - transp.mean(axis=-2, keepdims=True),
                             axis=-1)
        scale = jnp.sum(dc * dw, axis=-1) / jnp.sum(dc * dc, axis=-1)
        bases = bases * scale[..., None, None]
        scalep = alpha @ bases
        mask = jnp.any(scalep[..., 2] < 0, axis=-1)
        sign = jnp.ones_like(scale) - mask * 2
        scalep = sign[..., None, None] * scalep
        scale = (sign * scale)[..., None]
        return bases, scalep, scale
