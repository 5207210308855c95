r"""Einsum-CG layout/dtype ladder at 100k poses: the remaining levers
after the r4 roofline analysis (tools/fused_cg_prof.py) showed the
[N, t] f32 einsum CG is glue-traffic-bound (~105 MB/iter), so only BYTE
reduction can win — operand dtype (bf16 channel storage, f32 iterate +
f32 accumulation) and/or state layout ([t, N] lane-major, which keeps
every CG vector unpadded instead of lane-padding [N, 6] 21x).

Variants (identical math, same preconditioned CG recurrence):
    A  [N, t] state, f32 operands      <- SparseLM's current einsum CG
    B  [N, t] state, bf16 C/A/Minv     <- halves the operand bytes
    C  [t, N] state, f32 operands      <- unpads the state vectors
    D  [t, N] state, bf16 C/A/Minv     <- both

The r3 [t, N] attempt lost (283 us/iter) because its _block_mul sliced
t*t scalar channels; here the [t, N] matvec is ONE einsum
('tun,un->tn') XLA can fuse.

Usage: timeout 900 python tools/cg_layout_prof.py   (takes the TPU tunnel)
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

_HI = jax.lax.Precision.HIGHEST


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(jnp.sum(leaf))


def timed(f, *args, iters=5, warmup=1):
    for _ in range(warmup):
        out = f(*args)
    _sync(out)
    best = float('inf')
    for _ in range(iters):
        t0 = time.perf_counter()
        out = f(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print('devices:', jax.devices(), file=sys.stderr, flush=True)
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    t = 6
    offsets = (1, 347 % N)
    rng = np.random.default_rng(0)

    sym = rng.standard_normal((N, t, t)).astype(np.float32) * 0.1
    Ablk = 10.0 * np.eye(t, dtype=np.float32) + sym + sym.transpose(0, 2, 1)
    C = rng.standard_normal((len(offsets), N, t, t)).astype(np.float32) * 0.8
    b = rng.standard_normal((N, t)).astype(np.float32)
    Minv = np.linalg.inv(Ablk).astype(np.float32)
    Ablk, C, b, Minv = map(jnp.asarray, (Ablk, C, b, Minv))

    # ---------------- [N, t] state ----------------
    def make_nt(op_dtype):
        cast = (lambda a: a.astype(op_dtype)) if op_dtype else (lambda a: a)
        A_, C_, M_ = cast(Ablk), cast(C), cast(Minv)
        hi = None if op_dtype else _HI

        def mv(Mat, x):
            return jnp.einsum('ntu,nu->nt', Mat, x, precision=hi,
                              preferred_element_type=jnp.float32)

        def Avp(x):
            y = mv(A_, x)
            for k, d in enumerate(offsets):
                y = y + mv(C_[k], jnp.roll(x, -d, axis=0))
                back = jnp.einsum('ntu,nt->nu', C_[k], x, precision=hi,
                                  preferred_element_type=jnp.float32)
                y = y + jnp.roll(back, d, axis=0)
            return y

        @functools.partial(jax.jit, static_argnames='maxiter')
        def cg(b, maxiter):
            r0 = b
            z0 = mv(M_, r0)
            gamma0 = jnp.sum(r0 * z0)

            def cond(st):
                return st[-1] < maxiter

            def body(st):
                x, r, z, p, gamma, it = st
                Ap = Avp(p)
                pAp = jnp.sum(p * Ap)
                alpha = gamma / jnp.where(pAp == 0, 1.0, pAp)
                x = x + alpha * p
                r = r - alpha * Ap
                z = mv(M_, r)
                gn = jnp.sum(r * z)
                beta = gn / jnp.where(gamma == 0, 1.0, gamma)
                p = z + beta * p
                return (x, r, z, p, gn, it + 1)

            st = (jnp.zeros_like(b), r0, z0, z0, gamma0,
                  jnp.asarray(0, jnp.int32))
            return jax.lax.while_loop(cond, body, st)[0]

        return cg

    # ---------------- [t, N] state ----------------
    A_T = jnp.transpose(Ablk, (1, 2, 0))            # [t, u, N]
    C_T = jnp.transpose(C, (0, 2, 3, 1))            # [n_off, t, u, N]
    M_T = jnp.transpose(Minv, (1, 2, 0))
    b_T = b.T                                       # [t, N]

    def make_tn(op_dtype):
        cast = (lambda a: a.astype(op_dtype)) if op_dtype else (lambda a: a)
        A_, C_, M_ = cast(A_T), cast(C_T), cast(M_T)
        hi = None if op_dtype else _HI

        def mv(Mat, x):                              # [t,u,N],[u,N]->[t,N]
            return jnp.einsum('tun,un->tn', Mat, x, precision=hi,
                              preferred_element_type=jnp.float32)

        def Avp(x):
            y = mv(A_, x)
            for k, d in enumerate(offsets):
                y = y + mv(C_[k], jnp.roll(x, -d, axis=1))
                back = jnp.einsum('tun,tn->un', C_[k], x, precision=hi,
                                  preferred_element_type=jnp.float32)
                y = y + jnp.roll(back, d, axis=1)
            return y

        @functools.partial(jax.jit, static_argnames='maxiter')
        def cg(b, maxiter):
            r0 = b
            z0 = mv(M_, r0)
            gamma0 = jnp.sum(r0 * z0)

            def cond(st):
                return st[-1] < maxiter

            def body(st):
                x, r, z, p, gamma, it = st
                Ap = Avp(p)
                pAp = jnp.sum(p * Ap)
                alpha = gamma / jnp.where(pAp == 0, 1.0, pAp)
                x = x + alpha * p
                r = r - alpha * Ap
                z = mv(M_, r)
                gn = jnp.sum(r * z)
                beta = gn / jnp.where(gamma == 0, 1.0, gamma)
                p = z + beta * p
                return (x, r, z, p, gn, it + 1)

            st = (jnp.zeros_like(b), r0, z0, z0, gamma0,
                  jnp.asarray(0, jnp.int32))
            return jax.lax.while_loop(cond, body, st)[0]

        return cg

    variants = [
        ('A nt-f32', make_nt(None), b),
        ('B nt-bf16', make_nt(jnp.bfloat16), b),
        ('C tn-f32', make_tn(None), b_T),
        ('D tn-bf16', make_tn(jnp.bfloat16), b_T),
    ]
    x_ref = None
    for name, cg, bb in variants:
        t10 = timed(lambda: cg(bb, maxiter=10))
        t100 = timed(lambda: cg(bb, maxiter=100))
        per = (t100 - t10) / 90
        x = cg(bb, maxiter=100)
        x = x if x.shape == (N, t) else x.T
        if x_ref is None:
            x_ref = x
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(x - x_ref))
                        / jnp.max(jnp.abs(x_ref)))
        print(f'[{name}] per-iter {per*1e6:7.1f} us, fixed '
              f'{1e3*(t10 - 10*per):6.2f} ms, rel err vs A {err:.2e}',
              file=sys.stderr, flush=True)


if __name__ == '__main__':
    main()
