r"""Stencil-couple matvec variants at 100k poses: read C once, not twice.

StencilSpMV.couple applies each channel C[k] [N, t, t] twice per matvec
(forward 'ntu,nu->nt' and transposed 'ntu,nt->nu').  einsum lowers to
dot_general, which XLA does not cross-fuse — so C is read TWICE per
iteration (57.6 MB of the ~87 MB measured matvec traffic at N=1e5,
n_off=2, t=6 f32).  Variants measured here, f32 and bf16 channels:

  A. einsum pair (current production form)
  B. mul+sum pair in ONE jnp expression: y1 = sum_u(C * xr[:, None, :]),
     y2 = sum_t(C * x[:, :, None]) — reductions over different axes of
     the same broadcasted product, fusable into a single pass over C
Correctness pinned against A-f32 before timing.

Run:  timeout 900 python tools/couple_variants_prof.py
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

_HI = jax.lax.Precision.HIGHEST

N = 100_000
T = 6
OFFS = (1, 317)


def sync(out):
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])


def warm_time(fn, n_lo=1, n_hi=3, repeats=3):
    sync(fn())
    def block(n):
        best = float('inf')
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best
    return max(block(n_hi) - block(n_lo), 1e-12) / (n_hi - n_lo)


def couple_einsum(C, D, x):
    hi = _HI if C.dtype == jnp.float32 else None
    y = jnp.einsum('ntu,nu->nt', D, x, precision=hi,
                   preferred_element_type=jnp.float32)
    for k, d in enumerate(OFFS):
        xr = jnp.roll(x, -d, axis=0)
        y = y + jnp.einsum('ntu,nu->nt', C[k], xr, precision=hi,
                           preferred_element_type=jnp.float32)
        back = jnp.einsum('ntu,nt->nu', C[k], x, precision=hi,
                          preferred_element_type=jnp.float32)
        y = y + jnp.roll(back, d, axis=0)
    return y


def couple_mulsum(C, D, x):
    Cf = C.astype(jnp.float32) if C.dtype != jnp.float32 else C
    Df = D.astype(jnp.float32) if D.dtype != jnp.float32 else D
    y = jnp.sum(Df * x[:, None, :], axis=-1)
    for k, d in enumerate(OFFS):
        xr = jnp.roll(x, -d, axis=0)
        Ck = Cf[k]
        y = y + jnp.sum(Ck * xr[:, None, :], axis=-1)
        back = jnp.sum(Ck * x[:, :, None], axis=1)
        y = y + jnp.roll(back, d, axis=0)
    return y


def main():
    print('devices:', jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    C = jnp.asarray(rng.standard_normal((len(OFFS), N, T, T)), jnp.float32)
    D = jnp.asarray(rng.standard_normal((N, T, T)), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((N, T)), jnp.float32)

    forms = {
        'einsum.f32': (couple_einsum, C, D),
        'einsum.bf16': (couple_einsum, C.astype(jnp.bfloat16),
                        D.astype(jnp.bfloat16)),
        'mulsum.f32': (couple_mulsum, C, D),
        'mulsum.bf16': (couple_mulsum, C.astype(jnp.bfloat16),
                        D.astype(jnp.bfloat16)),
    }

    # one jitted program per correctness check (eager ops each pay a
    # full tunnel dispatch; and big operands go as ARGUMENTS)
    @jax.jit
    def ref_norm(C, D, x):
        r = couple_einsum(C, D, x)
        return r, jnp.linalg.norm(r)
    ref, rn = jax.block_until_ready(ref_norm(C, D, x0))
    rn = float(rn)
    for name, (fn, Cv, Dv) in forms.items():
        err = float(jax.jit(
            lambda Cv, Dv, x, ref, fn=fn:
            jnp.linalg.norm(fn(Cv, Dv, x) - ref))(Cv, Dv, x0, ref)) / rn

        # big operands as jit ARGUMENTS (closure constants ship in the
        # remote-compile payload — CLAUDE.md HTTP 413 note)
        @functools.partial(jax.jit, static_argnames='iters')
        def chain(Cv, Dv, x, iters, fn=fn):
            def body(i, x):
                y = fn(Cv, Dv, x)
                return y * jax.lax.rsqrt(jnp.sum(y * y) + 1e-30)
            return jax.lax.fori_loop(0, iters, body, x)
        t80 = warm_time(lambda: chain(Cv, Dv, x0, 80))
        t10 = warm_time(lambda: chain(Cv, Dv, x0, 10))
        us = (t80 - t10) / 70 * 1e6
        print(f'[{name}] {us:.1f} us/matvec  (rel err vs einsum.f32: '
              f'{err:.2e})')


if __name__ == '__main__':
    main()
