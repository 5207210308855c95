r"""Profile the SparseLM CG matvec on the real TPU: break the 135 us/iter
frontier (round-1 measurement) into gather / block-product / accumulate
components, and compare accumulation formulations:

  A. incidence-gather (current default; N*D row gathers)
  B. scatter-add (.at[idx].add)
  C. tile-sorted one-hot matmul (zero gathers on the accumulate side:
     contributions pre-sorted by node tile, segment-sum as a static
     bf16 one-hot einsum)

Run:  python tools/matvec_prof.py   (takes the TPU tunnel — nothing else
may be using it)
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')

_HI = jax.lax.Precision.HIGHEST


def timeit(f, *args, iters=50, warmup=2):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    print('devices:', jax.devices())
    from pypose_tpu.datasets import synthetic_sphere
    ds = synthetic_sphere(2500)
    N = 2500
    edges = np.asarray(ds['edges'])
    E = edges.shape[0]
    print(f'sphere2500: N={N} E={E}')

    rng = np.random.default_rng(0)
    J = jnp.asarray(rng.normal(size=(E, 6, 2, 6)), jnp.float32)
    Jm = J.reshape(E, 6, 12)
    x = jnp.asarray(rng.normal(size=(N, 6)), jnp.float32)
    ej = jnp.asarray(edges)

    # ---- component: x row gather ----
    @jax.jit
    def gather_x(x):
        return x[ej]  # [E, 2, 6]

    t = timeit(gather_x, x)
    print(f'gather_x ({2*E} rows of 24B): {t*1e6:.1f} us '
          f'= {t/(2*E)*1e9:.2f} ns/row')

    # ---- component: block product (both sides) ----
    xg = gather_x(x)

    @jax.jit
    def products(xg):
        Jx = jnp.einsum('eij,ej->ei', Jm, xg.reshape(E, 12), precision=_HI)
        contrib = jnp.einsum('eij,ei->ej', Jm, Jx,
                             precision=_HI).reshape(E, 2, 6)
        return contrib

    t = timeit(products, xg)
    print(f'block products (2x [E,6,12] bmm): {t*1e6:.1f} us')
    contrib = products(xg)
    flatc = contrib.reshape(-1, 6)

    # ---- accumulate A: incidence gather ----
    flat_idx = edges.reshape(-1)
    deg = np.bincount(flat_idx, minlength=N)
    D = int(deg.max())
    inc = np.zeros((N, D), np.int32)
    mask = np.zeros((N, D), bool)
    fill = np.zeros(N, np.int64)
    for p, node in enumerate(flat_idx):
        inc[node, fill[node]] = p
        mask[node, fill[node]] = True
        fill[node] += 1
    inc_j = jnp.asarray(inc)
    mask_j = jnp.asarray(mask)
    print(f'incidence: D={D} mean_deg={deg.mean():.1f} '
          f'gather rows={N*D}')

    @jax.jit
    def acc_incidence(flatc):
        g = flatc[inc_j]                    # [N, D, 6]
        return jnp.sum(jnp.where(mask_j[..., None], g, 0), axis=1)

    tA = timeit(acc_incidence, flatc)
    print(f'accumulate A (incidence gather): {tA*1e6:.1f} us '
          f'= {tA/(N*D)*1e9:.2f} ns/row')

    # ---- accumulate B: scatter-add ----
    fi = jnp.asarray(flat_idx)

    @jax.jit
    def acc_scatter(flatc):
        return jnp.zeros((N, 6), flatc.dtype).at[fi].add(flatc)

    tB = timeit(acc_scatter, flatc)
    print(f'accumulate B (scatter-add): {tB*1e6:.1f} us')

    # ---- accumulate C: tile-sorted one-hot matmul ----
    TILE = 128
    T = (N + TILE - 1) // TILE
    order = np.argsort(flat_idx, kind='stable')
    sorted_ids = flat_idx[order]
    # rows per tile, padded to common K
    tile_of = sorted_ids // TILE
    counts = np.bincount(tile_of, minlength=T)
    K = int(counts.max())
    perm = np.zeros((T, K), np.int64)
    valid = np.zeros((T, K), bool)
    pos = np.zeros(T, np.int64)
    for r, tl in zip(order, tile_of):
        perm[tl, pos[tl]] = r
        valid[tl, pos[tl]] = True
        pos[tl] += 1
    # static one-hot [T, TILE, K] in bf16 (0/1 exact)
    onehot = np.zeros((T, TILE, K), np.float32)
    for tl in range(T):
        for k in range(int(pos[tl])):
            node = flat_idx[perm[tl, k]]
            onehot[tl, node - tl * TILE, k] = 1.0
    onehot_f32 = jnp.asarray(onehot, jnp.float32)
    perm_j = jnp.asarray(perm.reshape(-1))
    print(f'one-hot tiles: T={T} K={K} onehot {onehot_f32.nbytes/1e6:.1f} MB'
          f' perm gather rows={T*K}')

    @jax.jit
    def acc_onehot(flatc):
        cp = flatc[perm_j].reshape(T, K, 6)
        out = jnp.einsum('tnk,tkd->tnd', onehot_f32, cp,
                         preferred_element_type=jnp.float32)
        return out.reshape(T * TILE, 6)[:N]

    tC = timeit(acc_onehot, flatc)
    print(f'accumulate C (perm gather + one-hot matmul): {tC*1e6:.1f} us')

    # check C == A
    a = acc_incidence(flatc)
    c = acc_onehot(flatc)
    err = float(jnp.max(jnp.abs(a - c)))
    print(f'max |A - C| = {err:.2e} (bf16 one-hot, f32 accum)')

    # ---- full matvec variants ----
    @jax.jit
    def matvec_inc(x):
        xg = x[ej].reshape(E, 12)
        Jx = jnp.einsum('eij,ej->ei', Jm, xg, precision=_HI)
        c = jnp.einsum('eij,ei->ej', Jm, Jx, precision=_HI).reshape(-1, 6)
        g = c[inc_j]
        return jnp.sum(jnp.where(mask_j[..., None], g, 0), axis=1)

    @jax.jit
    def matvec_scatter(x):
        xg = x[ej].reshape(E, 12)
        Jx = jnp.einsum('eij,ej->ei', Jm, xg, precision=_HI)
        c = jnp.einsum('eij,ei->ej', Jm, Jx, precision=_HI).reshape(-1, 6)
        return jnp.zeros((N, 6), x.dtype).at[fi].add(c)

    # C with J pre-sorted into padded tile order: NO perm gather at all —
    # products run directly in [T*K] order, endpoints gathered once
    Jp = jnp.asarray(np.asarray(Jm)[perm.reshape(-1) // 2],
                     jnp.float32)  # [T*K, 6, 12]
    slot = jnp.asarray(perm.reshape(-1) % 2)
    epts = jnp.asarray(edges[perm.reshape(-1) // 2])  # [T*K, 2]
    validf = jnp.asarray(valid.reshape(-1, 1), jnp.float32)

    @jax.jit
    def matvec_onehot(x):
        xg = x[epts].reshape(-1, 12)                       # [T*K, 12]
        Jx = jnp.einsum('eij,ej->ei', Jp, xg, precision=_HI)
        slot_sel = jnp.stack([1.0 - slot, slot], 1).astype(x.dtype)
        c = jnp.einsum('eij,ei->ej', Jp, Jx, precision=_HI)
        c = (c.reshape(-1, 2, 6) * slot_sel[..., None]).sum(1) * validf
        cp = c.reshape(T, K, 6).astype(jnp.bfloat16)
        out = jnp.einsum('tnk,tkd->tnd', onehot_f32, cp,
                         preferred_element_type=jnp.float32)
        return out.reshape(T * TILE, 6)[:N]

    # correctness
    ref = matvec_inc(x)
    for name, f in [('scatter', matvec_scatter), ('onehot', matvec_onehot)]:
        err = float(jnp.max(jnp.abs(ref - f(x))))
        print(f'matvec {name} max err vs incidence: {err:.2e}')

    for name, f in [('incidence', matvec_inc), ('scatter', matvec_scatter),
                    ('onehot-sorted', matvec_onehot)]:
        t = timeit(f, x)
        print(f'FULL matvec [{name}] (per-dispatch, tunnel-bound): '
              f'{t*1e6:.1f} us')

    # ---- device-side loops: ONE dispatch, R chained matvecs ----
    # (per-call dispatch through the remote tunnel is ~0.7-1.4 ms and
    # swamps the ~100 us kernels above; this is the honest measurement)
    R = 200

    def chain(f):
        @jax.jit
        def run(x):
            def body(i, x):
                y = f(x)
                return y / (jnp.linalg.norm(y) + 1.0)
            return jax.lax.fori_loop(0, R, body, x)
        return run

    print(f'--- device-side loops ({R} chained matvecs, one dispatch) ---')
    for name, f in [('incidence', matvec_inc), ('scatter', matvec_scatter),
                    ('onehot-sorted', matvec_onehot)]:
        run = chain(f)
        t = timeit(run, x, iters=5)
        print(f'CHAINED matvec [{name}]: {t/R*1e6:.2f} us/matvec')

    # components, chained the same way (keep shapes closed: feed a vector
    # through each stage and reduce back to x-shape cheaply)
    @jax.jit
    def chain_gather(x):
        def body(i, x):
            xg = x[ej]                       # [E, 2, 6]
            return x + 1e-9 * xg.sum() # consume
        return jax.lax.fori_loop(0, R, body, x)

    t = timeit(chain_gather, x, iters=5)
    print(f'CHAINED gather_x-only: {t/R*1e6:.2f} us '
          f'({t/R/(2*E)*1e9:.2f} ns/row)')

    @jax.jit
    def chain_acc_inc(c0):
        def body(i, c):
            g = c.reshape(-1, 6)[inc_j]
            s = jnp.sum(jnp.where(mask_j[..., None], g, 0), axis=1)
            return c + 1e-9 * s.sum()
        return jax.lax.fori_loop(0, R, body, c0)

    t = timeit(chain_acc_inc, flatc, iters=5)
    print(f'CHAINED accumulate-incidence-only: {t/R*1e6:.2f} us '
          f'({t/R/(N*D)*1e9:.2f} ns/row)')

    @jax.jit
    def chain_products(xg0):
        def body(i, xg):
            Jx = jnp.einsum('eij,ej->ei', Jm, xg.reshape(E, 12),
                            precision=_HI)
            c = jnp.einsum('eij,ei->ej', Jm, Jx, precision=_HI)
            return xg + 1e-9 * c.sum()
        return jax.lax.fori_loop(0, R, body, xg0)

    t = timeit(chain_products, xg, iters=5)
    print(f'CHAINED products-only: {t/R*1e6:.2f} us')

    @jax.jit
    def chain_acc_onehot(c0):
        def body(i, c):
            cp = c.reshape(-1, 6)[perm_j].reshape(T, K, 6)
            out = jnp.einsum('tnk,tkd->tnd', onehot_f32, cp,
                             preferred_element_type=jnp.float32)
            return c + 1e-9 * out.sum()
        return jax.lax.fori_loop(0, R, body, c0)

    t = timeit(chain_acc_onehot, flatc, iters=5)
    print(f'CHAINED accumulate-onehot-only: {t/R*1e6:.2f} us')

    # =================================================================
    # COUPLING-BLOCK formulation: y = D x + sum_e (C_e x_j -> i) + (C_e^T
    # x_i -> j), with D and C precomputed ONCE PER LM STEP (J is constant
    # across a CG solve), chain edges as pure slices, loop edges as small
    # gathers + one-hot accumulation.
    # =================================================================
    Ji = J[:, :, 0, :]                      # [E, 6, 6]
    Jj = J[:, :, 1, :]
    chain_mask = (edges[:, 1] == edges[:, 0] + 1) & \
        (np.arange(E) < N - 1)              # sphere: first N-1 are chain
    Ec = int(chain_mask.sum())
    loops = ~chain_mask
    El = int(loops.sum())
    print(f'coupling split: {Ec} chain edges, {El} loop edges')

    @jax.jit
    def precompute(Ji, Jj):
        # per-edge coupling + per-node diagonal blocks
        C = jnp.einsum('edt,edu->etu', Ji, Jj, precision=_HI)   # [E,6,6]
        Dii = jnp.einsum('edt,edu->etu', Ji, Ji, precision=_HI)
        Djj = jnp.einsum('edt,edu->etu', Jj, Jj, precision=_HI)
        Dn = jnp.zeros((N, 6, 6), jnp.float32)
        Dn = Dn.at[ej[:, 0]].add(Dii).at[ej[:, 1]].add(Djj)
        return C, Dn

    C, Dn = precompute(Ji, Jj)
    t = timeit(precompute, Ji, Jj, iters=20)
    print(f'coupling precompute (once per LM step): {t*1e6:.1f} us')

    # static loop-edge tiling (both directions)
    def build_tiles(node_ids):
        order = np.argsort(node_ids, kind='stable')
        tile_of = node_ids[order] // TILE
        counts = np.bincount(tile_of, minlength=T)
        Kl = max(int(counts.max()), 1)
        prm = np.zeros((T, Kl), np.int64)
        oh = np.zeros((T, TILE, Kl), np.float32)
        pos = np.zeros(T, np.int64)
        for r, tl in zip(order, tile_of):
            prm[tl, pos[tl]] = r
            oh[tl, node_ids[r] - tl * TILE, pos[tl]] = 1.0
            pos[tl] += 1
        return jnp.asarray(prm.reshape(-1)), jnp.asarray(oh), Kl

    li = edges[loops, 0]
    lj = edges[loops, 1]
    perm_i, oh_i, Ki_ = build_tiles(li)
    perm_j2, oh_j, Kj_ = build_tiles(lj)
    lsrc_j = jnp.asarray(lj)   # x source rows for dir i<-j
    lsrc_i = jnp.asarray(li)
    Cl = C[jnp.asarray(np.nonzero(loops)[0])]
    Cc = C[jnp.asarray(np.nonzero(chain_mask)[0])]
    ci0 = int(edges[chain_mask, 0].min())  # chain is contiguous 0..Ec
    print(f'loop tiles: Ki={Ki_} Kj={Kj_}')

    @jax.jit
    def matvec_coupling(x):
        # block-diagonal part: zero gathers
        y = jnp.einsum('ntu,nu->nt', Dn, x, precision=_HI)
        # chain couplings: pure slices
        xi = x[ci0:ci0 + Ec]
        xj = x[ci0 + 1:ci0 + 1 + Ec]
        yi = jnp.einsum('etu,eu->et', Cc, xj, precision=_HI)
        yj = jnp.einsum('etu,et->eu', Cc, xi, precision=_HI)
        y = y.at[ci0:ci0 + Ec].add(yi)
        y = y.at[ci0 + 1:ci0 + 1 + Ec].add(yj)
        # loop couplings: E_l-row gathers + one-hot accumulate
        ci_ = jnp.einsum('etu,eu->et', Cl, x[lsrc_j], precision=_HI)
        cj_ = jnp.einsum('etu,et->eu', Cl, x[lsrc_i], precision=_HI)
        pi_ = ci_[perm_i].reshape(T, Ki_, 6)
        pj_ = cj_[perm_j2].reshape(T, Kj_, 6)
        acc_i = jnp.einsum('tnk,tkd->tnd', oh_i, pi_, precision=_HI,
                           preferred_element_type=jnp.float32)
        acc_j = jnp.einsum('tnk,tkd->tnd', oh_j, pj_, precision=_HI,
                           preferred_element_type=jnp.float32)
        y = y + acc_i.reshape(-1, 6)[:N] + acc_j.reshape(-1, 6)[:N]
        return y

    err = float(jnp.max(jnp.abs(ref - matvec_coupling(x))))
    print(f'matvec coupling max err vs incidence: {err:.2e}')
    run = chain(matvec_coupling)
    t = timeit(run, x, iters=5)
    print(f'CHAINED matvec [coupling]: {t/R*1e6:.2f} us/matvec')


if __name__ == '__main__':
    main()
