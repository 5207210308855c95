"""Benchmark harness: prints ONE JSON line to stdout.

Headline metric: sphere2500 pose-graph LM time-to-convergence on one chip
(warm, post-compile), vs the 5 s baseline target (BASELINE.json).
Secondary metrics (SE3 Exp/Log+Jacobian throughput at 1e5 batch) go to
stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Compact per-section results, re-printed as a [summary] block at the
# very END of the run: the driver records only the LAST ~2000 chars of
# the stream (BENCH_r04's tail began mid-headline), so numbers logged
# when a section RUNS are invisible unless repeated at the end.
_SUMMARY = []


def record(tag, text):
    _SUMMARY.append(f'{tag}: {text}')


def sync_get(out):
    """Force REAL completion of every enqueued program.

    Through the remote-TPU tunnel, jax.block_until_ready RETURNS BEFORE
    EXECUTION (measured r3: 8 calls of a 1.4 s program each "blocked" in
    ~0.1 ms until a device_get drained the queue) — block-only timing
    measures dispatch rate, not compute.  Fetching one element of the
    last output is the only reliable sync."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0])


def warm_time(fn, n_lo=1, n_hi=3, repeats=3):
    """Warm per-call seconds, device_get-synced; the ~25 ms tunnel
    roundtrip is cancelled by differencing two block sizes.  MIN over
    repeated blocks (the tunnel injects multi-ms stalls at random)."""
    sync_get(fn())  # compile + drain before timing

    def block(n):
        best = float('inf')
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            sync_get(out)
            best = min(best, time.perf_counter() - t0)
        return best

    return max(block(n_hi) - block(n_lo), 1e-12) / (n_hi - n_lo)


def microbench_lieops(batch=100_000, iters=50):
    import pypose_tpu as pp
    from pypose_tpu.lietensor.jacobian import se3_Jl

    x = pp.randn_se3(batch, key=jax.random.PRNGKey(0))
    X = x.Exp()
    p = jax.random.normal(jax.random.PRNGKey(1), (batch, 3))

    # the whole repetition loop runs ON DEVICE (fori_loop with a data
    # dependency between iterations) so the measurement is device
    # throughput, not per-dispatch tunnel latency (~20 ms jitter/call)
    @jax.jit
    def fused_loop(xd, Xd, p):
        def body(_, carry):
            xd, Xd, p = carry
            xl = pp.se3(xd)
            Xl = pp.SE3(Xd)
            y = xl.Exp()            # Exp
            z = Xl.Log()            # Log
            J = se3_Jl(z.tensor())  # analytic 6x6 left Jacobian
            q = y.Act(p)            # action
            # thread outputs back in (prevents loop-invariant hoisting)
            return (z.tensor() + J[..., 0, 0:6] * 1e-20,
                    y.tensor(), p + q * 1e-20)
        return jax.lax.fori_loop(0, iters, body, (xd, Xd, p))

    # ALL micro timings: best-of-REPEATS blocks that END IN A device_get.
    # Through the remote tunnel, jax.block_until_ready RETURNS BEFORE
    # EXECUTION (measured r3: 8 calls of a 1.4 s program each "blocked" in
    # ~0.1 ms until a device_get drained the queue) — block-only timing
    # measures dispatch rate, not compute.  Each block therefore syncs by
    # fetching ONE element of the last output; the ~25 ms roundtrip it
    # costs is cancelled by differencing two block sizes.  MIN over
    # repeated blocks remains the only stable statistic (the same program
    # varies up to 30x call-to-call on a jittery night).
    REPEATS = 5

    def per_call(fn, n_lo, n_hi):
        return warm_time(fn, n_lo, n_hi, repeats=REPEATS)

    args = (x.tensor(), X.tensor(), p)
    dt = per_call(lambda: fused_loop(*args), 1, 5) / iters
    ops_per_sec = batch / dt
    log(f'[micro] SE3 Exp+Log+Jl+Act chained x{iters} on device: '
        f'{dt*1e3:.4f} ms/iter = {ops_per_sec:.3e} group-elem/s '
        f'(carry stays VMEM-resident — the fused-chain regime; '
        f'best of {REPEATS}, device_get-synced)')
    record('micro-chain', f'{ops_per_sec:.2e} group-elem/s '
           f'(SE3 Exp+Log+Jl+Act, device-looped)')

    # HBM-resident single-shot (dispatch-loop) variant: each call reads
    # inputs from and writes outputs to HBM — the roofline regime.
    @jax.jit
    def fused(xd, Xd, p):
        xl = pp.se3(xd)
        Xl = pp.SE3(Xd)
        y = xl.Exp()
        z = Xl.Log()
        J = se3_Jl(z.tensor())
        q = y.Act(p)
        return y.tensor(), z.tensor(), J, q

    dt_h = per_call(lambda: fused(*args), 20, 120)
    log(f'[micro] SE3 Exp+Log+Jl+Act single-shot (HBM-resident): '
        f'{dt_h*1e3:.3f} ms/iter = {batch/dt_h:.3e} group-elem/s '
        f'(best of {REPEATS}, device_get-synced)')

    # jacobian of Act w.r.t. pose tangent via vmapped jacrev
    @jax.jit
    def jac(Xd, p):
        f = lambda X_, p_: pp.SE3(X_).Act(p_)
        return jax.vmap(jax.jacrev(f))(Xd, p)

    dtj = per_call(lambda: jac(X.tensor(), p), 20, 120)
    log(f'[micro] vmapped jacrev(Act) @ {batch}: {dtj*1e3:.3f} ms/iter '
        f'= {batch/dtj:.3e} jac/s (best of {REPEATS}, device_get-synced)')
    record('micro-jacrev', f'{batch/dtj:.2e} SE3-Act Jacobians/s @ 100k')
    return batch / dt_h


def _sphere2500_problem():
    """The headline problem, loaded through the REAL g2o IO path: a
    vendored sphere2500.g2o when present (drop into data/), else the
    synthetic graph round-tripped through g2o text + the native C++
    parser (same format, same loader)."""
    import os
    import tempfile
    from pypose_tpu.datasets import (find_data, load_g2o, save_g2o,
                                     synthetic_sphere)
    real = find_data('sphere2500.g2o')
    if real:
        return load_g2o(real), f'real g2o file {real}'
    ds = synthetic_sphere(2500)
    path = os.path.join(tempfile.gettempdir(), 'ppt_sphere2500.g2o')
    save_g2o(path, ds['nodes'], ds['edges'], ds['poses'], ds['infos'])
    parsed = load_g2o(path)
    return parsed, 'synthetic_sphere(2500) via g2o round-trip (native parser)'


def _reference_anchor(n=2500):
    """Vendored reference-computed chi2 target (tools/ref_anchor.py runs
    the actual PyTorch reference on the identical problem)."""
    import json
    from pypose_tpu.datasets import find_data
    p = find_data(f'ref_anchor_sphere{n}.json')
    if p is None:
        return None
    with open(p) as f:
        return json.load(f)


def bench_pgo_sphere2500():
    import jax.numpy as jnp
    from pypose_tpu.datasets import synthetic_sphere
    from pypose_tpu.optim.sparse import (SparseLM, pgo_factor,
                                         split_chain_edges)
    from pypose_tpu.optim.strategy import TrustRegion

    ds, provenance = _sphere2500_problem()
    log(f'[pgo] problem: {provenance}')
    n = ds['nodes'].lshape[0]
    fixed = {'poses': jnp.zeros(n, bool).at[0].set(True)}
    edges = jnp.asarray(ds['edges'])
    runs, rest = split_chain_edges(edges)
    factors = [pgo_factor(edges[jnp.asarray(r)], ds['poses'][jnp.asarray(r)])
               for r in runs]
    factors.append(pgo_factor(edges[jnp.asarray(rest)],
                              ds['poses'][jnp.asarray(rest)]))
    def mk(cg_iter, cg_tol):
        return SparseLM({'poses': ds['nodes']}, factors,
                        strategy=TrustRegion(radius=1e4), fixed=fixed,
                        cg_iter=cg_iter, cg_tol=cg_tol)

    # two-phase schedule: fast LM steps to the basin, then polish steps
    # with deep CG (the reference's Cholesky solves are exact; inexact-CG
    # LM needs tighter solves to match its converged tail)
    opt, opt2 = mk(150, 1e-9), mk(1200, 1e-9)

    # cold: compile + converge
    t0 = time.perf_counter()
    opt.optimize(steps=6, decreasing=1e-6, patience=2)
    opt2.params, opt2.strategy_state = opt.params, opt.strategy_state
    opt2.optimize(steps=6, decreasing=1e-7, patience=2)
    log(f'[pgo] cold: compile+optimize in {time.perf_counter()-t0:.1f}s, '
        f'chi2 {opt.history[0]:.4e} -> {opt2.history[-1]:.6e}')

    # target chi2: the PyTorch reference's converged value on the identical
    # problem (LM+Cholesky+TrustRegion+StopOnPlateau, tools/ref_anchor.py),
    # NOT our own plateau.  1e-4 relative slack covers f32 summation-order
    # noise (27k residual terms; the reference itself runs f32).
    anchor = _reference_anchor(2500)
    if anchor is not None:
        ref_chi2 = anchor['final_chi2'] * (1 + 1e-4)
        log(f'[pgo] target chi2 {anchor["final_chi2"]:.6e} (+1e-4 rel) '
            f'provenance: {anchor["provenance"]} ({anchor["reference"]}, '
            f'{anchor["dtype"]}, {anchor["wall_seconds"]:.0f}s on CPU); '
            f'ref history {["%.4e" % h for h in anchor["history"]]}')
    else:
        ref_chi2 = opt2.history[-1] * 1.01
        log(f'[pgo] target chi2 {ref_chi2:.6e} provenance: SELF-PLATEAU '
            'fallback (no data/ref_anchor_sphere2500.json vendored)')

    # warm: reset problem state, rerun the fully-device-side optimize loops
    opt.params = {'poses': ds['nodes']}
    opt.strategy_state = opt.strategy.init(jnp.float32)
    t0 = time.perf_counter()
    opt.optimize(steps=6, decreasing=1e-6, patience=2)
    t1 = time.perf_counter()
    opt2.params, opt2.strategy_state = opt.params, opt.strategy_state
    chi2 = opt2.optimize(steps=6, decreasing=1e-7, patience=2)
    t2 = time.perf_counter()
    history = list(opt.history) + list(opt2.history)
    n1, n2 = len(opt.history), len(opt2.history)
    # time-to-target: first step whose chi2 beats the reference's converged
    # value (per-step time attributed uniformly within each phase: the
    # loops run on device as single programs)
    hit = next((i + 1 for i, h in enumerate(history) if h <= ref_chi2),
               None)
    if hit is None:
        log(f'[pgo] WARNING: reference chi2 {ref_chi2:.6e} NOT reached; '
            f'best {min(history):.6e}')
        t_to_target = t2 - t0
        hit = len(history)
    elif hit <= n1:
        t_to_target = (t1 - t0) * hit / n1
    else:
        t_to_target = (t1 - t0) + (t2 - t1) * (hit - n1) / n2
    log(f'[pgo] warm: {n1}+{n2} device-side LM steps in {t2-t0:.3f}s '
        f'({(t2-t0)/(n1+n2)*1e3:.1f} ms/step); chi2 {chi2:.6e}; '
        f'target {ref_chi2:.6e} hit at step {hit} (~{t_to_target:.3f}s)')
    record('pgo', f'sphere2500 {(t2-t0)/(n1+n2)*1e3:.1f} ms/LM-step, '
           f'ref chi2 hit at step {hit} (~{t_to_target:.3f}s)')
    return t_to_target, chi2


def bench_pgo_weighted():
    """Information-weighted sphere2500 (real g2o graphs carry 6x6
    information matrices; exercises the weighted normal equations at
    full scale).  Split from the headline so the deadline scheduler can
    order it by evidence value."""
    from pypose_tpu.datasets import synthetic_sphere
    from pypose_tpu.optim.sparse import (SparseLM, pgo_factor,
                                         split_chain_edges)
    from pypose_tpu.optim.strategy import TrustRegion

    dsw = synthetic_sphere(2500, info='natural')
    n = dsw['nodes'].lshape[0]
    fixed = {'poses': jnp.zeros(n, bool).at[0].set(True)}
    edges = jnp.asarray(dsw['edges'])
    runs, rest = split_chain_edges(edges)
    def mkw(cg_iter, cg_tol):
        return SparseLM({'poses': dsw['nodes']},
                        [pgo_factor(edges[jnp.asarray(r)],
                                    dsw['poses'][jnp.asarray(r)],
                                    dsw['infos'][jnp.asarray(r)])
                         for r in runs] +
                        [pgo_factor(edges[jnp.asarray(rest)],
                                    dsw['poses'][jnp.asarray(rest)],
                                    dsw['infos'][jnp.asarray(rest)])],
                        strategy=TrustRegion(radius=1e4), fixed=fixed,
                        cg_iter=cg_iter, cg_tol=cg_tol)
    optw, optw2 = mkw(150, 1e-9), mkw(1200, 1e-9)
    t0 = time.perf_counter()
    optw.optimize(steps=6, decreasing=1e-6, patience=2)
    optw2.params, optw2.strategy_state = optw.params, optw.strategy_state
    lossw = optw2.optimize(steps=6, decreasing=1e-7, patience=2)
    dtw = time.perf_counter() - t0
    whist = list(optw.history) + list(optw2.history)
    wanchor = _reference_anchor('2500_weighted')
    if wanchor is not None and wanchor.get('final_weighted_chi2'):
        wtarget = wanchor['final_weighted_chi2'] * (1 + 1e-4)
        hit = next((i + 1 for i, h in enumerate(whist) if h <= wtarget),
                   None)
        status = f'hit at step {hit}' if hit else \
            f'NOT HIT (best {min(whist):.6e})'
        log(f'[pgo-weighted] info-weighted sphere2500 (natural 6x6 infos): '
            f'{len(whist)} steps (compile+run {dtw:.1f}s), weighted chi2 '
            f'{whist[0]:.4e} -> {lossw:.6e}; target '
            f'{wanchor["final_weighted_chi2"]:.6e} (+1e-4 rel) {status}; '
            f'provenance: {wanchor["provenance"]} ({wanchor["reference"]}, '
            f'{wanchor["wall_seconds"]:.0f}s on CPU)')
    else:
        log(f'[pgo-weighted] info-weighted sphere2500 (natural 6x6 infos): '
            f'{len(whist)} steps (compile+run {dtw:.1f}s), '
            f'weighted chi2 {whist[0]:.4e} -> {lossw:.6e} '
            f'(no reference anchor vendored: run '
            f'tools/ref_anchor.py --n 2500 --weighted)')
    whit = None
    if wanchor is not None and wanchor.get('final_weighted_chi2'):
        wt = wanchor['final_weighted_chi2'] * (1 + 1e-4)
        whit = next((i + 1 for i, h in enumerate(whist) if h <= wt), None)
    record('pgo-weighted', f'chi2 {whist[0]:.3e} -> {lossw:.4e}'
           + (f', ref target hit at step {whit}' if whit else ''))


def bench_ba():
    """Secondary: Schur-complement BA on a synthetic BAL-style problem."""
    from pypose_tpu.datasets import synthetic_bal
    from pypose_tpu.optim.ba import BundleAdjustment

    ds = synthetic_bal(n_cams=64, n_points=8000, obs_per_point=6)
    O = ds['pixels'].shape[0]
    ba = BundleAdjustment(ds['poses'], ds['points'], ds['cam_idx'],
                          ds['pt_idx'], ds['pixels'], ds['cameras'],
                          fix_first_pose=True, cg_iter=40, cg_tol=1e-6)
    ba.optimize(steps=6, patience=6, decreasing=1e-3)  # compile
    ba2 = BundleAdjustment(ds['poses'], ds['points'], ds['cam_idx'],
                           ds['pt_idx'], ds['pixels'], ds['cameras'],
                           fix_first_pose=True, cg_iter=40, cg_tol=1e-6)
    ba2._opt_cache = ba._opt_cache
    t0 = time.perf_counter()
    loss = ba2.optimize(steps=6, patience=6, decreasing=1e-3)
    dt = time.perf_counter() - t0
    steps = len(ba2.history)
    log(f'[ba] {ds["poses"].lshape[0]} cams, {ds["points"].shape[0]} pts, '
        f'{O} obs: {steps} device-side LM steps in {dt:.3f}s '
        f'({dt/max(steps,1)*1e3:.1f} ms/step), chi2 {loss:.4e}, '
        f'reproj RMSE {jnp.sqrt(loss/O):.4f} px')
    record('ba', f'{dt/max(steps,1)*1e3:.1f} ms/LM-step '
           f'(64 cams/8k pts/48k obs)')


def bench_ba_trafalgar():
    """Trafalgar-scale BA (reference default workload:
    examples/module/ba/bundle_adjustment.py:49-51, problem-257-65132-pre:
    257 cams, 65,132 points, 225,911 observations).  Loads the real BAL
    file when vendored in data/, else a synthetic problem at identical
    scale."""
    from pypose_tpu.datasets import find_data, load_bal, synthetic_bal
    from pypose_tpu.optim.ba import BundleAdjustment

    real = find_data('problem-257-65132-pre.txt')
    if real:
        ds = load_bal(real)
        prov = f'real BAL file {real}'
    else:
        # strong init noise: initial chi2 ~200x the converged floor, so
        # the run shows a real multi-step LM trajectory (damping
        # adaptation), not one exact-Schur hop (round-2 verdict weak #3)
        ds = synthetic_bal(n_cams=257, n_points=65132,
                           obs_per_point=225911 / 65132, seed=0,
                           pose_noise=(0.3, 0.1), point_noise=0.5)
        prov = 'synthetic at trafalgar scale (257/65132/225911), ' \
               'pose_noise=(0.3,0.1) point_noise=0.5'
    O = ds['pixels'].shape[0]
    log(f'[ba-trafalgar] problem: {prov}; O={O}')

    def make():
        return BundleAdjustment(ds['poses'], ds['points'], ds['cam_idx'],
                                ds['pt_idx'], ds['pixels'], ds['cameras'],
                                fix_first_pose=True, cg_iter=40,
                                cg_tol=1e-6)
    ba = make()
    chi0 = float(ba._chi2(ds['poses'].tensor(), ds['points']))
    t0 = time.perf_counter()
    # 5 steps: BENCH_r03 showed convergence at step 5 with 3 flatline
    # steps after — pure wasted driver budget (r3 verdict weak #5)
    ba.optimize(steps=5, patience=3, decreasing=1e-3)  # compile + run
    log(f'[ba-trafalgar] cold compile+optimize {time.perf_counter()-t0:.1f}s')
    ba2 = make()
    ba2._opt_cache = ba._opt_cache
    t0 = time.perf_counter()
    loss = ba2.optimize(steps=5, patience=3, decreasing=1e-3)
    dt = time.perf_counter() - t0
    steps = max(len(ba2.history), 1)
    log(f'[ba-trafalgar] warm: {steps} device-side LM steps in {dt:.3f}s '
        f'({dt/steps*1e3:.1f} ms/step); chi2 {chi0:.4e} -> '
        + ' -> '.join(f'{h:.4e}' for h in ba2.history)
        + f'; reproj RMSE {jnp.sqrt(loss/O):.4f} px '
        f'(chi2 provenance: no reference anchor possible at this scale — '
        f'dense J would be 356 GB; parity pinned by [ba-anchored])')
    record('ba-trafalgar', f'{dt/steps*1e3:.1f} ms/LM-step '
           f'(257 cams/65k pts/226k obs, dense Schur), '
           f'RMSE {float(jnp.sqrt(loss/O)):.3f} px')


def bench_ba_large():
    """Large-camera-count BA where the matvec-only Schur-CG fallback is
    the AUTO-selected route (C=2048 > DENSE_SCHUR_MAX_C=1024) — the
    regime the reference reaches only through its external CUDA `bae`
    backend (reference pypose/optim/optimizer.py:629-643: sparse CSR
    normal equations + PCG).  r4 verdict missing #2: the fallback had
    only ever been measured FORCED at trafalgar scale, never where it
    actually routes."""
    from pypose_tpu.datasets import synthetic_bal
    from pypose_tpu.optim.ba import BundleAdjustment

    ds = synthetic_bal(n_cams=2048, n_points=49152, obs_per_point=6,
                       seed=0, pose_noise=(0.2, 0.05), point_noise=0.3)
    O = ds['pixels'].shape[0]

    def make():
        return BundleAdjustment(ds['poses'], ds['points'], ds['cam_idx'],
                                ds['pt_idx'], ds['pixels'], ds['cameras'],
                                fix_first_pose=True, cg_iter=100,
                                cg_tol=1e-6)
    ba = make()
    assert not ba._use_dense_schur, 'expected auto-routed Schur-CG'
    log(f'[ba-large] C=2048 P=49152 O={O}; schur=auto routed to '
        f'matvec-CG (dense budget excludes C>1024)')
    chi0 = float(ba._chi2(ds['poses'].tensor(), ds['points']))
    # 10 steps: step 1 pays the trust-region escalation from the default
    # radius (the quality guard hard-rejects unconverged-CG garbage until
    # damping reaches the CG-solvable regime, r5); the following steps
    # accelerate — chi2 3.67e8 -> 2.56e7 by step 10.  cg_iter=300 is a
    # measured no-op (identical trajectory: CG hits cg_tol before 100
    # iterations at the dampings the schedule picks — the damping
    # schedule is the limiter, not CG accuracy; tools/ba_cgiter_exp r5).
    t0 = time.perf_counter()
    ba.optimize(steps=10, patience=5, decreasing=1e-3)  # compile + run
    log(f'[ba-large] cold compile+optimize {time.perf_counter()-t0:.1f}s')
    ba2 = make()
    ba2._opt_cache = ba._opt_cache
    t0 = time.perf_counter()
    loss = ba2.optimize(steps=10, patience=5, decreasing=1e-3)
    dt = time.perf_counter() - t0
    steps = max(len(ba2.history), 1)
    log(f'[ba-large] warm: {steps} device-side LM steps in {dt:.3f}s '
        f'({dt/steps*1e3:.1f} ms/step); chi2 {chi0:.4e} -> '
        + ' -> '.join(f'{h:.4e}' for h in ba2.history)
        + f'; reproj RMSE {jnp.sqrt(loss/O):.4f} px')
    record('ba-large', f'{dt/steps*1e3:.0f} ms/LM-step (C=2048 '
           f'auto-routed Schur-CG), chi2 {chi0:.2e} -> '
           f'{ba2.history[-1]:.2e} over {steps} steps')


def bench_ba_anchored():
    """Reference-parity BA: the identical problem tools/ref_anchor_ba.py
    ran through the reference's DENSE LM on CPU (C=16/P=300/O=1200,
    initial chi2 ~14,000x the converged floor).  Our Schur BA must hit the
    reference-computed chi2.  (Trafalgar scale has no reference anchor
    because the reference's dense path would need a 356 GB Jacobian — it
    only reaches that scale through its external CUDA `bae` backend,
    which is unavailable; semantics parity is pinned here instead.)"""
    import json as _json
    from pypose_tpu.datasets import find_data, synthetic_bal
    from pypose_tpu.optim.ba import BundleAdjustment
    from pypose_tpu.optim.strategy import TrustRegion

    p = find_data('ref_anchor_bal_16_300.json')
    if p is None:
        log('[ba-anchored] skipped: no data/ref_anchor_bal_16_300.json')
        return
    with open(p) as f:
        anchor = _json.load(f)
    ds = synthetic_bal(n_cams=anchor['n_cams'],
                       n_points=anchor['n_points'],
                       obs_per_point=anchor['obs_per_point'],
                       pose_noise=tuple(anchor['pose_noise']),
                       point_noise=anchor['point_noise'],
                       pixel_noise=anchor['pixel_noise'],
                       seed=anchor['seed'])
    ba = BundleAdjustment(ds['poses'], ds['points'], ds['cam_idx'],
                          ds['pt_idx'], ds['pixels'], ds['cameras'],
                          fix_first_pose=False,
                          strategy=TrustRegion(radius=1e4))
    t0 = time.perf_counter()
    ba.optimize(steps=20, patience=5, decreasing=1e-4)
    dt = time.perf_counter() - t0
    target = anchor['final_chi2'] * (1 + 1e-3)
    hit = next((i + 1 for i, h in enumerate(ba.history) if h <= target),
               None)
    status = f'hit at step {hit}' if hit else \
        f'NOT HIT (best {min(ba.history):.6e})'
    log(f'[ba-anchored] C={anchor["n_cams"]} P={anchor["n_points"]} '
        f'O={anchor["n_obs"]}: chi2 {anchor["initial_chi2"]:.4e} -> '
        + ' -> '.join(f'{h:.4e}' for h in ba.history)
        + f'; target {anchor["final_chi2"]:.6e} (+1e-3 rel) {status}; '
        f'provenance: {anchor["provenance"]} '
        f'({anchor["reference"]}, {anchor["wall_seconds"]:.0f}s on CPU; '
        f'this chip: {dt:.2f}s incl. compile)')
    record('ba-anchored', f'reference chi2 target {status} '
           f'(16 cams, ref-computed anchor)')


def bench_modules():
    """Module-level TPU numbers (reference workloads:
    examples/module/{pcr/icp.py, mpc/cartpole.py, imu/imu_integrator.py}
    and tests/module/test_pnp.py)."""
    import pypose_tpu as pp

    # ICP @ 100k points: tiled Gram-form knn (ops on MXU; the dense
    # distance matrix would need 40 GB) inside one while_loop program
    try:
        from pypose_tpu.module import ICP
        from pypose_tpu.utils import ReduceToBason
        N = 100_000
        src = jax.random.normal(jax.random.PRNGKey(0), (N, 3)) * 5.0
        T = pp.randn_SE3(sigma=(0.3, 0.05), key=jax.random.PRNGKey(1))
        tgt = T.Act(src)
        icp = ICP(stepper=ReduceToBason(steps=8, patience=8, tol=1e-9))
        dt = warm_time(lambda: icp(src, tgt).tensor())
        out = icp(src, tgt)
        err = float(jnp.abs((out.Inv() @ T).Log().tensor()).max())
        log(f'[icp] {N} pts, <=8 sweeps (tiled-knn while_loop): '
            f'{dt*1e3:.1f} ms warm (align err {err:.1e})')
        record('icp', f'{dt*1e3:.0f} ms @ 100k pts (err {err:.0e})')
    except Exception as e:
        log('[icp] failed:', e)

    # EPnP @ 10k independent problems, one batched program
    try:
        from pypose_tpu.module import EPnP
        B, n = 10_000, 12
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        pts_cam = jax.random.uniform(
            k1, (B, n, 3), minval=jnp.array([-2., -2., 4.]),
            maxval=jnp.array([2., 2., 12.]))
        pose = pp.randn_SE3(B, sigma=(0.5, 0.2), key=k2)
        pts_w = pose.Inv().unsqueeze(-2).Act(pts_cam)
        K = jnp.array([[500., 0, 320], [0, 500., 240], [0, 0, 1.]])
        pix = pp.point2pixel(pts_cam, K)
        epnp = EPnP(intrinsics=K, refine=False)
        run = jax.jit(lambda p, x: epnp(p, x).tensor())
        dt = warm_time(lambda: run(pts_w, pix))
        sol = run(pts_w, pix)
        errs = jnp.abs((pp.SE3(sol).Inv() @ pose).Log().tensor()).max(-1)
        med = float(jnp.median(errs))
        p99 = float(jnp.percentile(errs, 99))
        log(f'[epnp] {B} batched PnP problems (n={n}): {dt*1e3:.1f} ms '
            f'= {B/dt:.3e} poses/s (pose err median {med:.1e}, '
            f'p99 {p99:.1e})')
        record('epnp', f'{B/dt:.2e} poses/s (10k batched, n=12)')
    except Exception as e:
        log('[epnp] failed:', e)

    # MPC cart-pole swing-up, horizon 64
    try:
        from pypose_tpu.module import NLS, MPC
        from pypose_tpu.utils import ReduceToBason

        class CartPole(NLS):
            def state_transition(self, state, input, t=None):
                x, dx, th, dth = (state[..., 0], state[..., 1],
                                  state[..., 2], state[..., 3])
                f = input[..., 0]
                dtt, g, mc, mp, l = 0.05, 9.81, 1.0, 0.1, 0.5
                tmp = (f + mp * l * dth ** 2 * jnp.sin(th)) / (mc + mp)
                thacc = (g * jnp.sin(th) - jnp.cos(th) * tmp) / \
                    (l * (4.0 / 3 - mp * jnp.cos(th) ** 2 / (mc + mp)))
                xacc = tmp - mp * l * thacc * jnp.cos(th) / (mc + mp)
                return jnp.stack([x + dtt * dx, dx + dtt * xacc,
                                  th + dtt * dth, dth + dtt * thacc],
                                 axis=-1)

            def observation(self, state, input, t=None):
                return state

        # T=32: vanilla iLQR (reference parity — no line search or
        # Levenberg regularization, lqr.py:310-380) diverges on this
        # unstable plant beyond ~T=50; 32 is the longest reliable horizon
        T = 32
        Q = jnp.diag(jnp.array([1., 0.1, 10., 0.1, 0.01]))[None]
        pvec = jnp.zeros((1, 5))
        mpc = MPC(CartPole(), Q, pvec, T,
                  stepper=ReduceToBason(steps=5))
        x0 = jnp.array([[0.0, 0.0, 0.3, 0.0]])
        dt = warm_time(lambda: mpc(0.05, x0))
        x, u, cost = mpc(0.05, x0)
        log(f'[mpc] cartpole T={T}, 5 iLQR iters + diff pass: '
            f'{dt*1e3:.1f} ms warm (cost {float(cost[0]):.3f})')

        # Robust iLQR (line_search=True: Levenberg-regularized backward
        # pass + backtracking line search + carried nominal) lifts the
        # horizon cap: T=128 swing-up converges where vanilla diverges.
        T = 128
        mpc = MPC(CartPole(), Q, pvec, T,
                  stepper=ReduceToBason(steps=30), line_search=True)
        dt = warm_time(lambda: mpc(0.05, x0))
        x, u, cost = mpc(0.05, x0)
        th_tail = float(jnp.abs(x[0, T // 2:, 2]).max())
        log(f'[mpc-ls] cartpole T={T} robust iLQR: {dt*1e3:.1f} ms warm '
            f'(cost {float(cost[0]):.3f}, |theta| tail max {th_tail:.4f}; '
            f'vanilla iLQR diverges beyond ~T=50)')
        record('mpc-ls', f'T=128 robust iLQR {dt*1e3:.1f} ms warm')
    except Exception as e:
        log('[mpc] failed:', e)


def bench_imu():
    """IMU preintegration: SO3-product associative scan + the r5 O(F)
    closed-form covariance span (quaternion suffix scan + reverse
    cumsums — the legacy 81-column matrix scan was 2.44 s of the old
    2.45 s forward; tools/imu_prof.py).  Own section: the 56x r5 result
    must not ride behind the modules compiles in the deadline order."""
    for F in (1_000_000, 250_000):
        try:
            from pypose_tpu.module import IMUPreintegrator
            dtv = jnp.full((1, F, 1), 0.005)
            gyro = jnp.broadcast_to(jnp.array([0., 0., 0.3]), (1, F, 3))
            acc = jnp.broadcast_to(jnp.array([0.2, 0., 9.81007]), (1, F, 3))
            integ = IMUPreintegrator(reset=True, prop_cov=True)
            dt = warm_time(lambda: integ(dtv, gyro, acc))
            log(f'[imu] preintegration @ {F} frames (SO3 assoc scan + '
                f'closed-form 9x9 cov): {dt*1e3:.1f} ms = '
                f'{F/dt:.3e} frames/s')
            record('imu', f'{F/dt:.2e} frames/s @ {F} frames '
                   f'({dt*1e3:.1f} ms incl 9x9 cov)')
            break
        except Exception as e:
            log(f'[imu] failed @ {F} frames:', str(e)[:200])


def bench_batch_lm(B=4096, steps=4):
    """Secondary: B independent SE3 pose-inversion LM problems in ONE
    vmapped program (Theseus-style batched-optimization throughput)."""
    import jax.numpy as jnp
    import pypose_tpu as pp
    from pypose_tpu.optim.strategy import Constant

    class PoseInvB(pp.Module):
        def __init__(self):
            super().__init__()
            self.pose = pp.Parameter(pp.identity_se3(1))

        def forward(self, input):
            return (self.pose.Exp() @ input).Log().tensor()

    from pypose_tpu.optim import make_batch_optimizer
    targets = pp.randn_SE3(B, 1, sigma=0.5, key=jax.random.PRNGKey(7))
    solve = make_batch_optimizer(PoseInvB(), steps=steps,
                                 strategy=Constant(damping=1e-6))
    dt = warm_time(lambda: solve(targets))
    params, losses = solve(targets)
    log(f'[batch-lm] {B} independent SE3 LM problems x {steps} steps: '
        f'{dt*1e3:.1f} ms = {B/dt:.3e} problems/s '
        f'(max loss {float(losses.max()):.1e})')
    record('batch-lm', f'{B/dt:.2e} problems/s '
           f'(4096 independent SE3 LM x {steps} steps)')


def bench_pgo_chain():
    """Secondary: chain-dominated PGO (sparse loop closures — the BCR
    chain preconditioner's regime)."""
    import jax.numpy as jnp
    from pypose_tpu.datasets import synthetic_sphere
    from pypose_tpu.optim.sparse import (SparseLM, pgo_factor,
                                         split_chain_edges)
    from pypose_tpu.optim.strategy import TrustRegion

    ds = synthetic_sphere(5000, loops_per_pose=0.04, seed=5)
    edges = jnp.asarray(ds['edges'])
    runs, rest = split_chain_edges(edges)
    factors = [pgo_factor(edges[jnp.asarray(r)],
                          ds['poses'][jnp.asarray(r)]) for r in runs]
    if len(rest):
        factors.append(pgo_factor(edges[jnp.asarray(rest)],
                                  ds['poses'][jnp.asarray(rest)]))
    fixed = {'poses': jnp.zeros(5000, bool).at[0].set(True)}
    opt = SparseLM({'poses': ds['nodes']}, factors,
                   strategy=TrustRegion(radius=1e4), fixed=fixed,
                   cg_iter=200, cg_tol=1e-6)
    opt.optimize(steps=6, decreasing=1e-6, patience=2)
    opt.params = {'poses': ds['nodes']}
    opt.strategy_state = opt.strategy.init(jnp.float32)
    t0 = time.perf_counter()
    loss = opt.optimize(steps=6, decreasing=1e-6, patience=2)
    dt = time.perf_counter() - t0
    log(f'[pgo-chain] 5000 poses, {edges.shape[0]} edges '
        f'({opt.precond} precond): {len(opt.history)} steps in {dt:.3f}s, '
        f'chi2 {opt.history[0]:.3e} -> {loss:.3e}')
    record('pgo-chain', f'{dt/max(len(opt.history),1)*1e3:.1f} ms/step '
           f'(5k poses, chain precond), chi2 -> {loss:.2e}')


def bench_pgo_100k():
    """Secondary: 100k-pose / 180k-edge PGO — the large-single-chip
    regime (whole-CG kernel state exceeds VMEM; SparseLM routes to its
    einsum-CG path; formation is the scalarized [E]-vector form)."""
    import jax.numpy as jnp
    from pypose_tpu.datasets import synthetic_sphere
    from pypose_tpu.optim.sparse import (SparseLM, pgo_factor,
                                         split_chain_edges)
    from pypose_tpu.optim.strategy import TrustRegion

    N = 100_000
    ds = synthetic_sphere(N)
    edges = jnp.asarray(ds['edges'])
    runs, rest = split_chain_edges(edges)
    factors = [pgo_factor(edges[jnp.asarray(r)],
                          ds['poses'][jnp.asarray(r)]) for r in runs]
    if len(rest):
        factors.append(pgo_factor(edges[jnp.asarray(rest)],
                                  ds['poses'][jnp.asarray(rest)]))
    fixed = {'poses': jnp.zeros(N, bool).at[0].set(True)}
    # cg_tol=1e-3: the r5-measured sweet spot of the iteration-count
    # ladder (tools/cg_forcing_prof.py) — trajectory indistinguishable
    # from 1e-6 (plateau 2.881e2 by step 4 on both), 78.1 -> 66.4
    # ms/step; 1e-2 lags one LM step, EW forcing + warm-start are
    # written negatives
    opt = SparseLM({'poses': ds['nodes']}, factors,
                   strategy=TrustRegion(radius=1e4), fixed=fixed,
                   cg_iter=250, cg_tol=1e-3)
    opt.optimize(steps=6, decreasing=1e-6, patience=2)   # compile + run
    opt.params = {'poses': ds['nodes']}
    opt.strategy_state = opt.strategy.init(jnp.float32)
    t0 = time.perf_counter()
    loss = opt.optimize(steps=6, decreasing=1e-6, patience=2)
    dt = time.perf_counter() - t0
    log(f'[pgo-100k] {N} poses, {edges.shape[0]} edges: '
        f'{len(opt.history)} warm device-side LM steps in {dt:.3f}s '
        f'({dt/len(opt.history)*1e3:.1f} ms/step), chi2 '
        f'{opt.history[0]:.3e} -> {loss:.3e}')
    record('pgo-100k', f'{dt/len(opt.history)*1e3:.1f} ms/LM-step '
           f'(100k poses/180k edges), chi2 -> {loss:.3e}')


def bench_pgo_groups(N=10_000):
    """Secondary: SO3 rotation averaging + Sim3 scale-drift graph through
    the same group-generic `pgo_factor` (capability beyond the reference's
    SE3-only pgo, examples/module/pgo/pgo.py) — sources the README row."""
    import numpy as np
    import jax.numpy as jnp
    import pypose_tpu as pp
    from pypose_tpu.optim.sparse import SparseLM, pgo_factor
    from pypose_tpu.optim.strategy import TrustRegion

    ii = jnp.arange(N - 1)
    rng = np.random.default_rng(0)
    loops = rng.integers(0, N, size=(N // 10, 2))
    loops = loops[loops[:, 0] != loops[:, 1]]
    edges = jnp.concatenate([jnp.stack([ii, ii + 1], 1),
                             jnp.array([[N - 1, 0]]),
                             jnp.asarray(loops, jnp.int32)], 0)
    for name, mk_truth, mk_noise in [
        ('so3-averaging',
         lambda k: pp.randn_SO3(N, key=k),
         lambda k: pp.randn_SO3(N, sigma=0.1, key=k)),
        ('sim3-pgo',
         lambda k: pp.randn_Sim3(N, sigma=(0.3, 0.2, 0.1), key=k),
         lambda k: pp.randn_Sim3(N, sigma=(0.1, 0.05, 0.05), key=k)),
    ]:
        truth = mk_truth(jax.random.PRNGKey(0))
        noisy = truth @ mk_noise(jax.random.PRNGKey(1))
        Z = truth[edges[:, 0]].Inv() @ truth[edges[:, 1]]
        fixed = {'x': jnp.zeros(N, bool).at[0].set(True)}
        opt = SparseLM({'x': noisy}, [pgo_factor(edges, Z, name='x')],
                       strategy=TrustRegion(radius=1e4), fixed=fixed,
                       cg_iter=100, cg_tol=1e-8)
        opt.optimize(steps=6, decreasing=1e-10, patience=2)  # compile+run
        opt.params = {'x': noisy}
        opt.strategy_state = opt.strategy.init(jnp.float32)
        t0 = time.perf_counter()
        loss = opt.optimize(steps=6, decreasing=1e-10, patience=2)
        dt = time.perf_counter() - t0
        log(f'[{name}] {N} nodes, {edges.shape[0]} edges: '
            f'{len(opt.history)} warm LM steps in {dt:.3f}s '
            f'({dt/len(opt.history)*1e3:.1f} ms/step), chi2 '
            f'{opt.history[0]:.3e} -> {loss:.3e}')
        record(name, f'{dt/len(opt.history)*1e3:.1f} ms/LM-step '
               f'(10k nodes), chi2 -> {loss:.2e}')


def bench_filters(T=1000):
    """Secondary: EKF over a 1000-step rollout as one lax.scan program
    (BASELINE config: filters on an NLS system, 1k-step rollout)."""
    import jax.numpy as jnp
    import pypose_tpu as pp
    from pypose_tpu.module import NLS, EKF, filter_rollout

    class Pendulum(NLS):
        def state_transition(self, state, input, t=None):
            th, om = state[..., 0], state[..., 1]
            om = om + 0.05 * (-9.81 * jnp.sin(th) + input[..., 0])
            return jnp.stack([th + 0.05 * om, om], axis=-1)

        def observation(self, state, input, t=None):
            return state

    N = 2
    Q = jnp.eye(N) * 1e-4
    R = jnp.eye(N) * 1e-2
    key = jax.random.PRNGKey(3)
    us = jax.random.normal(key, (T, 1))
    ys = jax.random.normal(jax.random.PRNGKey(4), (T, N)) * 0.1
    filt = EKF(Pendulum(), Q, R)
    run = jax.jit(lambda x0, P0, ys, us: filter_rollout(
        filt, x0, P0, ys, us))
    dt = warm_time(lambda: run(jnp.zeros(N), jnp.eye(N), ys, us))
    log(f'[ekf] {T}-step EKF rollout (scan, incl. per-step jacrev '
        f'linearization): {dt*1e3:.1f} ms = {T/dt:.3e} steps/s')
    record('ekf', f'{T/dt:.2e} steps/s (1000-step scan rollout)')


def main():
    """Headline FIRST, JSON line IMMEDIATELY after it, then secondary
    sections under a global wall-clock budget (r3 verdict #1: the driver's
    capture timed out at rc=124 because the headline ran last and nothing
    bounded total time).  The budget clock starts at PPT_BENCH_T0 when set
    (the watchdog passes it down so restarts share one budget)."""
    import os

    deadline = float(os.environ.get('PPT_BENCH_DEADLINE', '900'))
    t_start = float(os.environ.get('PPT_BENCH_T0') or time.monotonic())

    def remaining():
        return deadline - (time.monotonic() - t_start)

    log('devices:', jax.devices())

    # --- headline (exempt from the deadline: it IS the deliverable) ---
    baseline = 5.0  # seconds (BASELINE.json: sphere2500 to ref chi2 < 5 s)
    payload_line = os.environ.get('PPT_JSON_PAYLOAD', '')
    if os.environ.get('PPT_JSON_DONE'):
        # watchdog restart after the JSON line already went out: don't
        # burn shared budget re-running (and maybe re-compiling) the
        # headline — go straight to the remaining sections
        log('[pgo] headline already captured by a previous attempt; skipping')
    else:
        try:
            elapsed, chi2 = bench_pgo_sphere2500()
            payload = {
                'metric': 'sphere2500_pgo_time_to_converge',
                'value': round(elapsed, 4),
                'unit': 'seconds',
                'vs_baseline': round(baseline / elapsed, 2),
            }
        except Exception as e:
            log('[pgo] HEADLINE FAILED:', e)
            payload = {
                'metric': 'sphere2500_pgo_time_to_converge',
                'value': round(deadline, 4),  # sentinel: did not converge
                'unit': 'seconds',
                'vs_baseline': 0.0,
            }
        payload_line = json.dumps(payload)
        print(payload_line, flush=True)

    # --- secondary sections, ordered by EVIDENCE VALUE (r4 verdict #1:
    # [pgo-100k]/[ba-trafalgar] — the flagship optimizations — were
    # deadline-skipped behind cheap sections).  Each is skipped when the
    # remaining budget can't cover its estimated cost; per-section wall
    # time is logged so next round can recalibrate the estimates. ---
    # estimates recalibrated from r5 measured section wall times
    sections = [
        ('pgo-100k', bench_pgo_100k, 150),
        ('ba-trafalgar', bench_ba_trafalgar, 100),
        ('ba-large', bench_ba_large, 170),
        ('imu', bench_imu, 110),
        ('ekf', bench_filters, 15),
        ('ba-anchored', bench_ba_anchored, 50),
        ('micro', microbench_lieops, 70),
        ('batch-lm', bench_batch_lm, 30),
        ('pgo-groups', bench_pgo_groups, 125),
        ('pgo-weighted', bench_pgo_weighted, 45),
        ('modules', bench_modules, 190),
        ('pgo-chain', bench_pgo_chain, 100),
        ('ba', bench_ba, 230),
    ]
    skipped = []
    for name, fn, cost in sections:
        if remaining() < cost:
            log(f'[{name}] skipped (deadline: {remaining():.0f}s left '
                f'< est {cost}s)')
            skipped.append(name)
            continue
        t_sec = time.monotonic()
        try:
            fn()
        except Exception as e:
            log(f'[{name}] failed:', e)
        log(f'[{name}] section wall time {time.monotonic() - t_sec:.0f}s '
            f'(est {cost}s)')
    log(f'[bench] done with {remaining():.0f}s of budget left')
    # Compact [summary] block + the headline JSON as the LAST stdout
    # lines: the driver records only the END of the stream (~2000 chars
    # — BENCH_r03/r04 tails began mid-JSON with parsed:null), so every
    # captured number is repeated here to be visible in the artifact.
    # The first JSON print (right after the headline) stays for
    # wedge-safety.
    for line in _SUMMARY:
        print(f'[summary] {line}', flush=True)
    if skipped:
        print(f'[summary] deadline-skipped: {", ".join(skipped)}',
              flush=True)
    if payload_line:
        print(payload_line, flush=True)


def _watchdog_main():
    """Self-watchdog: the remote-TPU tunnel intermittently wedges the
    process (futex wait, no CPU, no output — at backend init OR mid-run
    between sections; a killed retry always succeeds, CLAUDE.md).  Run
    the real bench in a child and restart it whenever it goes silent for
    WEDGE_S seconds (every bench section logs within ~60 s — the longest
    single remote compile — so 300 s of silence is a wedge, not work)."""
    import os
    import subprocess
    import threading

    WEDGE_S = 300.0
    # r3: the tunnel can wedge repeatedly for a long stretch (hours of
    # back-to-back backend-init hangs observed); keep retrying — each
    # attempt is cheap and a recovered tunnel completes in ~25 min
    t0 = time.monotonic()
    json_done = {'v': False, 'line': ''}
    for attempt in range(8):
        # restarts share ONE wall-clock budget (PPT_BENCH_T0) and must not
        # re-RUN the headline (PPT_JSON_DONE) — but they DO need its text
        # (PPT_JSON_PAYLOAD) so the final-line re-print survives restarts
        env = dict(os.environ, PPT_BENCH_CHILD='1', PPT_BENCH_T0=repr(t0))
        if json_done['v']:
            env['PPT_JSON_DONE'] = '1'
            env['PPT_JSON_PAYLOAD'] = json_done['line']
        proc = subprocess.Popen([sys.executable, '-u', __file__],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, env=env)
        state = {'last': time.monotonic()}

        def pump(src, dst):
            for line in iter(src.readline, b''):
                state['last'] = time.monotonic()
                if dst is sys.stdout and line.strip().startswith(b'{'):
                    json_done['v'] = True
                    json_done['line'] = line.strip().decode()
                dst.buffer.write(line)
                dst.flush()

        t_err = threading.Thread(target=pump, args=(proc.stderr, sys.stderr),
                                 daemon=True)
        t_out = threading.Thread(target=pump, args=(proc.stdout, sys.stdout),
                                 daemon=True)
        t_err.start()
        t_out.start()
        while proc.poll() is None:
            time.sleep(5.0)
            if time.monotonic() - state['last'] > WEDGE_S:
                log(f'[watchdog] no output for {WEDGE_S:.0f}s '
                    f'(attempt {attempt + 1}) — tunnel wedge, restarting')
                proc.kill()
                proc.wait()
                break
        else:
            t_err.join(timeout=10)
            t_out.join(timeout=10)
            if proc.returncode == 0:
                sys.exit(0)
            # nonzero exit = the tunnel CRASHED the child (e.g. 'TPU
            # worker process crashed or restarted', observed in bursts
            # r5) rather than wedging it — retry exactly like a wedge;
            # PPT_JSON_DONE/PPT_BENCH_T0 carry finished work across
            log(f'[watchdog] child exited rc={proc.returncode} '
                f'(attempt {attempt + 1}) — tunnel crash, restarting')
        time.sleep(3.0)
    log('[watchdog] giving up after 8 wedged attempts; running inline')
    main()


if __name__ == '__main__':
    import os
    if os.environ.get('PPT_BENCH_CHILD'):
        main()
    else:
        _watchdog_main()
