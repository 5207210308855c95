r"""Compute the PyTorch reference's converged chi^2 on the identical PGO
problem, and vendor it as a JSON artifact for bench.py.

Runs the actual reference implementation (/root/reference, torch CPU) with
the exact example configuration — LM + Cholesky + TrustRegion(radius=1e4) +
StopOnPlateau(steps, patience=3, decreasing=1e-3) — on the same
synthetic_sphere graph that bench.py optimizes, and records the per-step
loss trajectory.  Reference loop parity:
/root/reference/examples/module/pgo/pgo.py:64-85,
/root/reference/pypose/optim/scheduler.py:162-203.

The reference's reported loss is the UNWEIGHTED chi^2 = sum_e |r_e|^2
(RobustModel.loss, /root/reference/pypose/optim/optimizer.py:118-125 —
weights enter only the normal equations), which coincides with pypose_tpu's
weighted chi^2 when information matrices are identity (the synthetic-sphere
case).

Usage:  python tools/ref_anchor.py --n 500 [--steps 10] [--f64]
Writes: data/ref_anchor_sphere<n>.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, '/root/reference')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# never touch the TPU tunnel from this CPU-only tool
import jax
jax.config.update('jax_platforms', 'cpu')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=500)
    ap.add_argument('--steps', type=int, default=10)
    ap.add_argument('--patience', type=int, default=3)
    ap.add_argument('--decreasing', type=float, default=1e-3)
    ap.add_argument('--radius', type=float, default=1e4)
    ap.add_argument('--f64', action='store_true',
                    help='run the reference in float64 (default float32, '
                         'the reference example default dtype)')
    ap.add_argument('--weighted', action='store_true',
                    help='use the natural information matrices as the LM '
                         'weight (reference optimizer.py:80-95 block-diag '
                         'path); records BOTH the unweighted loss the '
                         'reference reports and the weighted chi2 '
                         'r^T W r that pypose_tpu optimizes')
    ap.add_argument('--out', type=str, default=None)
    args = ap.parse_args()

    import numpy as np
    import torch
    torch.set_num_threads(max(1, os.cpu_count()))
    import pypose as pp
    import pypose.optim.solver as ppos
    import pypose.optim.strategy as ppost
    from pypose.optim.scheduler import StopOnPlateau
    from torch import nn

    from pypose_tpu.datasets import synthetic_sphere

    ds = synthetic_sphere(args.n,
                          info='natural' if args.weighted else 'identity')
    dtype = torch.float64 if args.f64 else torch.float32
    nodes = pp.SE3(torch.from_numpy(
        np.asarray(ds['nodes'].tensor(), np.float64)).to(dtype))
    poses = pp.SE3(torch.from_numpy(
        np.asarray(ds['poses'].tensor(), np.float64)).to(dtype))
    edges = torch.from_numpy(np.asarray(ds['edges'], np.int64))
    weight = None
    if args.weighted:
        weight = torch.from_numpy(np.asarray(ds['infos'], np.float64)) \
            .to(dtype)

    class PoseGraph(nn.Module):
        # reference example model, examples/module/pgo/pgo.py:16-26
        def __init__(self, nodes):
            super().__init__()
            self.nodes = pp.Parameter(nodes)

        def forward(self, edges, poses):
            node1 = self.nodes[edges[..., 0]]
            node2 = self.nodes[edges[..., 1]]
            error = poses.Inv() @ node1.Inv() @ node2
            return error.Log().tensor()

    graph = PoseGraph(nodes)
    optimizer = pp.optim.LM(graph, solver=ppos.Cholesky(),
                            strategy=ppost.TrustRegion(radius=args.radius),
                            min=1e-6, vectorize=True)
    scheduler = StopOnPlateau(optimizer, steps=args.steps,
                              patience=args.patience,
                              decreasing=args.decreasing, verbose=True)

    def wchi2():
        # weighted chi2 = sum_e r_e^T W_e r_e — the objective pypose_tpu's
        # SparseLM(infos=...) reports; the reference's *reported* loss stays
        # unweighted (RobustModel.loss, optimizer.py:118-125) even though
        # the weight steers its normal equations
        with torch.no_grad():
            r = graph(edges, poses).view(-1, 6)
            return float(torch.einsum('ei,eij,ej->', r, weight, r))

    with torch.no_grad():
        r0 = graph(edges, poses)
        chi2_0 = float(r0.square().sum())
    wchi2_0 = wchi2() if args.weighted else None
    print(f'[ref] n={args.n} E={edges.shape[0]} initial chi2 {chi2_0:.6e}'
          + (f' weighted {wchi2_0:.6e}' if args.weighted else ''),
          flush=True)

    history, whistory = [], []
    t0 = time.perf_counter()
    while scheduler.continual():
        ts = time.perf_counter()
        loss = optimizer.step(input=(edges, poses), weight=weight)
        scheduler.step(loss)
        history.append(float(loss))
        if args.weighted:
            whistory.append(wchi2())
        print(f'[ref] step {len(history)}: loss {float(loss):.6e}'
              + (f' weighted {whistory[-1]:.6e}' if args.weighted else '')
              + f' ({time.perf_counter()-ts:.1f}s)', flush=True)
    elapsed = time.perf_counter() - t0

    suffix = '_weighted' if args.weighted else ''
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'data', f'ref_anchor_sphere{args.n}{suffix}.json')
    os.makedirs(os.path.dirname(out), exist_ok=True)
    payload = {
        'problem': f'synthetic_sphere({args.n}) seed=42 (pypose_tpu.datasets)'
                   + (' info=natural, weight=infos' if args.weighted else ''),
        'n_poses': args.n,
        'n_edges': int(edges.shape[0]),
        'reference': 'pypose v0.9.5 LM+Cholesky+TrustRegion(1e4)+'
                     f'StopOnPlateau(steps={args.steps}, '
                     f'patience={args.patience}, '
                     f'decreasing={args.decreasing})'
                     + (' weight=natural-infos' if args.weighted else ''),
        'dtype': 'float64' if args.f64 else 'float32',
        'device': 'cpu',
        'initial_chi2': chi2_0,
        'history': history,
        'final_chi2': history[-1] if history else None,
        'wall_seconds': elapsed,
        'loss_definition': 'unweighted chi2 = sum_e |r_e|^2 '
                           '(reference RobustModel.loss)',
        'provenance': 'reference-computed (this file written by '
                      'tools/ref_anchor.py running /root/reference on CPU)',
    }
    if args.weighted:
        payload['initial_weighted_chi2'] = wchi2_0
        payload['weighted_history'] = whistory
        payload['final_weighted_chi2'] = whistory[-1] if whistory else None
        payload['weighted_loss_definition'] = \
            'sum_e r_e^T W_e r_e (the objective pypose_tpu SparseLM ' \
            'with infos= reports)'
    with open(out, 'w') as f:
        json.dump(payload, f, indent=1)
    print(f'[ref] wrote {out}: final chi2 '
          f'{payload["final_chi2"]:.6e} in {elapsed:.1f}s', flush=True)


if __name__ == '__main__':
    main()
