r"""Measure the XLA collective schedule of the sharded paths and emit the
markdown table vendored in docs/MULTICHIP.md.

Runs on an 8-device virtual CPU mesh (the same substrate as
tests/parallel/*): lowers each sharded program with
``jit(...).lower(...).compile()`` and counts collective instructions in
the optimized HLO.  GSPMD emits the same schedule for a real TPU mesh —
only the transport (ICI vs host loopback) differs — so these counts are
the honest single-host evidence for the multi-chip design
(real-chip scaling cannot be measured on this one-chip box).

Usage:  python tools/collective_schedule.py  [--markdown]
"""

import argparse
import os
import re
import sys

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp

COLLECTIVES = ('collective-permute', 'all-gather', 'all-reduce',
               'reduce-scatter')


def counts(hlo_text):
    # count instruction OCCURRENCES in the entry + called computations;
    # while-loop bodies appear once regardless of trip count, so these
    # are per-dispatch STATIC counts (loop-carried collectives execute
    # once per iteration but are scheduled once).
    return {name: len(re.findall(name + r'[-.\w]*\(', hlo_text))
            for name in COLLECTIVES}


def lower_text(fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


def row(name, mesh_desc, c, note):
    return {'program': name, 'mesh': mesh_desc, **c, 'note': note}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--markdown', action='store_true')
    args = ap.parse_args()

    import pypose_tpu as pp
    from pypose_tpu.ops.spmv import StencilSpMV
    from pypose_tpu.parallel import (make_mesh, sharded_stencil_matvec,
                                     ShardedPGO, ShardedBA)
    from pypose_tpu.datasets import synthetic_sphere, synthetic_bal

    rows = []

    # ---- shard_map stencil matvec: halo-exchange-only schedule ----
    mesh = make_mesh(8, axis='mp')
    N, t, stride = 256, 6, 17
    ii = np.arange(N)
    edges = np.concatenate([np.stack([ii, (ii + 1) % N], 1),
                            np.stack([ii[::3], (ii[::3] + stride) % N], 1)],
                           0)
    st = StencilSpMV(edges, N, t)
    C = jnp.zeros((len(st.offsets), N, t, t))
    D = jnp.zeros((N, t, t))
    x = jnp.zeros((N, t))
    c = counts(lower_text(sharded_stencil_matvec(st, mesh, axis='mp'),
                          C, D, x))
    rows.append(row('sharded_stencil_matvec (per matvec)', '8-way mp',
                    c, f'{len(st.offsets)} offsets; halo rows only, '
                       'O(halo) ICI, independent of N/E'))

    # ---- ShardedPGO full LM step: edge-sharded (dp) ----
    ds = synthetic_sphere(64, seed=1)

    def pgo_hlo(cg_iter, node_axis=None, mesh=None):
        opt = ShardedPGO(ds['nodes'], ds['edges'], ds['poses'],
                         mesh=mesh, node_axis=node_axis,
                         cg_iter=cg_iter, cg_tol=0.0)
        lm = opt.lm
        if lm.strategy_state is None:
            lm.strategy_state = lm.strategy.init(jnp.float32)
        return lower_text(lm._core, lm.params, lm.strategy_state,
                          lm._factor_data())

    c10 = counts(pgo_hlo(10))
    c50 = counts(pgo_hlo(50))
    static = 'STATIC in cg_iter' if c10 == c50 else \
        f'VARIES with cg_iter ({c10} vs {c50})'
    rows.append(row('ShardedPGO LM step (full semantics)', '8-way dp',
                    c10, f'cg_iter=10 == cg_iter=50 schedule: {static}'))

    # ---- ShardedPGO on a 2-D mesh: edges x nodes ----
    from jax.sharding import Mesh
    mesh2 = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ('dp', 'mp'))
    c2d = counts(pgo_hlo(10, node_axis='mp', mesh=mesh2))
    rows.append(row('ShardedPGO LM step', '4x2 dp(edges) x mp(nodes)', c2d,
                    'node state sharded too'))

    # ---- ShardedBA full LM step: observation-sharded ----
    ba_ds = synthetic_bal(n_cams=8, n_points=64, obs_per_point=4, seed=0)
    mesh = make_mesh(8, axis='dp')
    ba = ShardedBA(ba_ds['poses'], ba_ds['points'], ba_ds['cam_idx'],
                   ba_ds['pt_idx'], ba_ds['pixels'], ba_ds['cameras'],
                   mesh=mesh, cg_iter=10, cg_tol=0.0)
    if ba.strategy_state is None:
        ba.strategy_state = ba.strategy.init(jnp.float32)
    cba = counts(lower_text(ba._core, ba.poses.tensor(), ba.points,
                            ba.strategy_state, ba._obs_data()))
    rows.append(row('ShardedBA LM step (dense Schur)', '8-way dp (obs)',
                    cba, 'per-obs Gram psums; reduced camera solve '
                         'replicated'))

    # ---- emit ----
    if args.markdown:
        hdr = ['program', 'mesh'] + list(COLLECTIVES) + ['note']
        print('| ' + ' | '.join(hdr) + ' |')
        print('|' + '---|' * len(hdr))
        for r in rows:
            print('| ' + ' | '.join(str(r[k]) for k in hdr) + ' |')
    else:
        for r in rows:
            print(r)


if __name__ == '__main__':
    main()
