"""Collective-schedule evidence for the sharded paths (8-device CPU mesh).

Pins (a) numerical equality of the shard_map stencil matvec with the
single-device StencilSpMV, (b) its collective schedule — ppermute halo
exchange only, no all-gather/all-reduce — and (c) that the compiled
ShardedLM step's collective count is a STATIC property (CG iterations run
inside a rolled while loop, so the schedule does not scale with cg_iter).
docs/MULTICHIP.md carries the measured schedule table
(tools/collective_schedule.py regenerates it).
"""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pypose_tpu as pp
from pypose_tpu.ops.spmv import StencilSpMV
from pypose_tpu.parallel import (make_mesh, sharded_stencil_matvec,
                                 ShardedPGO)


def _mesh8(axis='mp'):
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    return make_mesh(8, axis=axis)


def _collective_counts(hlo_text):
    return {name: len(re.findall(name + r'[-.\w]*\(', hlo_text))
            for name in ('collective-permute', 'all-gather', 'all-reduce',
                         'reduce-scatter')}


def _ring_stencil(N=256, stride=17, tan=6):
    ii = np.arange(N)
    edges = np.concatenate([
        np.stack([ii, (ii + 1) % N], 1),
        np.stack([ii[::3], (ii[::3] + stride) % N], 1)], 0)
    return StencilSpMV(edges, N, tan), edges


def test_sharded_stencil_matvec_matches_single_device():
    mesh = _mesh8()
    st, edges = _ring_stencil()
    key = jax.random.PRNGKey(0)
    E, t = edges.shape[0], 6
    J = jax.random.normal(key, (E, t, 2, t)) * 0.1
    C = st.precompute(J, J)
    D = jnp.broadcast_to(jnp.eye(t), (st.N, t, t)) \
        + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (st.N, t, t))
    x = jax.random.normal(jax.random.PRNGKey(2), (st.N, t))

    y_ref = st.matvec(C, D, x)
    fn = sharded_stencil_matvec(st, mesh, axis='mp')
    y_sh = jax.jit(fn)(C, D, x)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)


def test_sharded_stencil_matvec_collective_schedule():
    """Halo exchange only: ppermutes bounded by 4 per offset, zero
    all-gathers / all-reduces — ICI traffic is O(halo), independent of
    N and E."""
    mesh = _mesh8()
    st, edges = _ring_stencil()
    t = 6
    C = jnp.zeros((len(st.offsets), st.N, t, t))
    D = jnp.zeros((st.N, t, t))
    x = jnp.zeros((st.N, t))
    fn = jax.jit(sharded_stencil_matvec(st, mesh, axis='mp'))
    hlo = fn.lower(C, D, x).compile().as_text()
    counts = _collective_counts(hlo)
    assert counts['all-gather'] == 0, counts
    assert counts['all-reduce'] == 0, counts
    assert counts['reduce-scatter'] == 0, counts
    assert 1 <= counts['collective-permute'] <= 4 * len(st.offsets), counts


def test_sharded_lm_collectives_static_in_cg_iter():
    """The ShardedLM step compiles to ONE program whose collective
    instruction count does not grow with cg_iter (the CG loop is a rolled
    lax.while_loop: per-iteration psums appear once in the loop body)."""
    mesh = _mesh8(axis='dp')
    ds = pp.datasets.synthetic_sphere(64, seed=1)

    def hlo_for(cg_iter):
        opt = ShardedPGO(ds['nodes'], ds['edges'], ds['poses'],
                         mesh=mesh, cg_iter=cg_iter, cg_tol=0.0)
        lm = opt.lm
        if lm.strategy_state is None:
            lm.strategy_state = lm.strategy.init(jnp.float32)
        # lower the exact jitted core that step() runs (sparse.py:714)
        return jax.jit(lm._core).lower(
            lm.params, lm.strategy_state,
            lm._factor_data()).compile().as_text()

    h10 = hlo_for(10)
    h50 = hlo_for(50)
    c10 = _collective_counts(h10)
    c50 = _collective_counts(h50)
    assert c10 == c50, (c10, c50)
    total = sum(c10.values())
    assert total >= 1, 'expected at least one collective in a sharded step'
