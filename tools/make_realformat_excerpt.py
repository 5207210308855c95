r"""Generate data/realformat_excerpt.g2o + data/realformat_excerpt_bal.txt.

This environment has no network egress, so the genuine benchmark files
(parking-garage.g2o, problem-257-65132-pre.txt — the reference downloads
them at run time, examples/module/pgo/pgo_dataset.py:15-20) cannot be
vendored.  These excerpts are the honest next-best: geometrically
consistent small problems emitted with the FORMAT QUIRKS real files carry,
none of which save_g2o/save_bal produce:

g2o:  '# ...' comment lines (one containing a record keyword), a FIX
      record, an unknown record type (VERTEX_SE2), non-contiguous vertex
      ids starting at 1000, vertices written in shuffled order, edges
      written i>j as well as i<j, scientific notation with explicit '+'
      exponents and mixed-case 'E', leading '+' signs, tab separators,
      trailing whitespace, and a blank line.
BAL:  exponent-notation camera/point values ('…e-02'), negative
      distortion coefficients, CRLF-style blank padding.

Run:  python tools/make_realformat_excerpt.py   (writes into data/)
The round-trip tests live in tests/utils/test_native.py.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update('jax_platforms', 'cpu')

from pypose_tpu.datasets import synthetic_sphere, synthetic_bal  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fmt_quirky(x, i):
    """Cycle through formatting styles real files exhibit."""
    styles = ['%.6f', '%.12g', '%e', '%.5E', '%+.8g', '%.17g']
    s = styles[i % len(styles)] % x
    return s


def main():
    rng = np.random.default_rng(7)
    ds = synthetic_sphere(12, loops_per_pose=0.25, seed=7)
    nodes = np.asarray(ds['nodes'].tensor(), np.float64)
    poses = np.asarray(ds['poses'].tensor(), np.float64)
    edges = np.asarray(ds['edges'])
    # non-trivial SPD information matrices (diagonal-dominant, like real
    # graphs' natural weights)
    E = edges.shape[0]
    infos = np.zeros((E, 6, 6))
    for e in range(E):
        d = np.concatenate([np.full(3, 400.0), np.full(3, 2500.0)])
        A = rng.normal(size=(6, 6)) * 5.0
        infos[e] = np.diag(d) + A @ A.T * 0.01
    iu = np.triu_indices(6)

    ids = 1000 + 3 * np.arange(len(nodes))       # non-contiguous, offset
    order = rng.permutation(len(nodes))          # shuffled in-file order

    out = os.path.join(HERE, 'data', 'realformat_excerpt.g2o')
    k = 0
    with open(out, 'w') as f:
        f.write('# hand-vendored real-format excerpt (see '
                'tools/make_realformat_excerpt.py)\n')
        f.write('# this comment mentions VERTEX_SE3:QUAT 0 to trip '
                'token-based skippers\n')
        for i in order:
            vals = []
            for v in nodes[i]:
                vals.append(fmt_quirky(v, k))
                k += 1
            sep = '\t' if i % 3 == 0 else ' '
            f.write('VERTEX_SE3:QUAT %d%s' % (ids[i], sep)
                    + sep.join(vals) + (' ' if i % 4 == 0 else '') + '\n')
        f.write('FIX %d\n' % ids[0])
        f.write('VERTEX_SE2 999 0.0 0.0 0.0\n')   # unknown record type
        f.write('\n')                              # blank line
        for e in range(E):
            i, j = edges[e]
            if e % 3 == 2:                         # some edges written j<i
                i, j = j, i
                # measurement must flip too: Z_ji = Z_ij^-1
                t, q = poses[e, :3], poses[e, 3:]
                # quaternion conjugate (x,y,z,w storage)
                qc = np.array([-q[0], -q[1], -q[2], q[3]])
                R = _quat_mat(qc)
                z = np.concatenate([-R @ t, qc])
            else:
                z = poses[e]
            vals = []
            for v in z:
                vals.append(fmt_quirky(v, k))
                k += 1
            for v in infos[e][iu]:
                vals.append(fmt_quirky(v, k))
                k += 1
            f.write('EDGE_SE3:QUAT %d %d ' % (ids[i], ids[j])
                    + ' '.join(vals) + '\n')
        f.write('# trailing comment\n')
    print('wrote', out)

    # --- BAL excerpt ------------------------------------------------------
    db = synthetic_bal(n_cams=3, n_points=20, obs_per_point=2, seed=7)
    from pypose_tpu.lietensor.utils import SO3
    import jax.numpy as jnp
    data = np.asarray(db['gt_poses'].tensor(), np.float64)
    rod = np.asarray(SO3(jnp.asarray(data[:, 3:])).Log().tensor(),
                     np.float64)
    t = data[:, :3]
    cam_idx = np.asarray(db['cam_idx'])
    pt_idx = np.asarray(db['pt_idx'])
    pixels = np.asarray(db['pixels'], np.float64)
    points = np.asarray(db['gt_points'], np.float64)
    outb = os.path.join(HERE, 'data', 'realformat_excerpt_bal.txt')
    k = 0
    with open(outb, 'w') as f:
        f.write('%d %d %d\n' % (3, len(points), len(cam_idx)))
        for c, p, (u, v) in zip(cam_idx, pt_idx, pixels):
            f.write('%d %d %s %s\n'
                    % (c, p, '%.6e' % u, '%.6e' % v))
        for c in range(3):
            # real BAL: one value per line, exponent notation, negative
            # k1/k2 distortion
            for v in (*rod[c], *t[c], 4.98e+02, -3.1e-07, 5.2e-13):
                f.write('%.16e\n' % v)
                k += 1
        for p in points:
            for v in p:
                f.write('%s\n' % fmt_quirky(v, k))
                k += 1
    print('wrote', outb)


def _quat_mat(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


if __name__ == '__main__':
    main()
