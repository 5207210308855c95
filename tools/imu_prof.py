r"""Stage breakdown of 1e6-frame IMU preintegration on the real TPU.

r4 verdict weak #3: [imu] = 2453.8 ms @ 1e6 frames while the dominant
81-lane covariance associative scan has a glue-traffic roofline in the
tens of milliseconds — a 1-2 order gap with no accounting.  This
profiler stage-budgets the path with the bench.py sync recipe
(device_get drain + block differencing):

  1. full IMUPreintegrator forward (the bench number's program)
  2. integrate-only (SO3 Exp + cumprod product scan + cumsums)
  3. cumprod of the [1, F+1, 4] quaternion chain alone
  4. predict-only
  5. A81/B81 formation (scalarized quat->R, Jr, block grids)
  6. propagate_cov alone (chunked 81-lane scan), and one cov_span chunk
  7. input materialization (the broadcast_to inputs the bench feeds)

Run:  timeout 1200 python tools/imu_prof.py   (takes the TPU tunnel)
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0])


def warm_time(fn, n_lo=2, n_hi=12, repeats=3):
    sync(fn())
    def block(n, reps):
        best = float('inf')
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best
    # auto-calibrate: a 2.5 s program at the default 42 calls would burn
    # the tunnel budget; block(1) ends in a device_get so it IS synced
    t1 = block(1, 1)
    if t1 > 1.0:
        n_lo, n_hi, repeats = 1, 3, 1
    elif t1 > 0.1:
        n_lo, n_hi, repeats = 2, 6, 2
    return max(block(n_hi, repeats) - block(n_lo, repeats), 1e-12) \
        / (n_hi - n_lo)


def main():
    print('devices:', jax.devices(), file=sys.stderr)
    from pypose_tpu.module import IMUPreintegrator
    from pypose_tpu.basics.ops import cumprod
    from pypose_tpu.lietensor.utils import identity_SO3, so3
    from pypose_tpu.lietensor.lietensor import LieTensor

    F = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dtv = jnp.full((1, F, 1), 0.005)
    gyro = jnp.broadcast_to(jnp.array([0., 0., 0.3]), (1, F, 3))
    acc = jnp.broadcast_to(jnp.array([0.2, 0., 9.81007]), (1, F, 3))
    dtv, gyro, acc = jax.device_put((dtv, gyro, acc))
    sync((dtv, gyro, acc))

    integ = IMUPreintegrator(reset=True, prop_cov=True)

    # 1. full forward, exactly as bench.py times it
    t = warm_time(lambda: integ(dtv, gyro, acc))
    print(f'[full] forward @ {F}: {t*1e3:.1f} ms = {F/t:.3e} frames/s',
          file=sys.stderr)

    # 2. integrate only
    integ_jit = jax.jit(lambda d, g, a: integ.integrate(d, g, a))
    t_int = warm_time(lambda: integ_jit(dtv, gyro, acc))
    print(f'[integrate] {t_int*1e3:.1f} ms', file=sys.stderr)

    # 3. the SO3 cumprod alone
    def qchain(d, g):
        dr = so3(g * d).Exp()
        w = LieTensor(jnp.concatenate(
            [identity_SO3(1, 1, dtype=d.dtype).tensor(), dr.tensor()],
            axis=1), ltype=dr.ltype)
        return cumprod(w, dim=1, left=False).tensor()
    qchain_jit = jax.jit(qchain)
    t_q = warm_time(lambda: qchain_jit(dtv, gyro))
    print(f'[cumprod-SO3] {t_q*1e3:.1f} ms', file=sys.stderr)

    # pre-materialize integrate outputs for downstream stages
    inte = jax.block_until_ready(integ_jit(dtv, gyro, acc))

    # 4. predict only
    init_state = {'pos': integ.pos, 'rot': integ.rot, 'vel': integ.vel}
    pred_jit = jax.jit(lambda s: integ.predict(init_state, s))
    t_pred = warm_time(lambda: pred_jit(inte))
    print(f'[predict] {t_pred*1e3:.1f} ms', file=sys.stderr)

    # 5./6. propagate_cov alone (+ formation-only probe)
    B = 1
    gyro_cov = jnp.tile(integ.gyro_cov, (B, 1, 1))
    acc_cov = jnp.tile(integ.acc_cov, (B, 1, 1))
    init_cov = jnp.zeros((B, 9, 9))
    cov_input = {'Rij': inte['Dr'], 'Rk': inte['w'], 'a': inte['a'],
                 'dt': dtv}
    cov_jit = jax.jit(lambda ci, ic: integ.propagate_cov(
        ci, ic, gyro_cov, acc_cov))
    t_cov = warm_time(lambda: cov_jit(cov_input, init_cov))
    print(f'[propagate_cov] {t_cov*1e3:.1f} ms', file=sys.stderr)

    # one cov_span chunk at M frames (isolate scan vs chunk loop)
    M = IMUPreintegrator.COV_SCAN_CHUNK
    ci_M = {'Rij': cov_input['Rij'][:, :M], 'Rk': cov_input['Rk'][:, :M],
            'a': cov_input['a'][:, :M], 'dt': dtv[:, :M]}
    ci_M = jax.block_until_ready(ci_M)
    cov1_jit = jax.jit(lambda ci, ic: integ.propagate_cov(
        ci, ic, gyro_cov, acc_cov))
    t_cov1 = warm_time(lambda: cov1_jit(ci_M, init_cov))
    print(f'[cov one-chunk] M={M}: {t_cov1*1e3:.1f} ms '
          f'(x{F/M:.0f} chunks -> {t_cov1*F/M*1e3:.1f} ms extrapolated)',
          file=sys.stderr)

    # 7. stage sum vs full
    print(f'[sum] integrate {t_int*1e3:.1f} + predict {t_pred*1e3:.1f} '
          f'+ cov {t_cov*1e3:.1f} = '
          f'{(t_int + t_pred + t_cov)*1e3:.1f} ms vs full {t*1e3:.1f} ms',
          file=sys.stderr)
    print('OK')


if __name__ == '__main__':
    main()
