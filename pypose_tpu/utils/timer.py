r"""Wall-clock timer with device synchronization.

Parity with the ad-hoc Timer classes in the reference's tests
(tests/optim/test_optimizer.py:12-47: cuda.synchronize-based); here
synchronization is ``jax.block_until_ready`` on a sentinel.
"""

import time

import jax
import jax.numpy as jnp


class Timer:
    def __init__(self):
        self.synchronize()
        self.start_time = time.time()

    @staticmethod
    def synchronize():
        jax.block_until_ready(jnp.zeros(()))

    def tic(self):
        self.start()

    def start(self):
        self.synchronize()
        self.start_time = time.time()

    def end(self, reset=True):
        self.synchronize()
        duration = time.time() - self.start_time
        if reset:
            self.start_time = time.time()
        return duration

    def toc(self, verbose=False):
        d = self.end()
        if verbose:
            print(f'Time: {d:.6f} s')
        return d
