r"""Environment diagnostics.  Ref: pypose/utils/collect_env.py (a fork of
torch's collect_env); here a compact JAX/TPU-native report.
"""

import os
import sys
import platform


def get_pretty_env_info():
    lines = []
    lines.append('pypose_tpu version: ' + _pkg_version())
    lines.append('Python version: ' + sys.version.replace('\n', ' '))
    lines.append('Platform: ' + platform.platform())
    try:
        import jax
        import jaxlib
        lines.append('JAX version: ' + jax.__version__)
        lines.append('jaxlib version: ' + jaxlib.__version__)
        try:
            devices = jax.devices()
            lines.append('Default backend: ' + jax.default_backend())
            lines.append('Devices: ' + ', '.join(str(d) for d in devices))
            lines.append('Device count: ' + str(jax.device_count()))
        except Exception as e:  # device init can fail in odd envs
            lines.append('Devices: <unavailable: {}>'.format(e))
    except ImportError:
        lines.append('JAX: not installed')
    try:
        import numpy
        lines.append('NumPy version: ' + numpy.__version__)
    except ImportError:
        pass
    for var in ('XLA_FLAGS', 'JAX_PLATFORMS', 'TPU_ACCELERATOR_TYPE',
                'LIBTPU_INIT_ARGS'):
        if os.environ.get(var):
            lines.append(f'{var}={os.environ[var]}')
    return '\n'.join(lines)


def _pkg_version():
    try:
        from .. import __version__
        return __version__
    except Exception:
        return 'unknown'


def collect_env():
    print(get_pretty_env_info())


if __name__ == '__main__':
    collect_env()
