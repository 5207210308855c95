from .stepper import ReduceToBason, _Stepper
from .collect_env import collect_env, get_pretty_env_info
from . import checkpoint
from .timer import Timer

__all__ = ['ReduceToBason', 'collect_env', 'get_pretty_env_info',
           'checkpoint', 'Timer']
