from .stepper import ReduceToBason, _Stepper
from .collect_env import collect_env, get_pretty_env_info

__all__ = ['ReduceToBason', 'collect_env', 'get_pretty_env_info']
