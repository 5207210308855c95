from .stepper import ReduceToBason, _Stepper

__all__ = ['ReduceToBason']
