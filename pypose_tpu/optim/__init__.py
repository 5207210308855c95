from .optimizer import GaussNewton, GN, LevenbergMarquardt, LM, RobustModel
from .functional import modjac, modjacrev, modjacfwd
from . import solver
from . import kernel
from . import corrector
from . import strategy
from . import scheduler

__all__ = ['GaussNewton', 'GN', 'LevenbergMarquardt', 'LM', 'RobustModel',
           'modjac', 'modjacrev', 'modjacfwd', 'solver', 'kernel',
           'corrector', 'strategy', 'scheduler']
