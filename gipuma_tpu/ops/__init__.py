from . import checkerboard, cost, sampling
