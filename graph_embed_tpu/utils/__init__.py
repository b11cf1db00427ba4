from . import params, timing
