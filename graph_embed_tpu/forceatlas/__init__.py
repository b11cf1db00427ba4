from . import forces, flat
