from . import surface_ps
