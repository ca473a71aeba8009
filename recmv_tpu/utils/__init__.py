from . import io, profiling, visualizer
