from .profiling import compiled_cost, timed, trace

__all__ = ["trace", "timed", "compiled_cost"]
