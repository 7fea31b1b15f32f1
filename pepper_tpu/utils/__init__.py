from .profiling import StageTimer, trace
