from .profiling import stage_timer, timed, trace_to  # noqa: F401
