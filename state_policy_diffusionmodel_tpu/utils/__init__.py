from . import plotting, printing, profiling

__all__ = ["plotting", "printing", "profiling"]
