"""Configuration, profiling and small shared utilities."""

from . import profiling
from .config import default_dtype, enable_x64, resolve_backend, x64_enabled
from .profiling import Timer, synchronize, timed

__all__ = [
    "enable_x64",
    "x64_enabled",
    "resolve_backend",
    "default_dtype",
    "profiling",
    "Timer",
    "synchronize",
    "timed",
]
