"""Configuration and small shared utilities."""

from .config import default_dtype, enable_x64, resolve_backend, x64_enabled

__all__ = ["enable_x64", "x64_enabled", "resolve_backend", "default_dtype"]
