"""Shared utilities (compilation cache, misc helpers)."""

from .jitcache import enable_persistent_cache

__all__ = ["enable_persistent_cache"]
