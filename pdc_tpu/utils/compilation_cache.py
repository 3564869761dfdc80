"""Persistent XLA compilation cache.

First compiles of the 640x480 programs cost 40-200 s (more through a remote
TPU runtime); the persistent cache makes every later process reuse them.
Opt-in via ``enable()``, the ``training.compilation_cache_dir`` config key,
or the ``PDC_COMPILATION_CACHE`` environment variable (checked by the
trainer and bench).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

_enabled_dir: Optional[str] = None


def enable(cache_dir: Optional[str] = None,
           min_compile_time_secs: float = 1.0) -> Optional[str]:
    """Turn on the JAX persistent compilation cache. Idempotent.

    :param cache_dir: defaults to $PDC_COMPILATION_CACHE or
        ~/.cache/pdc_tpu/xla
    :return: the active cache dir, or None if unavailable in this jax
    """
    global _enabled_dir
    if _enabled_dir is not None:
        return _enabled_dir
    if cache_dir is None:
        cache_dir = os.environ.get(
            "PDC_COMPILATION_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "pdc_tpu", "xla"))
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_time_secs))
        _enabled_dir = cache_dir
        logger.info("persistent compilation cache: %s", cache_dir)
        return cache_dir
    except Exception as e:  # older jax / unsupported backend
        logger.warning("compilation cache unavailable: %s", e)
        return None


def maybe_enable_from_env() -> Optional[str]:
    """Enable only when PDC_COMPILATION_CACHE is set (safe default for
    library import paths)."""
    if os.environ.get("PDC_COMPILATION_CACHE"):
        return enable()
    return None
