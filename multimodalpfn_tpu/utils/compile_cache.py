"""Persistent XLA compilation cache.

The fine-tuning protocol (reference ``finetune_mmpfn_main.py:78``) pays one
large XLA compile per (episode shape x architecture); the published experiment
driver re-runs it grid x 5 seeds times in fresh processes (``run.py:26-201``).
A persistent on-disk cache makes every later process skip those compiles.

OPT-IN: inactive unless ``MMPFN_JAX_CACHE_DIR`` (or the standard
``JAX_COMPILATION_CACHE_DIR``) points at a directory — see
``enable_persistent_cache`` for why it is not on by default.
"""

from __future__ import annotations

import os

_configured = False


def enable_persistent_cache() -> None:
    """Idempotently point JAX at an on-disk compilation cache.

    OPT-IN: only active when ``MMPFN_JAX_CACHE_DIR`` (or the standard
    ``JAX_COMPILATION_CACHE_DIR``) is set. Measured on the remote-TPU tunnel,
    cache WRITES serialize the executable through the device link and can
    stall a compile by minutes, while a fresh compile of even the largest
    program here is ~10-45 s — so the cache only pays on backends with cheap
    executable serialization (local TPU/CPU), where the user can opt in.
    """
    global _configured
    if _configured:
        return
    cache_dir = os.environ.get(
        "MMPFN_JAX_CACHE_DIR", os.environ.get("JAX_COMPILATION_CACHE_DIR", "")
    )
    if not cache_dir:
        return  # not latched: setting the env var later in-process still works
    _configured = True
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is an optimization only
        pass


_effort_applied = False


def apply_compile_effort() -> None:
    """Idempotently apply ``MMPFN_COMPILE_EFFORT`` (float in [-1, 1]) to XLA's
    exec-time optimization effort.

    The 100-step fine-tuning protocol is compile-dominated cold (~77 s of XLA
    compile vs ~20 s of steps): lowering the scheduler/fusion search effort
    trades a few percent of step time for a large cut in compile seconds —
    the right trade for short protocol runs and first-contact UX. Unset = XLA
    default (0.0). Applies process-wide at the next compilation."""
    global _effort_applied
    if _effort_applied:
        return
    val = os.environ.get("MMPFN_COMPILE_EFFORT", "")
    if not val:
        return  # not latched: setting the env var later still works
    _effort_applied = True
    try:
        import jax

        jax.config.update("jax_exec_time_optimization_effort", float(val))
    except Exception:  # pragma: no cover - an optimization knob only
        pass
