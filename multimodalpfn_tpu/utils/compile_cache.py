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

import contextlib
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
        if os.environ.get("MMPFN_JAX_CACHE_READONLY", "") not in ("", "0"):
            # Read-only reuse of a pre-warmed cache: loads skip the compile,
            # and the write path (the part measured to stall minutes over the
            # remote tunnel) never runs — min_compile_time gates WRITES only.
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1e9
            )
        else:
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


def resolve_compile_effort(default: float | None = None) -> float | None:
    """The effort to use for a compile region: ``MMPFN_COMPILE_EFFORT`` if set
    (user override, including "0" to force XLA's default), else ``default``."""
    val = os.environ.get("MMPFN_COMPILE_EFFORT", "")
    if val:
        try:
            return float(val)
        except ValueError:
            return default
    return default


@contextlib.contextmanager
def compile_effort_scope(effort: float | None):
    """Scope XLA's exec-time optimization effort to the compiles issued inside
    this block (thread-local; programs keep the quality they were compiled at).

    Measured on the v5e (100-step fine-tune protocol, fresh process): effort
    -0.5 cuts the compile-dominated cold wall 372 s -> 154 s while costing
    ~11% steady step time (177.7 -> 197.1 ms) — the right trade for short
    protocol runs, and exactly the wrong one for long ones; scoping the knob
    to the protocol's compiles keeps every other program at full quality.
    ``None`` = leave XLA's current setting untouched."""
    if effort is None:
        yield
        return
    ctx = None
    try:
        from jax._src.config import exec_time_optimization_effort as _opt

        ctx = _opt(float(effort))
    except Exception:  # pragma: no cover - private-API drift
        ctx = None
    if ctx is not None:
        with ctx:
            yield
        return
    # No thread-local context manager available (jax private-API drift).
    # A global set/restore fallback is NOT safe here: fine-tuning runs this
    # scope concurrently on the main thread and the compile-prewarm thread,
    # and interleaved set/restore could leave lowered effort applied
    # process-wide after both scopes exit. Skip scoping (full-quality
    # compiles) and say so.
    import logging  # pragma: no cover - exercised only on config-API drift

    logging.getLogger(__name__).warning(
        "jax thread-local exec_time_optimization_effort unavailable; "
        "compiling at XLA default effort (cold-start will be slower)"
    )
    yield
