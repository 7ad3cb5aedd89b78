"""Scoped XLA exec-time-effort knob (utils/compile_cache.py).

The 100-step fine-tune protocol is compile-dominated cold; the library lowers
XLA's exec-time optimization effort ONLY around the protocol's compiling
dispatches (measured on v5e: cold 372 s -> 154 s at +11% steady step time).
These tests pin the scoping semantics: thread-local, exception-safe, env-var
overridable, and inactive for long runs.
"""

import threading

import jax
import pytest

from multimodalpfn_tpu.utils.compile_cache import (
    compile_effort_scope,
    resolve_compile_effort,
)


def _current_effort() -> float:
    from jax._src.config import exec_time_optimization_effort

    return float(exec_time_optimization_effort.value)


def test_scope_sets_and_restores():
    before = _current_effort()
    with compile_effort_scope(-0.5):
        assert _current_effort() == pytest.approx(-0.5)
    assert _current_effort() == pytest.approx(before)


def test_scope_none_is_a_noop():
    before = _current_effort()
    with compile_effort_scope(None):
        assert _current_effort() == pytest.approx(before)


def test_scope_restores_on_exception():
    before = _current_effort()
    with pytest.raises(RuntimeError):
        with compile_effort_scope(-1.0):
            raise RuntimeError("boom")
    assert _current_effort() == pytest.approx(before)


def test_scope_is_thread_local():
    """Another thread compiling concurrently must keep XLA's default quality."""
    seen = {}

    def other():
        seen["effort"] = _current_effort()

    before = _current_effort()
    with compile_effort_scope(-0.5):
        t = threading.Thread(target=other)
        t.start()
        t.join()
    assert seen["effort"] == pytest.approx(before)


def test_env_var_overrides_default(monkeypatch):
    monkeypatch.setenv("MMPFN_COMPILE_EFFORT", "0")
    assert resolve_compile_effort(-0.5) == 0.0  # "0" forces XLA default
    monkeypatch.setenv("MMPFN_COMPILE_EFFORT", "-1.0")
    assert resolve_compile_effort(None) == -1.0
    monkeypatch.setenv("MMPFN_COMPILE_EFFORT", "not-a-float")
    assert resolve_compile_effort(-0.5) == -0.5
    monkeypatch.delenv("MMPFN_COMPILE_EFFORT")
    assert resolve_compile_effort(-0.5) == -0.5
    assert resolve_compile_effort(None) is None


def test_compile_under_scope_produces_working_program():
    """A program compiled at lowered effort computes the same values."""
    import jax.numpy as jnp

    def f(x):
        return jnp.sum(x * 2.0 + 1.0)

    x = jnp.arange(8, dtype=jnp.float32)
    expect = float(jax.jit(f)(x))
    with compile_effort_scope(-1.0):
        got = float(jax.jit(lambda y: f(y) + 0.0)(x))  # distinct program
    assert got == pytest.approx(expect)


def test_finetune_defaults_short_protocol_to_lowered_effort(monkeypatch):
    """fine_tune_mmpfn compiles its protocol programs inside the scope: the
    initial validation (which compiles the fused step+val program) must see
    the lowered thread-local effort; after the call the setting is restored."""
    import numpy as np

    from multimodalpfn_tpu.train import finetune as ft

    seen = []
    orig = ft.compile_effort_scope

    def spying_scope(effort):
        seen.append(effort)
        return orig(effort)

    monkeypatch.setattr(ft, "compile_effort_scope", spying_scope)

    rng = np.random.default_rng(0)
    X = rng.normal(size=(40, 3)).astype(np.float32)
    y = (rng.random(40) > 0.5).astype(np.float32)

    before = _current_effort()
    hist = ft.fine_tune_mmpfn(
        mixer_type="none",
        mgm_heads=4,
        cap_heads=2,
        features_per_group=2,
        save_path_to_fine_tuned_model="/tmp/ft_effort_test.ckpt",
        path_to_base_model="random:0",
        finetuning_config={"max_steps": 2, "validate_every_n_steps": 1},
        X_train=X,
        y_train=y,
        random_seed=0,
        logger_level=40,
    )
    assert hist["steps"] == 2
    assert -0.5 in seen  # short protocol -> lowered-effort scope entered
    assert _current_effort() == pytest.approx(before)

    # long runs keep XLA's default quality
    assert (
        ft.resolve_compile_effort(-0.5 if 50_000 <= 10_000 else None) is None
    )
