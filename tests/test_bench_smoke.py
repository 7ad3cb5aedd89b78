"""Smoke tests for bench.py's measurement functions.

The driver runs bench.py unattended at the end of every round; a crash in a
measurement function silently drops its metrics from BENCH_r{N}.json. These
tests execute the same code paths at toy geometry on the CPU backend so a
refactor can't break the bench without failing CI.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


@pytest.mark.slow  # 51 s: bench sweep program on CPU
def test_sweep_metrics_smoke():
    m = bench.sweep_metrics(
        n_runs=2,
        n_steps=2,
        emsize=48,
        nhead=2,
        nlayers=2,
        shape=(1, 36, 9, 5),
        n_reps=1,
    )
    assert m["sweep_runs"] == 2
    assert m["sweep_step_ms"] > 0
    assert m["sweep_steps_per_s"] > 0
    assert np.isfinite(m["sweep_mfu"]) and m["sweep_mfu"] >= 0


@pytest.mark.slow
def test_kernel_parity_metrics_smoke():
    """The on-hardware parity gate's code path, at tiny shapes in interpret
    mode — a refactor crash would otherwise only surface in the driver's TPU
    bench run. (On CPU the flash-vs-XLA item comparison degenerates to
    XLA-vs-XLA below the sep>=512 flash gate, so shapes keep sep=512.)"""
    from jax.experimental import pallas as pl  # noqa: F401
    import jax.experimental.pallas.tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        m = bench.kernel_parity_metrics(
            feat_shape=(2, 12, 9), item_shape=(2, 512, 64)
        )
    assert set(m) == {"kernel_parity_ok", "kernel_parity_rel_err"}
    assert m["kernel_parity_ok"] is True, m


def test_cached_predict_flops_positive_and_scales():
    f1 = bench.cached_predict_flops(
        t=30, s_te=512, s_tr=1838, e=192, nhid=768, nlayers=12
    )
    f2 = bench.cached_predict_flops(
        t=30, s_te=1024, s_tr=1838, e=192, nhid=768, nlayers=12
    )
    assert f1 > 0 and 1.9 * f1 < f2 < 2.1 * f1  # linear in test rows


def test_model_matmul_flops_positive_and_scales():
    f1 = bench.model_matmul_flops(
        e=192, nhead=6, nhid=768, nlayers=12, b=1, s=1470, s_tr=1323,
        s_te=147, t=30, in_dim=768, mgm=16, cap=8, n_out=10,
    )
    f2 = bench.model_matmul_flops(
        e=192, nhead=6, nhid=768, nlayers=24, b=1, s=1470, s_tr=1323,
        s_te=147, t=30, in_dim=768, mgm=16, cap=8, n_out=10,
    )
    assert f1 > 0 and f2 > 1.9 * f1  # layers dominate
