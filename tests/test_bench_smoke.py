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
