"""Benchmark: PAD-UFES-20-shaped fit+predict throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches the reference protocol (SURVEY.md §6): 2298 rows (80/20 split),
21 clinical features + 1 frozen image-embedding token, MGM+CAP mixer,
n_estimators=4, full TabPFN-v2 architecture. `vs_baseline` compares against the
torch reference on the same config measured by tools/measure_reference_baseline.py
(recorded in bench_baseline.json).

Steady-state protocol: one warmup fit+predict (pays compile), then timed fresh
fit+predict epochs with identical shapes (compile-cached, as in production reuse).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

BENCH_MGM, BENCH_CAP, BENCH_EST = 16, 8, 4


def main() -> None:
    from multimodalpfn_tpu import MMPFNClassifier
    from multimodalpfn_tpu.datasets.synthetic import pad_ufes_like

    X, emb, y = pad_ufes_like(seed=0)
    ntr = int(len(X) * 0.8)
    n_test = len(X) - ntr

    def run(seed: int) -> float:
        clf = MMPFNClassifier(
            model_path="random:0",
            mixer_type="MGM+CAP",
            mgm_heads=BENCH_MGM,
            cap_heads=BENCH_CAP,
            features_per_group=1,
            n_estimators=BENCH_EST,
            random_state=seed,
        )
        t0 = time.time()
        clf.fit(X[:ntr], emb[:ntr], y[:ntr])
        proba = clf.predict_proba(X[ntr:], emb[ntr:])
        dt = time.time() - t0
        assert proba.shape == (n_test, 6) and np.isfinite(proba).all()
        return dt

    run(0)  # warmup: compile
    times = [run(s) for s in (0, 1, 2)]
    total_s = float(np.median(times))
    value = n_test / total_s

    baseline_file = Path(__file__).parent / "bench_baseline.json"
    vs_baseline = 0.0
    if baseline_file.exists():
        base = json.loads(baseline_file.read_text())
        if base.get("samples_per_sec"):
            vs_baseline = value / float(base["samples_per_sec"])

    print(
        json.dumps(
            {
                "metric": "PAD-UFES-20-shaped fit+predict throughput (4-member MGM+CAP ensemble, 1 chip)",
                "value": round(value, 2),
                "unit": "test samples/sec/chip",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
