"""Probe: fit+predict run-to-run variance (root-cause of the r2->r3 518 vs 700).

Runs the bench's exact fit+predict workload many times in one process and
prints every individual wall time, plus a breakdown run that separates
fit (host preprocessing) from predict_proba (device forwards). The r2->r3
driver captures moved 700 -> 518 samples/s with no deliberate predict-path
change; this measures whether that is relay variance (wide spread across
identical runs) or a real regression (tight spread at the slow level).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from multimodalpfn_tpu.datasets.synthetic import pad_ufes_like
from multimodalpfn_tpu import MMPFNClassifier

BENCH_MGM, BENCH_CAP, BENCH_EST = 16, 8, 4


def main():
    X, emb, y = pad_ufes_like(seed=0)
    ntr = int(len(X) * 0.8)
    n_test = len(X) - ntr

    def make(seed):
        return MMPFNClassifier(
            model_path="random:0", mixer_type="MGM+CAP", mgm_heads=BENCH_MGM,
            cap_heads=BENCH_CAP, features_per_group=1, n_estimators=BENCH_EST,
            random_state=seed,
        )

    # warmup (compile)
    clf = make(0)
    clf.fit(X[:ntr], emb[:ntr], y[:ntr])
    clf.predict_proba(X[ntr:], emb[ntr:])

    times, fits, preds = [], [], []
    for s in range(10):
        clf = make(s)
        t0 = time.time()
        clf.fit(X[:ntr], emb[:ntr], y[:ntr])
        t1 = time.time()
        clf.predict_proba(X[ntr:], emb[ntr:])
        t2 = time.time()
        times.append(t2 - t0)
        fits.append(t1 - t0)
        preds.append(t2 - t1)
        print(
            f"run {s}: total {t2-t0:.3f}s fit {t1-t0:.3f}s predict {t2-t1:.3f}s"
            f" -> {n_test/(t2-t0):.1f} samples/s",
            flush=True,
        )
    print(json.dumps({
        "total_s": [round(t, 3) for t in times],
        "fit_s": [round(t, 3) for t in fits],
        "predict_s": [round(t, 3) for t in preds],
        "median_samples_per_s": round(n_test / float(np.median(times)), 2),
        "best_samples_per_s": round(n_test / float(np.min(times)), 2),
        "worst_samples_per_s": round(n_test / float(np.max(times)), 2),
    }))


if __name__ == "__main__":
    main()
