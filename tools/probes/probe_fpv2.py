"""Probe: fit+predict cycle split into (fit host | fit device sync | predict).

probe_predict_phases.py showed a WARM predict on a long-fitted clf is ~0.39 s
at HEAD (faster than r2's 0.51), yet the per-cycle var probe measures 0.74 s
predicts — so the regression lives in device work enqueued by fit (param
init, image upload) that predict's device_get then waits behind. This probe
adds a block_until_ready barrier after fit to attribute it.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

from multimodalpfn_tpu.datasets.synthetic import pad_ufes_like
from multimodalpfn_tpu import MMPFNClassifier

X, emb, y = pad_ufes_like(seed=0)
ntr = int(len(X) * 0.8)
n_test = len(X) - ntr


def make(seed):
    return MMPFNClassifier(
        model_path="random:0", mixer_type="MGM+CAP", mgm_heads=16,
        cap_heads=8, features_per_group=1, n_estimators=4, random_state=seed,
    )


clf = make(0)
clf.fit(X[:ntr], emb[:ntr], y[:ntr])
clf.predict_proba(X[ntr:], emb[ntr:])  # compile

rows = []
for s in range(8):
    clf = make(s)
    t0 = time.time()
    clf.fit(X[:ntr], emb[:ntr], y[:ntr])
    t1 = time.time()
    jax.block_until_ready(clf.params_)
    t2 = time.time()
    clf.predict_proba(X[ntr:], emb[ntr:])
    t3 = time.time()
    rows.append((t1 - t0, t2 - t1, t3 - t2))
    print(
        f"run {s}: fit_host {t1-t0:.3f}s fit_devsync {t2-t1:.3f}s "
        f"predict {t3-t2:.3f}s -> total {t3-t0:.3f}s "
        f"({n_test/(t3-t0):.0f} samples/s)",
        flush=True,
    )
med = [round(float(np.median([r[i] for r in rows])), 3) for i in range(3)]
print(json.dumps({
    "fit_host_s": med[0], "fit_devsync_s": med[1], "predict_s": med[2],
    "median_samples_per_s": round(n_test / sum(med), 1),
}))
