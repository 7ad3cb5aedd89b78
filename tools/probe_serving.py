"""Probe: KV-cached serving predict phases (bench shape)."""
import time
import numpy as np
from multimodalpfn_tpu import MMPFNClassifier
from multimodalpfn_tpu.datasets.synthetic import pad_ufes_like

X, emb, y = pad_ufes_like(seed=0)
ntr = int(len(X) * 0.8)
clf = MMPFNClassifier(model_path="random:0", mixer_type="MGM+CAP",
                      mgm_heads=16, cap_heads=8, features_per_group=1,
                      n_estimators=4, random_state=0, fit_mode="fit_with_cache")
t0 = time.time()
clf.fit(X[:ntr], emb[:ntr], y[:ntr])
t1 = time.time()
for i in range(3):  # warm
    clf.predict_proba(X[ntr:], emb[ntr:])
ts = []
for i in range(6):
    t0 = time.time()
    p = clf.predict_proba(X[ntr:], emb[ntr:])
    ts.append(time.time() - t0)
n_test = len(X) - ntr
dt = float(np.median(ts))
print(f"fit: {t1-t0:.2f}s  predict: {dt*1e3:.0f} ms -> {n_test/dt:.0f} samples/s", flush=True)
