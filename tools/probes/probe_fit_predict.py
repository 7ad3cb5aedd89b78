"""Probe: phase split of the headline fit+predict cycle (bench shape)."""
import time
import numpy as np
from multimodalpfn_tpu import MMPFNClassifier
from multimodalpfn_tpu.datasets.synthetic import pad_ufes_like

X, emb, y = pad_ufes_like(seed=0)
ntr = int(len(X) * 0.8)

def cycle(seed, report=False):
    clf = MMPFNClassifier(model_path="random:0", mixer_type="MGM+CAP",
                          mgm_heads=16, cap_heads=8, features_per_group=1,
                          n_estimators=4, random_state=seed)
    t0 = time.time()
    clf.fit(X[:ntr], emb[:ntr], y[:ntr])
    t1 = time.time()
    proba = clf.predict_proba(X[ntr:], emb[ntr:])
    t2 = time.time()
    proba2 = clf.predict_proba(X[ntr:], emb[ntr:])
    t3 = time.time()
    if report:
        print(f"fit {t1-t0:.2f}s  predict1 {t2-t1:.2f}s  predict2 {t3-t2:.2f}s", flush=True)
    return proba

cycle(0)  # warmup/compile
for s in (0, 1, 2):
    cycle(s, report=True)
