"""Probe: KV-cached predict phase decomposition."""
import time
import numpy as np
import jax
from multimodalpfn_tpu import MMPFNClassifier
from multimodalpfn_tpu.datasets.synthetic import pad_ufes_like

X, emb, y = pad_ufes_like(seed=0)
ntr = int(len(X) * 0.8)
clf = MMPFNClassifier(model_path="random:0", mixer_type="MGM+CAP",
                      mgm_heads=16, cap_heads=8, features_per_group=1,
                      n_estimators=4, random_state=0, fit_mode="fit_with_cache")
clf.fit(X[:ntr], emb[:ntr], y[:ntr])
clf.predict_proba(X[ntr:], emb[ntr:])  # compile

eng = clf.executor_
Xte, Ite = X[ntr:], emb[ntr:]

# phase 1: host transforms
t0 = time.time()
for _ in range(5):
    X_tests = [None if m.X_train is None else m.preprocessor.transform(Xte).X for m in eng.members]
t_tr = (time.time() - t0) / 5

# phase 2: iter_outputs end to end
t0 = time.time()
for _ in range(5):
    outs = eng.iter_outputs(Xte, Ite)
t_io = (time.time() - t0) / 5

# phase 3: estimator-level predict (adds softmax/permutation/balance host work)
t0 = time.time()
for _ in range(5):
    clf.predict_proba(Xte, Ite)
t_pp = (time.time() - t0) / 5

print(f"transforms {t_tr*1e3:.0f} ms | engine iter_outputs {t_io*1e3:.0f} ms | predict_proba {t_pp*1e3:.0f} ms")
