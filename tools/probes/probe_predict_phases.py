"""Probe: host-vs-device phase split inside ONE warm predict_proba at the
bench shape (chasing the r2->r4 regression: device forward got FASTER
— probe_predict_ab.py: 206 ms fused vs 358 ms r2-style — while end-to-end
predict got SLOWER, 0.51 -> 0.74 s; so the delta is host-side or sync-side).

Phases: sklearn member transforms | test-row bucketing pad | member stack
(np.concatenate+stack) | image device concat | dispatch (jit call returns) |
device_get | host ensemble postprocess. Also times fit's phases once.
"""

import time
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from multimodalpfn_tpu import MMPFNClassifier
from multimodalpfn_tpu.datasets.synthetic import pad_ufes_like
from multimodalpfn_tpu.estimator import inference as inf

X, emb, y = pad_ufes_like(seed=0)
ntr = int(len(X) * 0.8)

t0 = time.time()
clf = MMPFNClassifier(model_path="random:0", mixer_type="MGM+CAP",
                      mgm_heads=16, cap_heads=8, features_per_group=1,
                      n_estimators=4, random_state=0)
t_init = time.time() - t0
t0 = time.time()
clf.fit(X[:ntr], emb[:ntr], y[:ntr])
t_fit = time.time() - t0
clf.predict_proba(X[ntr:], emb[ntr:])  # warmup: compile
clf.predict_proba(X[ntr:], emb[ntr:])

# --- instrumented predict (mirrors _predict_proba_impl + _group_and_run)
from multimodalpfn_tpu.estimator.data_utils import fix_dtypes, validate_X_predict

Xq = X[ntr:]
Eq = emb[ntr:]

ph = {}
t0 = time.time()
Xv = validate_X_predict(Xq, clf)
Xv = fix_dtypes(Xv, cat_indices=clf.categorical_features_indices)
Xv = np.asarray(clf.preprocessor_.transform(Xv))
ph["validate+ordinal"] = time.time() - t0

eng = clf.executor_
t0 = time.time()
X_tests = [
    None if m.X_train is None else m.preprocessor.transform(Xv).X
    for m in eng.members
]
ph["member_transforms"] = time.time() - t0

t0 = time.time()
img_tr = eng._image_train_dev
n_test = len(Eq)
pad_rows = inf._bucket_test_rows(n_test) - n_test
X_tests_p = [
    None if Xt is None else np.concatenate([Xt, np.repeat(Xt[-1:], pad_rows, axis=0)])
    for Xt in X_tests
]
image_test = np.concatenate([Eq, np.repeat(np.asarray(Eq)[-1:], pad_rows, axis=0)])
ph["bucket_pad"] = time.time() - t0

t0 = time.time()
img_te = jnp.asarray(np.asarray(image_test, dtype=np.float32))
image_full = jnp.concatenate([img_tr, img_te], axis=0)
ph["image_device_concat"] = time.time() - t0

groups: dict = {}
for i, (m, Xt) in enumerate(zip(eng.members, X_tests_p)):
    width = -1 if Xt is None else Xt.shape[1]
    groups.setdefault((width, len(m.y_train)), []).append(i)
print("groups:", {k: len(v) for k, v in groups.items()}, flush=True)

import dataclasses
run_cfg = dataclasses.replace(
    clf.config_, compute_dtype="bfloat16", use_flash=True, fused_ops=True
)
t0 = time.time()
pend = []
for (width, sep), idxs in groups.items():
    ys = np.stack([eng.members[i].y_train.astype(np.float32) for i in idxs])
    xs = np.stack([
        np.concatenate([eng.members[i].X_train, X_tests_p[i]], axis=0, dtype=np.float32)
        for i in idxs
    ])
    pend.append((idxs, ys, xs, sep))
ph["host_stack"] = time.time() - t0

t0 = time.time()
outs = []
for idxs, ys, xs, sep in pend:
    logits = inf._forward_jit(
        eng.params, run_cfg, xs, ys, image_full[None], single_eval_pos=sep
    )
    outs.append(logits)
ph["dispatch"] = time.time() - t0
t0 = time.time()
fetched = jax.device_get(outs)
ph["device_get"] = time.time() - t0

t0 = time.time()
proba = clf.predict_proba(Xq, Eq)
ph["full_predict_again"] = time.time() - t0

print(f"init {t_init:.3f}s fit {t_fit:.3f}s")
for k, v in ph.items():
    print(f"{k:22s} {v*1e3:8.1f} ms", flush=True)
