"""Probe: cached-forward device time via chaining vs single dispatch."""
import time
import numpy as np
import jax, jax.numpy as jnp
from multimodalpfn_tpu import MMPFNClassifier
from multimodalpfn_tpu.datasets.synthetic import pad_ufes_like
from multimodalpfn_tpu.models.cached import forward_cached

X, emb, y = pad_ufes_like(seed=0)
ntr = int(len(X) * 0.8)
clf = MMPFNClassifier(model_path="random:0", mixer_type="MGM+CAP",
                      mgm_heads=16, cap_heads=8, features_per_group=1,
                      n_estimators=4, random_state=0, fit_mode="fit_with_cache")
clf.fit(X[:ntr], emb[:ntr], y[:ntr])
clf.predict_proba(X[ntr:], emb[ntr:])
eng = clf.executor_
(cache, idxs), = eng.caches.values()
Xte = X[ntr:]
X_tests = [eng.members[i].preprocessor.transform(Xte).X for i in idxs]
pad = 512 - len(Xte)
X_tests = [np.concatenate([Xt, np.repeat(Xt[-1:], pad, 0)]) for Xt in X_tests]
xs = jnp.asarray(np.stack(X_tests), jnp.float32)
img = jnp.asarray(np.concatenate([emb[ntr:], np.repeat(emb[ntr:][-1:], pad, 0)])[None], jnp.float32)
params, cfg = eng.params, eng._run_cfg

f1 = jax.jit(lambda p, c, a, b: forward_cached(p, cfg, c, a, b)[0, 0, 0])
def chained(p, c, a, b):
    def body(carry, _):
        o = forward_cached(p, cfg, c, a, b)
        return carry, o[0, 0, 0]
    _, outs = jax.lax.scan(body, 0.0, None, length=6)
    return outs[-1]
fK = jax.jit(chained)
float(f1(params, cache, xs, img)); float(fK(params, cache, xs, img))
ts1, tsK = [], []
for _ in range(5):
    t0 = time.time(); float(f1(params, cache, xs, img)); ts1.append(time.time()-t0)
    t0 = time.time(); float(fK(params, cache, xs, img)); tsK.append(time.time()-t0)
one = np.median(ts1); dev = (np.median(tsK) - one) / 5
print(f"single dispatch {one*1e3:.0f} ms | device-only per fwd {dev*1e3:.1f} ms")
