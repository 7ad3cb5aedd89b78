"""Probe: AOT stage timing of the fine-tune validation forward (args version)."""
import dataclasses
import time

t_imp = time.time()
import jax
import jax.numpy as jnp
import numpy as np

from multimodalpfn_tpu.estimator.base import initialize_model
from multimodalpfn_tpu.models.transformer import forward_train_test

print(f"imports {time.time()-t_imp:.1f}s", flush=True)

t0 = time.time()
jax.devices()
print(f"backend init {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
loaded = initialize_model(model_path="random:0", which="classifier", static_seed=0,
                          mixer_type="MGM+CAP", mgm_heads=16, cap_heads=8,
                          features_per_group=1)
cfg = dataclasses.replace(loaded.config, compute_dtype="bfloat16",
                          use_flash=True, fused_ops=True)
params = loaded.params
# force completion of init: fetch one scalar derived from every leaf
tot = float(sum(jnp.sum(x) for x in jax.tree.leaves(params)))
print(f"init_params + settle {time.time()-t0:.1f}s", flush=True)

s_tr, s_val, F = 1470, 368, 21
rng = np.random.default_rng(0)
val_data = {
    "x_tr": jnp.asarray(rng.normal(size=(1, s_tr, F)), jnp.float32),
    "y_tr": jnp.asarray(rng.integers(0, 6, size=(1, s_tr)), jnp.float32),
    "x_va": jnp.asarray(rng.normal(size=(1, s_val, F)), jnp.float32),
    "i_tr": jnp.asarray(rng.normal(size=(1, s_tr, 1, 768)), jnp.float32),
    "i_va": jnp.asarray(rng.normal(size=(1, s_val, 1, 768)), jnp.float32),
}
t0 = time.time()
tot = float(sum(jnp.sum(v) for v in val_data.values()))
print(f"val_data upload settle {time.time()-t0:.1f}s", flush=True)


def f(p, vd):
    return forward_train_test(p, cfg, vd["x_tr"], vd["y_tr"], vd["x_va"],
                              vd["i_tr"], vd["i_va"])


t0 = time.time()
lowered = jax.jit(f).lower(params, val_data)
print(f"trace+lower {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
compiled = lowered.compile()
print(f"compile {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
out = np.asarray(compiled(params, val_data))
print(f"first run+fetch {time.time()-t0:.1f}s out {out.shape}", flush=True)
t0 = time.time()
out = np.asarray(compiled(params, val_data))
print(f"second run+fetch {time.time()-t0:.2f}s", flush=True)
