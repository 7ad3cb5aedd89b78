"""Probe: XLA compile time of the inference forward by kernel configuration."""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodalpfn_tpu.estimator.base import initialize_model
from multimodalpfn_tpu.models.transformer import forward_train_test

loaded = initialize_model(model_path="random:0", which="classifier", static_seed=0,
                          mixer_type="MGM+CAP", mgm_heads=16, cap_heads=8,
                          features_per_group=1)
base_cfg = dataclasses.replace(loaded.config, compute_dtype="bfloat16")
params = loaded.params
jax.block_until_ready(params)

s_tr, s_val, F = 1470, 368, 21
rng = np.random.default_rng(0)
Xtr = jnp.asarray(rng.normal(size=(1, s_tr, F)), jnp.float32)
ytr = jnp.asarray(rng.integers(0, 6, size=(1, s_tr)), jnp.float32)
Xva = jnp.asarray(rng.normal(size=(1, s_val, F)), jnp.float32)
Itr = jnp.asarray(rng.normal(size=(1, s_tr, 1, 768)), jnp.float32)
Iva = jnp.asarray(rng.normal(size=(1, s_val, 1, 768)), jnp.float32)

for name, kw in [
    ("xla_only", dict(use_flash=False, fused_ops=False)),
    ("flash", dict(use_flash=True, fused_ops=False)),
    ("flash+fused", dict(use_flash=True, fused_ops=True)),
]:
    if len(sys.argv) > 1 and sys.argv[1] not in name:
        continue
    cfg = dataclasses.replace(base_cfg, **kw)

    def f(p):
        return forward_train_test(p, cfg, Xtr, ytr, Xva, Itr, Iva)

    t0 = time.time()
    lowered = jax.jit(f).lower(params)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    out = np.asarray(compiled(params))
    t3 = time.time()
    print(f"{name}: trace {t1-t0:.1f}s compile {t2-t1:.1f}s first-run {t3-t2:.1f}s",
          flush=True)
