"""Profile where jit tracing time goes for the inference forward."""
import cProfile
import dataclasses
import pstats
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodalpfn_tpu.estimator.base import initialize_model
from multimodalpfn_tpu.models.transformer import forward_train_test

loaded = initialize_model(model_path="random:0", which="classifier", static_seed=0,
                          mixer_type="MGM+CAP", mgm_heads=16, cap_heads=8,
                          features_per_group=1)
cfg = dataclasses.replace(loaded.config, compute_dtype="bfloat16",
                          use_flash=False, fused_ops=False)
params = loaded.params

s_tr, s_val, F = 1470, 368, 21
rng = np.random.default_rng(0)
Xtr = jnp.asarray(rng.normal(size=(1, s_tr, F)), jnp.float32)
ytr = jnp.asarray(rng.integers(0, 6, size=(1, s_tr)), jnp.float32)
Xva = jnp.asarray(rng.normal(size=(1, s_val, F)), jnp.float32)
Itr = jnp.asarray(rng.normal(size=(1, s_tr, 1, 768)), jnp.float32)
Iva = jnp.asarray(rng.normal(size=(1, s_val, 1, 768)), jnp.float32)


def f(p):
    return forward_train_test(p, cfg, Xtr, ytr, Xva, Itr, Iva)


t0 = time.time()
prof = cProfile.Profile()
prof.enable()
lowered = jax.jit(f).lower(params)
prof.disable()
print("lower s", round(time.time() - t0, 1))
stats = pstats.Stats(prof)
stats.sort_stats("cumulative").print_stats(25)
