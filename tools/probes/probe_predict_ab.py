"""Probe: inference-forward dispatch A/B at the bench fit+predict shape.

Root-causing the r2->r3 fit+predict regression (700 -> 518 samples/s driver
capture; tight-spread in-process A/B shows ~786 -> ~502): round-3's
training-oriented kernel work (fully-fused item sublayer, item-major layout,
item-major MLP grid) also re-routed the ESTIMATOR's predict forward, which is
pure-forward (no backward) and may be better served by the r2 path
(flash attention + XLA-fused sublayers).

Times the exact `_group_and_run` forward (4 members stacked, sep=1838,
512 bucketed test rows, shared image) under dispatch variants.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import dataclasses

from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
from multimodalpfn_tpu.models.params import init_params
from multimodalpfn_tpu.models.transformer import forward

M, SEP, NTEST, F = 4, 1838, 512, 21
S = SEP + NTEST
K = 10

base_cfg = ModelConfig(
    emsize=192, nhead=6, nhid_factor=4, nlayers=12, features_per_group=1,
    n_out=10, max_num_classes=10, compute_dtype="bfloat16",
    use_flash=True, fused_ops=True, fused_item=True,
    mixer=MixerConfig(mixer_type="MGM+CAP", mgm_heads=16, cap_heads=8, in_dim=768),
)
params = init_params(jax.random.PRNGKey(0), base_cfg, model_seed=0)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(M, S, F)), jnp.float32)
y = jnp.asarray(rng.integers(0, 6, size=(M, SEP)), jnp.float32)
img = jnp.asarray(rng.normal(size=(1, S, 1, 768)), jnp.float32)

fwd = jax.jit(
    forward,
    static_argnames=("cfg", "single_eval_pos", "train", "remat", "return_embeddings"),
)

ident = jax.jit(lambda a: a * 1.000001)
_ = np.asarray(ident(x))
t0 = time.time()
z = x
for _ in range(K):
    z = ident(z)
np.asarray(z)
base = (time.time() - t0) / K
print(f"tunnel baseline {base*1e3:.1f} ms/call", flush=True)

VARIANTS = {
    "prod (fused_ops+flash+fused_item)": {},
    "fused_item=False": {"fused_item": False},
    "fused_ops=False (flash+XLA)": {"fused_ops": False},
    "fused_ops=False,fused_item=False": {"fused_ops": False, "fused_item": False},
    "pure XLA (no flash)": {"fused_ops": False, "use_flash": False, "fused_item": False},
}

for name, repl in VARIANTS.items():
    cfg = dataclasses.replace(base_cfg, **repl)
    out = fwd(params, cfg, x, y, img, single_eval_pos=SEP)
    np.asarray(out)  # compile + settle
    ts = []
    for rep in range(3):
        t0 = time.time()
        for _ in range(K):
            out = fwd(params, cfg, x, y, img, single_eval_pos=SEP)
        np.asarray(out)
        ts.append((time.time() - t0) / K - base)
    dt = float(np.median(ts))
    print(f"{name:38s} {dt*1e3:8.1f} ms  -> {NTEST*M/ (dt*M):7.1f} eff samples/s/member-batch", flush=True)
