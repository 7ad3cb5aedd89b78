"""Isolation A/B at the ITEM-MAJOR sweep shape (the production fused path):
per-sublayer fwd / fwd+bwd timing of

  * fused_feature_attention_ln_im (packed score tiles vs not is a code state,
    so run this probe before/after a change to compare),
  * fused_mlp_ln on the item-major (…, s, e) layout,
  * the fully-fused item sublayer (fused_item_sublayer) vs the previous
    composition (fused_item_attention + residual_ln).

Chained-call timing with empty-chain baseline subtraction (see
probe_sublayer_perf.py for why, axon tunnel).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from multimodalpfn_tpu.ops.pallas_fused import (
    fused_feature_attention_ln_im,
    fused_mlp_ln,
)
from multimodalpfn_tpu.ops.pallas_item_fused import (
    fused_item_attention,
    fused_item_sublayer,
)
from multimodalpfn_tpu.models.transformer import residual_ln

G = int(sys.argv[1]) if len(sys.argv) > 1 else 4
b, S, t, e, h, d, H = 1, 1470, 30, 192, 6, 32, 768
sep = 1323
cd = jnp.bfloat16
K = 30

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(G, b, t, S, e)), cd)  # item-major
w1 = jnp.asarray(rng.normal(size=(G, e, H)) * 0.05, jnp.float32)
w2 = jnp.asarray(rng.normal(size=(G, H, e)) * 0.05, jnp.float32)
wqkv = jnp.asarray(rng.normal(size=(G, 3, h, d, e)) * 0.05, jnp.float32)
wout = jnp.asarray(rng.normal(size=(G, h, d, e)) * 0.05, jnp.float32)

ident = jax.jit(lambda x: x * 1.000001)
_ = float(ident(x0).sum())
t0 = time.time()
y = x0
for _ in range(K):
    y = ident(y)
float(y.sum())
base = (time.time() - t0) / K


def time_chained(name, fn, fl):
    f = jax.jit(fn)
    y = f(x0)
    float(y.sum())
    t0 = time.time()
    y = x0
    for _ in range(K):
        y = f(y)
    float(y.sum())
    dt = (time.time() - t0) / K - base
    print(f"{name:34s} {dt*1e3:8.2f} ms   {fl/dt/1e12:6.1f} TF/s", flush=True)
    return dt


def fa_im(xx):
    return jax.vmap(fused_feature_attention_ln_im)(xx, wqkv, wout)


def mlp_im(xx):
    return jax.vmap(fused_mlp_ln)(xx, w1, w2)


def item_sub(xx):
    return jax.vmap(
        lambda xi, wq, wo: fused_item_sublayer(
            xi, wq, wo, single_eval_pos=sep, compute_dtype=cd
        )
    )(xx, wqkv, wout)


def item_old(xx):
    def one(xi, wq, wo):
        hh = fused_item_attention(
            xi, wq, wo, single_eval_pos=sep, compute_dtype=cd
        )
        return residual_ln(xi, hh).astype(cd)

    return jax.vmap(one)(xx, wqkv, wout)


def with_bwd(fn):
    def step(xx):
        def loss(xi):
            return jnp.sum(fn(xi).astype(jnp.float32) ** 2)

        g = jax.grad(loss)(xx)
        return (xx + 1e-6 * g).astype(cd)

    return step


flops_fa = G * S * t * (4 * e * e * 2 + 2 * t * d * h * 2)
flops_mlp = G * S * t * (2 * e * H * 2)
flops_item = G * t * (
    4 * e * e * 2 * S  # qkvo projections
    + h * d * 2 * 2 * (sep * sep + (S - sep) * sep)
)
print(f"per-call tunnel baseline: {base*1e3:.2f} ms", flush=True)
which = sys.argv[2] if len(sys.argv) > 2 else "all"
cases = [
    ("feat_attn_im fwd", fa_im, flops_fa, "fa"),
    ("mlp_im fwd", mlp_im, flops_mlp, "mlp"),
    ("item_sublayer fwd", item_sub, flops_item, "item"),
    ("item_old(attn+res_ln) fwd", item_old, flops_item, "item"),
    ("feat_attn_im fwd+bwd", with_bwd(fa_im), 3 * flops_fa, "fa"),
    ("mlp_im fwd+bwd", with_bwd(mlp_im), 3 * flops_mlp, "mlp"),
    ("item_sublayer fwd+bwd", with_bwd(item_sub), 3 * flops_item, "item"),
    ("item_old fwd+bwd", with_bwd(item_old), 3 * flops_item, "item"),
]
for name, fn, fl, tag in cases:
    if which in ("all", tag):
        time_chained(name, fn, fl)
