"""Isolation A/B at the sweep shape: fused row-local sublayer kernels vs XLA.

Times fwd+bwd of (feature-attention+LN) and (MLP+LN) separately, fused Pallas
vs plain XLA, at the vmapped N=4 PAD-UFES shape (G runs, S=1470 rows, t=30
tokens, e=192, bf16 compute).

Timing methodology (IMPORTANT, axon tunnel): the remote backend elides
repeated identical dispatches and `block_until_ready` does not wait for
execution — only a device->host fetch does. So every iteration must CHAIN the
previous output into the next input, and time K chained calls bracketed by
one scalar fetch; per-call tunnel overhead (~30 ms / K) is subtracted via the
measured empty-chain baseline.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from multimodalpfn_tpu.ops.pallas_fused import (
    fused_feature_attention_ln,
    fused_mlp_ln,
)
from multimodalpfn_tpu.models.transformer import _layer_norm, _mlp
from multimodalpfn_tpu.ops.attention import self_attention

G = int(sys.argv[1]) if len(sys.argv) > 1 else 4
b, S, t, e, h, d, H = 1, 1470, 30, 192, 6, 32, 768
cd = jnp.bfloat16
K = 50

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(G, b, S, t, e)), cd)
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
    """fn: x -> x-shaped output; chained K times, one fetch."""
    f = jax.jit(fn)
    y = f(x0)
    float(y.sum())  # compile + warm
    t0 = time.time()
    y = x0
    for _ in range(K):
        y = f(y)
    float(y.sum())
    dt = (time.time() - t0) / K - base
    print(f"{name:34s} {dt*1e3:8.2f} ms   {fl/dt/1e12:6.1f} TF/s")
    return dt


def fa_fused(xx):
    return jax.vmap(fused_feature_attention_ln)(xx, wqkv, wout)


def fa_xla(xx):
    return jax.vmap(
        lambda xi, wq, wo: _layer_norm(
            xi + self_attention(xi, wq, wo, compute_dtype=cd)
        ).astype(cd)
    )(xx, wqkv, wout)


def mlp_fused(xx):
    return jax.vmap(fused_mlp_ln)(xx, w1, w2)


def mlp_xla(xx):
    return jax.vmap(
        lambda xi, a, bb: _layer_norm(xi + _mlp(xi, a, bb, cd)).astype(cd)
    )(xx, w1, w2)


def with_bwd(fn):
    def step(xx):
        def loss(xi):
            return jnp.sum(fn(xi).astype(jnp.float32) ** 2)

        g = jax.grad(loss)(xx)
        return (xx + 1e-6 * g).astype(cd)

    return step


flops_fa = G * S * t * (4 * e * e * 2 + 2 * t * d * h * 2)
flops_mlp = G * S * t * (2 * e * H * 2)
print(f"per-call tunnel baseline: {base*1e3:.2f} ms")
for name, fn, fl in [
    ("feature_attn_ln fused fwd", fa_fused, flops_fa),
    ("feature_attn_ln xla   fwd", fa_xla, flops_fa),
    ("mlp_ln fused fwd", mlp_fused, flops_mlp),
    ("mlp_ln xla   fwd", mlp_xla, flops_mlp),
    ("feature_attn_ln fused fwd+bwd", with_bwd(fa_fused), 3 * flops_fa),
    ("feature_attn_ln xla   fwd+bwd", with_bwd(fa_xla), 3 * flops_fa),
    ("mlp_ln fused fwd+bwd", with_bwd(mlp_fused), 3 * flops_mlp),
    ("mlp_ln xla   fwd+bwd", with_bwd(mlp_xla), 3 * flops_mlp),
]:
    time_chained(name, fn, fl)
