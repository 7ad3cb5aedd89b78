"""Probe: feature-attn sublayer backward — fused Pallas vs XLA formulation.

The SOL table pins feat_attn_im fwd+bwd at ~16% of its component roofline
(8.2 ms/layer-G4); the backward's 6-head unrolled tiny-dot chains may lose to
XLA's batched-matmul lowering. Times, at the n=4 item-major sweep shape:

  A. shipped fused kernel (custom_vjp Pallas fwd + Pallas bwd)
  B. Pallas fwd + XLA bwd   (hybrid: jax.vjp of the XLA formulation)
  C. all-XLA (self_attention + residual + LN)

fwd-only and fwd+bwd walls, tunnel-corrected.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from multimodalpfn_tpu.ops.attention import self_attention
from multimodalpfn_tpu.ops.pallas_fused import fused_feature_attention_ln_im

G, b, t, S, e = 4, 1, 30, 1470, 192
h, d = 6, 32
cd = jnp.bfloat16
K = 15

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(G, b, t, S, e)), cd)
wqkv = jnp.asarray(rng.normal(size=(G, 3, h, d, e)) * 0.05, jnp.float32)
wout = jnp.asarray(rng.normal(size=(G, h, d, e)) * 0.05, jnp.float32)

ident = jax.jit(lambda a: a * 1.000001)
_ = float(ident(x0).sum())
t0 = time.time()
z = x0
for _ in range(K):
    z = ident(z)
float(z.sum())
base = (time.time() - t0) / K
print(f"tunnel baseline {base*1e3:.2f} ms", flush=True)


def _ln(x32):
    m = jnp.mean(x32, axis=-1, keepdims=True)
    v = jnp.mean((x32 - m) ** 2, axis=-1, keepdims=True)
    return (x32 - m) * jax.lax.rsqrt(v + 1e-5)


def xla_sublayer(xi, wq, wo):
    """XLA formulation on the item-major layout: attention over t per (b,s)."""
    # self_attention expects (..., t, e); xi is (b, t, s, e) -> (b, s, t, e)
    xs = jnp.swapaxes(xi, 1, 2)
    h_ = self_attention(xs, wq, wo, compute_dtype=cd)
    out = _ln(xs.astype(jnp.float32) + h_.astype(jnp.float32)).astype(cd)
    return jnp.swapaxes(out, 1, 2)


def fused(xi, wq, wo):
    return fused_feature_attention_ln_im(xi, wq, wo)


def hybrid(xi, wq, wo):
    @jax.custom_vjp
    def f(xi, wq, wo):
        return fused_feature_attention_ln_im(xi, wq, wo)

    def fwd(xi, wq, wo):
        return fused_feature_attention_ln_im(xi, wq, wo), (xi, wq, wo)

    def bwd(res, g):
        xi, wq, wo = res
        _, vjp = jax.vjp(xla_sublayer, xi, wq, wo)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f(xi, wq, wo)


def timed(f, with_grad):
    if with_grad:
        def step(xx):
            def loss(xi):
                y = jax.vmap(lambda a, wq, wo: f(a, wq, wo))(xi, wqkv, wout)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            g = jax.grad(loss)(xx)
            return (xx + 1e-6 * g).astype(cd)
    else:
        def step(xx):
            return jax.vmap(lambda a, wq, wo: f(a, wq, wo))(xx, wqkv, wout)

    jf = jax.jit(step)
    y = jf(x0)
    float(jnp.asarray(y).sum())
    ts = []
    for _ in range(2):
        tt = time.time()
        z = x0
        for _ in range(K):
            z = jf(z).astype(cd)
        float(jnp.asarray(z).sum())
        ts.append((time.time() - tt) / K - base)
    return float(np.median(ts)) * 1e3


for name, fn in [("fused", fused), ("hybrid", hybrid), ("xla", xla_sublayer)]:
    fw = timed(fn, False)
    fb = timed(fn, True)
    print(f"{name:8s} fwd {fw:7.2f} ms   fwd+bwd {fb:7.2f} ms", flush=True)
