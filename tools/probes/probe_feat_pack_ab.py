"""Interleaved in-process A/B of the row-packed feature-attn score tiles.

Monkeypatches `_row_group` to 1 (unpacked) vs normal (packed) and jits each
variant separately; interleaving the timed reps cancels the axon tunnel's
run-to-run drift that separate-process A/Bs (probe_sublayer_im.py) cannot.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import multimodalpfn_tpu.ops.pallas_fused as pf

G = int(sys.argv[1]) if len(sys.argv) > 1 else 4
b, S, t, e, h, d, H = 1, 1470, 30, 192, 6, 32, 768
cd = jnp.bfloat16
K = 30

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(G, b, t, S, e)), cd)
wqkv = jnp.asarray(rng.normal(size=(G, 3, h, d, e)) * 0.05, jnp.float32)
wout = jnp.asarray(rng.normal(size=(G, h, d, e)) * 0.05, jnp.float32)

ident = jax.jit(lambda x: x * 1.000001)
_ = float(ident(x0).sum())


def measure_base():
    t0 = time.time()
    y = x0
    for _ in range(K):
        y = ident(y)
    float(y.sum())
    return (time.time() - t0) / K


_orig_row_group = pf._row_group


def build(packed: bool, bwd: bool):
    pf._row_group = _orig_row_group if packed else (lambda R, t: 1)
    try:
        def fa(xx):
            return jax.vmap(pf.fused_feature_attention_ln_im)(xx, wqkv, wout)

        if bwd:
            def step(xx):
                def loss(xi):
                    return jnp.sum(fa(xi).astype(jnp.float32) ** 2)

                g = jax.grad(loss)(xx)
                return (xx + 1e-6 * g).astype(cd)
        else:
            step = fa
        f = jax.jit(step)
        float(f(x0).sum())  # compile NOW, while the patch is active
        return f
    finally:
        pf._row_group = _orig_row_group


def timed(f, base):
    t0 = time.time()
    y = x0
    for _ in range(K):
        y = f(y)
    float(y.sum())
    return (time.time() - t0) / K - base


for bwd in (False, True):
    fp = build(True, bwd)
    fu = build(False, bwd)
    ps, us = [], []
    for rep in range(4):
        base = measure_base()
        ps.append(timed(fp, base))
        us.append(timed(fu, base))
    tag = "fwd+bwd" if bwd else "fwd"
    print(
        f"feat_attn {tag:8s} packed {np.median(ps)*1e3:7.2f} ms"
        f"   unpacked {np.median(us)*1e3:7.2f} ms"
        f"   (reps p={['%.2f' % (v*1e3) for v in ps]},"
        f" u={['%.2f' % (v*1e3) for v in us]})",
        flush=True,
    )
