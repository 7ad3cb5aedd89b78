"""Probe: feature-attn fused kernel block_rows x vmem_limit sweep at the n=4
item-major sweep shape.

SOL table (probe_sol_table.py) shows feat_attn_im fwd at 25% / fwd+bwd at 16%
of the component roofline. The bwd block is pinned to 16 rows by the 16 MB
default scoped-VMEM limit (pallas_fused.py::_ATTN_BWD_BLOCK_ROWS); round 3
only tested raising vmem_limit at SHIPPED block sizes (a wash). This probe
raises the limit AND the block together: per-cell fixed overhead (unrolled
6-head tiny-dot chains, relayouts, LN) amortizes over rows.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

import multimodalpfn_tpu.ops.pallas_fused as pf

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


def timed(f):
    jf = jax.jit(f)
    yy = jf(x0)
    float(yy.sum())
    ts = []
    for _ in range(2):
        tt = time.time()
        z = x0
        for _ in range(K):
            z = jf(z)
        float(z.sum())
        ts.append((time.time() - tt) / K - base)
    return float(np.median(ts)) * 1e3


def fwd_fn(blk):
    def f(xx):
        return jax.vmap(
            lambda xi, wq, wo: pf.fused_feature_attention_ln_im(
                xi, wq, wo, block_rows=blk
            )
        )(xx, wqkv, wout)

    return f


def with_bwd(fn):
    def step(xx):
        def loss(xi):
            return jnp.sum(fn(xi).astype(jnp.float32) ** 2)

        g = jax.grad(loss)(xx)
        return (xx + 1e-6 * g).astype(cd)

    return step


orig_cp = pf._compiler_params
orig_bwd_rows = pf._ATTN_BWD_BLOCK_ROWS

import os
_cfg = os.environ.get("SWEEP_CONFIGS", "32:16:0,64:32:100,128:64:100,128:128:100")
CONFIGS = [
    tuple(None if v == "0" and k == 2 else int(v) for k, v in enumerate(c.split(":")))
    for c in _cfg.split(",")
]

print(f"{'fwdblk':>6s} {'bwdblk':>6s} {'vmemMB':>6s} {'fwd ms':>8s} {'f+b ms':>8s}")
for fb, bb, vm in CONFIGS:
    if vm is None:
        pf._compiler_params = orig_cp
    else:
        def patched(*sem, _vm=vm, **kw):  # kw: production's vmem_limit_mb
            return pltpu.CompilerParams(
                dimension_semantics=sem, vmem_limit_bytes=_vm * 1024 * 1024
            )

        pf._compiler_params = patched
    pf._ATTN_BWD_BLOCK_ROWS = bb
    try:
        fms = timed(fwd_fn(fb))
    except Exception as ex:  # compile overflow etc.
        fms = float("nan")
        print(f"  fwd blk={fb} failed: {str(ex)[:120]}", flush=True)
    try:
        bms = timed(with_bwd(fwd_fn(fb)))
    except Exception as ex:
        bms = float("nan")
        print(f"  bwd blk={bb} failed: {str(ex)[:120]}", flush=True)
    print(f"{fb:6d} {bb:6d} {str(vm):>6s} {fms:8.2f} {bms:8.2f}", flush=True)

pf._compiler_params = orig_cp
pf._ATTN_BWD_BLOCK_ROWS = orig_bwd_rows
