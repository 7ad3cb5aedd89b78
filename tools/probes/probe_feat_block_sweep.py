"""Block-size sweep for the fused feature-attn kernel (im layout), with the
Pallas scoped-VMEM limit raised from the 16 MB default.

The shipped defaults (fwd 32 rows, bwd 16 rows) came from OOMs under the
default limit; v5e has 128 MB of VMEM, so raising `vmem_limit_bytes` should
unlock much larger blocks and amortize per-grid-cell overhead.
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

VMEM = int(sys.argv[2]) * 1024 * 1024 if len(sys.argv) > 2 else 100 * 1024 * 1024


def _params_vmem(*semantics):
    return pltpu.CompilerParams(
        dimension_semantics=semantics, vmem_limit_bytes=VMEM
    )


pf._compiler_params = _params_vmem

G = int(sys.argv[1]) if len(sys.argv) > 1 else 4
b, S, t, e, h, d = 1, 1470, 30, 192, 6, 32
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


def timed(f):
    try:
        float(f(x0).sum())  # compile
    except Exception as ex:
        return None, repr(ex)[:120]
    base = measure_base()
    t0 = time.time()
    y = x0
    for _ in range(K):
        y = f(y)
    float(y.sum())
    return (time.time() - t0) / K - base, None


print(f"vmem_limit={VMEM // (1024*1024)} MB", flush=True)
for br in (32, 64, 128, 256, 512):
    f = jax.jit(
        lambda xx, br=br: jax.vmap(
            lambda xi, wq, wo: pf.fused_feature_attention_ln_im(
                xi, wq, wo, block_rows=br
            )
        )(xx, wqkv, wout)
    )
    dt, err = timed(f)
    msg = f"{dt*1e3:8.2f} ms" if dt is not None else f"FAIL {err}"
    print(f"fwd block={br:4d}  {msg}", flush=True)

for bwd_br in (16, 32, 64, 128, 256):
    pf._ATTN_BWD_BLOCK_ROWS = bwd_br

    def step(xx, bwd_br=bwd_br):
        def loss(xi):
            out = jax.vmap(
                lambda x1, wq, wo: pf.fused_feature_attention_ln_im(
                    x1, wq, wo, block_rows=max(64, bwd_br)
                )
            )(xi, wqkv, wout)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(xx)
        return (xx + 1e-6 * g).astype(cd)

    dt, err = timed(jax.jit(step))
    msg = f"{dt*1e3:8.2f} ms" if dt is not None else f"FAIL {err}"
    print(f"fwd+bwd bwd_block={bwd_br:4d}  {msg}", flush=True)
