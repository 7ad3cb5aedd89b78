"""Microbench: fused item-attention (in-kernel projections) vs flash path.

Compares `item_attention` with fused_item on/off at production shapes, fwd and
fwd+bwd, latency-corrected by chaining calls in one jit.

Usage: python tools/probes/probe_item_fused.py [G] [sep] [s_te]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from multimodalpfn_tpu.ops.attention import item_attention

G = int(sys.argv[1]) if len(sys.argv) > 1 else 120
SEP = int(sys.argv[2]) if len(sys.argv) > 2 else 1323
S_TE = int(sys.argv[3]) if len(sys.argv) > 3 else 147
E, H, D = 192, 6, 32

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((G, SEP + S_TE, E)), jnp.bfloat16)
w_qkv = jnp.asarray(rng.standard_normal((3, H, D, E)) * 0.05, jnp.float32)
w_out = jnp.asarray(rng.standard_normal((H, D, E)) * 0.05, jnp.float32)


def run(fused: bool, bwd: bool, n_chain: int = 8):
    def one(x):
        return item_attention(
            x, w_qkv, w_out, single_eval_pos=SEP, multiquery_test=True,
            compute_dtype=jnp.bfloat16, use_flash=True, fused_item=fused,
        )

    if bwd:
        def call(x):
            return jax.grad(lambda x: jnp.sum(one(x).astype(jnp.float32) ** 2))(x)
    else:
        call = one

    def chain(n):
        @jax.jit
        def f(x):
            def body(c, _):
                r = call(c)
                return (c + 0.0 * r.astype(c.dtype)[..., : c.shape[-1]]), r[0, 0, 0]
            c, rs = jax.lax.scan(body, x, None, length=n)
            return rs[-1]
        return f

    f1, fn = chain(1), chain(1 + n_chain)
    float(f1(x)); float(fn(x))
    ts = []
    for _ in range(3):
        t0 = time.time(); float(f1(x)); t1 = time.time()
        float(fn(x)); ts.append((time.time() - t1) - (t1 - t0))
    dt = float(np.median(ts)) / n_chain
    tag = ("fwd+bwd" if bwd else "fwd")
    print(f"G={G} S={SEP}+{S_TE} fused_item={fused} {tag}: {dt*1e3:.2f} ms", flush=True)


for fused in (False, True):
    run(fused, bwd=False)
for fused in (False, True):
    run(fused, bwd=True)
