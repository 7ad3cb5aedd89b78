"""Probe: fused feature-attention backward kernel cost (chained, device time)."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from multimodalpfn_tpu.ops import pallas_fused as pf

N, K = 6, 12
rng = np.random.default_rng(0)
m, t, e, h, d = 44100, 30, 192, 6, 32   # b*s rows at the episode shape
x = jnp.asarray(rng.normal(size=(m, t, e)), jnp.bfloat16)
wqkv = jnp.asarray(rng.normal(size=(3, h, d, e)) * 0.05, jnp.float32)
wout = jnp.asarray(rng.normal(size=(h, d, e)) * 0.05, jnp.float32)
g = jnp.asarray(rng.normal(size=(m, t, e)), jnp.bfloat16)

def bwd_only(z):
    dx, _, _ = pf._attn_bwd_call(z, wqkv, wout, g, int(sys.argv[1]) if len(sys.argv) > 1 else pf._ATTN_BWD_BLOCK_ROWS)
    return dx

def chained(z):
    def body(c, _):
        return bwd_only(c).astype(z.dtype), None
    out, _ = jax.lax.scan(body, z, None, length=K)
    return out

f1, fK = jax.jit(bwd_only), jax.jit(chained)
float(jnp.sum(f1(x).astype(jnp.float32))); float(jnp.sum(fK(x).astype(jnp.float32)))
ts = []
for _ in range(N):
    t0 = time.time(); float(jnp.sum(f1(x).astype(jnp.float32))); t1 = time.time()
    float(jnp.sum(fK(x).astype(jnp.float32))); t2 = time.time()
    ts.append(((t2 - t1) - (t1 - t0)) / (K - 1))
print(f"attn_bwd block={sys.argv[1] if len(sys.argv)>1 else pf._ATTN_BWD_BLOCK_ROWS}: {np.median(ts)*1e3:.2f} ms (one layer-equivalent)")
