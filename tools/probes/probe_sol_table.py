"""Probe: per-kernel achieved vs component speed-of-light at the n=4 sweep
shape (round-3 verdict #2: "publish the per-kernel SOL table and close what
it exposes").

For each fused kernel (item sublayer, feat-attn+LN, MLP+LN; fwd and fwd+bwd)
at the item-major sweep shape, prints:

  achieved ms | executed TF/s | component-SOL ms | % of SOL

Component SOL model (documented, approximate):
  t_sol = max( sum_i flops_i / (peak * eff_i),  hbm_bytes / bw )
with eff_i = 1.0 for contractions >=128 deep (e=192 projections pay their own
25% pad tax inside the 256-tile: eff 0.75; H=768 full), and 0.25 for the d=32
attention score/AV contractions (32/128 MXU systolic depth). Executed FLOPs
count what actually runs: backward = 2x forward matmuls + the kernels'
in-VMEM forward recompute (so fwd+bwd executes ~3x fwd), consistent with the
bench's MFU convention.

v5e: peak 197 TF/s bf16, HBM ~819 GB/s.
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
from multimodalpfn_tpu.ops.pallas_item_fused import fused_item_sublayer

PEAK = 197e12
BW = 819e9

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

ident = jax.jit(lambda a: a * 1.000001)
_ = float(ident(x0).sum())
t0 = time.time()
z = x0
for _ in range(K):
    z = ident(z)
float(z.sum())
base = (time.time() - t0) / K
print(f"tunnel baseline {base*1e3:.2f} ms", flush=True)

A = 2 * G * b * t * S * e  # activation bytes (bf16) for one (G,b,t,S,e) array

# --- component FLOP decomposition (forward) ---------------------------------
EFF_PROJ = 0.75  # e=192 contractions: 192 of a 256-deep double tile
EFF_D32 = 0.25  # d=32 score/AV contractions
fa_proj = G * S * t * 4 * e * e * 2  # qkv + out projections
fa_attn = G * S * t * 2 * t * d * h * 2  # scores + AV over t tokens
mlp_fl = G * S * t * 2 * e * H * 2
it_proj = G * t * S * 4 * e * e * 2
it_attn = G * t * h * d * 2 * 2 * (sep * sep + (S - sep) * sep)


def sol(flops_parts, bytes_moved):
    t_mxu = sum(fl / (PEAK * eff) for fl, eff in flops_parts)
    return max(t_mxu, bytes_moved / BW)


CASES = {
    # fwd: read x, write out (weights are KB-scale)
    "feat_attn_im fwd": (
        lambda xx: jax.vmap(fused_feature_attention_ln_im)(xx, wqkv, wout),
        [(fa_proj, EFF_PROJ), (fa_attn, EFF_D32)],
        2 * A,
    ),
    "mlp_im fwd": (
        lambda xx: jax.vmap(fused_mlp_ln)(xx, w1, w2),
        [(mlp_fl, 1.0)],
        2 * A,
    ),
    "item_sublayer fwd": (
        lambda xx: jax.vmap(
            lambda xi, wq, wo: fused_item_sublayer(
                xi, wq, wo, single_eval_pos=sep, compute_dtype=cd
            )
        )(xx, wqkv, wout),
        [(it_proj, EFF_PROJ), (it_attn, EFF_D32)],
        2 * A,
    ),
}


def with_bwd(fn):
    def step(xx):
        def loss(xi):
            return jnp.sum(fn(xi).astype(jnp.float32) ** 2)

        g = jax.grad(loss)(xx)
        return (xx + 1e-6 * g).astype(cd)

    return step


rows = []
for name, (fn, parts, nbytes) in list(CASES.items()):
    # fwd+bwd: executed = 3x forward matmul work (bwd 2x + in-kernel recompute
    # ~1x); bytes = x in, dx out, saved residuals in+out ~ 4 passes
    CASES_B = (
        with_bwd(fn),
        [(3 * fl, eff) for fl, eff in parts],
        4 * nbytes / 2 * 2,
    )
    for label, (f, p, nb) in ((name, (fn, parts, nbytes)),
                              (name.replace(" fwd", " fwd+bwd"), CASES_B)):
        jf = jax.jit(f)
        yy = jf(x0)
        float(yy.sum())  # scalar fetch: device sum, not a 34 MB array pull
        ts = []
        for _ in range(3):
            t0 = time.time()
            z = x0
            for _ in range(K):
                z = jf(z)
            float(z.sum())
            ts.append((time.time() - t0) / K - base)
        dt = float(np.median(ts))
        fl_total = sum(fl for fl, _ in p)
        t_sol = sol(p, nb)
        rows.append((label, dt * 1e3, fl_total / dt / 1e12, t_sol * 1e3,
                     100 * t_sol / dt))

print(f"{'kernel':28s} {'ms':>8s} {'TF/s':>7s} {'SOL ms':>8s} {'%SOL':>6s}")
for label, ms, tf, solms, pct in rows:
    print(f"{label:28s} {ms:8.2f} {tf:7.1f} {solms:8.2f} {pct:6.1f}")
