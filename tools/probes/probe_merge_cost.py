"""Probe: calibrate the cross-width merge cost model (round-5 ask #1).

The round-4 gate merged same-sep width groups only when relative padding
<= 0.25 — a static guess that missed the flagship bench ensemble (widths
39/39/22/22, pad 0.28) by 0.03 while the builder's own phase probe said the
split costs ~60% extra device time. This probe measures, tunnel-corrected,
the REAL device cost of:

  * the merged padded+masked 4-member forward (one dispatch), vs
  * the split two 2-member forwards (two dispatches, one final sync),

and a grid of (n_members, width) single-group timings to fit
    T(n, t_tokens) ~= OVERHEAD_MS + flops(n, t) / EFF_RATE
whose constants parameterize `estimator/inference._estimate_group_ms`.

Run on the real chip: python tools/probes/probe_merge_cost.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
from multimodalpfn_tpu.models.params import init_params
from multimodalpfn_tpu.models.transformer import forward
from multimodalpfn_tpu.estimator.inference import _merge_width_aux

SEP, NTEST, CAP = 1838, 512, 8
S = SEP + NTEST
K = 8  # dispatches per timing rep

cfg = ModelConfig(
    emsize=192, nhead=6, nhid_factor=4, nlayers=12, features_per_group=1,
    n_out=10, max_num_classes=10, compute_dtype="bfloat16",
    use_flash=True, fused_ops=True, fused_item=True,
    mixer=MixerConfig(mixer_type="MGM+CAP", mgm_heads=16, cap_heads=CAP, in_dim=768),
)
params = init_params(jax.random.PRNGKey(0), cfg, model_seed=0)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(1, S, 1, 768)), jnp.float32)

fwd = jax.jit(
    forward,
    static_argnames=("cfg", "single_eval_pos", "train", "remat", "return_embeddings"),
)

# tunnel baseline: fixed per-sync latency to subtract
ident = jax.jit(lambda a: a * 1.000001)
z0 = jnp.zeros((4, 64), jnp.float32)
_ = np.asarray(ident(z0))
t0 = time.time()
z = z0
for _ in range(K):
    z = ident(z)
np.asarray(z)
base = time.time() - t0  # per K-chain of dispatches + one sync
print(f"tunnel baseline {base/K*1e3:.1f} ms/dispatch-chain-slot", flush=True)


def member_x(w, n):
    return jnp.asarray(rng.normal(size=(n, S, w)), jnp.float32)


def time_group(n, w, tab_valid=None, noise=None, reps=3):
    x = member_x(w, n)
    y = jnp.asarray(rng.integers(0, 6, size=(n, SEP)), jnp.float32)
    tv = None if tab_valid is None else jnp.asarray(tab_valid)
    nz = None if noise is None else jnp.asarray(noise)
    out = fwd(params, cfg, x, y, img, single_eval_pos=SEP,
              tab_valid=tv, feat_pos_noise=nz)
    np.asarray(out)  # compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(K):
            out = fwd(params, cfg, x, y, img, single_eval_pos=SEP,
                      tab_valid=tv, feat_pos_noise=nz)
        np.asarray(out)
        ts.append((time.time() - t0 - base) / K)
    return float(np.median(ts))


# ---- single-group grid for the cost-model fit
print("\nsingle-group grid (n members, tab width -> ms):", flush=True)
grid = {}
for n in (1, 2, 4):
    for w in (22, 39):
        dt = time_group(n, w)
        grid[(n, w)] = dt * 1e3
        print(f"  n={n} w={w:3d} (t={w+CAP+1:3d} tokens): {dt*1e3:7.1f} ms", flush=True)

# ---- flagship decision A/B: merged vs split at widths 39/39/22/22
widths = [39, 39, 22, 22]
tab_valid, noise, wmax = _merge_width_aux(cfg, widths, CAP)
x_m = jnp.asarray(
    np.concatenate(
        [
            np.pad(rng.normal(size=(2, S, 39)), ((0, 0), (0, 0), (0, 0))),
            np.pad(rng.normal(size=(2, S, 22)), ((0, 0), (0, 0), (0, 17))),
        ]
    ).astype(np.float32)
)
y_m = jnp.asarray(rng.integers(0, 6, size=(4, SEP)), jnp.float32)
tv = jnp.asarray(tab_valid)
nz = jnp.asarray(noise)
out = fwd(params, cfg, x_m, y_m, img, single_eval_pos=SEP,
          tab_valid=tv, feat_pos_noise=nz)
np.asarray(out)
ts = []
for _ in range(3):
    t0 = time.time()
    for _ in range(K):
        out = fwd(params, cfg, x_m, y_m, img, single_eval_pos=SEP,
                  tab_valid=tv, feat_pos_noise=nz)
    np.asarray(out)
    ts.append((time.time() - t0 - base) / K)
t_merged = float(np.median(ts))
print(f"\nmerged 4-member masked (w=39 padded): {t_merged*1e3:7.1f} ms", flush=True)

# split: two dispatches per iteration, one sync
x_a = member_x(39, 2)
x_b = member_x(22, 2)
y_2 = jnp.asarray(rng.integers(0, 6, size=(2, SEP)), jnp.float32)
oa = fwd(params, cfg, x_a, y_2, img, single_eval_pos=SEP)
ob = fwd(params, cfg, x_b, y_2, img, single_eval_pos=SEP)
np.asarray(oa), np.asarray(ob)
ts = []
for _ in range(3):
    t0 = time.time()
    for _ in range(K):
        oa = fwd(params, cfg, x_a, y_2, img, single_eval_pos=SEP)
        ob = fwd(params, cfg, x_b, y_2, img, single_eval_pos=SEP)
    np.asarray(oa), np.asarray(ob)
    ts.append((time.time() - t0 - base) / K)
t_split = float(np.median(ts))
print(f"split 2x2-member (w=39 + w=22):      {t_split*1e3:7.1f} ms", flush=True)
print(f"merged/split = {t_merged/t_split:.3f}", flush=True)

# ---- fit T(n, t) = OH + n * c * flop_units(t); flop units ~ token-linear
# (item attention dominates and is linear in t at these shapes)
import itertools

rows = []
for (n, w), ms in grid.items():
    t = w + CAP + 1
    rows.append((1.0, n * t, ms))
A = np.array([[r[0], r[1]] for r in rows])
b = np.array([r[2] for r in rows])
coef, *_ = np.linalg.lstsq(A, b, rcond=None)
oh, c = coef
print(f"\nfit: T(n,t) ~= {oh:.1f} ms + n*t * {c:.4f} ms  (residuals:", flush=True)
for (n, w), ms in grid.items():
    t = w + CAP + 1
    pred = oh + n * t * c
    print(f"  n={n} w={w:3d}: measured {ms:7.1f} pred {pred:7.1f}", flush=True)
print(")", flush=True)
