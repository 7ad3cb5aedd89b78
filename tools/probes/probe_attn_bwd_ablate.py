"""Ablate the feat-attn fused BACKWARD kernel to attribute its 6.6-6.9 ms
(16% of component SOL): time the full bwd, then variants with stages knocked
out (results are WRONG — timing only). Also times a shared-erf MLP bwd gelu.

Stages in _feat_attn_bwd_core:
  1. recompute projections + per-head scores/softmax/o   (loop 1)
  2. LN bwd (du)
  3. dWout/do big dots
  4. per-head dp/ds/dq/dk/dv tiny-dot chains             (loop 2)
  5. dx + dWq/dWk/dWv big dots
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
    jax.tree.map(lambda a: float(jnp.asarray(a).sum()), yy)
    ts = []
    for _ in range(2):
        tt = time.time()
        z = x0
        for _ in range(K):
            z = jf(z)
        float(z[0].sum() if isinstance(z, tuple) else z.sum())
        ts.append((time.time() - tt) / K - base)
    return float(np.median(ts)) * 1e3


def bwd_only(xx):
    # raw bwd call (not fwd+bwd): dx feeds the chain
    def one(xi, wq, wo):
        dx, _, _ = pf._attn_bwd_call_im(
            xi.reshape(b, t, S, e), wq.reshape(3, h, d, e), wo, xi.reshape(b, t, S, e),
            pf._ATTN_BWD_BLOCK_ROWS,
        )
        return dx.reshape(xi.shape).astype(cd)

    return jax.vmap(one)(xx.reshape(G, b * t, S, e), wqkv.reshape(G, 3 * h, d, e), wout)


orig_core = pf._feat_attn_bwd_core


def make_ablated(skip):
    def core(x, g, wqkv_ref, wout_ref, *, h, d, sm_scale, key_mask_cols):
        import math as _m

        g32 = g.astype(jnp.float32)
        wq, wk, wv = wqkv_ref[0], wqkv_ref[1], wqkv_ref[2]

        def proj(w):
            return pf._dot_g(
                x, w, (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)

        q = proj(wq) * jnp.asarray(sm_scale, x.dtype)
        k = proj(wk)
        v = proj(wv)
        R, t_, e_ = x.shape
        wout2 = wout_ref[...].reshape(h * d, e_)
        ps, os_ = [], []
        if "scores" in skip:
            zero_p = jnp.zeros((R, t_, t_), jnp.float32)
            for hh in range(h):
                ps.append(zero_p)
                os_.append(v[..., hh * d : (hh + 1) * d])
        else:
            for hh in range(h):
                q_h = q[..., hh * d : (hh + 1) * d]
                k_h = k[..., hh * d : (hh + 1) * d]
                v_h = v[..., hh * d : (hh + 1) * d]
                s = pf._dot_g(
                    q_h, k_h, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
                s = jnp.where(col < key_mask_cols, s, pf.MASK_VALUE)
                mx = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - mx)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                o_h = pf._dot_g(
                    p.astype(v_h.dtype), v_h, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                ps.append(p)
                os_.append(o_h.astype(x.dtype))
        o_all = jnp.concatenate(os_, axis=-1)
        u32 = x.astype(jnp.float32) + pf._dot_g(
            o_all, wout2, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if "ln" in skip:
            du = g32
        else:
            du = pf._ln_rows_bwd(u32, g32)
        du_c = du.astype(x.dtype)
        x2 = x.reshape(R * t_, e_)
        du2 = du_c.reshape(R * t_, e_)
        dwout_all = pf._dot_g(
            o_all.reshape(R * t_, h * d), du2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        do_all = pf._dot_g(
            du_c, wout2, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if "loop2" in skip:
            dq_all = do_all
            dk_all = do_all
            dv_all = do_all
        else:
            dqs, dks, dvs = [], [], []
            for hh in range(h):
                q_h = q[..., hh * d : (hh + 1) * d]
                k_h = k[..., hh * d : (hh + 1) * d]
                v_h = v[..., hh * d : (hh + 1) * d]
                p = ps[hh]
                do_c = do_all[..., hh * d : (hh + 1) * d]
                dp = pf._dot_g(
                    do_c, v_h, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                delta = jnp.sum(p * dp, axis=-1, keepdims=True)
                ds = (p * (dp - delta)).astype(x.dtype)
                dq_h = pf._dot_g(
                    ds, k_h, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                ) * sm_scale
                dk_h = pf._dot_g(
                    ds, q_h, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                dv_h = pf._dot_g(
                    p.astype(do_c.dtype), do_c, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                dqs.append(dq_h.astype(x.dtype))
                dks.append(dk_h.astype(x.dtype))
                dvs.append(dv_h.astype(x.dtype))
            dq_all = jnp.concatenate(dqs, axis=-1)
            dk_all = jnp.concatenate(dks, axis=-1)
            dv_all = jnp.concatenate(dvs, axis=-1)
        dx = du
        for dgrad, w in ((dq_all, wq), (dk_all, wk), (dv_all, wv)):
            dx = dx + pf._dot_g(
                dgrad, w, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if "dw" in skip:
            dwq_all = dwout_all * 0 + 1.0
            dwk_all = dwq_all
            dwv_all = dwq_all
        else:
            dwq_all = pf._dot_g(
                dq_all.reshape(R * t_, h * d), x2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dwk_all = pf._dot_g(
                dk_all.reshape(R * t_, h * d), x2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dwv_all = pf._dot_g(
                dv_all.reshape(R * t_, h * d), x2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return dx, dwq_all, dwk_all, dwv_all, dwout_all

    return core


for name, skip in [
    ("full", set()),
    ("no-loop2", {"loop2"}),
    ("no-scores", {"scores"}),
    ("no-scores-loop2", {"scores", "loop2"}),
    ("no-ln", {"ln"}),
    ("no-dw", {"dw"}),
]:
    pf._feat_attn_bwd_core = make_ablated(skip) if skip else orig_core
    try:
        ms = timed(bwd_only)
    except Exception as ex:
        ms = float("nan")
        print(f"  {name} failed: {str(ex)[:150]}", flush=True)
    print(f"{name:18s} {ms:8.2f} ms", flush=True)

pf._feat_attn_bwd_core = orig_core
