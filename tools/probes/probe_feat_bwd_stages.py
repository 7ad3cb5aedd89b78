"""Probe: stage attribution of the feat-attn fused backward (round-5 verdict #5).

Replaces probe_attn_bwd_ablate.py, whose harness compared a monkeypatched core
against the original through different code paths and produced a nonsense
"full" time. Here EVERY variant — including "full" — is built by the same
core-substitution, timed with the probe_merge_cost harness (fresh operands,
K back-to-back dispatches, one sync, tunnel baseline subtracted), at the n=4
sweep shape (G=4, t=30, S=1470, e=192, bf16, vmapped over G like production).

Stages of `_feat_attn_bwd_core` (ops/pallas_fused.py):
  proj       recompute q/k/v projections (3 full-depth dots)
  scores     per-head s/softmax/o recompute (loop 1)
  ln         LN backward (VPU)
  wout       dWout + do big dots
  loop2      per-head dp/ds/dq/dk/dv tiny-dot chains
  dxdw       dx + dWq/dWk/dWv big dots
The 'floor' variant keeps ONLY the block DMA + relayout + a dx passthrough:
what remains when every compute stage is removed.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import multimodalpfn_tpu.ops.pallas_fused as pf

G, t, S, e = 4, 30, 1470, 192
h, d = 6, 32
cd = jnp.bfloat16
K = 10

rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.normal(size=(G, 1, t, S, e)), cd)
g0 = jnp.asarray(rng.normal(size=(G, 1, t, S, e)), cd)
wqkv = jnp.asarray(rng.normal(size=(G, 3, h, d, e)) * 0.05, jnp.float32)
wout = jnp.asarray(rng.normal(size=(G, h, d, e)) * 0.05, jnp.float32)

# baseline on a SMALL array: the result fetch must be bytes, not the 64 MB
# operand (the first version of this probe fetched dx itself and measured
# the tunnel's ~400 ms/64MB download instead of the kernel)
ident = jax.jit(lambda a: a * 1.000001)
z0 = jnp.zeros((8, 128), jnp.float32)
np.asarray(ident(z0))
t0 = time.time()
z = z0
for _ in range(K):
    z = ident(z)
np.asarray(z)
base = time.time() - t0
print(f"tunnel baseline {base / K * 1e3:.2f} ms/slot", flush=True)


def make_core(keep: set):
    """Rebuild _feat_attn_bwd_core with stages outside `keep` stubbed by
    cheap same-shape placeholders (results WRONG — timing only)."""

    def core(x, g, wqkv_ref, wout_ref, *, h, d, sm_scale, key_mask_cols):
        g32 = g.astype(jnp.float32)
        R, t_, e_ = x.shape
        wq, wk, wv = wqkv_ref[0], wqkv_ref[1], wqkv_ref[2]
        wout2 = wout_ref[...].reshape(h * d, e_)

        if "proj" in keep:
            def proj(w):
                return pf._dot_g(
                    x, w, (((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(x.dtype)

            q = proj(wq) * jnp.asarray(sm_scale, x.dtype)
            k = proj(wk)
            v = proj(wv)
        else:
            q = k = v = x[..., : h * d] if e_ >= h * d else x
        ps, os_ = [], []
        if "scores" in keep:
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
        else:
            ps = [jnp.zeros((R, t_, t_), jnp.float32)] * h
            o_all = v
        if "wout" in keep:
            u32 = x.astype(jnp.float32) + pf._dot_g(
                o_all, wout2, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            u32 = x.astype(jnp.float32)
        du = pf._ln_rows_bwd(u32, g32) if "ln" in keep else g32
        du_c = du.astype(x.dtype)
        x2 = x.reshape(R * t_, e_)
        du2 = du_c.reshape(R * t_, e_)
        if "wout" in keep:
            dwout_all = pf._dot_g(
                o_all.reshape(R * t_, h * d), du2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            do_all = pf._dot_g(
                du_c, wout2, (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        else:
            dwout_all = jnp.zeros((h * d, e_), jnp.float32)
            do_all = du_c[..., : h * d] if e_ >= h * d else du_c
        if "loop2" in keep:
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
        else:
            dq_all = dk_all = dv_all = do_all
        if "dxdw" in keep:
            dx = du
            for dgrad, w in ((dq_all, wq), (dk_all, wk), (dv_all, wv)):
                dx = dx + pf._dot_g(
                    dgrad, w, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
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
        else:
            dx = du
            dwq_all = dwk_all = dwv_all = jnp.zeros((h * d, e_), jnp.float32)
        return dx, dwq_all, dwk_all, dwv_all, dwout_all

    return core


def bwd_fn():
    def one(xi, gi, wq, wo):
        dx, dwq, dwo = pf._attn_bwd_call_im(
            xi, wq, wo, gi, pf._ATTN_BWD_BLOCK_ROWS
        )
        # reduce IN-jit so the per-call fetch is a scalar, not 64 MB of dx
        return jnp.sum(dx.astype(jnp.float32))

    return jax.jit(lambda a, b, c, d_: jnp.sum(jax.vmap(one)(a, b, c, d_)))


ALL = {"proj", "scores", "ln", "wout", "loop2", "dxdw"}
VARIANTS = [
    ("orig (unpatched)", None),
    ("full (rebuilt)", ALL),
    ("- loop2", ALL - {"loop2"}),
    ("- scores", ALL - {"scores"}),
    ("- scores - loop2", ALL - {"scores", "loop2"}),
    ("- ln", ALL - {"ln"}),
    ("- dxdw", ALL - {"dxdw"}),
    ("- wout", ALL - {"wout"}),
    ("proj only", {"proj"}),
    ("floor (DMA+relayout)", set()),
]

orig = pf._feat_attn_bwd_core
for name, keep in VARIANTS:
    pf._feat_attn_bwd_core = orig if keep is None else make_core(keep)
    try:
        f = bwd_fn()
        out = f(x0, g0, wqkv, wout)
        np.asarray(out)  # compile
        ts = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(K):
                out = f(x0, g0, wqkv, wout)
            np.asarray(out)
            ts.append((time.time() - t0 - base) / K)
        ms = float(np.median(ts)) * 1e3
        print(f"{name:22s} {ms:8.2f} ms", flush=True)
    except Exception as ex:
        print(f"{name:22s} FAILED: {str(ex)[:160]}", flush=True)
pf._feat_attn_bwd_core = orig
