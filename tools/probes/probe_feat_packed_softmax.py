"""Probe: cross-head-PACKED softmax chains for the feat-attn fused backward.

The round-5 stage table (probe_feat_bwd_stages.py) showed the backward is
VPU-bound in the two per-head loops: each per-head elementwise/transcendental
op runs on (R, t8, t8) operands with t8=32 lanes — 25% VPU lane utilization.
This probe A/Bs a PACKED formulation: per-head MXU dots stay per-head, but the
exp / p-normalize / p⊙dp / ds chains run on head-concatenated (R, t8, h·t8)
registers (192 lanes at h=6, t8=32 — full VPU width). Segment reductions
(softmax denominator, delta) use a block-diagonal-ones matmul in the compute
dtype (MXU broadcast-back included: E @ Bseg where Bseg[j, k] = 1 iff
j//t8 == k//t8 gives each position its own segment's sum).

Variants:
  orig            shipped `_feat_attn_bwd_core`
  packed          per-head max/shift, packed exp+normalize+loop2 chains,
                  Bseg-matmul segment reductions
  packed-slices   same but segment sums via per-head lane slices (no Bseg)

Each variant is numerically checked against orig (f32, rel tol 1e-5) before
timing. Timing harness = probe_feat_bwd_stages (fresh operands, K chained
dispatches, one scalar sync, tunnel baseline subtracted), n=4 sweep shape.
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


def _segsum(E, h, t8, *, use_matmul: bool):
    """Per-segment (width t8) sums along the packed lane axis, broadcast back
    to every position of the segment. E: (R, tq, h*t8) f32."""
    if use_matmul:
        # built from iota IN-kernel: Pallas rejects captured array constants
        ri = jax.lax.broadcasted_iota(jnp.int32, (h * t8, h * t8), 0) // t8
        ci = jax.lax.broadcasted_iota(jnp.int32, (h * t8, h * t8), 1) // t8
        bseg = (ri == ci).astype(E.dtype)
        return pf._dot_g(
            E, bseg, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    parts = []
    for hh in range(h):
        z = jnp.sum(E[..., hh * t8:(hh + 1) * t8], axis=-1, keepdims=True)
        parts.append(jnp.broadcast_to(z, (*z.shape[:-1], t8)))
    return jnp.concatenate(parts, axis=-1)


def make_packed_core(*, seg_matmul: bool):
    def core(x, g, wqkv_ref, wout_ref, *, h, d, sm_scale, key_mask_cols):
        g32 = g.astype(jnp.float32)
        wq, wk, wv = wqkv_ref[0], wqkv_ref[1], wqkv_ref[2]
        R, t_, e_ = x.shape

        def proj(w):
            return pf._dot_g(
                x, w, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(x.dtype)

        q = proj(wq) * jnp.asarray(sm_scale, x.dtype)
        k = proj(wk)
        v = proj(wv)
        wout2 = wout_ref[...].reshape(h * d, e_)

        # --- loop 1: per-head MXU scores, PACKED softmax chain ---
        shifted = []
        for hh in range(h):
            q_h = q[..., hh * d:(hh + 1) * d]
            k_h = k[..., hh * d:(hh + 1) * d]
            s = pf._dot_g(
                q_h, k_h, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (R, t, t)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(col < key_mask_cols, s, pf.MASK_VALUE)
            mx = jnp.max(s, axis=-1, keepdims=True)
            shifted.append(s - mx)
        S_ = jnp.concatenate(shifted, axis=-1)  # (R, t, h*t) packed lanes
        E = jnp.exp(S_)  # full-width transcendental
        Z = _segsum(E.astype(x.dtype) if seg_matmul else E, h, t_,
                    use_matmul=seg_matmul)
        P = E * (1.0 / Z)  # (R, t, h*t) f32, packed normalize
        P_c = P.astype(x.dtype)

        os_ = []
        for hh in range(h):
            o_h = pf._dot_g(
                P_c[..., hh * t_:(hh + 1) * t_], v[..., hh * d:(hh + 1) * d],
                (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
            )
            os_.append(o_h.astype(x.dtype))
        o_all = jnp.concatenate(os_, axis=-1)  # (R, t, h*d)

        u32 = x.astype(jnp.float32) + pf._dot_g(
            o_all, wout2, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
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

        # --- loop 2: per-head dp MXU, PACKED delta/ds chain ---
        dps = []
        for hh in range(h):
            dp_h = pf._dot_g(
                do_all[..., hh * d:(hh + 1) * d], v[..., hh * d:(hh + 1) * d],
                (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
            )
            dps.append(dp_h)
        DP = jnp.concatenate(dps, axis=-1)  # (R, t, h*t) f32
        T = P * DP
        Delta = _segsum(T.astype(x.dtype) if seg_matmul else T, h, t_,
                        use_matmul=seg_matmul)
        DS = (P * (DP - Delta)).astype(x.dtype)  # packed

        dqs, dks, dvs = [], [], []
        for hh in range(h):
            ds_h = DS[..., hh * t_:(hh + 1) * t_]
            p_h = P_c[..., hh * t_:(hh + 1) * t_]
            q_h = q[..., hh * d:(hh + 1) * d]
            k_h = k[..., hh * d:(hh + 1) * d]
            do_h = do_all[..., hh * d:(hh + 1) * d]
            dq_h = pf._dot_g(
                ds_h, k_h, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * sm_scale
            dk_h = pf._dot_g(
                ds_h, q_h, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            dv_h = pf._dot_g(
                p_h, do_h, (((1,), (1,)), ((0,), (0,))),
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


def main():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(G, 1, t, S, e)), cd)
    g0 = jnp.asarray(rng.normal(size=(G, 1, t, S, e)), cd)
    wqkv = jnp.asarray(rng.normal(size=(G, 3, h, d, e)) * 0.05, jnp.float32)
    wout = jnp.asarray(rng.normal(size=(G, h, d, e)) * 0.05, jnp.float32)

    # --- correctness first: f32 small shape vs orig core ---
    xs = jnp.asarray(rng.normal(size=(1, t, 96, e)), jnp.float32)
    gs = jnp.asarray(rng.normal(size=(1, t, 96, e)), jnp.float32)
    wq1 = jnp.asarray(rng.normal(size=(3, h, d, e)) * 0.05, jnp.float32)
    wo1 = jnp.asarray(rng.normal(size=(h, d, e)) * 0.05, jnp.float32)
    orig = pf._feat_attn_bwd_core
    with jax.default_matmul_precision("highest"):
        ref = jax.jit(lambda a, b, c, d_: pf._attn_bwd_call_im(a, c, d_, b, 32))(
            xs, gs, wq1, wo1
        )
        ref = jax.device_get(ref)
        for name, segm in (("packed", True), ("packed-slices", False)):
            pf._feat_attn_bwd_core = make_packed_core(seg_matmul=segm)
            try:
                out = jax.jit(
                    lambda a, b, c, d_: pf._attn_bwd_call_im(a, c, d_, b, 32)
                )(xs, gs, wq1, wo1)
                out = jax.device_get(out)
                errs = [
                    float(np.abs(np.asarray(o, np.float64) - np.asarray(r, np.float64)).max()
                          / (np.abs(np.asarray(r, np.float64)).max() + 1e-30))
                    for o, r in zip(out, ref)
                ]
                print(f"{name:14s} parity rel errs {['%.2e' % v for v in errs]}",
                      flush=True)
            except Exception as ex:
                print(f"{name:14s} parity FAILED: {str(ex)[:200]}", flush=True)
            finally:
                pf._feat_attn_bwd_core = orig

    # --- timing harness (probe_feat_bwd_stages protocol) ---
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

    def bwd_fn():
        def one(xi, gi, wq, wo):
            dx, dwq, dwo = pf._attn_bwd_call_im(
                xi, wq, wo, gi, pf._ATTN_BWD_BLOCK_ROWS
            )
            return jnp.sum(dx.astype(jnp.float32))

        return jax.jit(lambda a, b, c, d_: jnp.sum(jax.vmap(one)(a, b, c, d_)))

    VARIANTS = [
        ("orig", None),
        ("packed", make_packed_core(seg_matmul=True)),
        ("packed-slices", make_packed_core(seg_matmul=False)),
    ]
    for name, core in VARIANTS:
        pf._feat_attn_bwd_core = orig if core is None else core
        try:
            f = bwd_fn()
            out = f(x0, g0, wqkv, wout)
            np.asarray(out)
            ts = []
            for _ in range(3):
                t0 = time.time()
                for _ in range(K):
                    out = f(x0, g0, wqkv, wout)
                np.asarray(out)
                ts.append((time.time() - t0 - base) / K)
            ms = float(np.median(ts)) * 1e3
            print(f"{name:14s} {ms:8.2f} ms/layer-G4", flush=True)
        except Exception as ex:
            print(f"{name:14s} FAILED: {str(ex)[:200]}", flush=True)
        finally:
            pf._feat_attn_bwd_core = orig


if __name__ == "__main__":
    main()
