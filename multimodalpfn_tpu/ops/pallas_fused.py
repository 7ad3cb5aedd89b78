"""Fused row-local encoder sublayers (Pallas TPU), inference path.

The dual-axis layer's feature-attention and MLP sublayers are row-local (each
(sample, member) row attends/transforms over its own t≈30-50 feature tokens).
Under XLA each sublayer materializes several (rows, t, ·) intermediates through
HBM (q/k/v, logits, softmax, the (rows, nhid) MLP hidden), which measures as
the bottleneck: ~7ms (attention) + ~4ms (MLP) per layer at PAD-UFES predict
shapes where the matmul FLOPs alone cost <1ms. These kernels keep a block of
rows resident in VMEM through the whole sublayer INCLUDING the residual add
and the post-norm LayerNorm (reference `layer.py:437-455` sublayer structure),
so HBM sees one read and one write of the activations.

Weight residency: at emsize 192 / nhid 768 all sublayer weights fit VMEM
(w_qkv+w_out ≈ 0.6 MB, w1+w2 ≈ 0.6 MB bf16) and are fetched once per grid
sweep (constant index map).

Inference-only: the training path keeps the XLA formulation (autodiff +
rematerialization there; these kernels define no VJP).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MASK_VALUE = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ln_rows(x32: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Affine-free LayerNorm over the last axis, fp32 in/out
    (matches models.transformer._layer_norm / reference `layer.py:236-246`)."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mean) ** 2, axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps)


# ---------------------------------------------------------------------------
# fused MLP + residual + post-norm:  out = LN(x + W2 · gelu(W1 · x))
# ---------------------------------------------------------------------------


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """erf via Abramowitz-Stegun 7.1.26 (max abs error 1.5e-7 ≈ f32 eps).
    Mosaic implements neither erf nor erfc, only exp."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _erf_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-erf gelu (reference mlp.py) to f32 accuracy."""
    return 0.5 * x * (1.0 + _erf(x * (1.0 / math.sqrt(2.0))))


def _mlp_kernel(x_ref, w1_ref, w2_ref, o_ref):
    x = x_ref[...]  # (R, e)
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = _erf_gelu(h)
    out = jax.lax.dot_general(
        h.astype(x.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = _ln_rows(x.astype(jnp.float32) + out).astype(o_ref.dtype)


def fused_mlp_ln(
    x: jnp.ndarray, w1: jnp.ndarray, w2: jnp.ndarray, *, block_rows: int = 512
) -> jnp.ndarray:
    """x: (..., e) any leading shape; returns LN(x + mlp(x)) in x.dtype."""
    lead = x.shape[:-1]
    e = x.shape[-1]
    m = 1
    for n in lead:
        m *= n
    x2 = x.reshape(m, e)
    m_pad = _round_up(m, block_rows)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        _mlp_kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, e), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(m_pad // block_rows,),
            in_specs=[
                pl.BlockSpec((block_rows, e), lambda i: (i, 0)),
                pl.BlockSpec((e, w1.shape[1]), lambda i: (0, 0)),
                pl.BlockSpec((w2.shape[0], e), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((block_rows, e), lambda i: (i, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(x2, w1.astype(x.dtype), w2.astype(x.dtype))
    return out[:m].reshape(*lead, e)


# ---------------------------------------------------------------------------
# fused feature attention + residual + post-norm:
#   out = LN(x + W_out · attn(W_q x, W_k x, W_v x))   over the token axis
# ---------------------------------------------------------------------------


def _feat_attn_kernel(
    x_ref,
    wqkv_ref,
    wout_ref,
    o_ref,
    *,
    h: int,
    d: int,
    t_real: int,
    sm_scale: float,
    key_mask_cols: int | None,
):
    """One block of R rows; x_ref (R, t, e). Attention between the t feature
    tokens of each row, all in VMEM."""
    x = x_ref[...]  # (R, t, e)
    R, t, e = x.shape
    wq = wqkv_ref[0]  # (h*d, e) stacked head-major
    wk = wqkv_ref[1]
    wv = wqkv_ref[2]

    # projections: batched over rows, contraction over e (full 192 depth)
    def proj(w):  # (R, t, e) @ (e, h*d) -> (R, t, h*d)
        return jax.lax.dot_general(
            x, w, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype)

    q = proj(wq) * jnp.asarray(sm_scale, x.dtype)
    k = proj(wk)
    v = proj(wv)

    acc = None
    for hh in range(h):  # static unroll over the 6 heads
        q_h = q[..., hh * d : (hh + 1) * d]  # (R, t, d)
        k_h = k[..., hh * d : (hh + 1) * d]
        v_h = v[..., hh * d : (hh + 1) * d]
        s = jax.lax.dot_general(
            q_h, k_h, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, t, t)
        if key_mask_cols is not None:  # padded tokens never act as keys
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(col < key_mask_cols, s, MASK_VALUE)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_h = jax.lax.dot_general(
            p.astype(v_h.dtype), v_h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, t, d)
        # out-projection slice for this head: (R, t, d) @ (d, e)
        part = jax.lax.dot_general(
            o_h.astype(x.dtype),
            wout_ref[hh],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    o_ref[...] = _ln_rows(x.astype(jnp.float32) + acc).astype(o_ref.dtype)


def fused_feature_attention_ln(
    x: jnp.ndarray,
    w_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    *,
    token_valid_count: int | None = None,
    block_rows: int = 32,  # unrolled-head tiles stack in VMEM; 64 OOMs at t≈50
) -> jnp.ndarray:
    """x: (..., t, e); attention between the t tokens of each row, plus residual
    and post-norm — one HBM read and one write of the activations.

    ``token_valid_count``: static count of valid leading tokens (None = all);
    the traced-mask variant used by cross-cell batched HPO stays on the XLA
    path (training), so a static count suffices here.
    """
    lead = x.shape[:-2]
    t, e = x.shape[-2], x.shape[-1]
    _, h, d, _ = w_qkv.shape
    m = 1
    for n in lead:
        m *= n
    # tokens pad to a sublane multiple (Mosaic cannot merge unaligned sublane
    # dims); padded tokens are masked out of the keys and sliced off after
    t8 = _round_up(t, 8)
    mask_cols = token_valid_count if token_valid_count is not None else t
    x2 = x.reshape(m, t, e)
    m_pad = _round_up(m, block_rows)
    x2 = jnp.pad(x2, ((0, m_pad - m), (0, t8 - t), (0, 0)))
    # stack projections head-major on the output dim: (3, h*d, e)
    wqkv2 = w_qkv.reshape(3, h * d, e).astype(x.dtype)
    wout2 = w_out.astype(x.dtype)  # (h, d, e)
    kernel = functools.partial(
        _feat_attn_kernel,
        h=h,
        d=d,
        t_real=t,
        sm_scale=1.0 / math.sqrt(d),
        key_mask_cols=mask_cols,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, t8, e), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(m_pad // block_rows,),
            in_specs=[
                pl.BlockSpec((block_rows, t8, e), lambda i: (i, 0, 0)),
                pl.BlockSpec((3, h * d, e), lambda i: (0, 0, 0)),
                pl.BlockSpec((h, d, e), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((block_rows, t8, e), lambda i: (i, 0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(x2, wqkv2, wout2)
    return out[:m, :t].reshape(*lead, t, e)
