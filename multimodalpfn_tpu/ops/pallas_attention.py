"""Fused flash attention (Pallas TPU) for the item/samples axis.

This is the hot loop of the whole framework (SURVEY.md §3.2b): per layer the item
attention runs over batch = members × feature-tokens with sequence = samples
(thousands). The XLA einsum path materializes the (B, h, S_q, S_kv) score tensor —
gigabytes at PAD-UFES scale — making it HBM-bound; this kernel never materializes
scores (classic online-softmax tiling, cf. the reference's optional flash-attn
import `multi_head_attention.py:14-23`, re-designed for TPU/Mosaic).

Specifics for this model:
  * non-causal, cross-attention (queries = all rows, keys/values = train rows);
  * multiquery mode for test rows (KV head 0 shared across query heads,
    reference `multi_head_attention.py:438-445`) implemented by an index-map that
    pins the KV head — the single KV head is fetched once, not broadcast 6×;
  * head_dim is 32 (emsize 192 / 6 heads): blocks keep the last dim at head_dim
    and rely on Mosaic lane padding; q/kv tiles are sized so the score tile does
    the MXU work;
  * arbitrary (non-multiple-of-block) kv lengths handled by padding + key mask
    from a static length threshold.

Training-time gradients: `flash_mha` wraps the kernel in `jax.custom_vjp` whose
backward recomputes attention with the XLA einsum path (fine under `jax.checkpoint`
at TabPFN scales); inference uses the kernel directly.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_KV = 512
MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
LANES = 128


def _attn_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    sm_scale: float,
    kv_len: int,
    block_kv: int,
    n_kv_blocks: int,
):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]  # (block_q, d)
    k = k_ref[0, 0]  # (block_kv, d)
    v = v_ref[0, 0]

    s = jax.lax.dot_general(
        q,
        k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, block_kv)
    s = s * sm_scale

    # mask padded keys (static threshold; only the last block can be partial)
    first_masked = kv_len - ki * block_kv
    if True:  # static shapes: emit the mask only when this block can overflow
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < first_masked, s, MASK_VALUE)

    m_prev = m_scr[...]  # (block_q, LANES) broadcast storage
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # (block_q, 1)
    m_next = jnp.maximum(m_prev, m_curr)  # (block_q, LANES)
    alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])  # (block_q, 1)
    p = jnp.exp(s - m_next[:, :1])
    l_next = alpha * l_prev[:, :1] + jnp.sum(p, axis=1, keepdims=True)

    m_scr[...] = jnp.broadcast_to(m_next[:, :1], m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

    pv = jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )  # (block_q, d)
    acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(ki == n_kv_blocks - 1)
    def _store():
        l_fin = l_scr[...][:, :1]
        l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def _attn_kernel_heads(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    sm_scale: float,
    kv_len: int,
    block_kv: int,
    n_kv_blocks: int,
    n_heads: int,
    kv_head0_only: bool,
):
    """Head-folded variant: one grid cell covers ALL heads of a (q, kv) block pair.

    Measured on v5e @ (B=92, h=6, S=1838, d=32) bf16: 51.6ms vs the flat kernel's
    43ms (256/512 blocks); 512/1024 blocks exceed the 16MB VMEM scratch budget.
    Conclusion: grid-cell overhead is NOT the limiter — the d=32 contraction/output
    geometry underutilizes the 128-wide MXU either way. Kept as an engineering
    record + for shapes with many more heads; the flat `flash_mha` is the
    production path."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    first_masked = kv_len - ki * block_kv
    for hh in range(n_heads):  # static unroll
        q = q_ref[0, hh]  # (block_q, d)
        kv_h = 0 if kv_head0_only else hh
        k = k_ref[0, kv_h]
        v = v_ref[0, kv_h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < first_masked, s, MASK_VALUE)

        m_prev = m_scr[hh]
        l_prev = l_scr[hh]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev[:, :1], m_curr)
        alpha = jnp.exp(m_prev[:, :1] - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        m_scr[hh] = jnp.broadcast_to(m_next, m_scr.shape[1:])
        l_scr[hh] = jnp.broadcast_to(l_next, l_scr.shape[1:])
        pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        acc_scr[hh] = acc_scr[hh] * alpha + pv

    @pl.when(ki == n_kv_blocks - 1)
    def _store():
        for hh in range(n_heads):
            l_fin = l_scr[hh][:, :1]
            l_inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
            o_ref[0, hh] = (acc_scr[hh] * l_inv).astype(o_ref.dtype)


def _flash_forward_heads(
    q, k, v, *, kv_head0_only, sm_scale, block_q, block_kv
) -> jnp.ndarray:
    B, h, Sq, d = q.shape
    kv_len = k.shape[2]
    block_q = min(block_q, max(LANES, 1 << (Sq - 1).bit_length()))
    block_kv = min(block_kv, max(LANES, 1 << (kv_len - 1).bit_length()))
    qp = _pad_to(q, 2, block_q)
    kp = _pad_to(k, 2, block_kv)
    vp = _pad_to(v, 2, block_kv)
    n_q_blocks = qp.shape[2] // block_q
    n_kv_blocks = kp.shape[2] // block_kv
    h_kv = k.shape[1]

    kernel = functools.partial(
        _attn_kernel_heads,
        sm_scale=sm_scale,
        kv_len=kv_len,
        block_kv=block_kv,
        n_kv_blocks=n_kv_blocks,
        n_heads=h,
        kv_head0_only=kv_head0_only,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qp.shape, jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, n_q_blocks, n_kv_blocks),
            in_specs=[
                pl.BlockSpec((1, h, block_q, d), lambda b, qi, ki: (b, 0, qi, 0)),
                pl.BlockSpec((1, h_kv, block_kv, d), lambda b, qi, ki: (b, 0, ki, 0)),
                pl.BlockSpec((1, h_kv, block_kv, d), lambda b, qi, ki: (b, 0, ki, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, h, block_q, d), lambda b, qi, ki: (b, 0, qi, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((h, block_q, LANES), jnp.float32),
                pltpu.VMEM((h, block_q, LANES), jnp.float32),
                pltpu.VMEM((h, block_q, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp)
    return out[:, :, :Sq]


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    kv_head0_only: bool,
    sm_scale: float,
    block_q: int,
    block_kv: int,
) -> jnp.ndarray:
    """q: (B, h, Sq, d); k/v: (B, h_kv, Skv, d). Returns (B, h, Sq, d) fp32."""
    B, h, Sq, d = q.shape
    kv_len = k.shape[2]
    block_q = min(block_q, max(LANES, 1 << (Sq - 1).bit_length()))
    block_kv = min(block_kv, max(LANES, 1 << (kv_len - 1).bit_length()))

    qp = _pad_to(q, 2, block_q)
    kp = _pad_to(k, 2, block_kv)
    vp = _pad_to(v, 2, block_kv)
    n_q_blocks = qp.shape[2] // block_q
    n_kv_blocks = kp.shape[2] // block_kv

    kv_head = (lambda hh: 0) if kv_head0_only else (lambda hh: hh)

    kernel = functools.partial(
        _attn_kernel,
        sm_scale=sm_scale,
        kv_len=kv_len,
        block_kv=block_kv,
        n_kv_blocks=n_kv_blocks,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qp.shape, jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, h, n_q_blocks, n_kv_blocks),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, block_q, d), lambda b, hh, qi, ki: (b, hh, qi, 0)
                ),
                pl.BlockSpec(
                    (1, 1, block_kv, d),
                    lambda b, hh, qi, ki, _kvh=kv_head: (b, _kvh(hh), ki, 0),
                ),
                pl.BlockSpec(
                    (1, 1, block_kv, d),
                    lambda b, hh, qi, ki, _kvh=kv_head: (b, _kvh(hh), ki, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, block_q, d), lambda b, hh, qi, ki: (b, hh, qi, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp)
    return out[:, :, :Sq]


def _xla_reference(q, k, v, *, kv_head0_only, sm_scale):
    if kv_head0_only:
        k = jnp.broadcast_to(k[:, :1], q.shape[:2] + k.shape[2:])
        v = jnp.broadcast_to(v[:, :1], q.shape[:2] + v.shape[2:])
    s = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        * sm_scale
    )
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6)
)
def flash_mha(
    q,
    k,
    v,
    kv_head0_only: bool = False,
    sm_scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
):
    """Fused attention over projected heads.

    q: (B, h, Sq, d); k, v: (B, h_kv, Skv, d) with h_kv == h, or h_kv == 1 when
    ``kv_head0_only`` (multiquery). Returns fp32 (B, h, Sq, d).
    """
    scale = 1.0 / math.sqrt(q.shape[-1]) if sm_scale is None else sm_scale
    return _flash_forward(
        q, k, v, kv_head0_only=kv_head0_only, sm_scale=scale,
        block_q=block_q, block_kv=block_kv,
    )


def _fwd(q, k, v, kv_head0_only, sm_scale, block_q, block_kv):
    out = flash_mha(q, k, v, kv_head0_only, sm_scale, block_q, block_kv)
    return out, (q, k, v)


def _bwd(kv_head0_only, sm_scale, block_q, block_kv, res, g):
    q, k, v = res
    scale = 1.0 / math.sqrt(q.shape[-1]) if sm_scale is None else sm_scale
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_reference(
            q_, k_, v_, kv_head0_only=kv_head0_only, sm_scale=scale
        ),
        q,
        k,
        v,
    )
    return vjp(g)


flash_mha.defvjp(_fwd, _bwd)
