"""Attention ops for the dual-axis transformer.

This module provides the XLA einsum path; `multimodalpfn_tpu.ops.pallas_attention`
provides the fused Pallas TPU kernel for the item-axis hot loop. Semantics anchor:
reference `multi_head_attention.py:548-736` (einsum fallback path, which the flash /
SDPA kernels are numerically equivalent to) with the stacked ``w_qkv (3,h,d,in)`` /
``w_out (h,d,out)`` weight layout (`multi_head_attention.py:120-147`), and the
two-block item attention of `layer.py:341-395`:

  * train rows self-attend with all KV heads;
  * test rows cross-attend to train rows re-using only KV head 0 broadcast across all
    query heads (``reuse_first_head_kv``, `multi_head_attention.py:438-445`).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _softmax_f32(logits: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def _MAX_FUSED_ITEM_ROWS() -> int:
    # lazy: keep the Pallas module unimported until a caller opts in
    from multimodalpfn_tpu.ops.pallas_item_fused import MAX_FUSED_ITEM_ROWS

    return MAX_FUSED_ITEM_ROWS


def can_use_fused_item(
    sep: int,
    n_test: int,
    *,
    fused_item: bool,
    multiquery_test: bool,
    ring_axis: str | None,
) -> bool:
    """THE dispatch gate for the fully-fused item sublayer
    (`ops/pallas_item_fused.py`) — shared by `item_attention` and the
    item-major encoder layer (`models/transformer.py::encoder_layer_im`) so
    the two call sites cannot drift and route one shape to different kernels.

    ``fused_item`` should already fold in the flash opt-in
    (``cfg.use_flash and cfg.fused_item``). Bounds: the kernel keeps the
    train K/V resident in VMEM (sep ≤ MAX_FUSED_ITEM_ROWS) and its backward
    keeps the full padded test-q stream (+ f32 dq scratch) resident per grid
    cell, so the test-row count is VMEM-bound by the same ceiling. Below 512
    train rows both paths are microseconds; XLA avoids tiny-shape padding
    waste there.
    """
    return (
        fused_item
        and ring_axis is None
        and multiquery_test
        and 512 <= sep <= _MAX_FUSED_ITEM_ROWS()
        and n_test <= _MAX_FUSED_ITEM_ROWS()
    )


def mha(
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    w_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    *,
    kv_head0_only: bool = False,
    compute_dtype=jnp.float32,
    use_flash: bool = False,
    key_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Multi-head attention with stacked qkv weights.

    Args:
      x_q: queries input, ``(..., Sq, E)``.
      x_kv: keys/values input, ``(..., Sk, E)``.
      w_qkv: ``(3, h, d, E)`` stacked projection.
      w_out: ``(h, d, E_out)`` output projection.
      kv_head0_only: multiquery mode — compute K/V only from head 0 and share it
        across all query heads (reference ``reuse_first_head_kv``).
      key_mask: optional boolean mask broadcastable to ``(..., Sk)``; False keys
        are excluded exactly (−inf logits → softmax weight 0). Used for masked
        padded mixer tokens in cross-cell batched HPO. Not supported with
        ``use_flash``.
    """
    if key_mask is not None and use_flash:
        raise NotImplementedError("key_mask is not supported on the flash path")
    d = w_qkv.shape[2]
    scale = 1.0 / math.sqrt(d)
    cd = compute_dtype
    # MXU accumulation is f32 internally regardless; emitting the compute dtype
    # (f32 in parity mode — identical to before; bf16 in production) halves the
    # HBM traffic of materialized intermediates, the measured bottleneck.
    acc = jnp.dtype(cd)
    xq = x_q.astype(cd)
    xkv = x_kv.astype(cd)
    wq = w_qkv[0].astype(cd)
    wk = w_qkv[1].astype(cd)
    wv = w_qkv[2].astype(cd)

    if use_flash:
        # Native transposed layout for the Pallas kernel: d on sublanes, S on
        # lanes (see pallas_attention module docstring). The projection einsums
        # emit (..., d, s) directly so no transposes are ever materialized.
        from multimodalpfn_tpu.ops.pallas_attention import flash_mha_t

        lead = x_q.shape[:-2]
        B = 1
        for n in lead:
            B *= n
        h = w_qkv.shape[1]
        Sq, Skv = x_q.shape[-2], x_kv.shape[-2]
        if kv_head0_only:
            # multiquery: fold query heads into the lane (sequence) axis and
            # attend against the single shared KV head
            q3 = jnp.einsum(
                "...si,hdi->...dhs", xq, wq, preferred_element_type=acc
            ).reshape(B, d, h * Sq)
            k3 = jnp.einsum(
                "...si,di->...ds", xkv, wk[0], preferred_element_type=acc
            ).reshape(B, d, Skv)
            v3 = jnp.einsum(
                "...si,di->...ds", xkv, wv[0], preferred_element_type=acc
            ).reshape(B, d, Skv)
            o = flash_mha_t(q3, k3, v3).reshape(*lead, d, h, Sq)
            return jnp.einsum(
                "...dhq,hdo->...qo",
                o.astype(cd),
                w_out.astype(cd),
                preferred_element_type=acc,
            )
        q3 = jnp.einsum(
            "...si,hdi->...hds", xq, wq, preferred_element_type=acc
        ).reshape(B * h, d, Sq)
        k3 = jnp.einsum(
            "...si,hdi->...hds", xkv, wk, preferred_element_type=acc
        ).reshape(B * h, d, Skv)
        v3 = jnp.einsum(
            "...si,hdi->...hds", xkv, wv, preferred_element_type=acc
        ).reshape(B * h, d, Skv)
        o = flash_mha_t(q3, k3, v3).reshape(*lead, h, d, Sq)
        return jnp.einsum(
            "...hdq,hdo->...qo",
            o.astype(cd),
            w_out.astype(cd),
            preferred_element_type=acc,
        )

    q = jnp.einsum("...si,hdi->...shd", xq, wq, preferred_element_type=acc)
    if kv_head0_only:
        k = jnp.einsum(
            "...si,di->...sd", xkv, wk[0], preferred_element_type=acc
        )
        v = jnp.einsum(
            "...si,di->...sd", xkv, wv[0], preferred_element_type=acc
        )
        logits = (
            jnp.einsum(
                "...qhd,...kd->...hqk",
                q.astype(cd),
                k.astype(cd),
                preferred_element_type=acc,
            )
            * scale
        )
        if key_mask is not None:
            logits = jnp.where(key_mask, logits, -jnp.inf)
        p = _softmax_f32(logits)
        o = jnp.einsum(
            "...hqk,...kd->...qhd",
            p.astype(cd),
            v.astype(cd),
            preferred_element_type=acc,
        )
    else:
        k = jnp.einsum("...si,hdi->...shd", xkv, wk, preferred_element_type=acc)
        v = jnp.einsum("...si,hdi->...shd", xkv, wv, preferred_element_type=acc)
        logits = (
            jnp.einsum(
                "...qhd,...khd->...hqk",
                q.astype(cd),
                k.astype(cd),
                preferred_element_type=acc,
            )
            * scale
        )
        if key_mask is not None:
            logits = jnp.where(key_mask, logits, -jnp.inf)
        p = _softmax_f32(logits)
        o = jnp.einsum(
            "...hqk,...khd->...qhd",
            p.astype(cd),
            v.astype(cd),
            preferred_element_type=acc,
        )
    return jnp.einsum(
        "...qhd,hdo->...qo",
        o.astype(cd),
        w_out.astype(cd),
        preferred_element_type=acc,
    )


def self_attention(x, w_qkv, w_out, *, compute_dtype=jnp.float32, key_mask=None):
    return mha(x, x, w_qkv, w_out, compute_dtype=compute_dtype, key_mask=key_mask)


def _ring_mha(
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    w_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    *,
    ring_axis: str,
    kv_head0_only: bool = False,
    compute_dtype=jnp.float32,
    use_flash: bool = False,
) -> jnp.ndarray:
    """Sequence-parallel attention: KV ring-sharded over ``ring_axis`` of the
    ambient mesh (jax.set_mesh), queries replicated — per-chip KV memory is
    O(S/n). Projections stay in XLA (GSPMD shards them); only the attention
    core runs in the shard_map ring (`parallel/ring_attention.py`).

    For multiquery (reference ``reuse_first_head_kv``) the query heads fold
    into extra query rows against the single shared KV head.
    """
    import math as _math

    from multimodalpfn_tpu.parallel.ring_attention import ring_attention

    cd = compute_dtype
    acc = jnp.dtype(cd)
    d = w_qkv.shape[2]
    h = w_qkv.shape[1]
    lead = x_q.shape[:-2]
    B = 1
    for n in lead:
        B *= n
    Sq, Skv = x_q.shape[-2], x_kv.shape[-2]
    xq = x_q.astype(cd)
    xkv = x_kv.astype(cd)
    wq, wk, wv = (w_qkv[i].astype(cd) for i in range(3))
    if kv_head0_only:
        q = jnp.einsum(
            "...si,hdi->...hsd", xq, wq, preferred_element_type=acc
        ).reshape(B, 1, h * Sq, d)
        k = jnp.einsum(
            "...si,di->...sd", xkv, wk[0], preferred_element_type=acc
        ).reshape(B, 1, Skv, d)
        v = jnp.einsum(
            "...si,di->...sd", xkv, wv[0], preferred_element_type=acc
        ).reshape(B, 1, Skv, d)
        o = ring_attention(
            q, k, v, axis=ring_axis, sm_scale=1.0 / _math.sqrt(d),
            use_flash=use_flash,
        )
        o = o.reshape(*lead, h, Sq, d)
    else:
        q = jnp.einsum(
            "...si,hdi->...hsd", xq, wq, preferred_element_type=acc
        ).reshape(B, h, Sq, d)
        k = jnp.einsum(
            "...si,hdi->...hsd", xkv, wk, preferred_element_type=acc
        ).reshape(B, h, Skv, d)
        v = jnp.einsum(
            "...si,hdi->...hsd", xkv, wv, preferred_element_type=acc
        ).reshape(B, h, Skv, d)
        o = ring_attention(
            q, k, v, axis=ring_axis, sm_scale=1.0 / _math.sqrt(d),
            use_flash=use_flash,
        )
        o = o.reshape(*lead, h, Sq, d)
    return jnp.einsum(
        "...hqd,hdo->...qo",
        o.astype(cd),
        w_out.astype(cd),
        preferred_element_type=acc,
    )


@partial(jax.named_call, name="item_attention")
def item_attention(
    x: jnp.ndarray,
    w_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    *,
    single_eval_pos: int,
    multiquery_test: bool = True,
    compute_dtype=jnp.float32,
    use_flash: bool = False,
    fused_item: bool = False,
    ring_axis: str | None = None,
) -> jnp.ndarray:
    """Two-block attention over the items/samples axis.

    ``x`` is ``(..., S, E)`` with the first ``single_eval_pos`` items being train
    rows. Train rows self-attend (full KV heads); test rows attend to train rows
    only, sharing KV head 0 across query heads when ``multiquery_test``.
    Mirrors reference `layer.py:341-395`.

    ``fused_item``: dispatch to the fully-fused Pallas sublayer (in-kernel
    projections + flash, `ops/pallas_item_fused.py`) when the shape qualifies;
    otherwise this falls through to the flash/XLA paths below.
    ``ring_axis``: sequence parallelism — ring-shard the train-row KV over this
    mesh axis for contexts beyond one chip's HBM (cfg.seq_shard_axis).
    """
    sep = single_eval_pos
    if can_use_fused_item(
        sep,
        x.shape[-2] - sep,
        fused_item=fused_item,
        multiquery_test=multiquery_test,
        ring_axis=ring_axis,
    ):
        from multimodalpfn_tpu.ops.pallas_item_fused import fused_item_attention

        return fused_item_attention(
            x, w_qkv, w_out, single_eval_pos=sep, compute_dtype=compute_dtype
        )
    train = x[..., :sep, :]
    test = x[..., sep:, :]
    if ring_axis is not None:
        out_train = _ring_mha(
            train, train, w_qkv, w_out, ring_axis=ring_axis,
            compute_dtype=compute_dtype, use_flash=use_flash,
        )
        if test.shape[-2] == 0:
            return out_train
        out_test = _ring_mha(
            test, train, w_qkv, w_out, ring_axis=ring_axis,
            kv_head0_only=multiquery_test, compute_dtype=compute_dtype,
            use_flash=use_flash,
        )
        return jnp.concatenate([out_train, out_test], axis=-2)
    # Trace-time dispatch: the fused transposed-layout kernel beats the XLA path
    # at every measured context (v5e, latency-corrected: 5.8ms vs 6.3ms at the
    # S=1838 headline; 1.0ms vs 1.6ms at S=512; ~4x on fwd+bwd) and never
    # materializes scores (XLA OOMs by ~8k rows). Below 512 rows both are
    # microseconds; keep XLA there to avoid tiny-shape padding waste.
    use_flash = use_flash and sep >= 512
    out_train = mha(
        train, train, w_qkv, w_out, compute_dtype=compute_dtype, use_flash=use_flash
    )
    if test.shape[-2] == 0:
        return out_train
    out_test = mha(
        test,
        train,
        w_qkv,
        w_out,
        kv_head0_only=multiquery_test,
        compute_dtype=compute_dtype,
        use_flash=use_flash,
    )
    return jnp.concatenate([out_train, out_test], axis=-2)
