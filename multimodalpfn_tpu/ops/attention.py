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


def mha(
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    w_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    *,
    kv_head0_only: bool = False,
    compute_dtype=jnp.float32,
    use_flash: bool = False,
) -> jnp.ndarray:
    """Multi-head attention with stacked qkv weights.

    Args:
      x_q: queries input, ``(..., Sq, E)``.
      x_kv: keys/values input, ``(..., Sk, E)``.
      w_qkv: ``(3, h, d, E)`` stacked projection.
      w_out: ``(h, d, E_out)`` output projection.
      kv_head0_only: multiquery mode — compute K/V only from head 0 and share it
        across all query heads (reference ``reuse_first_head_kv``).
    """
    d = w_qkv.shape[2]
    scale = 1.0 / math.sqrt(d)
    cd = compute_dtype
    xq = x_q.astype(cd)
    xkv = x_kv.astype(cd)
    wq = w_qkv[0].astype(cd)
    wk = w_qkv[1].astype(cd)
    wv = w_qkv[2].astype(cd)

    if use_flash:
        from multimodalpfn_tpu.ops.pallas_attention import flash_mha

        lead = x_q.shape[:-2]
        B = 1
        for n in lead:
            B *= n
        h = w_qkv.shape[1]
        q = jnp.einsum(
            "...si,hdi->...hsd", xq, wq, preferred_element_type=jnp.float32
        ).reshape(B, h, x_q.shape[-2], d)
        wk_eff = wk[:1] if kv_head0_only else wk
        wv_eff = wv[:1] if kv_head0_only else wv
        k = jnp.einsum(
            "...si,hdi->...hsd", xkv, wk_eff, preferred_element_type=jnp.float32
        ).reshape(B, wk_eff.shape[0], x_kv.shape[-2], d)
        v = jnp.einsum(
            "...si,hdi->...hsd", xkv, wv_eff, preferred_element_type=jnp.float32
        ).reshape(B, wv_eff.shape[0], x_kv.shape[-2], d)
        o = flash_mha(q.astype(cd), k.astype(cd), v.astype(cd), kv_head0_only)
        o = o.reshape(*lead, h, x_q.shape[-2], d)
        return jnp.einsum(
            "...hqd,hdo->...qo",
            o.astype(cd),
            w_out.astype(cd),
            preferred_element_type=jnp.float32,
        )

    q = jnp.einsum("...si,hdi->...shd", xq, wq, preferred_element_type=jnp.float32)
    if kv_head0_only:
        k = jnp.einsum(
            "...si,di->...sd", xkv, wk[0], preferred_element_type=jnp.float32
        )
        v = jnp.einsum(
            "...si,di->...sd", xkv, wv[0], preferred_element_type=jnp.float32
        )
        logits = (
            jnp.einsum(
                "...qhd,...kd->...hqk",
                q.astype(cd),
                k.astype(cd),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        p = _softmax_f32(logits)
        o = jnp.einsum(
            "...hqk,...kd->...qhd",
            p.astype(cd),
            v.astype(cd),
            preferred_element_type=jnp.float32,
        )
    else:
        k = jnp.einsum("...si,hdi->...shd", xkv, wk, preferred_element_type=jnp.float32)
        v = jnp.einsum("...si,hdi->...shd", xkv, wv, preferred_element_type=jnp.float32)
        logits = (
            jnp.einsum(
                "...qhd,...khd->...hqk",
                q.astype(cd),
                k.astype(cd),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        p = _softmax_f32(logits)
        o = jnp.einsum(
            "...hqk,...khd->...qhd",
            p.astype(cd),
            v.astype(cd),
            preferred_element_type=jnp.float32,
        )
    return jnp.einsum(
        "...qhd,hdo->...qo",
        o.astype(cd),
        w_out.astype(cd),
        preferred_element_type=jnp.float32,
    )


def self_attention(x, w_qkv, w_out, *, compute_dtype=jnp.float32):
    return mha(x, x, w_qkv, w_out, compute_dtype=compute_dtype)


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
) -> jnp.ndarray:
    """Two-block attention over the items/samples axis.

    ``x`` is ``(..., S, E)`` with the first ``single_eval_pos`` items being train
    rows. Train rows self-attend (full KV heads); test rows attend to train rows
    only, sharing KV head 0 across query heads when ``multiquery_test``.
    Mirrors reference `layer.py:341-395`.
    """
    sep = single_eval_pos
    train = x[..., :sep, :]
    test = x[..., sep:, :]
    # Trace-time dispatch: the fused kernel wins when the XLA path's materialized
    # (B, h, S_q, S_kv) scores get large (and OOM by ~8k rows); below that XLA's
    # own fusion is on par (measured on v5e: 34ms XLA vs 43ms flash at S=1838).
    use_flash = use_flash and sep >= 2048
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
