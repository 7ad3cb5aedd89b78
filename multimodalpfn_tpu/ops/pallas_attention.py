"""Fused flash attention (Pallas TPU) for the item/samples axis — fwd + bwd.

This is the hot loop of the whole framework (SURVEY.md §3.2b): per layer the item
attention runs over batch = members × feature-tokens with sequence = samples
(thousands). The XLA einsum path materializes the (B, h, S_q, S_kv) score tensor —
gigabytes at PAD-UFES scale; this kernel never materializes scores (cf. the
reference's optional flash-attn import `multi_head_attention.py:14-23`,
re-designed for TPU/Mosaic).

Design (TPU-first, measured on v5e):

  * **Transposed layout: (G, d, S) — d on sublanes, S on lanes.** head_dim here
    is 32 (emsize 192 / 6 heads). In the conventional (S, d) layout every
    q/k/v/o tile is a (block, 32) sliver: Mosaic pads the 32 lanes to 128
    (4× VMEM waste) and HBM rows are 64 B (DMA-transaction collapse) — measured
    as a pure-copy kernel costing more than the whole XLA attention. Transposed,
    every tile is a dense (32, ≥128) block, HBM rows are ≥512 B, and the score
    contraction k_cᵀ·q is the MXU-native lhsT form.
  * **Row-form softmax stats.** Scores are computed kv-major, s_t (ckv, bq), so
    max/sum reduce over *sublanes* and m/l/lse/delta are (1, block_q) row
    vectors — they broadcast against every tile in fwd AND bwd with zero
    relayouts/transposes anywhere.
  * **Flat G axis.** Batch and heads fold into one leading axis outside the
    kernel. The FULL key/value sequence lives in VMEM per grid cell (≤128 KB
    bf16 at the model's official 10k-sample limit, reference
    `constants.py:160-173`), fetched from HBM once per g.
  * **Multiquery = fold heads into query lanes.** For test rows the reference
    shares KV head 0 across all query heads (``reuse_first_head_kv``,
    `multi_head_attention.py:438-445`). Instead of broadcasting KV 6×, q
    becomes (B, d, h·Sq) against the single KV; in the backward the dK/dV
    sum-over-query-heads (GQA gradient) falls out of the matmuls for free.
  * **Python-unrolled chunk loops** with online-softmax loop carries (no VMEM
    scratch); the padded-tail mask is emitted only for the one statically-known
    partial chunk, and the first chunk skips the rescale (alpha) path.
  * **Fused backward, no masks.** Zero-padding q/do/k/v and lse/delta makes
    every padded contribution vanish algebraically (pad-k columns are zero so
    dq ignores garbage score columns; pad-q columns have do = 0 so dk/dv
    ignore them). One merged kernel: grid over
    kv blocks (sequential), stream Q chunks once — dk/dv emit per block and
    dq accumulates across the kv grid axis.

Gradient flow: ``flash_mha_t`` is a ``jax.custom_vjp`` whose backward runs the
fused dq/dkv kernels — gradients never materialize (S_q, S_kv), so fine-tuning
at the 10k-row limit fits on one chip.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodalpfn_tpu.ops.pallas_fused import _compiler_params

# Swept on v5e at the PAD-UFES headline shape (G=552, S=1838, d=32):
# 2048/512 = 5.76ms vs XLA fused attention 6.29ms (block_q=whole padded Sq;
# 256/1024 = 10.9ms, 512/1024 = 6.7ms, 1024/1024 = 6.4ms).
DEFAULT_BLOCK_Q = 2048
DEFAULT_BLOCK_KV = 512
MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fit_block(size: int, block_max: int) -> int:
    """Largest <=block_max lane-block that minimizes padding: split size into
    the fewest blocks, then size the block to the split (e.g. Sq=2796 with
    block_max=2048 -> 2x1408 = 2816 lanes instead of 2x2048 = 4096)."""
    n_blocks = -(-size // block_max)
    return _round_up(-(-size // n_blocks), LANES)


def _pad_lanes(x: jnp.ndarray, to: int) -> jnp.ndarray:
    pad = to - x.shape[-1]
    if pad == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


# Above this many chunks, the chunk loop is a lax.fori_loop instead of a python
# unroll: Mosaic stack-allocates each unrolled iteration's score tile separately
# (measured: 18 unrolled 4MB tiles -> 65MB scoped-VMEM OOM at S=9k), while the
# rolled loop reuses one.
UNROLL_LIMIT = 8

# Unrolled chunk iterations each stack-allocate their (chunk, block_q) f32
# score tile; beyond this budget the kernel must roll the loop or the 16 MB
# scoped-VMEM limit overflows (observed at 5-8 full chunks x ~4 MB tiles for
# contexts around 2.5-4k rows).
UNROLL_SCORE_BYTES = 10 * 1024 * 1024


def _should_unroll(n_iters: int, chunk: int, block: int) -> bool:
    return (
        n_iters <= UNROLL_LIMIT
        and n_iters * chunk * block * 4 <= UNROLL_SCORE_BYTES
    )


def _fwd_kernel(
    q_ref,
    k_ref,
    v_ref,
    o_ref,
    lse_ref,
    *,
    sm_scale: float,
    kv_len: int,
    chunk: int,
    n_chunks: int,
):
    q = q_ref[0]  # (d, block_q)
    d, block_q = q.shape

    def process(ci, lo, carry, masked):
        """One KV chunk; lo is the chunk start (static under unroll, traced
        under fori). `masked` is static: only the one partial tail chunk pays
        the iota mask. K/V stay resident in VMEM."""
        m, l, acc = carry
        k = k_ref[0, :, pl.ds(lo, chunk)]  # (d, chunk)
        v = v_ref[0, :, pl.ds(lo, chunk)]
        s = jax.lax.dot_general(
            k, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (chunk, block_q) — kv on sublanes, q on lanes
        s = s * sm_scale
        if masked:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            s = jnp.where(row + lo < kv_len, s, MASK_VALUE)
        m_c = jnp.max(s, axis=0, keepdims=True)  # (1, block_q)
        if ci == 0:  # static: first chunk skips the rescale path
            m_n = m_c
            p = jnp.exp(s - m_n)
            l_n = jnp.sum(p, axis=0, keepdims=True)
            acc_n = jax.lax.dot_general(
                v,
                p.astype(v.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (d, block_q)
        else:
            m_n = jnp.maximum(m, m_c)
            alpha = jnp.exp(m - m_n)  # (1, block_q)
            p = jnp.exp(s - m_n)
            l_n = l * alpha + jnp.sum(p, axis=0, keepdims=True)
            acc_n = acc * alpha + jax.lax.dot_general(
                v,
                p.astype(v.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return m_n, l_n, acc_n

    n_full = min(kv_len // chunk, n_chunks)  # full chunks need no mask
    carry = (None, None, None)
    if _should_unroll(n_full, chunk, block_q):
        for ci in range(n_full):
            carry = process(ci, ci * chunk, carry, masked=False)
    else:
        carry = process(0, 0, carry, masked=False)
        carry = jax.lax.fori_loop(
            1,
            n_full,
            lambda i, c: process(1, pl.multiple_of(i * chunk, LANES), c, False),
            carry,
        )
    if n_full < n_chunks:  # one statically-known partial tail chunk
        carry = process(n_full, n_full * chunk, carry, masked=True)
    m, l, acc = carry
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


def _out_vma(*xs):
    """Union of the inputs' varying-mesh-axes types. Under shard_map with
    check_vma=True, pallas_call outputs must declare their vma explicitly
    (jax.ShapeDtypeStruct(vma=...)); outside shard_map this is empty and the
    kwarg is omitted."""
    vma = frozenset().union(
        *(getattr(jax.typeof(x), "vma", frozenset()) or frozenset() for x in xs)
    )
    return {"vma": vma} if vma else {}


def _fwd_impl(q3, k3, v3, *, sm_scale, block_q, block_kv):
    """q3: (G, d, Sq); k3/v3: (G, d, Skv). Returns (o (G,d,Sq) f32, lse (G,1,Sq))."""
    G, d, Sq = q3.shape
    kv_len = k3.shape[2]
    block_q = _fit_block(Sq, block_q)
    chunk = min(block_kv, _round_up(kv_len, LANES))
    skv_pad = _round_up(kv_len, chunk)
    sq_pad = _round_up(Sq, block_q)

    qp = _pad_lanes(q3, sq_pad)
    kp = _pad_lanes(k3, skv_pad)
    vp = _pad_lanes(v3, skv_pad)
    n_q_blocks = sq_pad // block_q
    n_chunks = skv_pad // chunk

    kernel = functools.partial(
        _fwd_kernel,
        sm_scale=sm_scale,
        kv_len=kv_len,
        chunk=chunk,
        n_chunks=n_chunks,
    )
    o, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((G, d, sq_pad), jnp.float32, **_out_vma(qp, kp, vp)),
            jax.ShapeDtypeStruct((G, 1, sq_pad), jnp.float32, **_out_vma(qp, kp, vp)),
        ),
        grid_spec=pl.GridSpec(
            grid=(G, n_q_blocks),
            in_specs=[
                pl.BlockSpec((1, d, block_q), lambda g, qi: (g, 0, qi)),
                pl.BlockSpec((1, d, skv_pad), lambda g, qi: (g, 0, 0)),
                pl.BlockSpec((1, d, skv_pad), lambda g, qi: (g, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, d, block_q), lambda g, qi: (g, 0, qi)),
                pl.BlockSpec((1, 1, block_q), lambda g, qi: (g, 0, qi)),
            ),
        ),
        compiler_params=_compiler_params("parallel", "parallel"),
    )(qp, kp, vp)
    return o[..., :Sq], lse[..., :Sq]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(
    k_ref,
    v_ref,
    q_ref,
    do_ref,
    lse_ref,
    delta_ref,
    dq_ref,
    dk_ref,
    dv_ref,
    *,
    sm_scale: float,
    chunk: int,
    n_chunks: int,
):
    """Merged backward: one (g, kv-block) cell streams the Q chunks ONCE,
    emitting this block's dk/dv and accumulating every chunk's dq slice.

    The two-kernel formulation (separate dq and dkv passes) recomputed the
    score/probability tiles twice; merging halves the score-space matmuls.
    The kv axis is a SEQUENTIAL grid dimension so dq (full-length, constant
    index map, f32) accumulates across kv blocks — initialized at kv block 0.
    Zero-padding still kills every padded contribution algebraically: padded q
    lanes have do = 0 (ds, dv die) and padded k columns are zero (dq ignores
    their garbage score columns).
    """
    k = k_ref[0]  # (d, block_kv)
    v = v_ref[0]
    ki = pl.program_id(1)

    def process(lo, carry):
        dk, dv = carry
        q_c = q_ref[0, :, pl.ds(lo, chunk)]  # (d, chunk)
        do_c = do_ref[0, :, pl.ds(lo, chunk)]
        lse_c = lse_ref[0, :, pl.ds(lo, chunk)]  # (1, chunk)
        delta_c = delta_ref[0, :, pl.ds(lo, chunk)]
        s_t = jax.lax.dot_general(
            k, q_c, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_kv, chunk)
        p_t = jnp.exp(s_t * sm_scale - lse_c)
        dv = dv + jax.lax.dot_general(
            do_c,
            p_t.astype(do_c.dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d, block_kv)
        dp_t = jax.lax.dot_general(
            v, do_c, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_kv, chunk)
        # sm_scale folded into ds once: serves both dq and dk
        ds_t = (p_t * (dp_t - delta_c) * sm_scale).astype(q_c.dtype)
        dk = dk + jax.lax.dot_general(
            q_c, ds_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d, block_kv)
        dq_c = jax.lax.dot_general(
            k, ds_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (d, chunk)

        @pl.when(ki == 0)
        def _init():
            dq_ref[0, :, pl.ds(lo, chunk)] = dq_c

        @pl.when(ki != 0)
        def _acc():
            dq_ref[0, :, pl.ds(lo, chunk)] += dq_c

        return dk, dv

    carry = (jnp.zeros(k.shape, jnp.float32), jnp.zeros(v.shape, jnp.float32))
    if _should_unroll(n_chunks, chunk, k.shape[1]):
        for ci in range(n_chunks):
            carry = process(ci * chunk, carry)
    else:
        carry = jax.lax.fori_loop(
            0,
            n_chunks,
            lambda i, c: process(pl.multiple_of(i * chunk, LANES), c),
            carry,
        )
    dk, dv = carry
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_impl(q3, k3, v3, o3, lse, do3, *, sm_scale, block_kv):
    """All rank-3 (G, d, S); lse (G, 1, Sq). Returns dq, dk, dv (input
    dtypes). Backward chunking derives from ``block_kv`` alone (``block_q``
    only shapes the forward grid)."""
    G, d, Sq = q3.shape
    kv_len = k3.shape[2]
    # delta_i = sum_d do_i * o_i - tiny (G, 1, Sq) row tensor, computed in XLA
    delta = jnp.sum(do3.astype(jnp.float32) * o3, axis=1, keepdims=True)
    do3 = do3.astype(q3.dtype)

    block_kv_g = min(512, _round_up(kv_len, LANES))
    chunk_q = min(block_kv, _round_up(Sq, LANES))
    skv_pad = _round_up(kv_len, block_kv_g)
    sq_pad = _round_up(Sq, chunk_q)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, sm_scale=sm_scale, chunk=chunk_q,
            n_chunks=sq_pad // chunk_q,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(
                (G, d, sq_pad), jnp.float32, **_out_vma(q3, k3, v3, o3, do3)
            ),
            jax.ShapeDtypeStruct(
                (G, d, skv_pad), k3.dtype, **_out_vma(q3, k3, v3, o3, do3)
            ),
            jax.ShapeDtypeStruct(
                (G, d, skv_pad), v3.dtype, **_out_vma(q3, k3, v3, o3, do3)
            ),
        ),
        grid_spec=pl.GridSpec(
            grid=(G, skv_pad // block_kv_g),
            in_specs=[
                pl.BlockSpec((1, d, block_kv_g), lambda g, ki: (g, 0, ki)),
                pl.BlockSpec((1, d, block_kv_g), lambda g, ki: (g, 0, ki)),
                pl.BlockSpec((1, d, sq_pad), lambda g, ki: (g, 0, 0)),
                pl.BlockSpec((1, d, sq_pad), lambda g, ki: (g, 0, 0)),
                pl.BlockSpec((1, 1, sq_pad), lambda g, ki: (g, 0, 0)),
                pl.BlockSpec((1, 1, sq_pad), lambda g, ki: (g, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, d, sq_pad), lambda g, ki: (g, 0, 0)),
                pl.BlockSpec((1, d, block_kv_g), lambda g, ki: (g, 0, ki)),
                pl.BlockSpec((1, d, block_kv_g), lambda g, ki: (g, 0, ki)),
            ),
        ),
        # dq accumulates over the sequential kv grid axis
        compiler_params=_compiler_params("parallel", "arbitrary"),
    )(
        _pad_lanes(k3, skv_pad),
        _pad_lanes(v3, skv_pad),
        _pad_lanes(q3, sq_pad),
        _pad_lanes(do3, sq_pad),
        _pad_lanes(lse, sq_pad),
        _pad_lanes(delta, sq_pad),
    )
    return (
        dq[..., :Sq].astype(q3.dtype),
        dk[..., :kv_len],
        dv[..., :kv_len],
    )


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_mha_t(
    q,
    k,
    v,
    sm_scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
):
    """Fused attention in the TPU-native transposed layout.

    q: (G, d, Sq); k, v: (G, d, Skv) — G is any flattened batch×head axis (for
    multiquery, fold the query heads into Sq). Returns fp32 (G, d, Sq).
    """
    scale = 1.0 / math.sqrt(q.shape[1]) if sm_scale is None else sm_scale
    o, _ = _fwd_impl(q, k, v, sm_scale=scale, block_q=block_q, block_kv=block_kv)
    return o


def _fwd_t(q, k, v, sm_scale, block_q, block_kv):
    scale = 1.0 / math.sqrt(q.shape[1]) if sm_scale is None else sm_scale
    o, lse = _fwd_impl(q, k, v, sm_scale=scale, block_q=block_q, block_kv=block_kv)
    return o, (q, k, v, o, lse)


def _bwd_t(sm_scale, block_q, block_kv, res, g):
    q, k, v, o, lse = res
    scale = 1.0 / math.sqrt(q.shape[1]) if sm_scale is None else sm_scale
    return _bwd_impl(q, k, v, o, lse, g, sm_scale=scale, block_kv=block_kv)


flash_mha_t.defvjp(_fwd_t, _bwd_t)


def flash_mha(
    q,
    k,
    v,
    kv_head0_only: bool = False,
    sm_scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_kv: int = DEFAULT_BLOCK_KV,
):
    """Conventional-layout wrapper over ``flash_mha_t``.

    q: (B, h, Sq, d); k, v: (B, h_kv, Skv, d) with h_kv == h, or h_kv == 1 when
    ``kv_head0_only`` (multiquery). Returns fp32 (B, h, Sq, d). Prefer calling
    ``flash_mha_t`` with natively-transposed operands (the projection einsums
    can emit (…, d, S) for free); this wrapper pays XLA transposes.
    """
    B, h, Sq, d = q.shape
    if kv_head0_only:
        q3 = jnp.moveaxis(q, 3, 1).reshape(B, d, h * Sq)  # heads -> query lanes
        k3 = jnp.moveaxis(k, 3, 1).reshape(B, d, -1)
        v3 = jnp.moveaxis(v, 3, 1).reshape(B, d, -1)
        o3 = flash_mha_t(q3, k3, v3, sm_scale, block_q, block_kv)
        return jnp.moveaxis(o3.reshape(B, d, h, Sq), 1, 3)
    q3 = jnp.swapaxes(q, 2, 3).reshape(B * h, d, Sq)
    k3 = jnp.swapaxes(k, 2, 3).reshape(B * h, d, -1)
    v3 = jnp.swapaxes(v, 2, 3).reshape(B * h, d, -1)
    o3 = flash_mha_t(q3, k3, v3, sm_scale, block_q, block_kv)
    return jnp.swapaxes(o3.reshape(B, h, d, Sq), 2, 3)


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
