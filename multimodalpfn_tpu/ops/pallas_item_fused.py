"""Fused item-attention core (Pallas TPU): QKV projections + two-block flash
attention in ONE kernel pair, fwd + merged bwd.

Motivation (measured on v5e, vmapped sweep step, round-3 trace): with the
projections in XLA and the flash kernel taking pre-projected ``(G, d, S)``
operands, ~30% of device time went to layout copies at the kernel boundary
(the ``...si,hdi->...hds`` einsums materialize dot + transpose under vmap) and
the projection dots themselves ran at ~12 TF/s against transposed output
layouts. Moving the projections INSIDE the kernel removes every boundary
transpose: the kernel reads activations in their natural ``(rows, e)`` layout
and projects with full-depth e-contractions in the MXU-native NT form
(``W (hd, e) x X (rows, e) -> (hd, rows)`` — the transposed operand the flash
inner loop wants falls straight out of the dot, no relayout), runs the proven
d-on-sublanes flash inner loop (`ops/pallas_attention.py` design notes), and
writes the attention output in ``(G, h*d, S)`` layout — which the XLA
out-projection consumes as a native lhsT matmul, again copy-free.

Semantics are the reference two-block item attention (`layer.py:341-395`):
train rows self-attend with all KV heads; test rows cross-attend to train
rows sharing KV head 0 across query heads (``reuse_first_head_kv``,
`multi_head_attention.py:438-445`).

Division of labor per encoder layer:

  Pallas (this module): q/k/v projections, flash (online softmax, never
    materializes scores), per-head lse; backward recomputes q/k/v in VMEM and
    emits dx plus all three projection-weight grads in the same sweep.
  XLA (caller): out-projection, residual add, LayerNorm — natural-layout
    dense ops XLA already fuses copy-free (and their backward).

Scaling scheme (identical to `pallas_attention._bwd_kernel`): scratch holds
the UNSCALED projected q; the forward multiplies the score tile by
``sm_scale`` and the backward folds ``sm_scale`` into ds exactly once, so
``dk = q·ds`` and ``dq = k·ds`` need no further correction.

Zero-padding keeps both kernels maskless except the forward's one
statically-known partial KV tail chunk: padded q lanes have do = 0 (their
dv/ds/dq contributions die), padded KV rows have x = 0 so their k/v are zero
(dq ignores them) and their garbage dk/dv rows are annihilated in the
weight-grad contractions by the zero x rows, while their dx rows are sliced
away by the caller.

Capacity: K/V for one (batch, token) group stay resident in VMEM, so the
kernel serves ``sep`` up to ``MAX_FUSED_ITEM_ROWS`` (beyond the PAD-UFES
regime but below the 10k model limit); `ops.attention.item_attention` falls
back to `flash_mha_t` above it.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodalpfn_tpu.ops.pallas_fused import (
    _compiler_params,
    _dot_g,
    _ln_rows,
    _ln_rows_bwd,
    _row_mask,
)
from multimodalpfn_tpu.ops.pallas_attention import (
    MASK_VALUE,
    _fit_block,
    _round_up,
    _should_unroll,
)

LANES = 128

# VMEM ceiling for the resident K/V (+ q/dq scratch in bwd); above this the
# caller uses the streaming flash path instead.
MAX_FUSED_ITEM_ROWS = 4096

DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_KV = 512


def _pick_block(size: int, block_max: int) -> tuple[int, int]:
    """(padded_size, block): block = `_fit_block` (fewest ≤block_max blocks,
    sized to the split), padded_size = round_up(size, block).

    MEASURED dead end (round 3, keep for the record): 128-granular padding
    (1323→1408 instead of →1536) cuts ~16% of padded score FLOPs per axis,
    but forces 128-wide blocks/chunks (1408 = 11·128 has no larger divisor) —
    the backward's sequential (G, n_kv)×chunk grid went 3×3 big cells → 11×11
    tiny ones and ran 4.5× SLOWER (56.8 vs 16.7 ms/layer fwd+bwd,
    probe_sublayer_im.py). Large blocks beat minimal padding here."""
    block = _fit_block(size, block_max)
    return _round_up(size, block), block


def _nt(w, x):
    """(rows_w, e) x (rows_x, e) -> (rows_w, rows_x) f32 — the projection in
    MXU-native NT form; the (hd, S) output is already the transposed layout
    the flash loop consumes."""
    return _dot_g(w, x, (((1,), (1,)), ((), ())))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    xq_ref, xkv_ref, w_ref, o_ref, lse_ref, kt_scr, vt_scr,
    *, h: int, d: int, kv_len: int, sm_scale: float, chunk: int,
    n_chunks: int, cross: bool,
):
    """Grid (G, n_q_blocks). Per cell: project this q block (and, at qi == 0,
    the whole K/V for this group into scratch), then per head run the online-
    softmax chunk loop in the d-on-sublanes orientation.

    ``cross`` (static): multiquery test-rows->train-rows attention — K/V come
    from head 0's weights only and are shared by every query head.
    """
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _project_kv():
        xkv = xkv_ref[0]  # (skv_pad, e)
        wk = w_ref[1, :d] if cross else w_ref[1]
        wv = w_ref[2, :d] if cross else w_ref[2]
        kt_scr[...] = _nt(wk, xkv).astype(kt_scr.dtype)  # (kv_rows, skv_pad)
        vt_scr[...] = _nt(wv, xkv).astype(vt_scr.dtype)

    xq = xq_ref[0]  # (block_q, e)
    q_t = _nt(w_ref[0], xq).astype(xq.dtype)  # (hd, block_q), unscaled
    block_q = q_t.shape[1]

    def process(ci, lo, carry, ksl, q_h, masked):
        m, l, acc = carry
        k_c = kt_scr[ksl, pl.ds(lo, chunk)]  # (d, chunk)
        v_c = vt_scr[ksl, pl.ds(lo, chunk)]
        s = jax.lax.dot_general(
            k_c, q_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (chunk, block_q)
        s = s * sm_scale
        if masked:
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            s = jnp.where(row + lo < kv_len, s, MASK_VALUE)
        m_c = jnp.max(s, axis=0, keepdims=True)  # (1, block_q)
        if ci == 0:
            m_n = m_c
            p = jnp.exp(s - m_n)
            l_n = jnp.sum(p, axis=0, keepdims=True)
            acc_n = jax.lax.dot_general(
                v_c, p.astype(v_c.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (d, block_q)
        else:
            m_n = jnp.maximum(m, m_c)
            alpha = jnp.exp(m - m_n)
            p = jnp.exp(s - m_n)
            l_n = l * alpha + jnp.sum(p, axis=0, keepdims=True)
            acc_n = acc * alpha + jax.lax.dot_general(
                v_c, p.astype(v_c.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return m_n, l_n, acc_n

    n_full = min(kv_len // chunk, n_chunks)
    for hh in range(h):
        q_h = q_t[hh * d : (hh + 1) * d]  # (d, block_q)
        ksl = slice(0, d) if cross else slice(hh * d, (hh + 1) * d)
        step = functools.partial(process, ksl=ksl, q_h=q_h)
        carry = (None, None, None)
        if _should_unroll(n_full, chunk, block_q):
            for ci in range(n_full):
                carry = step(ci, ci * chunk, carry, masked=False)
        else:
            carry = step(0, 0, carry, masked=False)
            carry = jax.lax.fori_loop(
                1,
                n_full,
                lambda i, c: step(
                    1, pl.multiple_of(i * chunk, LANES), c, masked=False
                ),
                carry,
            )
        if n_full < n_chunks:  # one statically-known partial tail chunk
            carry = step(n_full, n_full * chunk, carry, masked=True)
        m, l, acc = carry
        o_ref[0, hh * d : (hh + 1) * d] = (acc / l).astype(o_ref.dtype)
        lse_ref[0, hh : hh + 1] = m + jnp.log(l)


def _pad_rows(x, to):
    pad = to - x.shape[1]
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0)))


def _fwd_region(
    x_q, x_kv, w2, *, kv_len, skv_pad, sq_pad, bq, cross, sm_scale, h, d,
):
    """One region (train-self or test-cross) forward.

    x_q (G, >= sq_pad, e) zero-padded; x_kv (G, >= skv_pad, e) zero-padded
    past ``kv_len`` (may be the same buffer as x_q — only the spec'd prefix
    blocks are read). ``bq`` must divide ``sq_pad``. Returns o
    (G, h*d, sq_pad) in x dtype and lse (G, h, sq_pad) f32.
    """
    G, _, e = x_q.shape
    hd = h * d
    chunk = min(DEFAULT_BLOCK_KV, skv_pad)
    while skv_pad % chunk:
        chunk //= 2
    n_chunks = skv_pad // chunk
    kv_rows = d if cross else hd

    kern = functools.partial(
        _fwd_kernel, h=h, d=d, kv_len=kv_len, sm_scale=sm_scale,
        chunk=chunk, n_chunks=n_chunks, cross=cross,
    )
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((G, hd, sq_pad), x_q.dtype),
            jax.ShapeDtypeStruct((G, h, sq_pad), jnp.float32),
        ),
        grid=(G, sq_pad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, e), lambda g, qi: (g, qi, 0)),
            pl.BlockSpec((1, skv_pad, e), lambda g, qi: (g, 0, 0)),
            pl.BlockSpec((3, hd, e), lambda g, qi: (0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, hd, bq), lambda g, qi: (g, 0, qi)),
            pl.BlockSpec((1, h, bq), lambda g, qi: (g, 0, qi)),
        ),
        scratch_shapes=[
            pltpu.VMEM((kv_rows, skv_pad), x_q.dtype),
            pltpu.VMEM((kv_rows, skv_pad), x_q.dtype),
        ],
        compiler_params=_compiler_params("parallel", "arbitrary"),
    )(x_q, x_kv, w2)


def _fwd_call(x3, w2, sep, *, h, d, sm_scale, block_q=DEFAULT_BLOCK_Q):
    """x3 (G, S, e); w2 (3, h*d, e). Returns o_mid (G, h*d, S) in x dtype and
    (lse_tr, lse_te) (G, h, pad) f32 for the backward."""
    G, S, e = x3.shape
    s_te = S - sep

    # Train-self region. One padded buffer serves both the q-block stream and
    # the resident-KV operand (identical content, no second HBM copy).
    sq_tr, bq_tr = _pick_block(sep, block_q)
    skv_pad, chunk = _pick_block(sep, DEFAULT_BLOCK_KV)
    P = max(sq_tr, skv_pad)
    x_tr = _pad_rows(x3[:, :sep], P)

    o_tr, lse_tr = _fwd_region(
        x_tr, x_tr, w2, kv_len=sep, skv_pad=skv_pad, sq_pad=sq_tr, bq=bq_tr,
        cross=False, sm_scale=sm_scale, h=h, d=d,
    )

    if s_te == 0:
        return o_tr[..., :sep], lse_tr, None

    sq_te, bq_te = _pick_block(s_te, block_q)
    x_te = _pad_rows(x3[:, sep:], sq_te)
    o_te, lse_te = _fwd_region(
        x_te, x_tr, w2, kv_len=sep, skv_pad=skv_pad, sq_pad=sq_te, bq=bq_te,
        cross=True, sm_scale=sm_scale, h=h, d=d,
    )
    o_mid = jnp.concatenate([o_tr[..., :sep], o_te[..., :s_te]], axis=-1)
    return o_mid, lse_tr, lse_te


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(
    xkv_ref, xq_ref, do_ref, lse_ref, delta_ref, w_ref,
    dx_kv_ref, dx_q_ref, dwq_ref, dwk_ref, dwv_ref,
    qt_scr, dq_scr,
    *, h: int, d: int, sm_scale: float, chunk: int, n_chunks: int,
    n_kv: int, cross: bool,
):
    """Merged backward over one region. Grid (G, kv_blocks), both sequential.
    Per cell: recompute this kv block's K/V from x, stream the q chunks once
    (p from saved lse), emit dk/dv for the block immediately as dx(kv-side)
    and dWk/dWv contributions, and accumulate dq in scratch; the last kv step
    folds dq through Wq into dx(q-side) and dWq.

    ``cross`` (static): multiquery region — K/V from head 0 only; dK/dV sum
    over query heads (the GQA gradient), dx(kv-side) lands on TRAIN rows and
    dx(q-side) on test rows.
    """
    g_i = pl.program_id(0)
    ki = pl.program_id(1)

    xkv = xkv_ref[0]  # (bkv, e)
    wk = w_ref[1, :d] if cross else w_ref[1]
    wv = w_ref[2, :d] if cross else w_ref[2]
    kt = _nt(wk, xkv).astype(xkv.dtype)  # (kv_rows, bkv)
    vt = _nt(wv, xkv).astype(xkv.dtype)

    @pl.when(ki == 0)
    def _project_q():
        qt_scr[...] = _nt(w_ref[0], xq_ref[0]).astype(qt_scr.dtype)  # unscaled
        dq_scr[...] = jnp.zeros_like(dq_scr)

    def process(lo, carry, k_h, v_h, sl):
        dk_h, dv_h = carry
        q_c = qt_scr[sl, pl.ds(lo, chunk)]  # (d, chunk)
        do_c = do_ref[0, sl, pl.ds(lo, chunk)]
        lse_c = lse_ref[0, sl.start // d : sl.start // d + 1, pl.ds(lo, chunk)]
        delta_c = delta_ref[
            0, sl.start // d : sl.start // d + 1, pl.ds(lo, chunk)
        ]
        s_t = jax.lax.dot_general(
            k_h, q_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bkv, chunk)
        p_t = jnp.exp(s_t * sm_scale - lse_c)
        dv_h = dv_h + jax.lax.dot_general(
            do_c, p_t.astype(do_c.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d, bkv)
        dp_t = jax.lax.dot_general(
            v_h, do_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bkv, chunk)
        # sm_scale folded into ds once: serves both dq and dk
        ds_t = (p_t * (dp_t - delta_c) * sm_scale).astype(q_c.dtype)
        dk_h = dk_h + jax.lax.dot_general(
            q_c, ds_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d, bkv)
        dq_c = jax.lax.dot_general(
            k_h, ds_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d, chunk)
        dq_scr[sl, pl.ds(lo, chunk)] += dq_c
        return dk_h, dv_h

    bkv = kt.shape[1]
    dk_rows = []
    dv_rows = []
    dk_shared = jnp.zeros((d, bkv), jnp.float32)
    dv_shared = jnp.zeros((d, bkv), jnp.float32)
    for hh in range(h):
        sl = slice(hh * d, (hh + 1) * d)
        k_h = kt if cross else kt[sl]
        v_h = vt if cross else vt[sl]
        step = functools.partial(process, k_h=k_h, v_h=v_h, sl=sl)
        carry = (
            (dk_shared, dv_shared)
            if cross
            else (
                jnp.zeros((d, bkv), jnp.float32),
                jnp.zeros((d, bkv), jnp.float32),
            )
        )
        if _should_unroll(n_chunks, chunk, bkv):
            for ci in range(n_chunks):
                carry = step(ci * chunk, carry)
        else:
            carry = jax.lax.fori_loop(
                0,
                n_chunks,
                lambda i, c: step(pl.multiple_of(i * chunk, LANES), c),
                carry,
            )
        if cross:
            dk_shared, dv_shared = carry
        else:
            dk_rows.append(carry[0])
            dv_rows.append(carry[1])

    if cross:
        dk_t = dk_shared.astype(xkv.dtype)  # (d, bkv)
        dv_t = dv_shared.astype(xkv.dtype)
    else:
        dk_t = jnp.concatenate(dk_rows, axis=0).astype(xkv.dtype)  # (hd, bkv)
        dv_t = jnp.concatenate(dv_rows, axis=0).astype(xkv.dtype)

    # dx (kv-side) for this block: dk^T Wk + dv^T Wv — lhsT-native
    dx_kv = jax.lax.dot_general(
        dk_t, wk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        dv_t, wv, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bkv, e)
    dx_kv_ref[0] = dx_kv.astype(dx_kv_ref.dtype)

    # dWk/dWv contributions from this block: (kv_rows, bkv) x (bkv, e)
    dwk_blk = jax.lax.dot_general(
        dk_t, xkv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dwv_blk = jax.lax.dot_general(
        dv_t, xkv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    first = jnp.logical_and(g_i == 0, ki == 0)

    @pl.when(first)
    def _init_wkv():
        dwk_ref[...] = dwk_blk
        dwv_ref[...] = dwv_blk

    @pl.when(jnp.logical_not(first))
    def _acc_wkv():
        dwk_ref[...] += dwk_blk
        dwv_ref[...] += dwv_blk

    @pl.when(ki == n_kv - 1)
    def _finish_q():
        dq = dq_scr[...].astype(xkv.dtype)  # (hd, sq_pad)
        xq = xq_ref[0]
        dx_q = jax.lax.dot_general(
            dq, w_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (sq_pad, e)
        dx_q_ref[0] = dx_q.astype(dx_q_ref.dtype)
        dwq_blk = jax.lax.dot_general(
            dq, xq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (hd, e)

        @pl.when(g_i == 0)
        def _init_wq():
            dwq_ref[...] = dwq_blk

        @pl.when(g_i != 0)
        def _acc_wq():
            dwq_ref[...] += dwq_blk


def _bwd_region(
    x_q, x_kv, do_t, lse, delta, w2, *, skv_pad, cross, sm_scale, h, d,
    block_kv=DEFAULT_BLOCK_KV,
):
    """x_q (G, sq_pad, e) zero-padded; x_kv (G, P >= skv_pad, e) zero-padded
    (may be the same buffer as x_q); do_t (G, hd, sq_pad) zero-padded
    cotangent of o_mid; lse/delta (G, h, sq_pad). Returns (dx_kv
    (G, skv_pad, e), dx_q (G, sq_pad, e), dwq (hd, e), dwk (hd|d, e),
    dwv (hd|d, e)) — weight grads f32."""
    G, sq_pad, e = x_q.shape
    hd = h * d

    bkv = min(block_kv, skv_pad)
    while skv_pad % bkv:
        bkv //= 2
    n_kv = skv_pad // bkv
    chunk = min(block_kv, sq_pad)
    while sq_pad % chunk:
        chunk //= 2
    n_chunks = sq_pad // chunk

    kern = functools.partial(
        _bwd_kernel, h=h, d=d, sm_scale=sm_scale, chunk=chunk,
        n_chunks=n_chunks, n_kv=n_kv, cross=cross,
    )
    kv_rows = d if cross else hd
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((G, skv_pad, e), x_q.dtype),
            jax.ShapeDtypeStruct((G, sq_pad, e), x_q.dtype),
            jax.ShapeDtypeStruct((hd, e), jnp.float32),
            jax.ShapeDtypeStruct((kv_rows, e), jnp.float32),
            jax.ShapeDtypeStruct((kv_rows, e), jnp.float32),
        ),
        grid=(G, n_kv),
        in_specs=[
            pl.BlockSpec((1, bkv, e), lambda g, ki: (g, ki, 0)),
            pl.BlockSpec((1, sq_pad, e), lambda g, ki: (g, 0, 0)),
            pl.BlockSpec((1, hd, sq_pad), lambda g, ki: (g, 0, 0)),
            pl.BlockSpec((1, h, sq_pad), lambda g, ki: (g, 0, 0)),
            pl.BlockSpec((1, h, sq_pad), lambda g, ki: (g, 0, 0)),
            pl.BlockSpec((3, hd, e), lambda g, ki: (0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bkv, e), lambda g, ki: (g, ki, 0)),
            pl.BlockSpec((1, sq_pad, e), lambda g, ki: (g, 0, 0)),
            pl.BlockSpec((hd, e), lambda g, ki: (0, 0)),
            pl.BlockSpec((kv_rows, e), lambda g, ki: (0, 0)),
            pl.BlockSpec((kv_rows, e), lambda g, ki: (0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((hd, sq_pad), x_q.dtype),
            pltpu.VMEM((hd, sq_pad), jnp.float32),
        ],
        compiler_params=_compiler_params("arbitrary", "arbitrary"),
    )(x_kv, x_q, do_t, lse, delta, w2)


# ---------------------------------------------------------------------------
# public custom-vjp op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def item_mha_core(x3, w_qkv, sep: int, h: int, d: int):
    """Two-block item attention core with in-kernel projections.

    x3: (G, S, e) natural activation layout (G = batch x feature-tokens; the
        first ``sep`` of the S rows are train samples).
    w_qkv: (3, h, d, e) stacked projection weights (ckpt layout).
    Returns o_mid (G, h*d, S): per-head attention outputs, heads stacked on
    the second axis — the caller applies the output projection as a single
    lhsT-native matmul (``o_mid^T @ w_out``), then residual + LN.
    """
    o, _, _ = _fwd_call(
        x3, w_qkv.reshape(3, h * d, x3.shape[-1]).astype(x3.dtype), sep,
        h=h, d=d, sm_scale=1.0 / math.sqrt(d),
    )
    return o


def _core_fwd(x3, w_qkv, sep, h, d):
    w2 = w_qkv.reshape(3, h * d, x3.shape[-1]).astype(x3.dtype)
    o, lse_tr, lse_te = _fwd_call(
        x3, w2, sep, h=h, d=d, sm_scale=1.0 / math.sqrt(d)
    )
    return o, (x3, w_qkv, o, lse_tr, lse_te)


def _pad_cols(a, to):
    pad = to - a.shape[-1]
    if pad == 0:
        return a
    return jnp.pad(a, ((0, 0), (0, 0), (0, pad)))


def _core_bwd(sep, h, d, res, g):
    x3, w_qkv, o_mid, lse_tr, lse_te = res
    G, S, _ = x3.shape
    g = g.astype(x3.dtype)

    # delta_h = sum_d do_h * o_h — both already in (G, hd, S) layout
    delta = (
        (g.astype(jnp.float32) * o_mid.astype(jnp.float32))
        .reshape(G, h, d, S)
        .sum(axis=2)
    )  # (G, h, S)
    dx, dw = _attn_bwd_impl(x3, w_qkv, g, delta, lse_tr, lse_te, sep, h, d)
    return dx.astype(x3.dtype), dw


def _attn_bwd_impl(x3, w_qkv, g, delta, lse_tr, lse_te, sep, h, d):
    """Region backwards of the attention core given the cotangent of o_mid
    (``g``, compute dtype) and the precomputed per-head delta. Returns
    (dx f32, dw_qkv in w_qkv dtype)."""
    G, S, e = x3.shape
    hd = h * d
    s_te = S - sep
    sm_scale = 1.0 / math.sqrt(d)
    w2 = w_qkv.reshape(3, hd, e).astype(x3.dtype)

    sq_tr = lse_tr.shape[-1]
    skv_pad, _ = _pick_block(sep, DEFAULT_BLOCK_KV)
    P = max(sq_tr, skv_pad)
    x_tr = _pad_rows(x3[:, :sep], P)
    # the self region streams q over the SAME padded buffer; padded q lanes
    # beyond sep carry lse = delta = do = 0, which the kernel's algebra zeroes
    sq_s = P

    do_tr = _pad_cols(g[..., :sep], sq_s)
    delta_tr = _pad_cols(delta[..., :sep], sq_s)
    lse_tr_p = _pad_cols(lse_tr, sq_s)

    dxkv_s, dxq_s, dwq, dwk, dwv = _bwd_region(
        x_tr, x_tr, do_tr, lse_tr_p, delta_tr, w2,
        skv_pad=skv_pad, cross=False, sm_scale=sm_scale, h=h, d=d,
    )
    dx_tr = (
        dxq_s[:, :sep].astype(jnp.float32)
        + dxkv_s[:, :sep].astype(jnp.float32)
    )

    if s_te > 0:
        sq_te = lse_te.shape[-1]
        x_te = _pad_rows(x3[:, sep:], sq_te)
        do_te = _pad_cols(g[..., sep:], sq_te)
        delta_te = _pad_cols(delta[..., sep:], sq_te)
        dxkv_x, dxq_x, dwq_x, dwk0_x, dwv0_x = _bwd_region(
            x_te, x_tr, do_te, lse_te, delta_te, w2,
            skv_pad=skv_pad, cross=True, sm_scale=sm_scale, h=h, d=d,
        )
        dx_tr = dx_tr + dxkv_x[:, :sep].astype(jnp.float32)
        dx_te = dxq_x[:, :s_te].astype(jnp.float32)
        dx = jnp.concatenate([dx_tr, dx_te], axis=1)
        dwq = dwq + dwq_x
        dwk = dwk.at[:d].add(dwk0_x)
        dwv = dwv.at[:d].add(dwv0_x)
    else:
        dx = dx_tr

    dw = jnp.stack([dwq, dwk, dwv]).reshape(3, h, d, e)
    return dx, dw.astype(w_qkv.dtype)


item_mha_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# fused sublayer epilogue: out-projection + residual + post-norm
# ---------------------------------------------------------------------------
#
# Keeping the epilogue in XLA cost ~1.5-2 ms/layer at the sweep shapes
# (round-3 trace): the out-projection dot materialized its result through a
# non-tile-aligned reshape, and the residual-LN materialized an f32 copy of
# the full activations forward AND backward (the scan-save read converted
# bf16->f32 through HBM). These kernels keep the whole epilogue block-resident
# in VMEM; the backward also emits the flash backward's per-head
# ``delta = sum_d do*o`` in the same pass, so nothing about the sublayer's
# backward touches f32 activations in HBM.

_EPI_BLOCK_ROWS = 512


def _epi_fwd_kernel(x_ref, o_ref, w_ref, out_ref):
    """out = LN(x + o^T w). x (1, R, e); o (1, hd, R); w (hd, e).

    Precision note (intentional): the residual sum here is f32 x + the f32
    MXU accumulation of the out-projection — the sum never exists in the
    compute dtype. The unfused path (`models.transformer.residual_ln`) forms
    u = x + h in the compute dtype, so in bf16 production the two dispatches
    differ by ~1 bf16 ulp of rounding (the fused path is the MORE precise
    one). `test_pallas_item_fused.py::test_sublayer_bf16_close_to_f32_reference`
    pins both against the f32 reference at bf16 tolerance.
    """
    x = x_ref[0]
    u = x.astype(jnp.float32) + _dot_g(o_ref[0], w_ref[...], (((0,), (0,)), ((), ())))
    out_ref[0] = _ln_rows(u).astype(out_ref.dtype)


def _epi_bwd_kernel(
    x_ref, o_ref, w_ref, g_ref, dx_ref, do_ref, delta_ref, dw_ref,
    *, h: int, d: int, s_real: int,
):
    x = x_ref[0]  # (R, e)
    o_t = o_ref[0]  # (hd, R)
    g = g_ref[0]
    if s_real % x.shape[0] != 0:
        # zero OOB tail rows: g=0 makes every cotangent of this row vanish
        # algebraically; x/o are zeroed too so garbage bf16 NaN patterns
        # cannot poison the LN statistics (0*NaN) before that happens
        valid = _row_mask(x.shape, s_real, pl.program_id(1))
        x = jnp.where(valid, x, 0).astype(x.dtype)
        g = jnp.where(valid, g, 0).astype(g.dtype)
        o_t = jnp.where(
            _row_mask(o_t.shape, s_real, pl.program_id(1), row_axis=1), o_t, 0
        ).astype(o_t.dtype)
    w = w_ref[...]
    u = x.astype(jnp.float32) + _dot_g(o_t, w, (((0,), (0,)), ((), ())))
    du = _ln_rows_bwd(u, g.astype(jnp.float32))  # (R, e) f32
    dx_ref[0] = du.astype(dx_ref.dtype)
    du_c = du.astype(x.dtype)
    do_t = _dot_g(w, du_c, (((1,), (1,)), ((), ())))  # (hd, R) f32
    do_ref[0] = do_t.astype(do_ref.dtype)
    # flash-backward delta for this block: per-head sum over d of do*o
    R = x.shape[0]
    prod = do_t * o_t.astype(jnp.float32)  # (hd, R)
    delta_ref[0] = prod.reshape(h, d, R).sum(axis=1)
    dw_blk = _dot_g(o_t, du_c, (((1,), (0,)), ((), ())))  # (hd, e)
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dw_ref[...] = dw_blk

    @pl.when(jnp.logical_not(first))
    def _acc():
        dw_ref[...] += dw_blk


def _epi_fwd_call(x3, o_mid, w2out, block_rows=_EPI_BLOCK_ROWS):
    G, S, e = x3.shape
    hd = w2out.shape[0]
    return pl.pallas_call(
        _epi_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((G, S, e), x3.dtype),
        grid=(G, pl.cdiv(S, block_rows)),
        in_specs=[
            pl.BlockSpec((1, block_rows, e), lambda g, i: (g, i, 0)),
            pl.BlockSpec((1, hd, block_rows), lambda g, i: (g, 0, i)),
            pl.BlockSpec((hd, e), lambda g, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_rows, e), lambda g, i: (g, i, 0)),
        compiler_params=_compiler_params("parallel", "parallel"),
    )(x3, o_mid, w2out)


def _epi_bwd_call(x3, o_mid, w2out, g, h, d, block_rows=_EPI_BLOCK_ROWS):
    G, S, e = x3.shape
    hd = h * d
    kern = functools.partial(_epi_bwd_kernel, h=h, d=d, s_real=S)
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((G, S, e), x3.dtype),       # du (dx epilogue)
            jax.ShapeDtypeStruct((G, hd, S), x3.dtype),      # do_mid
            jax.ShapeDtypeStruct((G, h, S), jnp.float32),    # delta
            jax.ShapeDtypeStruct((hd, e), jnp.float32),      # dw_out
        ),
        grid=(G, pl.cdiv(S, block_rows)),
        in_specs=[
            pl.BlockSpec((1, block_rows, e), lambda gi, i: (gi, i, 0)),
            pl.BlockSpec((1, hd, block_rows), lambda gi, i: (gi, 0, i)),
            pl.BlockSpec((hd, e), lambda gi, i: (0, 0)),
            pl.BlockSpec((1, block_rows, e), lambda gi, i: (gi, i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_rows, e), lambda gi, i: (gi, i, 0)),
            pl.BlockSpec((1, hd, block_rows), lambda gi, i: (gi, 0, i)),
            pl.BlockSpec((1, h, block_rows), lambda gi, i: (gi, 0, i)),
            pl.BlockSpec((hd, e), lambda gi, i: (0, 0)),
        ),
        # sequential grid: dw_out accumulates across blocks
        compiler_params=_compiler_params("arbitrary", "arbitrary"),
    )(x3, o_mid, w2out, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _item_sublayer_core(x3, w_qkv, w_out, sep: int, h: int, d: int):
    w2 = w_qkv.reshape(3, h * d, x3.shape[-1]).astype(x3.dtype)
    o, _, _ = _fwd_call(x3, w2, sep, h=h, d=d, sm_scale=1.0 / math.sqrt(d))
    return _epi_fwd_call(
        x3, o, w_out.reshape(h * d, -1).astype(x3.dtype)
    )


def _sublayer_fwd(x3, w_qkv, w_out, sep, h, d):
    w2 = w_qkv.reshape(3, h * d, x3.shape[-1]).astype(x3.dtype)
    o, lse_tr, lse_te = _fwd_call(
        x3, w2, sep, h=h, d=d, sm_scale=1.0 / math.sqrt(d)
    )
    out = _epi_fwd_call(x3, o, w_out.reshape(h * d, -1).astype(x3.dtype))
    return out, (x3, w_qkv, w_out, o, lse_tr, lse_te)


def _sublayer_bwd(sep, h, d, res, g):
    x3, w_qkv, w_out, o_mid, lse_tr, lse_te = res
    e = x3.shape[-1]
    hd = h * d
    w2out = w_out.reshape(hd, -1).astype(x3.dtype)
    du, do_mid, delta, dw_out = _epi_bwd_call(
        x3, o_mid, w2out, g.astype(x3.dtype), h, d
    )
    dx_attn, dw_qkv = _attn_bwd_impl(
        x3, w_qkv, do_mid, delta, lse_tr, lse_te, sep, h, d
    )
    dx = du.astype(jnp.float32) + dx_attn
    return (
        dx.astype(x3.dtype),
        dw_qkv,
        dw_out.reshape(w_out.shape).astype(w_out.dtype),
    )


_item_sublayer_core.defvjp(_sublayer_fwd, _sublayer_bwd)


def fused_item_sublayer(
    x: jnp.ndarray,
    w_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    *,
    single_eval_pos: int,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Whole item-attention sublayer, LN(x + W_out·attn(x)), fused fwd+bwd.

    x: (..., S, e); returns the post-norm state in x's shape/compute dtype.
    Everything — projections, flash attention, out-projection, residual,
    LayerNorm, and their backwards (including the flash bwd's delta) — runs in
    Pallas; the only HBM residents are x, o_mid, and lse (all compute-dtype or
    per-head f32 vectors). Reference sublayer structure: `layer.py:341-455`.
    """
    *lead, S, e = x.shape
    _, h, d, _ = w_qkv.shape
    cd = jnp.dtype(compute_dtype)
    G = 1
    for n in lead:
        G *= n
    x3 = x.reshape(G, S, e).astype(cd)
    out = _item_sublayer_core(x3, w_qkv, w_out, single_eval_pos, h, d)
    return out.reshape(*lead, S, e)


def fused_item_attention(
    x: jnp.ndarray,
    w_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    *,
    single_eval_pos: int,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Full item-attention sublayer value (pre-residual): projections + flash
    in Pallas, out-projection in XLA. x: (..., S, e) natural layout with the
    leading dims flattened to the kernel's G axis; returns (..., S, e_out).
    The caller adds the residual and LayerNorm (keeping parity with the XLA
    path's structure in `models/transformer.py::encoder_layer`).
    """
    *lead, S, e = x.shape
    _, h, d, _ = w_qkv.shape
    cd = jnp.dtype(compute_dtype)
    G = 1
    for n in lead:
        G *= n
    x3 = x.reshape(G, S, e).astype(cd)
    o_mid = item_mha_core(x3, w_qkv, single_eval_pos, h, d)  # (G, hd, S)
    # lhsT-native out-projection: contraction over hd (sublanes of o_mid)
    h3 = jax.lax.dot_general(
        o_mid.astype(cd),
        w_out.reshape(h * d, -1).astype(cd),
        (((1,), (0,)), ((), ())),
        preferred_element_type=cd,
    )  # (G, S, e_out)
    return h3.reshape(*lead, S, -1)
