"""Fused row-local encoder sublayers (Pallas TPU), forward + backward.

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

Training: both sublayers carry a ``jax.custom_vjp`` whose backward is itself a
fused Pallas kernel (recompute-in-VMEM: the backward re-derives the sublayer's
intermediates from the block-resident input instead of saving (rows, nhid) /
per-head score tensors through HBM, then emits dx per block and accumulates
the weight gradients across a sequential grid). The XLA autodiff path remains
for the traced-key-mask variant (cross-cell batched HPO).
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

# Above this many feature tokens the fused attention's per-head (R, t, t)
# score tiles exceed the VMEM budget (block 64 already OOMs at t≈50; the
# backward holds all heads' p/o tiles concurrently). Callers fall back to the
# XLA formulation beyond it — correctness is unaffected, only fusion.
MAX_FUSED_ATTN_TOKENS = 48


def _dot_g(lhs, rhs, dimension_numbers, preferred_element_type=jnp.float32):
    """dot_general with f32 accumulation; f32 inputs use HIGHEST precision so
    the kernels match the XLA path's `jax.default_matmul_precision` behavior
    in fp32 parity mode (bf16 production inputs are unaffected)."""
    prec = jax.lax.Precision.HIGHEST if lhs.dtype == jnp.float32 else None
    return jax.lax.dot_general(
        lhs, rhs, dimension_numbers, precision=prec,
        preferred_element_type=preferred_element_type,
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _compiler_params(*semantics: str, vmem_limit_mb: int | None = None):
    """CompilerParams with dimension semantics — except under the TPU
    interpreter, where they are omitted: the interpreter (unlike the real
    Mosaic lowering, which tracks vmap-added grid dims separately via
    ``grid_mapping.vmapped_dims``) zips user semantics against the FULL grid
    and crashes when vmap has prepended a batch dim. Semantics only steer
    scheduling, never results, so interpret-mode tests lose nothing.

    vmem_limit_mb raises Mosaic's default 16 MB scoped-VMEM budget (v5e has
    128 MB physical) for kernels whose working set at the chosen block size
    exceeds it — used by the attention backward at block 32."""
    try:
        from jax._src import config as _jax_config

        interpret = (
            _jax_config.pallas_tpu_interpret_mode_context_manager.value
            is not None
        )
    except Exception:  # pragma: no cover - private-API drift
        interpret = False
    if interpret:
        return None
    kw = {}
    if vmem_limit_mb is not None:
        kw["vmem_limit_bytes"] = vmem_limit_mb * 1024 * 1024
    return pltpu.CompilerParams(dimension_semantics=semantics, **kw)


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


def _row_mask(shape, m_real: int, i, row_axis: int = 0):
    """(block-local) validity mask for the rows axis: global row < m_real.

    Tail blocks of a non-divisible grid read out-of-bounds garbage (Pallas
    masks WRITES automatically but not reads); zeroing invalid rows on load
    makes every kernel algebraically identical to the old zero-padded form —
    without the jnp.pad / slice round-trips of the full activation through
    HBM that padding cost (the measured boundary overhead, round-3 trace)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, row_axis)
    return rows + i * shape[row_axis] < m_real


def _mlp_kernel(x_ref, w1_ref, w2_ref, o_ref):
    x = x_ref[...]  # (R, e)
    h = _dot_g(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = _erf_gelu(h)
    out = _dot_g(
        h.astype(x.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = _ln_rows(x.astype(jnp.float32) + out).astype(o_ref.dtype)


def _mlp_kernel_g(x_ref, w1_ref, w2_ref, o_ref):
    x = x_ref[0]  # (R, e)
    h = _dot_g(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = _erf_gelu(h)
    out = _dot_g(
        h.astype(x.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = _ln_rows(x.astype(jnp.float32) + out).astype(o_ref.dtype)


def _mlp_fwd_call(
    x: jnp.ndarray, w1: jnp.ndarray, w2: jnp.ndarray, block_rows: int
) -> jnp.ndarray:
    """x: (..., e) any leading shape; returns LN(x + mlp(x)) in x.dtype.

    Rows need no masking in the forward: each row is independent, so a
    garbage out-of-bounds tail row yields a garbage output row that the
    masked tail-block WRITE drops.

    The grid blocks over the LAST leading axis only, with the other leading
    dims collapsed into a free reshape: flattening ALL leading dims into one
    rows axis forces a real HBM data-format pass whenever the last leading dim
    is not sublane-aligned (e.g. (4,1,30,1470,192) -> (4,44100,192) at the
    sweep shapes was a measured ~0.4 ms copy per call, both directions,
    fwd and bwd — round-3 trace)."""
    lead = x.shape[:-1]
    e = x.shape[-1]
    if len(lead) > 1 and lead[-1] >= block_rows:
        # item-major: rows axis big enough to block on its own
        s = lead[-1]
        L = 1
        for n in lead[:-1]:
            L *= n
        x2 = x.reshape(L, s, e)
        out = pl.pallas_call(
            _mlp_kernel_g,
            out_shape=jax.ShapeDtypeStruct((L, s, e), x.dtype),
            grid_spec=pl.GridSpec(
                grid=(L, pl.cdiv(s, block_rows)),
                in_specs=[
                    pl.BlockSpec((1, block_rows, e), lambda g, i: (g, i, 0)),
                    pl.BlockSpec((e, w1.shape[1]), lambda g, i: (0, 0)),
                    pl.BlockSpec((w2.shape[0], e), lambda g, i: (0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, block_rows, e), lambda g, i: (g, i, 0)
                ),
            ),
            compiler_params=_compiler_params("parallel", "parallel"),
        )(x2, w1.astype(x.dtype), w2.astype(x.dtype))
        return out.reshape(*lead, e)
    # sample-major fallback: flatten every leading dim into one rows axis
    m = 1
    for n in lead:
        m *= n
    x2 = x.reshape(m, e)
    out = pl.pallas_call(
        _mlp_kernel,
        out_shape=jax.ShapeDtypeStruct((m, e), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(pl.cdiv(m, block_rows),),
            in_specs=[
                pl.BlockSpec((block_rows, e), lambda i: (i, 0)),
                pl.BlockSpec((e, w1.shape[1]), lambda i: (0, 0)),
                pl.BlockSpec((w2.shape[0], e), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((block_rows, e), lambda i: (i, 0)),
        ),
        compiler_params=_compiler_params("parallel"),
    )(x2, w1.astype(x.dtype), w2.astype(x.dtype))
    return out.reshape(*lead, e)


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
    tokens of each row, all in VMEM.

    The block's token dim is t8 ≥ t_real: the [t_real, t8) tail is an
    out-of-bounds read (garbage, not zeros), so it is zeroed on load — a
    garbage v row would otherwise poison valid rows through 0·NaN in the
    p·v contraction. Garbage tail ROWS need no mask: rows are independent
    and the tail-block write is dropped by Pallas."""
    x = x_ref[...]  # (R, t, e)
    o_ref[...] = _feat_attn_fwd_core(
        x, wqkv_ref, wout_ref, h=h, d=d, t_real=t_real, sm_scale=sm_scale,
        key_mask_cols=key_mask_cols,
    ).astype(o_ref.dtype)


def _feat_attn_kernel_im(
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
    """Item-major block: x_ref (1, t8, R, e) from a (b, t, s, e) array. One
    in-VMEM relayout to the row-major (R, t8, e) form on load and one back on
    store — replacing the per-layer (b,s,t,e)<->(b,t,s,e) HBM transpose pair
    the sample-major canonical layout cost."""
    x = jnp.swapaxes(x_ref[0], 0, 1)  # (t8, R, e) -> (R, t8, e)
    out = _feat_attn_fwd_core(
        x, wqkv_ref, wout_ref, h=h, d=d, t_real=t_real, sm_scale=sm_scale,
        key_mask_cols=key_mask_cols,
    )
    o_ref[0] = jnp.swapaxes(out, 0, 1).astype(o_ref.dtype)


def _feat_attn_kernel_masked(
    x_ref,
    mask_ref,
    wqkv_ref,
    wout_ref,
    o_ref,
    *,
    h: int,
    d: int,
    t_real: int,
    sm_scale: float,
):
    """Per-ROW key-masked block (inference-only, no vjp): mask_ref (R, t8)
    f32 0/1 — 0 keys are excluded exactly (−inf logits). Serves cross-width
    member batching: members padded to a common feature width share one
    program, each row masking its own padded token slots."""
    x = x_ref[...]
    o_ref[...] = _feat_attn_fwd_core(
        x, wqkv_ref, wout_ref, h=h, d=d, t_real=t_real, sm_scale=sm_scale,
        key_mask_cols=None, mask=mask_ref[...],
    ).astype(o_ref.dtype)


def _feat_attn_kernel_im_masked(
    x_ref,
    mask_ref,
    wqkv_ref,
    wout_ref,
    o_ref,
    *,
    h: int,
    d: int,
    t_real: int,
    sm_scale: float,
):
    """Item-major per-MEMBER key-masked block (inference-only, no vjp):
    mask_ref is the FULL (b, t8) f32 0/1 mask table (b is tiny — the member
    count), replicated to every grid cell because Mosaic rejects a (1, t8)
    block over a (b, t8) array (second-minor block dim must be 8-divisible or
    equal to the array dim). The cell's member row is selected in-kernel with
    an iota compare + sum — a few-lane VPU op. Keeps cross-width batched
    members on the fully-fused item-major pipeline."""
    x = jnp.swapaxes(x_ref[0], 0, 1)  # (t8, R, e) -> (R, t8, e)
    bi = pl.program_id(0)
    full = mask_ref[...]  # (b, t8)
    rows = jax.lax.broadcasted_iota(jnp.int32, full.shape, 0)
    mask_row = jnp.sum(jnp.where(rows == bi, full, 0.0), axis=0)  # (t8,)
    mask = jnp.broadcast_to(mask_row[None, :], (x.shape[0], full.shape[-1]))
    out = _feat_attn_fwd_core(
        x, wqkv_ref, wout_ref, h=h, d=d, t_real=t_real, sm_scale=sm_scale,
        key_mask_cols=None, mask=mask,
    )
    o_ref[0] = jnp.swapaxes(out, 0, 1).astype(o_ref.dtype)


def _feat_attn_fwd_core(
    x, wqkv_ref, wout_ref, *, h, d, t_real, sm_scale, key_mask_cols, mask=None
):
    R, t, e = x.shape
    if t_real < t:
        tok = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(tok < t_real, x, 0).astype(x.dtype)
    wq = wqkv_ref[0]  # (h*d, e) stacked head-major
    wk = wqkv_ref[1]
    wv = wqkv_ref[2]

    # projections: batched over rows, contraction over e (full 192 depth)
    def proj(w):  # (R, t, e) @ (e, h*d) -> (R, t, h*d)
        return _dot_g(
            x, w, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype)

    q = proj(wq) * jnp.asarray(sm_scale, x.dtype)
    k = proj(wk)
    v = proj(wv)

    os_ = []
    for hh in range(h):  # static unroll over the 6 heads
        q_h = q[..., hh * d : (hh + 1) * d]  # (R, t, d)
        k_h = k[..., hh * d : (hh + 1) * d]
        v_h = v[..., hh * d : (hh + 1) * d]
        s = _dot_g(
            q_h, k_h, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, t, t)
        if mask is not None:  # per-row key mask (host pads the t8 tail with 0)
            s = jnp.where(mask[:, None, :] > 0, s, MASK_VALUE)
        elif key_mask_cols is not None:  # padded tokens never act as keys
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(col < key_mask_cols, s, MASK_VALUE)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_h = _dot_g(
            p.astype(v_h.dtype), v_h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, t, d)
        os_.append(o_h.astype(x.dtype))
    # one head-concatenated out-projection (R,t,h·d)@(h·d,e) instead of h
    # chained (R,t,d)@(d,e) dots — the accumulation chain serializes the MXU
    o_all = jnp.concatenate(os_, axis=-1)
    acc = _dot_g(
        o_all, wout_ref[...].reshape(h * d, x.shape[-1]),
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    return _ln_rows(x.astype(jnp.float32) + acc)


def _attn_fwd_call(
    x: jnp.ndarray,
    w_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    token_valid_count: int | None,
    block_rows: int,
    key_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """x: (..., t, e); attention between the t tokens of each row, plus residual
    and post-norm — one HBM read and one write of the activations.

    key_mask: optional per-row key mask, broadcastable to ``(*lead, t)``
    (e.g. ``(b, 1, t)`` for per-member masks over (b, s, t, e) activations).
    Inference-only — this path has no custom vjp."""
    lead = x.shape[:-2]
    t, e = x.shape[-2], x.shape[-1]
    _, h, d, _ = w_qkv.shape
    m = 1
    for n in lead:
        m *= n
    # the BLOCK's token dim is a sublane multiple (Mosaic cannot merge
    # unaligned sublane dims) but the ARRAY keeps its real t: the tail is an
    # out-of-bounds block region, zeroed on load inside the kernel — no
    # jnp.pad / slice round-trip of the activations through HBM
    t8 = _round_up(t, 8)
    mask_cols = token_valid_count if token_valid_count is not None else t
    x2 = x.reshape(m, t, e)
    # stack projections head-major on the output dim: (3, h*d, e)
    wqkv2 = w_qkv.reshape(3, h * d, e).astype(x.dtype)
    wout2 = w_out.astype(x.dtype)  # (h, d, e)
    if key_mask is not None:
        # materialize (m, t8): per-row f32 0/1, tail columns zero so the
        # kernel's OOB tail block never reads garbage mask values
        km = jnp.broadcast_to(key_mask, (*lead, t)).reshape(m, t)
        km8 = jnp.zeros((m, t8), jnp.float32).at[:, :t].set(km.astype(jnp.float32))
        kernel = functools.partial(
            _feat_attn_kernel_masked,
            h=h, d=d, t_real=t, sm_scale=1.0 / math.sqrt(d),
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, t, e), x.dtype),
            grid_spec=pl.GridSpec(
                grid=(pl.cdiv(m, block_rows),),
                in_specs=[
                    pl.BlockSpec((block_rows, t8, e), lambda i: (i, 0, 0)),
                    pl.BlockSpec((block_rows, t8), lambda i: (i, 0)),
                    pl.BlockSpec((3, h * d, e), lambda i: (0, 0, 0)),
                    pl.BlockSpec((h, d, e), lambda i: (0, 0, 0)),
                ],
                out_specs=pl.BlockSpec((block_rows, t8, e), lambda i: (i, 0, 0)),
            ),
            # f32 (parity-mode) working sets at t8≈48 exceed the default 16 MB
            # scoped-VMEM budget (~17.2 MB measured on v5e); raising the limit
            # is perf-neutral at these block sizes (probe_vmem_limit_ab.py)
            compiler_params=_compiler_params("parallel", vmem_limit_mb=64),
        )(x2, km8, wqkv2, wout2)
        return out.reshape(*lead, t, e)
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
        out_shape=jax.ShapeDtypeStruct((m, t, e), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(pl.cdiv(m, block_rows),),
            in_specs=[
                pl.BlockSpec((block_rows, t8, e), lambda i: (i, 0, 0)),
                pl.BlockSpec((3, h * d, e), lambda i: (0, 0, 0)),
                pl.BlockSpec((h, d, e), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((block_rows, t8, e), lambda i: (i, 0, 0)),
        ),
        # see the item-major variant: f32 at t8≈48 needs >16 MB scoped VMEM
        compiler_params=_compiler_params("parallel", vmem_limit_mb=64),
    )(x2, wqkv2, wout2)
    return out.reshape(*lead, t, e)


def _attn_fwd_call_im(
    x: jnp.ndarray,
    w_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    token_valid_count: int | None,
    block_rows: int,
    key_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Item-major variant: x (b, t, s, e) — the canonical layout of the fused
    training path, where the item-attention sublayer is transpose-free. Blocks
    a (t8, R, e) slab per grid cell and relayouts in VMEM (see
    `_feat_attn_kernel_im`).

    key_mask: optional (b, t) per-member key mask (inference-only, no vjp)."""
    b, t, s, e = x.shape
    _, h, d, _ = w_qkv.shape
    t8 = _round_up(t, 8)
    mask_cols = token_valid_count if token_valid_count is not None else t
    wqkv2 = w_qkv.reshape(3, h * d, e).astype(x.dtype)
    wout2 = w_out.astype(x.dtype)
    if key_mask is not None:
        km8 = jnp.zeros((b, t8), jnp.float32).at[:, :t].set(
            key_mask.astype(jnp.float32)
        )
        kernel = functools.partial(
            _feat_attn_kernel_im_masked,
            h=h, d=d, t_real=t, sm_scale=1.0 / math.sqrt(d),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, t, s, e), x.dtype),
            grid_spec=pl.GridSpec(
                grid=(b, pl.cdiv(s, block_rows)),
                in_specs=[
                    pl.BlockSpec(
                        (1, t8, block_rows, e), lambda bi, si: (bi, 0, si, 0)
                    ),
                    # full mask table to every cell (see kernel docstring)
                    pl.BlockSpec((b, t8), lambda bi, si: (0, 0)),
                    pl.BlockSpec((3, h * d, e), lambda bi, si: (0, 0, 0)),
                    pl.BlockSpec((h, d, e), lambda bi, si: (0, 0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, t8, block_rows, e), lambda bi, si: (bi, 0, si, 0)
                ),
            ),
            # see the row-major masked branch: f32 parity-mode needs >16 MB
            compiler_params=_compiler_params(
                "parallel", "parallel", vmem_limit_mb=64
            ),
        )(x, km8, wqkv2, wout2)
    kernel = functools.partial(
        _feat_attn_kernel_im,
        h=h,
        d=d,
        t_real=t,
        sm_scale=1.0 / math.sqrt(d),
        key_mask_cols=mask_cols,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, s, e), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(b, pl.cdiv(s, block_rows)),
            in_specs=[
                pl.BlockSpec((1, t8, block_rows, e), lambda bi, si: (bi, 0, si, 0)),
                pl.BlockSpec((3, h * d, e), lambda bi, si: (0, 0, 0)),
                pl.BlockSpec((h, d, e), lambda bi, si: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, t8, block_rows, e), lambda bi, si: (bi, 0, si, 0)
            ),
        ),
        # f32 (parity-mode) working sets at t8≈48 exceed the default 16 MB
        # scoped budget (measured 17.21 MB on v5e at width-39 inputs);
        # raising the limit is perf-neutral (probe_vmem_limit_ab.py)
        compiler_params=_compiler_params(
            "parallel", "parallel", vmem_limit_mb=64
        ),
    )(x, wqkv2, wout2)


# ---------------------------------------------------------------------------
# training path: fused backward kernels + custom_vjp wrappers
# ---------------------------------------------------------------------------
#
# The backward recomputes the sublayer's intermediates from the block-resident
# input (recompute-in-VMEM beats saving (rows, nhid) / per-head score tensors
# through HBM at these shapes), then:
#   * writes dx block-by-block (parallel in the data),
#   * accumulates weight grads across a SEQUENTIAL grid into constant-index
#     f32 output blocks (initialized at grid step 0 via pl.when).
# Zero-padding of both x and the cotangent makes every padded row/token's
# contribution vanish algebraically (du = 0 there), so no masks are needed.


def _erf_gelu_and_grad(z: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(gelu(z), gelu'(z)) sharing ONE erf polynomial and ONE exp.

    gelu'(z) = 0.5(1+erf(z/sqrt2)) + z·phi(z), and the A-S erf evaluation's
    internal exp(-(z/sqrt2)^2) = exp(-z^2/2) = sqrt(2π)·phi(z) — so the
    backward's three exps + two poly chains collapse to one of each (the
    VPU transcendental is the bound in the MLP backward, round-4 probe)."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    xs = z * (1.0 / math.sqrt(2.0))
    ax = jnp.abs(xs)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    ex = jnp.exp(-ax * ax)  # = exp(-z^2/2)
    erf_term = jnp.sign(xs) * (1.0 - poly * ex)
    half1pe = 0.5 * (1.0 + erf_term)
    phi = ex * (1.0 / math.sqrt(2.0 * math.pi))
    return z * half1pe, half1pe + z * phi


def _ln_rows_bwd(u32: jnp.ndarray, g32: jnp.ndarray, eps: float = 1e-5):
    """Cotangent of affine-free LayerNorm: u -> LN(u), given dL/dLN(u)."""
    mean = jnp.mean(u32, axis=-1, keepdims=True)
    c = u32 - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    n = c * r
    g_mean = jnp.mean(g32, axis=-1, keepdims=True)
    gn_mean = jnp.mean(g32 * n, axis=-1, keepdims=True)
    return r * (g32 - g_mean - n * gn_mean)


def _mlp_bwd_kernel(
    x_ref, g_ref, w1_ref, w2_ref, dx_ref, dw1_ref, dw2_ref, *, m_real: int
):
    # zero out-of-bounds tail rows on load: the dw contractions sum over rows,
    # so garbage OOB reads must vanish algebraically (as zero-padding did)
    x = x_ref[...]  # (R, e) compute dtype
    g = g_ref[...]
    if m_real % x.shape[0] != 0:
        valid = _row_mask(x.shape, m_real, pl.program_id(0))
        x = jnp.where(valid, x, 0).astype(x.dtype)
        g = jnp.where(valid, g, 0).astype(g.dtype)
    g32 = g.astype(jnp.float32)
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    # recompute forward intermediates in VMEM
    z = _dot_g(
        x, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (R, H)
    gz, gz_grad = _erf_gelu_and_grad(z)
    u32 = x.astype(jnp.float32) + _dot_g(
        gz.astype(x.dtype), w2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    du = _ln_rows_bwd(u32, g32)  # (R, e) f32
    du_c = du.astype(x.dtype)
    dh = _dot_g(
        du_c, w2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (R, H)
    dz = dh * gz_grad
    dz_c = dz.astype(x.dtype)
    dx = du + _dot_g(
        dz_c, w1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dw1_blk = _dot_g(
        x, dz_c, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (e, H)
    dw2_blk = _dot_g(
        gz.astype(x.dtype), du_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, e)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = dw1_blk
        dw2_ref[...] = dw2_blk

    @pl.when(i != 0)
    def _acc():
        dw1_ref[...] += dw1_blk
        dw2_ref[...] += dw2_blk


def _mlp_bwd_kernel_g(
    x_ref, g_ref, w1_ref, w2_ref, dx_ref, dw1_ref, dw2_ref, *, m_real: int
):
    """Item-major grid (L, s-blocks): same math as `_mlp_bwd_kernel` with the
    row mask/grid bookkeeping on the second grid axis."""
    x = x_ref[0]  # (R, e)
    g = g_ref[0]
    if m_real % x.shape[0] != 0:
        valid = _row_mask(x.shape, m_real, pl.program_id(1))
        x = jnp.where(valid, x, 0).astype(x.dtype)
        g = jnp.where(valid, g, 0).astype(g.dtype)
    g32 = g.astype(jnp.float32)
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    z = _dot_g(
        x, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    gz, gz_grad = _erf_gelu_and_grad(z)
    u32 = x.astype(jnp.float32) + _dot_g(
        gz.astype(x.dtype), w2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    du = _ln_rows_bwd(u32, g32)
    du_c = du.astype(x.dtype)
    dh = _dot_g(
        du_c, w2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dz = dh * gz_grad
    dz_c = dz.astype(x.dtype)
    dx = du + _dot_g(
        dz_c, w1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dx_ref[0] = dx.astype(dx_ref.dtype)
    dw1_blk = _dot_g(
        x, dz_c, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dw2_blk = _dot_g(
        gz.astype(x.dtype), du_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dw1_ref[...] = dw1_blk
        dw2_ref[...] = dw2_blk

    @pl.when(jnp.logical_not(first))
    def _acc():
        dw1_ref[...] += dw1_blk
        dw2_ref[...] += dw2_blk


def _mlp_bwd_call(x, w1, w2, g, block_rows: int):
    lead = x.shape[:-1]
    e = x.shape[-1]
    H = w1.shape[1]
    if len(lead) > 1 and lead[-1] >= block_rows:
        s = lead[-1]
        L = 1
        for n in lead[:-1]:
            L *= n
        x2 = x.reshape(L, s, e)
        g2 = g.reshape(L, s, e)
        dx, dw1, dw2 = pl.pallas_call(
            functools.partial(_mlp_bwd_kernel_g, m_real=s),
            out_shape=(
                jax.ShapeDtypeStruct((L, s, e), x.dtype),
                jax.ShapeDtypeStruct((e, H), jnp.float32),
                jax.ShapeDtypeStruct((H, e), jnp.float32),
            ),
            grid_spec=pl.GridSpec(
                grid=(L, pl.cdiv(s, block_rows)),
                in_specs=[
                    pl.BlockSpec((1, block_rows, e), lambda gi, i: (gi, i, 0)),
                    pl.BlockSpec((1, block_rows, e), lambda gi, i: (gi, i, 0)),
                    pl.BlockSpec((e, H), lambda gi, i: (0, 0)),
                    pl.BlockSpec((H, e), lambda gi, i: (0, 0)),
                ],
                out_specs=(
                    pl.BlockSpec((1, block_rows, e), lambda gi, i: (gi, i, 0)),
                    pl.BlockSpec((e, H), lambda gi, i: (0, 0)),
                    pl.BlockSpec((H, e), lambda gi, i: (0, 0)),
                ),
            ),
            # sequential grid: dw accumulates across blocks; f32 working sets
            # exceed the default 16 MB scoped VMEM (measured 18.5 MB on v5e;
            # bf16 production fits — the limit raise is perf-neutral,
            # probe_vmem_limit_ab.py)
            compiler_params=_compiler_params(
                "arbitrary", "arbitrary", vmem_limit_mb=64
            ),
        )(x2, g2, w1.astype(x.dtype), w2.astype(x.dtype))
        return (
            dx.reshape(x.shape),
            dw1.astype(w1.dtype),
            dw2.astype(w2.dtype),
        )
    m = 1
    for n in lead:
        m *= n
    x2 = x.reshape(m, e)
    g2 = g.reshape(m, e)
    dx, dw1, dw2 = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, m_real=m),
        out_shape=(
            jax.ShapeDtypeStruct((m, e), x.dtype),
            jax.ShapeDtypeStruct((e, H), jnp.float32),
            jax.ShapeDtypeStruct((H, e), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(pl.cdiv(m, block_rows),),
            in_specs=[
                pl.BlockSpec((block_rows, e), lambda i: (i, 0)),
                pl.BlockSpec((block_rows, e), lambda i: (i, 0)),
                pl.BlockSpec((e, H), lambda i: (0, 0)),
                pl.BlockSpec((H, e), lambda i: (0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((block_rows, e), lambda i: (i, 0)),
                pl.BlockSpec((e, H), lambda i: (0, 0)),
                pl.BlockSpec((H, e), lambda i: (0, 0)),
            ),
        ),
        # sequential grid: dw accumulates across blocks; see the item-major
        # variant above for the f32 scoped-VMEM rationale
        compiler_params=_compiler_params("arbitrary", vmem_limit_mb=64),
    )(x2, g2, w1.astype(x.dtype), w2.astype(x.dtype))
    return dx.reshape(x.shape), dw1.astype(w1.dtype), dw2.astype(w2.dtype)


_MLP_BLOCK_ROWS = 512


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_mlp_ln_vjp(x, w1, w2, block_rows):
    return _mlp_fwd_call(x, w1, w2, block_rows)


def _fused_mlp_ln_fwd(x, w1, w2, block_rows):
    return _mlp_fwd_call(x, w1, w2, block_rows), (x, w1, w2)


def _fused_mlp_ln_bwd(block_rows, res, g):
    x, w1, w2 = res
    return _mlp_bwd_call(x, w1, w2, g, block_rows)


_fused_mlp_ln_vjp.defvjp(_fused_mlp_ln_fwd, _fused_mlp_ln_bwd)


def fused_mlp_ln(
    x: jnp.ndarray, w1: jnp.ndarray, w2: jnp.ndarray, *, block_rows: int = _MLP_BLOCK_ROWS
) -> jnp.ndarray:
    """LN(x + W2·gelu(W1·x)) with fused Pallas forward AND backward."""
    return _fused_mlp_ln_vjp(x, w1, w2, block_rows)


def _zero_oob(x, g, *, m_real, t_real, block_idx):
    """Zero out-of-bounds tail rows AND tokens of an (R, t, e) block on load:
    the dw contractions sum over (rows·tokens), so garbage OOB reads must
    vanish algebraically exactly as the old zero-padding did."""
    needs_row = m_real % x.shape[0] != 0
    needs_tok = t_real < x.shape[1]
    if needs_row or needs_tok:
        valid = jnp.ones(x.shape, jnp.bool_)
        if needs_row:
            valid &= _row_mask(x.shape, m_real, block_idx)
        if needs_tok:
            tok = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            valid &= tok < t_real
        x = jnp.where(valid, x, 0).astype(x.dtype)
        g = jnp.where(valid, g, 0).astype(g.dtype)
    return x, g


def _attn_bwd_kernel(
    x_ref, g_ref, wqkv_ref, wout_ref, dx_ref, dwqkv_ref, dwout_ref,
    *, h: int, d: int, sm_scale: float, key_mask_cols: int,
    m_real: int, t_real: int,
):
    x, g = _zero_oob(
        x_ref[...], g_ref[...], m_real=m_real, t_real=t_real,
        block_idx=pl.program_id(0),
    )
    dx, dwq_all, dwk_all, dwv_all, dwout_all = _feat_attn_bwd_core(
        x, g, wqkv_ref, wout_ref, h=h, d=d, sm_scale=sm_scale,
        key_mask_cols=key_mask_cols,
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        dwqkv_ref[0] = dwq_all
        dwqkv_ref[1] = dwk_all
        dwqkv_ref[2] = dwv_all
        dwout_ref[...] = dwout_all.reshape(h, d, x.shape[-1])

    @pl.when(jnp.logical_not(first))
    def _acc():
        dwqkv_ref[0] += dwq_all
        dwqkv_ref[1] += dwk_all
        dwqkv_ref[2] += dwv_all
        dwout_ref[...] += dwout_all.reshape(h, d, x.shape[-1])


def _attn_bwd_kernel_im(
    x_ref, g_ref, wqkv_ref, wout_ref, dx_ref, dwqkv_ref, dwout_ref,
    *, h: int, d: int, sm_scale: float, key_mask_cols: int,
    m_real: int, t_real: int,
):
    """Item-major block: x_ref/g_ref/dx_ref (1, t8, R, e) from (b, t, s, e)
    arrays; relayout in VMEM (see `_feat_attn_kernel_im`). The weight grads
    accumulate across the full 2D (b, s-blocks) sequential grid."""
    x = jnp.swapaxes(x_ref[0], 0, 1)
    g = jnp.swapaxes(g_ref[0], 0, 1)
    x, g = _zero_oob(
        x, g, m_real=m_real, t_real=t_real, block_idx=pl.program_id(1)
    )
    dx, dwq_all, dwk_all, dwv_all, dwout_all = _feat_attn_bwd_core(
        x, g, wqkv_ref, wout_ref, h=h, d=d, sm_scale=sm_scale,
        key_mask_cols=key_mask_cols,
    )
    dx_ref[0] = jnp.swapaxes(dx, 0, 1).astype(dx_ref.dtype)
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dwqkv_ref[0] = dwq_all
        dwqkv_ref[1] = dwk_all
        dwqkv_ref[2] = dwv_all
        dwout_ref[...] = dwout_all.reshape(h, d, x.shape[-1])

    @pl.when(jnp.logical_not(first))
    def _acc():
        dwqkv_ref[0] += dwq_all
        dwqkv_ref[1] += dwk_all
        dwqkv_ref[2] += dwv_all
        dwout_ref[...] += dwout_all.reshape(h, d, x.shape[-1])


def _feat_attn_bwd_core(
    x, g, wqkv_ref, wout_ref, *, h: int, d: int, sm_scale: float,
    key_mask_cols: int,
):
    g32 = g.astype(jnp.float32)
    wq = wqkv_ref[0]  # (h*d, e)
    wk = wqkv_ref[1]
    wv = wqkv_ref[2]

    def proj(w):
        return _dot_g(
            x, w, (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype)  # (R, t, h*d)

    q = proj(wq) * jnp.asarray(sm_scale, x.dtype)  # scaled as in forward
    k = proj(wk)
    v = proj(wv)

    # recompute the per-head attention (needs all heads before LN bwd)
    R, t, e = x.shape
    wout2 = wout_ref[...].reshape(h * d, e)  # head-major 2D view
    ps = []
    os_ = []
    for hh in range(h):
        q_h = q[..., hh * d : (hh + 1) * d]
        k_h = k[..., hh * d : (hh + 1) * d]
        v_h = v[..., hh * d : (hh + 1) * d]
        s = _dot_g(
            q_h, k_h, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, t, t)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < key_mask_cols, s, MASK_VALUE)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # (R, t, t) f32
        o_h = _dot_g(
            p.astype(v_h.dtype), v_h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, t, d)
        ps.append(p)
        os_.append(o_h.astype(x.dtype))

    # head-concatenated big dots instead of per-head accumulation chains:
    # the chained `acc += dot(...)`/`dx += dot(...)` form serializes h (or
    # 3h) small MXU ops; one (R,t,h·d)-wide dot keeps the MXU busy.
    o_all = jnp.concatenate(os_, axis=-1)  # (R, t, h·d)
    u32 = x.astype(jnp.float32) + _dot_g(
        o_all, wout2, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    du = _ln_rows_bwd(u32, g32)  # (R, t, e) f32
    du_c = du.astype(x.dtype)

    # 2D views for the weight-grad contractions: Mosaic's matmul supports a
    # single contracting dim, so (R,t,·) pairs flatten to (R·t,·) first
    x2 = x.reshape(R * t, e)
    du2 = du_c.reshape(R * t, e)

    # dWout = o_allᵀ du  and  do = du · Woutᵀ — one dot each, all heads
    dwout_all = _dot_g(
        o_all.reshape(R * t, h * d), du2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (h·d, e)
    do_all = _dot_g(
        du_c, wout2, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)  # (R, t, h·d)

    dqs, dks, dvs = [], [], []
    for hh in range(h):
        q_h = q[..., hh * d : (hh + 1) * d]
        k_h = k[..., hh * d : (hh + 1) * d]
        v_h = v[..., hh * d : (hh + 1) * d]
        p = ps[hh]
        do_c = do_all[..., hh * d : (hh + 1) * d]
        dp = _dot_g(
            do_c, v_h, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, t_q, t_k)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = (p * (dp - delta)).astype(x.dtype)  # (R, t_q, t_k)
        # dq (for the SCALED q), then fold the scale into the projection grad
        dq_h = _dot_g(
            ds, k_h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # (R, t_q, d)
        dk_h = _dot_g(
            ds, q_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, t_k, d) — q already carries sm_scale
        dv_h = _dot_g(
            p.astype(do_c.dtype), do_c, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, t_k, d)
        dqs.append(dq_h.astype(x.dtype))
        dks.append(dk_h.astype(x.dtype))
        dvs.append(dv_h.astype(x.dtype))

    dq_all = jnp.concatenate(dqs, axis=-1)  # (R, t, h·d)
    dk_all = jnp.concatenate(dks, axis=-1)
    dv_all = jnp.concatenate(dvs, axis=-1)

    # input grads: three full-width (R,t,h·d)@(h·d,e) dots
    dx = du
    for dgrad, w in ((dq_all, wq), (dk_all, wk), (dv_all, wv)):
        dx = dx + _dot_g(
            dgrad, w, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # weight grads: sum over (R·t) of outer(h·d-grad, x), one dot per matrix
    dwq_all = _dot_g(
        dq_all.reshape(R * t, h * d), x2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (h·d, e)
    dwk_all = _dot_g(
        dk_all.reshape(R * t, h * d), x2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwv_all = _dot_g(
        dv_all.reshape(R * t, h * d), x2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dx, dwq_all, dwk_all, dwv_all, dwout_all


def _attn_bwd_call(x, w_qkv, w_out, g, block_rows: int):
    lead = x.shape[:-2]
    t, e = x.shape[-2], x.shape[-1]
    _, h, d, _ = w_qkv.shape
    m = 1
    for n in lead:
        m *= n
    t8 = _round_up(t, 8)
    x2 = x.reshape(m, t, e)
    g2 = g.reshape(m, t, e)
    wqkv2 = w_qkv.reshape(3, h * d, e).astype(x.dtype)
    wout2 = w_out.astype(x.dtype)
    kernel = functools.partial(
        _attn_bwd_kernel, h=h, d=d, sm_scale=1.0 / math.sqrt(d),
        key_mask_cols=t, m_real=m, t_real=t,
    )
    dx, dwqkv, dwout = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, t, e), x.dtype),
            jax.ShapeDtypeStruct((3, h * d, e), jnp.float32),
            jax.ShapeDtypeStruct((h, d, e), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(pl.cdiv(m, block_rows),),
            in_specs=[
                pl.BlockSpec((block_rows, t8, e), lambda i: (i, 0, 0)),
                pl.BlockSpec((block_rows, t8, e), lambda i: (i, 0, 0)),
                pl.BlockSpec((3, h * d, e), lambda i: (0, 0, 0)),
                pl.BlockSpec((h, d, e), lambda i: (0, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((block_rows, t8, e), lambda i: (i, 0, 0)),
                pl.BlockSpec((3, h * d, e), lambda i: (0, 0, 0)),
                pl.BlockSpec((h, d, e), lambda i: (0, 0, 0)),
            ),
        ),
        # sequential grid: dw accumulates across blocks; block 32's working
        # set (per-head p/o tiles + recompute temporaries) needs > the 16 MB
        # default scoped VMEM (block sweep: 6.92 -> 6.57 ms f+b per layer-G4)
        compiler_params=_compiler_params("arbitrary", vmem_limit_mb=100),
    )(x2, g2, wqkv2, wout2)
    dx = dx.reshape(x.shape)
    return dx, dwqkv.reshape(w_qkv.shape).astype(w_qkv.dtype), dwout.astype(w_out.dtype)


def _attn_bwd_call_im(x, w_qkv, w_out, g, block_rows: int):
    """Item-major backward: x/g (b, t, s, e)."""
    b, t, s, e = x.shape
    _, h, d, _ = w_qkv.shape
    t8 = _round_up(t, 8)
    wqkv2 = w_qkv.reshape(3, h * d, e).astype(x.dtype)
    wout2 = w_out.astype(x.dtype)
    kernel = functools.partial(
        _attn_bwd_kernel_im, h=h, d=d, sm_scale=1.0 / math.sqrt(d),
        key_mask_cols=t, m_real=s, t_real=t,
    )
    blk = pl.BlockSpec((1, t8, block_rows, e), lambda bi, si: (bi, 0, si, 0))
    dx, dwqkv, dwout = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, t, s, e), x.dtype),
            jax.ShapeDtypeStruct((3, h * d, e), jnp.float32),
            jax.ShapeDtypeStruct((h, d, e), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(b, pl.cdiv(s, block_rows)),
            in_specs=[
                blk,
                blk,
                pl.BlockSpec((3, h * d, e), lambda bi, si: (0, 0, 0)),
                pl.BlockSpec((h, d, e), lambda bi, si: (0, 0, 0)),
            ],
            out_specs=(
                blk,
                pl.BlockSpec((3, h * d, e), lambda bi, si: (0, 0, 0)),
                pl.BlockSpec((h, d, e), lambda bi, si: (0, 0, 0)),
            ),
        ),
        # sequential grid: dw accumulates across blocks; 100 MB scoped VMEM
        # for the block-32 working set (see _attn_bwd_call)
        compiler_params=_compiler_params(
            "arbitrary", "arbitrary", vmem_limit_mb=100
        ),
    )(x, g, wqkv2, wout2)
    return (
        dx,
        dwqkv.reshape(w_qkv.shape).astype(w_qkv.dtype),
        dwout.astype(w_out.dtype),
    )


_ATTN_BLOCK_ROWS = 32


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_attn_ln_vjp(x, w_qkv, w_out, block_rows):
    return _attn_fwd_call(x, w_qkv, w_out, None, block_rows)


def _fused_attn_ln_fwd(x, w_qkv, w_out, block_rows):
    return _attn_fwd_call(x, w_qkv, w_out, None, block_rows), (x, w_qkv, w_out)


# The backward holds every head's p/o tile plus the recompute temporaries
# concurrently (Mosaic stack-allocates unrolled iterations separately); block
# 32 overflows the DEFAULT 16 MB scoped-VMEM limit by ~300 KB, so the bwd
# calls raise the limit to 100 MB (v5e has 128 physical) and run block 32:
# per-cell fixed overhead (6-head unrolled tiny-dot chains, relayouts, LN)
# amortizes over twice the rows (block sweep probe: bwd 6.3 -> 5.8 ms per
# layer-G4 at the n=4 sweep shape).
_ATTN_BWD_BLOCK_ROWS = 32


def _fused_attn_ln_bwd(block_rows, res, g):
    x, w_qkv, w_out = res
    return _attn_bwd_call(x, w_qkv, w_out, g, min(block_rows, _ATTN_BWD_BLOCK_ROWS))


_fused_attn_ln_vjp.defvjp(_fused_attn_ln_fwd, _fused_attn_ln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_attn_ln_im_vjp(x, w_qkv, w_out, block_rows):
    return _attn_fwd_call_im(x, w_qkv, w_out, None, block_rows)


def _fused_attn_ln_im_fwd(x, w_qkv, w_out, block_rows):
    return (
        _attn_fwd_call_im(x, w_qkv, w_out, None, block_rows),
        (x, w_qkv, w_out),
    )


def _fused_attn_ln_im_bwd(block_rows, res, g):
    x, w_qkv, w_out = res
    return _attn_bwd_call_im(
        x, w_qkv, w_out, g, min(block_rows, _ATTN_BWD_BLOCK_ROWS)
    )


_fused_attn_ln_im_vjp.defvjp(_fused_attn_ln_im_fwd, _fused_attn_ln_im_bwd)


def fused_feature_attention_ln_im(
    x: jnp.ndarray,
    w_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    *,
    key_mask: jnp.ndarray | None = None,
    block_rows: int = _ATTN_BLOCK_ROWS,
) -> jnp.ndarray:
    """Item-major `fused_feature_attention_ln`: x (b, t, s, e), attention over
    the t axis per (b, s) row. Used by the item-major encoder-layer path
    (`models/transformer.py::encoder_layer`) whose canonical activation layout
    keeps the item-attention sublayer — the FLOPs majority — transpose-free.

    key_mask: optional (b, t) per-member key mask (cross-width batched
    inference; forward-only, no custom VJP)."""
    if key_mask is not None:
        return _attn_fwd_call_im(
            x, w_qkv, w_out, None, block_rows, key_mask=key_mask
        )
    return _fused_attn_ln_im_vjp(x, w_qkv, w_out, block_rows)


def fused_feature_attention_ln(
    x: jnp.ndarray,
    w_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    *,
    token_valid_count: int | None = None,
    key_mask: jnp.ndarray | None = None,
    block_rows: int = _ATTN_BLOCK_ROWS,  # unrolled-head tiles stack in VMEM; 64 OOMs at t≈50
) -> jnp.ndarray:
    """LN(x + attn over the t feature tokens of each row), fused fwd+bwd.

    ``token_valid_count``: static count of valid leading tokens (None = all);
    ``key_mask``: per-row key mask broadcastable to ``(*lead, t)`` (cross-width
    member batching). Both are inference-only variants with no custom VJP (the
    traced-mask training variant used by cross-cell batched HPO stays on the
    XLA path).
    """
    if key_mask is not None:
        return _attn_fwd_call(
            x, w_qkv, w_out, None, block_rows, key_mask=key_mask
        )
    if token_valid_count is not None:
        return _attn_fwd_call(x, w_qkv, w_out, token_valid_count, block_rows)
    return _fused_attn_ln_vjp(x, w_qkv, w_out, block_rows)
