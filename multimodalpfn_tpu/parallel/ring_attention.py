"""Ring attention: item-axis attention with KV sharded across the mesh,
forward AND backward (training-grade).

The reference has no sequence parallelism (SURVEY.md §5 long-context: it chunks
compute on one device). On TPU, contexts beyond one chip's HBM shard the *samples*
axis of the item attention across the mesh: each device holds a KV shard, and
shards rotate around the ring (`lax.ppermute` over ICI) while every device
accumulates online-softmax statistics for its queries — compute overlaps the
neighbor exchange, memory per chip is O(S/n_devices).

Design:

  * Per-shard blocks merge in the NORMALIZED (o, lse) form:
    ``lse = logaddexp(lse_a, lse_b); o = o_a·e^{lse_a−lse} + o_b·e^{lse_b−lse}``
    — so a block contribution needs only an output and a log-sum-exp, which is
    exactly what the Pallas flash kernel emits. With ``use_flash`` each shard's
    block runs `pallas_attention._fwd_impl` (never materializes the per-shard
    score tensor: per-chip score memory O(shard·block), not O(Sq·S/n)).
  * The backward is a ``jax.custom_vjp`` running a SECOND ring pass
    (fori_loop is not reverse-differentiable, and scan would save every
    visiting KV shard — O(S) per chip, defeating the point): dq accumulates
    locally from the saved lse/delta while each (k, v, dk, dv) quadruple
    rotates the full circle and arrives home with its complete gradient. Peak
    per-chip memory stays O(S/n) in KV terms. Each step's block backward uses
    the GLOBAL (o, lse) saved by the forward, so with ``use_flash`` it streams
    through the Pallas merged backward (`pallas_attention._bwd_impl`) — score
    memory O(Sq·block), same as the forward — falling back to the dense XLA
    block only for shards under ``MIN_FLASH_SHARD``.
  * Replicated-query variant: every device accumulates the COMPLETE dq and
    computes the complete dk/dv of whichever shard is visiting (overwrite,
    not accumulate); the invariant re-typing for the replicated output/dq
    happens inside the custom_vjp (pmean of identical values), so the
    shard_map transpose stays exact. Sharded-query inputs accumulate dk/dv
    around the ring and need no correction.
"""

from __future__ import annotations


import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map



def _axis_size(mesh: Mesh | None, axis: str) -> int:
    """Axis size from the given mesh, or from the ambient mesh (jax.set_mesh)."""
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
        if axis not in (mesh.axis_names or ()):
            raise ValueError(
                f"ring_attention: no mesh given and ambient mesh {mesh} has no "
                f"axis {axis!r}; wrap the call in jax.set_mesh(...)"
            )
    return mesh.shape[axis]


# flash per-shard pays off only when the shard is long enough to fill lane
# blocks; below this the XLA block formulation is used inside the ring
MIN_FLASH_SHARD = 512


def _block_o_lse(q, k, v, scale, use_flash):
    """Normalized block output + lse. q: (B,h,Sq,d); k/v: (B,h,Skv,d).
    Returns o (B,h,Sq,d) f32, lse (B,h,Sq) f32."""
    B, h, Sq, d = q.shape
    Skv = k.shape[2]
    if use_flash and Skv >= MIN_FLASH_SHARD:
        from multimodalpfn_tpu.ops.pallas_attention import _fwd_impl

        q3 = jnp.swapaxes(q, 2, 3).reshape(B * h, d, Sq)
        k3 = jnp.swapaxes(k, 2, 3).reshape(B * h, d, Skv)
        v3 = jnp.swapaxes(v, 2, 3).reshape(B * h, d, Skv)
        o3, lse3 = _fwd_impl(
            q3.astype(q.dtype), k3.astype(k.dtype), v3.astype(v.dtype),
            sm_scale=scale, block_q=2048, block_kv=512,
        )
        o = jnp.swapaxes(o3.reshape(B, h, d, Sq), 2, 3)
        lse = lse3.reshape(B, h, Sq)
        return o, lse
    s = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    m = jnp.max(s, axis=-1)  # (B,h,Sq)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ) / l[..., None]
    return o, m + jnp.log(l)


def _block_bwd(q, k_cur, v_cur, o, lse, g, delta, scale, use_flash):
    """One ring step's backward block using the GLOBAL (o, lse) statistics:
    ``p = exp(s·scale − lse)`` already carries the full-softmax normalization,
    so each visiting shard's (dq, dk, dv) contribution is exact in isolation.

    q/k_cur/v_cur: (B,h,S*,d); o (B,h,Sq,d) f32; lse/delta (B,h,Sq) f32;
    g (B,h,Sq,d) f32. Returns (dq_blk, dk_blk, dv_blk) f32 — the local
    queries' contribution for the visiting shard. Long shards stream through
    the Pallas merged backward (score memory O(block), matching the module's
    O(shard·block) claim); short shards use the dense XLA block.
    """
    B, h, Sq, d = q.shape
    Skv = k_cur.shape[2]
    cd = q.dtype
    if use_flash and Skv >= MIN_FLASH_SHARD:
        from multimodalpfn_tpu.ops.pallas_attention import _bwd_impl

        def t3(x, s):
            return jnp.swapaxes(x, 2, 3).reshape(B * h, d, s)

        dq3, dk3, dv3 = _bwd_impl(
            t3(q, Sq), t3(k_cur, Skv), t3(v_cur, Skv),
            t3(o, Sq), lse.reshape(B * h, 1, Sq), t3(g.astype(cd), Sq),
            sm_scale=scale, block_kv=512,
        )

        def t4(x3, s):
            return jnp.swapaxes(x3.reshape(B, h, d, s), 2, 3).astype(jnp.float32)

        return t4(dq3, Sq), t4(dk3, Skv), t4(dv3, Skv)
    s = (
        jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(cd), k_cur,
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    p = jnp.exp(s - lse[..., None])  # (B,h,Sq,Skv_shard)
    dv_blk = jnp.einsum(
        "bhqk,bhqd->bhkd", p.astype(cd), g.astype(cd),
        preferred_element_type=jnp.float32,
    )
    dp = jnp.einsum(
        "bhqd,bhkd->bhqk", g.astype(cd), v_cur,
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta[..., None]) * scale).astype(cd)
    dq_blk = jnp.einsum(
        "bhqk,bhkd->bhqd", ds, k_cur, preferred_element_type=jnp.float32
    )
    dk_blk = jnp.einsum(
        "bhqk,bhqd->bhkd", ds, q.astype(cd),
        preferred_element_type=jnp.float32,
    )
    return dq_blk, dk_blk, dv_blk


def _rot(x, axis, n):
    perm = [(j, (j + 1) % n) for j in range(n)]
    return jax.lax.ppermute(x, axis, perm)


def _vary(x, axis):
    """Re-type as varying over ``axis`` (idempotent; numerically identity)."""
    if axis in (getattr(jax.typeof(x), "vma", frozenset()) or frozenset()):
        return x
    return jax.lax.pcast(x, axis, to="varying")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _ring_core(q_loc, k_loc, v_loc, axis, n, scale, use_flash, q_replicated):
    """Local-shard ring attention: q_loc attends to ALL kv shards rotating
    around ``axis``. Returns the complete normalized output for q_loc's rows.
    With ``q_replicated`` the output is re-typed ring-invariant (numerically
    the identity — every device accumulated the identical full result)."""
    o, _ = _ring_fwd_impl(q_loc, k_loc, v_loc, axis, n, scale, use_flash)
    if q_replicated:
        o = jax.lax.pmean(o, axis)
    return o


def _ring_fwd_impl(q_loc, k_loc, v_loc, axis, n, scale, use_flash):
    B, h, Sq, d = q_loc.shape
    # replicated q is re-typed varying so every operand of the per-shard
    # (Pallas) block shares one vma type; numerically the identity
    q_loc = _vary(q_loc, axis)

    def step(i, carry):
        k_cur, v_cur, o, lse = carry
        o_b, lse_b = _block_o_lse(q_loc, k_cur, v_cur, scale, use_flash)
        lse_new = jnp.logaddexp(lse, lse_b)
        o = (
            o * jnp.exp(lse - lse_new)[..., None]
            + o_b * jnp.exp(lse_b - lse_new)[..., None]
        )
        return _rot(k_cur, axis, n), _rot(v_cur, axis, n), o, lse_new

    # stats vary across the ring axis from step 1 on; mark them varying up
    # front so the fori_loop carry type is stable under shard_map
    o0 = _vary(jnp.zeros((B, h, Sq, d), jnp.float32), axis)
    lse0 = _vary(jnp.full((B, h, Sq), -jnp.inf, jnp.float32), axis)
    _, _, o, lse = jax.lax.fori_loop(0, n, step, (k_loc, v_loc, o0, lse0))
    return o, lse


def _ring_core_fwd(q_loc, k_loc, v_loc, axis, n, scale, use_flash, q_replicated):
    o, lse = _ring_fwd_impl(q_loc, k_loc, v_loc, axis, n, scale, use_flash)
    if q_replicated:
        o = jax.lax.pmean(o, axis)
    return o, (q_loc, k_loc, v_loc, o, lse)


def _ring_core_bwd(axis, n, scale, use_flash, q_replicated, res, g):
    q_loc, k_loc, v_loc, o, lse = res
    g = g.astype(jnp.float32)
    delta = jnp.sum(g * o, axis=-1)  # (B,h,Sq)
    # uniform vma for the per-shard block operands (see _ring_fwd_impl)
    q_loc, o, lse, g, delta = (
        _vary(t, axis) for t in (q_loc, o, lse, g, delta)
    )

    def step(i, carry):
        k_cur, v_cur, dk_cur, dv_cur, dq = carry
        dq_blk, dk_blk, dv_blk = _block_bwd(
            q_loc, k_cur, v_cur, o, lse, g, delta, scale, use_flash
        )
        dq = dq + dq_blk
        # with replicated queries every device computes the COMPLETE dk/dv for
        # the visiting shard (it holds all the query rows) — overwrite, don't
        # double-count; with sharded queries each device adds its rows' part
        if q_replicated:
            dk_new = dk_blk
            dv_new = dv_blk
        else:
            dk_new = dk_cur + dk_blk
            dv_new = dv_cur + dv_blk
        # (k, dk) and (v, dv) travel together; after n rotations each pair is
        # home with gradient contributions from every device's queries
        return (
            _rot(k_cur, axis, n),
            _rot(v_cur, axis, n),
            _rot(dk_new, axis, n),
            _rot(dv_new, axis, n),
            dq,
        )

    dk0 = _vary(jnp.zeros(k_loc.shape, jnp.float32), axis)
    dv0 = _vary(jnp.zeros(v_loc.shape, jnp.float32), axis)
    dq0 = _vary(jnp.zeros(q_loc.shape, jnp.float32), axis)
    _, _, dk, dv, dq = jax.lax.fori_loop(
        0, n, step, (k_loc, v_loc, dk0, dv0, dq0)
    )
    if q_replicated:
        # every device accumulated the COMPLETE dq (each saw every KV shard);
        # pmean re-types it as ring-invariant — numerically the identity — so
        # the shard_map transpose of the replicated q input is exact
        dq = jax.lax.pmean(dq, axis)
        # dk/dv stay varying (they are true shards) — nothing to do
    return (
        dq.astype(q_loc.dtype),
        dk.astype(k_loc.dtype),
        dv.astype(v_loc.dtype),
    )


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mesh: Mesh | None = None,
    axis: str = "dp",
    sm_scale: float | None = None,
    use_flash: bool = False,
) -> jnp.ndarray:
    """Non-causal attention with K/V sharded on `axis` along the sequence dim.

    q: (B, h, Sq, d) replicated; k, v: (B, h, Skv, d) — Skv must divide by the
    axis size. Returns (B, h, Sq, d) fp32, replicated. ``mesh=None`` uses the
    ambient mesh (jax.set_mesh), so this composes with jitted callers.
    Differentiable (custom ring backward); ``use_flash`` runs each shard's
    block through the Pallas flash forward.
    """
    scale = 1.0 / math.sqrt(q.shape[-1]) if sm_scale is None else sm_scale
    n = _axis_size(mesh, axis)

    def inner(q_loc, k_loc, v_loc):
        # the invariant re-typing for the P() out_spec happens INSIDE the
        # custom_vjp (fwd pmean), so the backward receives the full replicated
        # cotangent rather than shard_map's 1/n-scaled pmean transpose
        return _ring_core(q_loc, k_loc, v_loc, axis, n, scale, use_flash, True)

    return shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(None, None, axis, None), P(None, None, axis, None)),
        out_specs=P(),
    )(q, k, v)


def ring_attention_sharded_queries(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mesh: Mesh | None = None,
    axis: str = "dp",
    sm_scale: float | None = None,
    use_flash: bool = False,
) -> jnp.ndarray:
    """Variant with queries ALSO sharded on the sequence axis (full sequence
    parallelism: per-chip memory O(S/n) for q, k, v, output, AND gradients)."""
    scale = 1.0 / math.sqrt(q.shape[-1]) if sm_scale is None else sm_scale
    n = _axis_size(mesh, axis)

    def inner(q_loc, k_loc, v_loc):
        return _ring_core(q_loc, k_loc, v_loc, axis, n, scale, use_flash, False)

    return shard_map(
        inner,
        mesh=mesh,
        in_specs=(
            P(None, None, axis, None),
            P(None, None, axis, None),
            P(None, None, axis, None),
        ),
        out_specs=P(None, None, axis, None),
    )(q, k, v)
