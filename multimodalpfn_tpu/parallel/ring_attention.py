"""Ring attention: item-axis attention with KV sharded across the mesh.

The reference has no sequence parallelism (SURVEY.md §5 long-context: it chunks
compute on one device). On TPU, contexts beyond one chip's HBM shard the *samples*
axis of the item attention across the mesh: each device holds a KV shard, and
shards rotate around the ring (`lax.ppermute` over ICI) while every device
accumulates online-softmax statistics for its queries — compute overlaps the
neighbor exchange, memory per chip is O(S/n_devices).

This is the XLA-level (shard_map) formulation; it composes with the Pallas flash
kernel per-shard when shards are long enough.
"""

from __future__ import annotations


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


def _block_attention(q, k, v, sm_scale):
    """Unnormalized block contribution + stats. q: (B,h,Sq,d); k/v: (B,h,Skv,d)."""
    s = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        * sm_scale
    )
    m = jnp.max(s, axis=-1)  # (B,h,Sq)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return m, l, acc


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mesh: Mesh | None = None,
    axis: str = "dp",
    sm_scale: float | None = None,
) -> jnp.ndarray:
    """Non-causal attention with K/V sharded on `axis` along the sequence dim.

    q: (B, h, Sq, d) replicated; k, v: (B, h, Skv, d) — Skv must divide by the
    axis size. Returns (B, h, Sq, d) fp32, replicated. ``mesh=None`` uses the
    ambient mesh (jax.set_mesh), so this composes with jitted callers.
    """
    scale = 1.0 / math.sqrt(q.shape[-1]) if sm_scale is None else sm_scale
    n = _axis_size(mesh, axis)

    def inner(q_loc, k_loc, v_loc):
        def step(i, carry):
            k_cur, v_cur, m, l, acc = carry
            m_b, l_b, acc_b = _block_attention(q_loc, k_cur, v_cur, scale)
            m_new = jnp.maximum(m, m_b)
            alpha = jnp.exp(m - m_new)
            beta = jnp.exp(m_b - m_new)
            l = l * alpha + l_b * beta
            acc = acc * alpha[..., None] + acc_b * beta[..., None]
            perm = [(j, (j + 1) % n) for j in range(n)]
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            return k_nxt, v_nxt, m_new, l, acc

        B, h, Sq, d = q_loc.shape
        # stats vary across the ring axis from step 1 on; mark them varying up
        # front so the fori_loop carry type is stable under shard_map
        m0 = jax.lax.pcast(
            jnp.full((B, h, Sq), -jnp.inf, jnp.float32), axis, to="varying"
        )
        l0 = jax.lax.pcast(jnp.zeros((B, h, Sq), jnp.float32), axis, to="varying")
        a0 = jax.lax.pcast(
            jnp.zeros((B, h, Sq, d), jnp.float32), axis, to="varying"
        )
        _, _, m, l, acc = jax.lax.fori_loop(
            0, n, step, (k_loc, v_loc, m0, l0, a0)
        )
        return jax.lax.pmean(acc / l[..., None], axis)

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
) -> jnp.ndarray:
    """Variant with queries ALSO sharded on the sequence axis (full sequence
    parallelism: per-chip memory O(S/n) for q, k, v, and output)."""
    scale = 1.0 / math.sqrt(q.shape[-1]) if sm_scale is None else sm_scale
    n = _axis_size(mesh, axis)

    def inner(q_loc, k_loc, v_loc):
        def step(i, carry):
            k_cur, v_cur, m, l, acc = carry
            m_b, l_b, acc_b = _block_attention(q_loc, k_cur, v_cur, scale)
            m_new = jnp.maximum(m, m_b)
            alpha = jnp.exp(m - m_new)
            beta = jnp.exp(m_b - m_new)
            l = l * alpha + l_b * beta
            acc = acc * alpha[..., None] + acc_b * beta[..., None]
            perm = [(j, (j + 1) % n) for j in range(n)]
            return (
                jax.lax.ppermute(k_cur, axis, perm),
                jax.lax.ppermute(v_cur, axis, perm),
                m_new,
                l,
                acc,
            )

        B, h, Sq, d = q_loc.shape
        m0 = jax.lax.pcast(
            jnp.full((B, h, Sq), -jnp.inf, jnp.float32), axis, to="varying"
        )
        l0 = jax.lax.pcast(jnp.zeros((B, h, Sq), jnp.float32), axis, to="varying")
        a0 = jax.lax.pcast(
            jnp.zeros((B, h, Sq, d), jnp.float32), axis, to="varying"
        )
        _, _, m, l, acc = jax.lax.fori_loop(0, n, step, (k_loc, v_loc, m0, l0, a0))
        return acc / l[..., None]

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
