"""Multimodal mixers: MGM, CAP, MoE — functional, batched JAX versions.

Reference semantics: `mmpfn/models/mmpfn/model/transformer.py:33-128`. Unlike the
reference (whose CAP/MoE hard-assume batch==1, `transformer.py:78,109`), these are
written for a leading ensemble/member batch axis so vmapped ensembles and batched HPO
trials work; at batch==1 they reduce to reference numerics exactly.

All mixers map frozen-encoder embeddings ``(b, s, N, in_dim)`` to model-width image
tokens ``(b, s, N', emsize)`` that get concatenated onto the feature-token axis.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from multimodalpfn_tpu.models.config import MixerConfig


def _layer_norm(x, g, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def _dropout(x, rate, rng, deterministic):
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def mgm(params: dict, cfg: MixerConfig, x: jnp.ndarray, *, rng=None, train=False):
    """Multihead Gated MLP (`transformer.py:33-48`): per head
    LN -> Linear(in,in) -> GLU -> Dropout -> Linear(in/2, emsize); heads concatenate
    on the token axis (head-major). Heads are batched into single einsums so a
    256-head mixer is two MXU matmuls, not 256 modules."""
    H = params["ln_g"].shape[0]
    h = _layer_norm(x[..., None, :, :], params["ln_g"][:, None, :], params["ln_b"][:, None, :])
    # h: (b, s, H, N, in); per-head first linear
    h = (
        jnp.einsum("...hni,hio->...hno", h, params["w1"],
                   preferred_element_type=jnp.float32)
        + params["b1"][:, None, :]
    )
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)  # torch GLU(dim=-1)
    h = _dropout(h, cfg.dropout, rng if train else None, not train)
    out = (
        jnp.einsum("...hni,hio->...hno", h, params["w2"],
                   preferred_element_type=jnp.float32)
        + params["b2"][:, None, :]
    )
    # (b, s, H, N, e) -> heads-major token concat (b, s, H*N, e)
    return out.reshape(*out.shape[:-3], H * out.shape[-2], out.shape[-1])


def orthogonality_loss(params_mgm: dict) -> jnp.ndarray:
    """Pairwise Frobenius cross-correlation of MGM output projections
    (`transformer.py:50-57`); exposed for feature parity (unused by default)."""
    w = jnp.swapaxes(params_mgm["w2"], -1, -2)  # torch layout (H, out, in)
    h = w.shape[0]
    loss = 0.0
    for i in range(h):
        for j in range(i + 1, h):
            loss = loss + jnp.linalg.norm(w[i] @ w[j].T)
    return loss


def cap(
    params: dict,
    cfg: MixerConfig,
    src: jnp.ndarray,
    *,
    rng=None,
    train=False,
    src_valid: jnp.ndarray | None = None,
):
    """Cross-Attention Pooler (`transformer.py:60-88`): ``cap_heads`` learned queries
    attend over the mixer tokens via torch-style nn.MultiheadAttention, then
    out = LN(out) + FFN(out). src: ``(b, s, N, e)`` -> ``(b, s, cap_heads, e)``.

    ``src_valid``: boolean ``(N,)`` — False source tokens are excluded exactly
    (for padded MGM heads in cross-cell batched HPO)."""
    e = src.shape[-1]
    nh = cfg.cap_heads
    hd = e // nh
    assert nh * hd == e, "cap_heads must divide emsize"

    k_in = _layer_norm(src, params["k_norm_g"], params["k_norm_b"])
    q_in = _layer_norm(params["queries"], params["q_norm_g"], params["q_norm_b"])
    q_in = q_in @ params["q_proj_w"]  # (cap, e)

    wq, wk, wv = jnp.split(params["in_proj_w"], 3, axis=0)  # (e, e) torch (out,in)
    bq, bk, bv = jnp.split(params["in_proj_b"], 3, axis=0)
    q = q_in @ wq.T + bq  # (cap, e)
    k = k_in @ wk.T + bk  # (b, s, N, e)
    v = k_in @ wv.T + bv

    def split_heads(t):
        return t.reshape(*t.shape[:-1], nh, hd)

    qh = split_heads(q)  # (cap, nh, hd)
    kh = split_heads(k)  # (b, s, N, nh, hd)
    vh = split_heads(v)
    logits = jnp.einsum("chd,bsnhd->bshcn", qh, kh) / math.sqrt(hd)
    if src_valid is not None:
        logits = jnp.where(src_valid, logits, -jnp.inf)
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(src.dtype)
    p = _dropout(p, cfg.dropout, rng if train else None, not train)
    o = jnp.einsum("bshcn,bsnhd->bschd", p, vh)
    o = o.reshape(*o.shape[:-2], e)
    out = o @ params["out_proj_w"].T + params["out_proj_b"]  # (b, s, cap, e)

    ffn = out @ params["ffn_w1"] + params["ffn_b1"]
    ffn = jax.nn.gelu(ffn, approximate=False)
    ffn = _dropout(
        ffn, cfg.dropout, jax.random.fold_in(rng, 1) if (train and rng is not None) else None, not train
    )
    ffn = ffn @ params["ffn_w2"] + params["ffn_b2"]
    return _layer_norm(out, params["out_norm_g"], params["out_norm_b"]) + ffn


def moe(
    params: dict,
    cfg: MixerConfig,
    image: jnp.ndarray,
    *,
    rng=None,
    train=False,
    expert_active: jnp.ndarray | None = None,
):
    """Dense top-k MoE over the first image token (`transformer.py:91-128`).
    Note the reference's top_k = max(mgm_heads, cap_heads) >= n_experts whenever
    cap<=mgm, i.e. the gate is effectively dense; we reproduce both branches.

    ``expert_active``: experts with index >= this count get gate weight 0
    exactly (padded experts in cross-cell batched HPO; dense gate only)."""
    x = image[..., 0, :]  # (b, s, in_dim) first token only (reference x[0,:,0])
    n_experts = params["ln_g"].shape[0]
    gate_logits = x @ params["gate_w"] + params["gate_b"]
    if expert_active is not None:
        assert cfg.moe_top_k >= n_experts, (
            "per-run top-k gating is not supported with padded experts"
        )
        gate_logits = jnp.where(
            jnp.arange(n_experts) < expert_active, gate_logits, -jnp.inf
        )
    gate = jax.nn.softmax(gate_logits, axis=-1)
    if cfg.moe_top_k < n_experts:
        thresh = -jnp.sort(-gate, axis=-1)[..., cfg.moe_top_k - 1 : cfg.moe_top_k]
        mask = gate >= thresh
        gate = gate * mask
        gate = gate / (gate.sum(axis=-1, keepdims=True) + 1e-9)

    # all experts batched into two einsums (the reference computes every expert
    # densely anyway, `transformer.py:121-127` — no dispatch/all-to-all needed)
    h = _layer_norm(x[..., None, :], params["ln_g"], params["ln_b"])  # (b,s,E,in)
    h = (
        jnp.einsum("...ei,eio->...eo", h, params["w1"],
                   preferred_element_type=jnp.float32)
        + params["b1"]
    )
    h = jax.nn.gelu(h, approximate=False)
    h = _dropout(h, 0.1, rng if train else None, not train)
    outs = (
        jnp.einsum("...ei,eio->...eo", h, params["w2"],
                   preferred_element_type=jnp.float32)
        + params["b2"]
    )  # (b, s, E, emsize)
    return outs * gate[..., None]


def apply_mixer(
    mixer_params: dict,
    cfg: MixerConfig,
    image: jnp.ndarray,
    *,
    rng=None,
    train=False,
    mgm_active: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Dispatch per `transformer.py:755-761`.

    ``mgm_active`` (traced scalar) activates a prefix of PADDED MGM heads /
    MoE experts for cross-cell batched HPO: inactive MGM-head tokens are
    excluded from the CAP pool (or MoE gate) exactly, and the caller masks
    inactive output tokens out of the transformer's feature attention. Exact
    equality with an unpadded mixer of the active size. ``cap_heads`` is NOT
    paddable — it sets the CAP MHA head split (reference `transformer.py:66`),
    so batched groups must share it."""
    if cfg.mixer_type == "MoE":
        return moe(
            mixer_params["moe"], cfg, image, rng=rng, train=train,
            expert_active=mgm_active,
        )
    r1 = r2 = None
    if train and rng is not None:
        r1, r2 = jax.random.split(rng)
    tokens = mgm(mixer_params["mgm"], cfg, image, rng=r1, train=train)
    if cfg.mixer_type == "MGM+CAP":
        src_valid = None
        if mgm_active is not None:
            n_img = image.shape[-2]
            src_valid = (jnp.arange(tokens.shape[-2]) // n_img) < mgm_active
        tokens = cap(
            mixer_params["cap"], cfg, tokens, rng=r2, train=train,
            src_valid=src_valid,
        )
    return tokens
