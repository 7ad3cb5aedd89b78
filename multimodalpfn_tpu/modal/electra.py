"""ELECTRA text encoder as a functional JAX model (L0 modality encoder).

The reference embeds free-text columns with HF
``google/electra-base-discriminator`` CLS tokens (`mmpfn/datasets/cloth.py:57-88`,
`datasets/petfinder.py:152-188`) through torch/transformers. This is the
TPU-native equivalent: a pure-function BERT-style encoder (stacked layer
params under ``lax.scan``, bf16-able matmuls) plus a converter from the HF
checkpoint, so embedding generation runs on the same JAX stack as the rest of
the framework. ``modal/text.py`` routes through it when weights are available
and keeps the cache-first contract either way.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ElectraConfig:
    vocab_size: int = 30522
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_position: int = 512
    type_vocab: int = 2
    embedding_size: int = 768  # == hidden for -base; smaller for -small
    layer_norm_eps: float = 1e-12
    compute_dtype: str = "float32"


def _ln(x, g, b, eps):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def _layer(x, p, mask_bias, cfg: ElectraConfig):
    """One post-LN BERT/ELECTRA encoder layer (HF ElectraLayer semantics)."""
    cd = jnp.dtype(cfg.compute_dtype)
    h, nh = cfg.hidden, cfg.heads
    d = h // nh
    B, L, _ = x.shape

    def dense(z, w, b):  # HF Linear: y = z @ w.T + b; converter pre-transposes
        return (
            jnp.einsum("...i,io->...o", z.astype(cd), w.astype(cd),
                       preferred_element_type=jnp.dtype(cd))
            + b
        )

    q = dense(x, p["q_w"], p["q_b"]).reshape(B, L, nh, d)
    k = dense(x, p["k_w"], p["k_b"]).reshape(B, L, nh, d)
    v = dense(x, p["v_w"], p["v_b"]).reshape(B, L, nh, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s / np.sqrt(d)
    if mask_bias is not None:
        s = s + mask_bias  # (B, 1, 1, L) additive -inf on padded keys
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(cd)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", a, v,
                     preferred_element_type=jnp.dtype(cd)).reshape(B, L, h)
    attn_out = dense(ctx, p["ao_w"], p["ao_b"])
    x = _ln(x + attn_out, p["aln_g"], p["aln_b"], cfg.layer_norm_eps)
    inter = jax.nn.gelu(dense(x, p["i_w"], p["i_b"]), approximate=False)
    out = dense(inter, p["o_w"], p["o_b"])
    return _ln(x + out, p["oln_g"], p["oln_b"], cfg.layer_norm_eps)


def forward(
    params: dict,
    cfg: ElectraConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None,
    token_type_ids: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Token ids (B, L) int32 -> last hidden state (B, L, hidden) f32.

    Matches HF ``ElectraModel(...).last_hidden_state`` (eval mode, no
    dropout). ``attention_mask``: 1 for real tokens, 0 for padding.
    """
    B, L = input_ids.shape
    emb = params["word_emb"][input_ids]
    emb = emb + params["pos_emb"][:L][None]
    tt = (
        jnp.zeros((B, L), jnp.int32) if token_type_ids is None else token_type_ids
    )
    emb = emb + params["type_emb"][tt]
    emb = _ln(emb, params["emb_ln_g"], params["emb_ln_b"], cfg.layer_norm_eps)
    if "emb_proj_w" in params:  # electra-small: embedding_size != hidden
        emb = (
            jnp.einsum("...i,io->...o", emb, params["emb_proj_w"])
            + params["emb_proj_b"]
        )
    x = emb.astype(jnp.dtype(cfg.compute_dtype))

    mask_bias = None
    if attention_mask is not None:
        mask_bias = jnp.where(
            attention_mask[:, None, None, :].astype(bool), 0.0, -1e30
        ).astype(jnp.float32)

    def body(carry, lp):
        return _layer(carry, lp, mask_bias, cfg), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x.astype(jnp.float32)


def cls_embeddings(
    params: dict,
    cfg: ElectraConfig,
    input_ids: np.ndarray,
    attention_mask: np.ndarray | None = None,
    *,
    batch_size: int = 16,
) -> np.ndarray:
    """Token ids -> (B, 1, hidden) CLS embeddings (the reference's text
    embedding contract), batched through one jitted forward."""
    fwd = jax.jit(lambda p, ids, m: forward(p, cfg, ids, m)[:, 0, :])
    outs = []
    ids = np.asarray(input_ids, np.int32)
    mask = (
        np.ones_like(ids) if attention_mask is None
        else np.asarray(attention_mask, np.int32)
    )
    for i in range(0, len(ids), batch_size):
        chunk = slice(i, i + batch_size)
        cur = ids[chunk]
        if len(cur) < batch_size and i > 0:  # keep one compiled shape
            pad = batch_size - len(cur)
            cur = np.concatenate([cur, np.repeat(cur[-1:], pad, 0)])
            m = np.concatenate([mask[chunk], np.repeat(mask[chunk][-1:], pad, 0)])
            outs.append(np.asarray(fwd(params, cur, m))[: batch_size - pad])
        else:
            outs.append(np.asarray(fwd(params, cur, mask[chunk])))
    return np.concatenate(outs)[:, None, :].astype(np.float32)


# --- HF checkpoint conversion ------------------------------------------------


def convert_hf_state_dict(sd: dict[str, Any], cfg: ElectraConfig) -> dict:
    """HF ``ElectraModel`` state dict -> pytree (accepts tensors or arrays;
    keys with or without the ``electra.`` prefix)."""

    def a(name):
        for k in (name, "electra." + name):
            if k in sd:
                v = sd[k]
                return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        raise KeyError(name)

    params: dict[str, Any] = {
        "word_emb": a("embeddings.word_embeddings.weight"),
        "pos_emb": a("embeddings.position_embeddings.weight"),
        "type_emb": a("embeddings.token_type_embeddings.weight"),
        "emb_ln_g": a("embeddings.LayerNorm.weight"),
        "emb_ln_b": a("embeddings.LayerNorm.bias"),
    }
    if any("embeddings_project" in k for k in sd):
        params["emb_proj_w"] = a("embeddings_project.weight").T
        params["emb_proj_b"] = a("embeddings_project.bias")

    def layer(i):
        pre = f"encoder.layer.{i}."
        return {
            # HF Linear stores (out, in); pre-transpose to (in, out)
            "q_w": a(pre + "attention.self.query.weight").T,
            "q_b": a(pre + "attention.self.query.bias"),
            "k_w": a(pre + "attention.self.key.weight").T,
            "k_b": a(pre + "attention.self.key.bias"),
            "v_w": a(pre + "attention.self.value.weight").T,
            "v_b": a(pre + "attention.self.value.bias"),
            "ao_w": a(pre + "attention.output.dense.weight").T,
            "ao_b": a(pre + "attention.output.dense.bias"),
            "aln_g": a(pre + "attention.output.LayerNorm.weight"),
            "aln_b": a(pre + "attention.output.LayerNorm.bias"),
            "i_w": a(pre + "intermediate.dense.weight").T,
            "i_b": a(pre + "intermediate.dense.bias"),
            "o_w": a(pre + "output.dense.weight").T,
            "o_b": a(pre + "output.dense.bias"),
            "oln_g": a(pre + "output.LayerNorm.weight"),
            "oln_b": a(pre + "output.LayerNorm.bias"),
        }

    ls = [layer(i) for i in range(cfg.layers)]
    params["layers"] = jax.tree.map(lambda *xs: np.stack(xs), *ls)
    return jax.tree.map(jnp.asarray, params)


def init_params(key, cfg: ElectraConfig) -> dict:
    """Random init (testing / benchmarking without weights)."""
    ks = iter(jax.random.split(key, 64))

    def nrm(shape, std=0.02):
        return jax.random.normal(next(ks), shape, jnp.float32) * std

    h, e = cfg.hidden, cfg.embedding_size
    params = {
        "word_emb": nrm((cfg.vocab_size, e)),
        "pos_emb": nrm((cfg.max_position, e)),
        "type_emb": nrm((cfg.type_vocab, e)),
        "emb_ln_g": jnp.ones((e,)),
        "emb_ln_b": jnp.zeros((e,)),
    }
    if e != h:
        params["emb_proj_w"] = nrm((e, h))
        params["emb_proj_b"] = jnp.zeros((h,))

    def layer(k):
        kk = iter(jax.random.split(k, 16))

        def w(shape, std=0.02):
            return jax.random.normal(next(kk), shape, jnp.float32) * std

        return {
            "q_w": w((h, h)), "q_b": jnp.zeros((h,)),
            "k_w": w((h, h)), "k_b": jnp.zeros((h,)),
            "v_w": w((h, h)), "v_b": jnp.zeros((h,)),
            "ao_w": w((h, h)), "ao_b": jnp.zeros((h,)),
            "aln_g": jnp.ones((h,)), "aln_b": jnp.zeros((h,)),
            "i_w": w((h, cfg.intermediate)), "i_b": jnp.zeros((cfg.intermediate,)),
            "o_w": w((cfg.intermediate, h)), "o_b": jnp.zeros((h,)),
            "oln_g": jnp.ones((h,)), "oln_b": jnp.zeros((h,)),
        }

    ls = [layer(k) for k in jax.random.split(next(ks), cfg.layers)]
    params["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *ls)
    return params
