"""DINOv2 ViT-B/14 image encoder in JAX (embedding generation, L0).

The reference vendors the full DINOv2 repo but only `vision_transformer.py`'s
`vit_base` + `forward_features(...)['x_norm_clstoken']` are on the MMPFN path
(`mmpfn/datasets/pad_ufes_20.py:78-96`, SURVEY.md §2.5). This is a functional JAX
ViT with the same architecture (patch 14, embed 768, 12 blocks, 12 heads, LayerScale
init 1.0, no register tokens) that loads the published
``dinov2_vitb14_pretrain.pth`` weights, so cached embeddings are interchangeable.

TPU-first: patchify is one conv (MXU), blocks run under `lax.scan`, bf16 matmuls
with fp32 LayerNorm; batch rides the leading axis.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 14
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    pos_embed_size: int = 37  # 518 / 14
    layerscale: bool = True
    compute_dtype: str = "bfloat16"


def _ln(x, g, b, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def _attn(x, p, nheads, cd):
    B, N, D = x.shape
    hd = D // nheads
    qkv = (x.astype(cd) @ p["qkv_w"].astype(cd) + p["qkv_b"]).astype(jnp.float32)
    qkv = qkv.reshape(B, N, 3, nheads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(cd), k.astype(cd),
        preferred_element_type=jnp.float32,
    ) / math.sqrt(hd)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum(
        "bhqk,bkhd->bqhd", a.astype(cd), v.astype(cd),
        preferred_element_type=jnp.float32,
    ).reshape(B, N, D)
    return o.astype(cd) @ p["proj_w"].astype(cd) + p["proj_b"]


def _block(x, p, cfg: ViTConfig):
    cd = jnp.dtype(cfg.compute_dtype)
    h = _attn(_ln(x, p["norm1_g"], p["norm1_b"]), p, cfg.num_heads, cd)
    if cfg.layerscale:
        h = h * p["ls1"]
    x = x + h
    z = _ln(x, p["norm2_g"], p["norm2_b"])
    z = jax.nn.gelu(
        z.astype(cd) @ p["fc1_w"].astype(cd) + p["fc1_b"], approximate=False
    )
    z = z.astype(cd) @ p["fc2_w"].astype(cd) + p["fc2_b"]
    if cfg.layerscale:
        z = z * p["ls2"]
    return x + z


def interpolate_pos_embed(pos: jnp.ndarray, grid: int, base: int) -> jnp.ndarray:
    """Bicubic pos-embed interpolation for non-518 inputs (reference
    `dino_v2/models/vision_transformer.py` interpolate_pos_encoding)."""
    if grid == base:
        return pos
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    patch_pos = patch_pos.reshape(1, base, base, -1)
    patch_pos = jax.image.resize(
        patch_pos, (1, grid, grid, patch_pos.shape[-1]), method="bicubic"
    )
    return jnp.concatenate([cls_pos, patch_pos.reshape(1, grid * grid, -1)], axis=1)


def forward_features(params: dict, cfg: ViTConfig, images: jnp.ndarray) -> dict:
    """images: (B, C, H, W) float in [0, 1]-ish (caller normalizes). Returns
    {'x_norm_clstoken': (B, D), 'x_norm_patchtokens': (B, N, D)}."""
    cd = jnp.dtype(cfg.compute_dtype)
    B, C, H, W = images.shape
    ps = cfg.patch_size
    grid = H // ps
    x = jax.lax.conv_general_dilated(
        images.astype(cd),
        params["patch_w"].astype(cd),  # (D, C, ps, ps)
        window_strides=(ps, ps),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )  # (B, D, grid, grid)
    x = x.reshape(B, cfg.embed_dim, grid * grid).transpose(0, 2, 1)
    x = x + params["patch_b"]
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x.astype(jnp.float32)], axis=1)
    x = x + interpolate_pos_embed(params["pos_embed"], grid, cfg.pos_embed_size)
    x = x.astype(cd)

    def body(carry, bp):
        return _block(carry, bp, cfg), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = _ln(x, params["norm_g"], params["norm_b"]).astype(jnp.float32)
    return {"x_norm_clstoken": x[:, 0], "x_norm_patchtokens": x[:, 1:]}


def load_dinov2_vitb14(path: str | Any) -> tuple[dict, ViTConfig]:
    """Convert the published torch ``dinov2_vitb14_pretrain.pth`` state dict."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    cfg = ViTConfig()
    D = cfg.embed_dim

    def blk(i, name):
        return sd[f"blocks.{i}.{name}"]

    blocks = {
        "norm1_g": np.stack([blk(i, "norm1.weight") for i in range(cfg.depth)]),
        "norm1_b": np.stack([blk(i, "norm1.bias") for i in range(cfg.depth)]),
        "qkv_w": np.stack([blk(i, "attn.qkv.weight").T for i in range(cfg.depth)]),
        "qkv_b": np.stack([blk(i, "attn.qkv.bias") for i in range(cfg.depth)]),
        "proj_w": np.stack([blk(i, "attn.proj.weight").T for i in range(cfg.depth)]),
        "proj_b": np.stack([blk(i, "attn.proj.bias") for i in range(cfg.depth)]),
        "ls1": np.stack([blk(i, "ls1.gamma") for i in range(cfg.depth)]),
        "ls2": np.stack([blk(i, "ls2.gamma") for i in range(cfg.depth)]),
        "norm2_g": np.stack([blk(i, "norm2.weight") for i in range(cfg.depth)]),
        "norm2_b": np.stack([blk(i, "norm2.bias") for i in range(cfg.depth)]),
        "fc1_w": np.stack([blk(i, "mlp.fc1.weight").T for i in range(cfg.depth)]),
        "fc1_b": np.stack([blk(i, "mlp.fc1.bias") for i in range(cfg.depth)]),
        "fc2_w": np.stack([blk(i, "mlp.fc2.weight").T for i in range(cfg.depth)]),
        "fc2_b": np.stack([blk(i, "mlp.fc2.bias") for i in range(cfg.depth)]),
    }
    params = {
        "patch_w": sd["patch_embed.proj.weight"],  # (D, 3, 14, 14)
        "patch_b": sd["patch_embed.proj.bias"],
        "cls_token": sd["cls_token"].reshape(1, 1, D),
        "pos_embed": sd["pos_embed"],
        "norm_g": sd["norm.weight"],
        "norm_b": sd["norm.bias"],
        "blocks": blocks,
    }
    return jax.tree.map(jnp.asarray, params), cfg


def init_vit_params(key, cfg: ViTConfig) -> dict:
    """Random init (testing without the published weights)."""
    D, depth, hidden = cfg.embed_dim, cfg.depth, cfg.embed_dim * cfg.mlp_ratio
    ks = iter(jax.random.split(key, 8))

    def nrm(k, shape, std=0.02):
        return std * jax.random.normal(k, shape, jnp.float32)

    blocks = {
        "norm1_g": jnp.ones((depth, D)),
        "norm1_b": jnp.zeros((depth, D)),
        "qkv_w": nrm(next(ks), (depth, D, 3 * D)),
        "qkv_b": jnp.zeros((depth, 3 * D)),
        "proj_w": nrm(next(ks), (depth, D, D)),
        "proj_b": jnp.zeros((depth, D)),
        "ls1": jnp.ones((depth, D)),
        "ls2": jnp.ones((depth, D)),
        "norm2_g": jnp.ones((depth, D)),
        "norm2_b": jnp.zeros((depth, D)),
        "fc1_w": nrm(next(ks), (depth, D, hidden)),
        "fc1_b": jnp.zeros((depth, hidden)),
        "fc2_w": nrm(next(ks), (depth, hidden, D)),
        "fc2_b": jnp.zeros((depth, D)),
    }
    n = cfg.pos_embed_size**2 + 1
    return {
        "patch_w": nrm(next(ks), (D, 3, cfg.patch_size, cfg.patch_size)),
        "patch_b": jnp.zeros((D,)),
        "cls_token": nrm(next(ks), (1, 1, D)),
        "pos_embed": nrm(next(ks), (1, n, D)),
        "norm_g": jnp.ones((D,)),
        "norm_b": jnp.zeros((D,)),
        "blocks": blocks,
    }


def embed_images(
    params: dict,
    cfg: ViTConfig,
    images: np.ndarray,
    *,
    batch_size: int = 16,
) -> np.ndarray:
    """(B, N, C, H, W) float [0,1] -> CLS embeddings (B, N, 768), mirroring the
    reference's batched embedding loop (`datasets/pad_ufes_20.py:91-103`)."""
    B, N = images.shape[:2]
    flat = images.reshape(-1, *images.shape[2:])
    fwd = jax.jit(lambda im: forward_features(params, cfg, im)["x_norm_clstoken"])
    outs = []
    for i in range(0, flat.shape[0], batch_size):
        chunk = flat[i : i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
        emb = np.asarray(fwd(jnp.asarray(chunk)))
        outs.append(emb[: batch_size - pad] if pad else emb)
    return np.concatenate(outs).reshape(B, N, -1)
