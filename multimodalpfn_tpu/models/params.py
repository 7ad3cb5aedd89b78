"""Parameter pytrees: initialization and torch-checkpoint conversion.

The param tree is a plain nested dict of jnp arrays. Transformer layers are stacked on
a leading ``L`` axis so the encoder stack runs under ``lax.scan``.

Weight layout conventions:
  * attention keeps the reference's stacked layouts ``w_qkv (3, h, d_k, in)`` and
    ``w_out (h, d_v, out)`` (reference `multi_head_attention.py:120-147`) so that
    torch-checkpoint conversion is a pure stack/transpose;
  * all plain linears are stored transposed, ``(in, out)``, so application is
    ``x @ w + b``.

Checkpoint format parity: the reference ships ``{"state_dict": ..., "config": ...}``
(`model/loading.py:427-433`); `convert_torch_state_dict` maps that state_dict onto this
tree, and missing mixer weights are freshly initialized — the JAX analogue of the
reference's ``load_state_dict(strict=False)`` (`loading.py:540`).
"""

from __future__ import annotations

import math
import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig

Params = dict


# ---------------------------------------------------------------------------
# initializers (numerically matching the reference's torch init distributions)
# ---------------------------------------------------------------------------


def _attn_input_weight(key, dims, nhead, input_size, gain=1.0, dtype=jnp.float32):
    # reference `multi_head_attention.py:149-162`
    d = dims[-2]
    std = math.sqrt(2.0 / float(nhead * d + input_size)) * gain
    a = math.sqrt(3.0) * std
    return jax.random.uniform(key, dims, dtype, minval=-a, maxval=a)


def _torch_linear_weight(key, fan_in, fan_out, dtype=jnp.float32):
    """torch nn.Linear default (kaiming_uniform a=sqrt(5)) in (in, out) layout."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, (fan_in, fan_out), dtype, minval=-bound, maxval=bound)


def _torch_linear_bias(key, fan_in, fan_out, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, (fan_out,), dtype, minval=-bound, maxval=bound)


def _xavier_uniform(key, shape, dtype=jnp.float32, gain=1.0):
    fan_in, fan_out = shape[-1], shape[-2]
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


# ---------------------------------------------------------------------------
# subspace positional-embedding noise table
# ---------------------------------------------------------------------------


import functools


@functools.lru_cache(maxsize=1024)
def get_subspace_noise(model_seed: int, n_tokens: int, sub_dim: int) -> np.ndarray:
    """Reproduce the torch ``randn`` draws of the reference's "subspace" feature
    positional embedding (`transformer.py:925-933`).

    The reference re-seeds a `SerializableGenerator(model_seed)` on *every* forward
    and draws ``randn(f, emsize//4)`` — i.e. a deterministic constant per
    (seed, shape). The token count is static under jit, so this host function is
    evaluated at trace time and baked into the compiled program as a constant.
    (torch CPU draws are NOT prefix-stable across shapes, so the exact shape must be
    drawn — verified empirically.)
    """
    try:
        import torch

        gen = torch.Generator(device="cpu")
        if model_seed:
            gen.manual_seed(int(model_seed))
        # else: the reference's `if self.seed:` guard (`transformer.py:423`) treats
        # seed=0 as falsy, leaving the generator at torch's deterministic default
        # seed (67280421310721) — reproduced by not seeding.
        return torch.randn((n_tokens, sub_dim), generator=gen).numpy()
    except ImportError:  # pragma: no cover - torch is available in dev images
        rng = np.random.default_rng(int(model_seed))
        return rng.standard_normal((n_tokens, sub_dim)).astype(np.float32)


# ---------------------------------------------------------------------------
# fresh initialization
# ---------------------------------------------------------------------------


def init_mixer_params(key, cfg: MixerConfig, emsize: int) -> Params:
    """Initialize mixer params from scratch (these are never in the base ckpt)."""
    p: Params = {}
    in_dim = cfg.in_dim
    if cfg.mixer_type in ("MGM", "MGM+CAP"):
        h = cfg.mgm_heads
        ks = jax.random.split(key, 6)
        p["mgm"] = {
            # stacked over heads; reference `transformer.py:33-48` per-head Sequential
            "ln_g": jnp.ones((h, in_dim)),
            "ln_b": jnp.zeros((h, in_dim)),
            "w1": jax.vmap(lambda k: _torch_linear_weight(k, in_dim, in_dim))(
                jax.random.split(ks[0], h)
            ),
            "b1": jax.vmap(lambda k: _torch_linear_bias(k, in_dim, in_dim))(
                jax.random.split(ks[1], h)
            ),
            "w2": jax.vmap(lambda k: _torch_linear_weight(k, in_dim // 2, emsize))(
                jax.random.split(ks[2], h)
            ),
            "b2": jax.vmap(lambda k: _torch_linear_bias(k, in_dim // 2, emsize))(
                jax.random.split(ks[3], h)
            ),
        }
    if cfg.mixer_type == "MGM+CAP":
        ch = cfg.cap_heads
        ks = jax.random.split(jax.random.fold_in(key, 1), 10)
        e = emsize
        p["cap"] = {
            # reference `transformer.py:60-88`
            "queries": 1e-2 * jax.random.normal(ks[0], (ch, e)),
            "q_proj_w": _torch_linear_weight(ks[1], e, e),
            "in_proj_w": _xavier_uniform(ks[2], (3 * e, e)),  # torch MHA layout
            "in_proj_b": jnp.zeros((3 * e,)),
            "out_proj_w": _torch_linear_weight(ks[3], e, e).T,  # (out,in) torch layout
            "out_proj_b": jnp.zeros((e,)),
            "k_norm_g": jnp.ones((e,)),
            "k_norm_b": jnp.zeros((e,)),
            "q_norm_g": jnp.ones((e,)),
            "q_norm_b": jnp.zeros((e,)),
            "out_norm_g": jnp.ones((e,)),
            "out_norm_b": jnp.zeros((e,)),
            "ffn_w1": _torch_linear_weight(ks[4], e, 2 * e),
            "ffn_b1": _torch_linear_bias(ks[5], e, 2 * e),
            "ffn_w2": _torch_linear_weight(ks[6], 2 * e, e),
            "ffn_b2": _torch_linear_bias(ks[7], 2 * e, e),
        }
    if cfg.mixer_type == "MoE":
        n = cfg.mgm_heads  # n_experts = mgm_heads (reference `transformer.py:301`)
        ks = jax.random.split(key, 6)
        p["moe"] = {
            # reference `transformer.py:91-106`
            "ln_g": jnp.ones((n, in_dim)),
            "ln_b": jnp.zeros((n, in_dim)),
            "w1": jax.vmap(lambda k: _torch_linear_weight(k, in_dim, in_dim // 2))(
                jax.random.split(ks[0], n)
            ),
            "b1": jax.vmap(lambda k: _torch_linear_bias(k, in_dim, in_dim // 2))(
                jax.random.split(ks[1], n)
            ),
            "w2": jax.vmap(lambda k: _torch_linear_weight(k, in_dim // 2, emsize))(
                jax.random.split(ks[2], n)
            ),
            "b2": jax.vmap(lambda k: _torch_linear_bias(k, in_dim // 2, emsize))(
                jax.random.split(ks[3], n)
            ),
            "gate_w": _torch_linear_weight(ks[4], in_dim, n),
            "gate_b": _torch_linear_bias(ks[5], in_dim, n),
        }
    return p


def _pad_leaf(x, axis: int, to: int):
    if x.shape[axis] == to:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, to - x.shape[axis])
    return jnp.pad(x, widths)


# leaf -> axis that stacks heads/experts (everything else is shape-invariant)
_MGM_HEAD_AXIS = {"ln_g": 0, "ln_b": 0, "w1": 0, "b1": 0, "w2": 0, "b2": 0}
_MOE_EXPERT_AXIS = {
    "ln_g": 0, "ln_b": 0, "w1": 0, "b1": 0, "w2": 0, "b2": 0,
    "gate_w": 1, "gate_b": 0,
}


def pad_mixer_params(p: Params, cfg_pad: MixerConfig) -> Params:
    """Zero-pad per-head/per-expert mixer leaves up to ``cfg_pad.mgm_heads``.

    Combined with the runtime activation mask (``apply_mixer(mgm_active=...)``)
    the padded model computes EXACTLY what the unpadded active-size model
    would — this is what lets grid cells with different mgm_heads share one
    vmapped train stream (cross-cell HPO batching). Padded parameters receive
    exactly-zero gradients. ``cap_heads`` is NOT paddable (it sets the CAP MHA
    head split) — batched groups must share it.
    """
    out = dict(p)
    if "mgm" in p:
        out["mgm"] = {
            k: _pad_leaf(v, _MGM_HEAD_AXIS[k], cfg_pad.mgm_heads)
            for k, v in p["mgm"].items()
        }
    if "moe" in p:
        out["moe"] = {
            k: _pad_leaf(v, _MOE_EXPERT_AXIS[k], cfg_pad.mgm_heads)
            for k, v in p["moe"].items()
        }
    return out


def slice_mixer_params(p: Params, cfg_active: MixerConfig) -> Params:
    """Inverse of `pad_mixer_params`: extract the active prefix so a padded run's
    result round-trips into a regular checkpoint of the true cell shape."""
    out = dict(p)
    if "mgm" in p:
        out["mgm"] = {
            k: jnp.take(v, jnp.arange(cfg_active.mgm_heads), axis=_MGM_HEAD_AXIS[k])
            for k, v in p["mgm"].items()
        }
    if "moe" in p:
        out["moe"] = {
            k: jnp.take(
                v, jnp.arange(cfg_active.mgm_heads), axis=_MOE_EXPERT_AXIS[k]
            )
            for k, v in p["moe"].items()
        }
    return out


@functools.partial(jax.jit, static_argnums=(1,), static_argnames=("model_seed",))
def init_params(key, cfg: ModelConfig, model_seed: int = 0) -> Params:
    """Fresh random init of the whole model (matching reference init distributions:
    zero-init output projections `layer.py:192,232`, attn input init
    `multi_head_attention.py:149-162`, torch Linear defaults elsewhere).

    Jitted as ONE program: the ~40 per-leaf random draws would otherwise each
    run as a separate eagerly-compiled op (a full compile round trip per leaf
    on a remote backend)."""
    e, h, d, L, nhid = cfg.emsize, cfg.nhead, cfg.d_head, cfg.nlayers, cfg.nhid
    fpg = cfg.features_per_group
    keys = jax.random.split(key, 16)

    def stack_layers(fn, k):
        return jax.vmap(fn)(jax.random.split(k, L))

    params: Params = {
        "encoder": {"w": _torch_linear_weight(keys[0], 2 * fpg, e)},
        "y_encoder": {
            "w": _torch_linear_weight(keys[1], 2, e),
            "b": _torch_linear_bias(keys[2], 2, e),
        },
        "layers": {
            "attn_feat": {
                "w_qkv": stack_layers(
                    lambda k: _attn_input_weight(k, (3, h, d, e), h, e), keys[3]
                ),
                "w_out": jnp.zeros((L, h, d, e)),
            },
            "attn_item": {
                "w_qkv": stack_layers(
                    lambda k: _attn_input_weight(k, (3, h, d, e), h, e), keys[4]
                ),
                "w_out": jnp.zeros((L, h, d, e)),
            },
            "mlp": {
                "w1": stack_layers(
                    lambda k: _torch_linear_weight(k, e, nhid), keys[5]
                ),
                "w2": jnp.zeros((L, nhid, e)),
            },
        },
        "decoder": {
            "w1": _torch_linear_weight(keys[6], e, nhid),
            "b1": _torch_linear_bias(keys[7], e, nhid),
            "w2": _torch_linear_weight(keys[8], nhid, cfg.n_out),
            "b2": _torch_linear_bias(keys[9], nhid, cfg.n_out),
        },
    }
    if cfg.feature_positional_embedding == "subspace":
        params["feat_pos_emb"] = {
            "w": _torch_linear_weight(keys[10], e // 4, e),
            "b": _torch_linear_bias(keys[11], e // 4, e),
        }
    mixer = init_mixer_params(keys[12], cfg.mixer, e)
    if mixer:
        params["mixer"] = mixer
    return params


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def convert_torch_state_dict(
    state_dict: dict[str, Any],
    cfg: ModelConfig,
    *,
    model_seed: int = 0,
    mixer_init_key=None,
) -> Params:
    """Map a reference torch ``state_dict`` onto the JAX param tree.

    Name anchors (reference modules):
      * ``encoder.<i>.layer.weight`` — `encoders.py:382-425` LinearInputEncoderStep
      * ``y_encoder.<i>.layer.{weight,bias}``
      * ``transformer_encoder.layers.<l>.self_attn_between_{features,items}._w_{qkv,out}``
      * ``transformer_encoder.layers.<l>.mlp.linear{1,2}.weight``
      * ``decoder_dict.standard.{0,2}.{weight,bias}``
      * ``feature_positional_embedding_embeddings.{weight,bias}``
      * mixer weights ``mgm.projs.*`` / ``cap.*`` / ``moe.*`` when present
    """
    sd = {k: _t(v) for k, v in state_dict.items()}
    L = cfg.nlayers

    def find_one(pattern: str) -> np.ndarray:
        hits = [k for k in sd if re.fullmatch(pattern, k)]
        if len(hits) != 1:
            raise KeyError(f"expected exactly one key for {pattern}, got {hits}")
        return sd[hits[0]]

    def layer_stack(fmt: str) -> jnp.ndarray:
        return jnp.asarray(np.stack([sd[fmt.format(l=l)] for l in range(L)]))

    enc_w = find_one(r"encoder\.\d+\.layer\.weight")
    if enc_w.shape[1] != 2 * cfg.features_per_group:
        raise ValueError(
            f"features_per_group={cfg.features_per_group} is inconsistent with the "
            f"checkpoint's input encoder (expects {enc_w.shape[1] // 2}); the "
            "reference's strict=False load would fail on this shape mismatch too "
            "(`loading.py:540`). Pass the checkpoint's features_per_group."
        )
    params: Params = {
        "encoder": {"w": jnp.asarray(enc_w.T)},
        "y_encoder": {
            "w": jnp.asarray(find_one(r"y_encoder\.\d+\.layer\.weight").T),
            "b": jnp.asarray(find_one(r"y_encoder\.\d+\.layer\.bias")),
        },
        "layers": {
            "attn_feat": {
                "w_qkv": layer_stack(
                    "transformer_encoder.layers.{l}.self_attn_between_features._w_qkv"
                ),
                "w_out": layer_stack(
                    "transformer_encoder.layers.{l}.self_attn_between_features._w_out"
                ),
            },
            "attn_item": {
                "w_qkv": layer_stack(
                    "transformer_encoder.layers.{l}.self_attn_between_items._w_qkv"
                ),
                "w_out": layer_stack(
                    "transformer_encoder.layers.{l}.self_attn_between_items._w_out"
                ),
            },
            "mlp": {
                "w1": jnp.swapaxes(
                    layer_stack("transformer_encoder.layers.{l}.mlp.linear1.weight"),
                    -1,
                    -2,
                ),
                "w2": jnp.swapaxes(
                    layer_stack("transformer_encoder.layers.{l}.mlp.linear2.weight"),
                    -1,
                    -2,
                ),
            },
        },
        "decoder": {
            "w1": jnp.asarray(sd["decoder_dict.standard.0.weight"].T),
            "b1": jnp.asarray(sd["decoder_dict.standard.0.bias"]),
            "w2": jnp.asarray(sd["decoder_dict.standard.2.weight"].T),
            "b2": jnp.asarray(sd["decoder_dict.standard.2.bias"]),
        },
    }
    if cfg.feature_positional_embedding == "subspace":
        params["feat_pos_emb"] = {
            "w": jnp.asarray(sd["feature_positional_embedding_embeddings.weight"].T),
            "b": jnp.asarray(sd["feature_positional_embedding_embeddings.bias"]),
        }

    # --- mixers: load if present in the ckpt, else fresh init (strict=False parity)
    mixer_params = _convert_mixer(sd, cfg.mixer)
    if mixer_params is None and cfg.mixer.mixer_type != "none":
        key = (
            mixer_init_key
            if mixer_init_key is not None
            else jax.random.PRNGKey(model_seed)
        )
        mixer_params = init_mixer_params(key, cfg.mixer, cfg.emsize)
    if mixer_params:
        params["mixer"] = mixer_params
    return params


def _convert_mixer(sd: dict[str, np.ndarray], cfg: MixerConfig) -> Params | None:
    if cfg.mixer_type == "none":
        return None
    p: Params = {}
    if "mgm.projs.0.1.weight" in sd:
        h = cfg.mgm_heads
        p["mgm"] = {
            "ln_g": jnp.asarray(np.stack([sd[f"mgm.projs.{i}.0.weight"] for i in range(h)])),
            "ln_b": jnp.asarray(np.stack([sd[f"mgm.projs.{i}.0.bias"] for i in range(h)])),
            "w1": jnp.asarray(np.stack([sd[f"mgm.projs.{i}.1.weight"].T for i in range(h)])),
            "b1": jnp.asarray(np.stack([sd[f"mgm.projs.{i}.1.bias"] for i in range(h)])),
            "w2": jnp.asarray(np.stack([sd[f"mgm.projs.{i}.4.weight"].T for i in range(h)])),
            "b2": jnp.asarray(np.stack([sd[f"mgm.projs.{i}.4.bias"] for i in range(h)])),
        }
    if "cap.queries" in sd:
        p["cap"] = {
            "queries": jnp.asarray(sd["cap.queries"]),
            "q_proj_w": jnp.asarray(sd["cap.q_proj.weight"].T),
            "in_proj_w": jnp.asarray(sd["cap.mha.in_proj_weight"]),
            "in_proj_b": jnp.asarray(sd["cap.mha.in_proj_bias"]),
            "out_proj_w": jnp.asarray(sd["cap.mha.out_proj.weight"]),
            "out_proj_b": jnp.asarray(sd["cap.mha.out_proj.bias"]),
            "k_norm_g": jnp.asarray(sd["cap.k_norm.weight"]),
            "k_norm_b": jnp.asarray(sd["cap.k_norm.bias"]),
            "q_norm_g": jnp.asarray(sd["cap.q_norm.weight"]),
            "q_norm_b": jnp.asarray(sd["cap.q_norm.bias"]),
            "out_norm_g": jnp.asarray(sd["cap.out_norm.weight"]),
            "out_norm_b": jnp.asarray(sd["cap.out_norm.bias"]),
            "ffn_w1": jnp.asarray(sd["cap.ffn.0.weight"].T),
            "ffn_b1": jnp.asarray(sd["cap.ffn.0.bias"]),
            "ffn_w2": jnp.asarray(sd["cap.ffn.3.weight"].T),
            "ffn_b2": jnp.asarray(sd["cap.ffn.3.bias"]),
        }
    if "moe.gate.weight" in sd:
        n = cfg.mgm_heads
        p["moe"] = {
            "ln_g": jnp.asarray(np.stack([sd[f"moe.experts.{i}.0.weight"] for i in range(n)])),
            "ln_b": jnp.asarray(np.stack([sd[f"moe.experts.{i}.0.bias"] for i in range(n)])),
            "w1": jnp.asarray(np.stack([sd[f"moe.experts.{i}.1.weight"].T for i in range(n)])),
            "b1": jnp.asarray(np.stack([sd[f"moe.experts.{i}.1.bias"] for i in range(n)])),
            "w2": jnp.asarray(np.stack([sd[f"moe.experts.{i}.4.weight"].T for i in range(n)])),
            "b2": jnp.asarray(np.stack([sd[f"moe.experts.{i}.4.bias"] for i in range(n)])),
            "gate_w": jnp.asarray(sd["moe.gate.weight"].T),
            "gate_b": jnp.asarray(sd["moe.gate.bias"]),
        }
    return p or None


def export_torch_state_dict(params: Params, cfg: ModelConfig) -> dict[str, np.ndarray]:
    """Inverse of `convert_torch_state_dict` for the core weights (used to save
    fine-tuned checkpoints the reference loader can consume). Encoder step indices
    follow the reference's default encoder construction (`loading.py:308-398`)."""
    # One batched device->host fetch of the whole tree up front: the per-key
    # np.asarray calls below would otherwise each be a separate round trip
    # (ruinous over a high-latency remote-device link).
    params = jax.device_get(params)
    enc_idx = 2 + int(cfg.remove_empty_features) + int(cfg.remove_duplicate_features)
    enc_idx += 2 if cfg.nan_handling_enabled else 0
    y_idx = (1 if cfg.nan_handling_y_encoder else 0) + (
        1 if cfg.max_num_classes >= 2 else 0
    )
    out: dict[str, np.ndarray] = {
        f"encoder.{enc_idx}.layer.weight": np.asarray(params["encoder"]["w"].T),
        f"y_encoder.{y_idx}.layer.weight": np.asarray(params["y_encoder"]["w"].T),
        f"y_encoder.{y_idx}.layer.bias": np.asarray(params["y_encoder"]["b"]),
        "decoder_dict.standard.0.weight": np.asarray(params["decoder"]["w1"].T),
        "decoder_dict.standard.0.bias": np.asarray(params["decoder"]["b1"]),
        "decoder_dict.standard.2.weight": np.asarray(params["decoder"]["w2"].T),
        "decoder_dict.standard.2.bias": np.asarray(params["decoder"]["b2"]),
    }
    if "feat_pos_emb" in params:
        out["feature_positional_embedding_embeddings.weight"] = np.asarray(
            params["feat_pos_emb"]["w"].T
        )
        out["feature_positional_embedding_embeddings.bias"] = np.asarray(
            params["feat_pos_emb"]["b"]
        )
    layers = params["layers"]
    for l in range(cfg.nlayers):
        pre = f"transformer_encoder.layers.{l}"
        out[f"{pre}.self_attn_between_features._w_qkv"] = np.asarray(
            layers["attn_feat"]["w_qkv"][l]
        )
        out[f"{pre}.self_attn_between_features._w_out"] = np.asarray(
            layers["attn_feat"]["w_out"][l]
        )
        out[f"{pre}.self_attn_between_items._w_qkv"] = np.asarray(
            layers["attn_item"]["w_qkv"][l]
        )
        out[f"{pre}.self_attn_between_items._w_out"] = np.asarray(
            layers["attn_item"]["w_out"][l]
        )
        out[f"{pre}.mlp.linear1.weight"] = np.asarray(layers["mlp"]["w1"][l].T)
        out[f"{pre}.mlp.linear2.weight"] = np.asarray(layers["mlp"]["w2"][l].T)
    mix = params.get("mixer", {})
    if "mgm" in mix:
        m = mix["mgm"]
        for i in range(m["ln_g"].shape[0]):
            out[f"mgm.projs.{i}.0.weight"] = np.asarray(m["ln_g"][i])
            out[f"mgm.projs.{i}.0.bias"] = np.asarray(m["ln_b"][i])
            out[f"mgm.projs.{i}.1.weight"] = np.asarray(m["w1"][i].T)
            out[f"mgm.projs.{i}.1.bias"] = np.asarray(m["b1"][i])
            out[f"mgm.projs.{i}.4.weight"] = np.asarray(m["w2"][i].T)
            out[f"mgm.projs.{i}.4.bias"] = np.asarray(m["b2"][i])
    if "cap" in mix:
        c = mix["cap"]
        out.update(
            {
                "cap.queries": np.asarray(c["queries"]),
                "cap.q_proj.weight": np.asarray(c["q_proj_w"].T),
                "cap.mha.in_proj_weight": np.asarray(c["in_proj_w"]),
                "cap.mha.in_proj_bias": np.asarray(c["in_proj_b"]),
                "cap.mha.out_proj.weight": np.asarray(c["out_proj_w"]),
                "cap.mha.out_proj.bias": np.asarray(c["out_proj_b"]),
                "cap.k_norm.weight": np.asarray(c["k_norm_g"]),
                "cap.k_norm.bias": np.asarray(c["k_norm_b"]),
                "cap.q_norm.weight": np.asarray(c["q_norm_g"]),
                "cap.q_norm.bias": np.asarray(c["q_norm_b"]),
                "cap.out_norm.weight": np.asarray(c["out_norm_g"]),
                "cap.out_norm.bias": np.asarray(c["out_norm_b"]),
                "cap.ffn.0.weight": np.asarray(c["ffn_w1"].T),
                "cap.ffn.0.bias": np.asarray(c["ffn_b1"]),
                "cap.ffn.3.weight": np.asarray(c["ffn_w2"].T),
                "cap.ffn.3.bias": np.asarray(c["ffn_b2"]),
            }
        )
    if "moe" in mix:
        m = mix["moe"]
        for i in range(m["ln_g"].shape[0]):
            out[f"moe.experts.{i}.0.weight"] = np.asarray(m["ln_g"][i])
            out[f"moe.experts.{i}.0.bias"] = np.asarray(m["ln_b"][i])
            out[f"moe.experts.{i}.1.weight"] = np.asarray(m["w1"][i].T)
            out[f"moe.experts.{i}.1.bias"] = np.asarray(m["b1"][i])
            out[f"moe.experts.{i}.4.weight"] = np.asarray(m["w2"][i].T)
            out[f"moe.experts.{i}.4.bias"] = np.asarray(m["b2"][i])
        out["moe.gate.weight"] = np.asarray(m["gate_w"].T)
        out["moe.gate.bias"] = np.asarray(m["gate_b"])
    return out
