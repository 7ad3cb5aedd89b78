"""PerFeatureTransformer: the dual-axis in-context transformer, as a pure function.

Reference semantics: `mmpfn/models/mmpfn/model/transformer.py:182-1039` and
`layer.py:95-466`. TPU-first re-design decisions:

  * pure function of (params, inputs); layers stacked and run under ``lax.scan``;
  * attention via `ops.attention` ('...'-batched einsums, no data movement between
    the feature-axis and item-axis sublayers beyond one transpose);
  * feature positional embeddings come from a precomputed torch-parity noise table
    (see `models.params.make_subspace_noise_table`) instead of per-forward RNG;
  * the reference's dead O(f²·s) correlation loop (`transformer.py:810-813`) is not
    ported;
  * ensemble members ride the leading batch axis (the reference loops them).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from multimodalpfn_tpu.models.config import ModelConfig
from multimodalpfn_tpu.models.encoders import encode_x, encode_y
from multimodalpfn_tpu.models.mixers import apply_mixer
from multimodalpfn_tpu.models.params import get_subspace_noise
from multimodalpfn_tpu.ops.attention import item_attention, self_attention


def _layer_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Affine-free LayerNorm in fp32 (reference `layer.py:236-246`,
    elementwise_affine=False, eps=1e-5)."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


_LN_EPS = 1e-5


@jax.custom_vjp
def _residual_ln_vjp(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    return _residual_ln_fwd(x, h)[0]


def _residual_ln_fwd(x, h):
    # the sum is formed in the compute dtype (identical numerics to the plain
    # `_layer_norm(x + h)` composition), so the saved compute-dtype `u` is
    # EXACTLY the forward's LN input — the backward's recomputed statistics
    # are bit-identical in both f32-parity and bf16-production modes.
    u = x + h
    u32 = u.astype(jnp.float32)
    mean = u32.mean(axis=-1, keepdims=True)
    var = u32.var(axis=-1, keepdims=True)
    out = ((u32 - mean) * jax.lax.rsqrt(var + _LN_EPS)).astype(x.dtype)
    return out, u


def _residual_ln_bwd(u, g):
    u32 = u.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    mean = u32.mean(axis=-1, keepdims=True)
    c = u32 - mean
    var = (c * c).mean(axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + _LN_EPS)
    n = c * r
    du = r * (
        g32
        - g32.mean(axis=-1, keepdims=True)
        - n * (g32 * n).mean(axis=-1, keepdims=True)
    )
    du = du.astype(u.dtype)
    return du, du


_residual_ln_vjp.defvjp(_residual_ln_fwd, _residual_ln_bwd)


def residual_ln(x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """``LN(x + h)`` with a compute-dtype residual save.

    Plain autodiff of the composition makes XLA save the f32 pre-LN sum per
    layer for the LN backward — at the vmapped-sweep shapes those saves were
    the largest single HBM cost in the train step (round-3 trace: ~71 ms of
    the 537 ms N=4 step in post-item LN + scan saves). This custom_vjp saves
    the sum in the compute dtype (half the bytes in bf16 mode; the same bytes
    — and bit-identical values — in f32 parity mode) and recomputes the LN
    statistics in the backward, which is exact because the saved sum IS the
    forward's LN input.
    """
    return _residual_ln_vjp(x, h.astype(x.dtype))


def _mlp(x: jnp.ndarray, w1: jnp.ndarray, w2: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    """Bias-free 2-layer GELU MLP (reference `mlp.py:59-104`, exact erf gelu).

    Matmuls accumulate in f32 on the MXU regardless; emitting the compute dtype
    (f32 in parity mode — identical to before; bf16 in production) halves the
    HBM traffic of the (…, nhid) intermediate, the measured bottleneck."""
    acc = jnp.dtype(compute_dtype)
    h = jnp.einsum(
        "...e,eh->...h",
        x.astype(compute_dtype),
        w1.astype(compute_dtype),
        preferred_element_type=acc,
    )
    h = jax.nn.gelu(h, approximate=False)
    return jnp.einsum(
        "...h,he->...e",
        h,
        w2.astype(compute_dtype),
        preferred_element_type=acc,
    )


def encoder_layer_im(
    state: jnp.ndarray,
    layer_params: dict,
    *,
    single_eval_pos: int,
    cfg: ModelConfig,
    token_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Item-major PerFeatureEncoderLayer: state ``(b, t, s, e)``.

    Same math as `encoder_layer` but with the items axis outermost, which is
    the layout every item-attention path consumes — so the FLOPs-dominant
    sublayer runs with ZERO boundary transposes. The feature-attention kernel
    reads item-major blocks and relayouts in VMEM
    (`ops.pallas_fused.fused_feature_attention_ln_im`); the MLP and the
    residual-LN are layout-agnostic. `_forward_impl` transposes ONCE before
    the 12-layer scan and never again (round-3 trace: the per-layer
    (b,s,t,e)<->(b,t,s,e) HBM copy pair was ~7% of the sweep train step).
    Fused-path only (cfg.fused_ops).

    token_valid: optional (b, t) per-member feature-attn key mask (cross-width
    batched INFERENCE only — the masked fused forward has no custom VJP;
    training masks stay on `encoder_layer`'s XLA path).
    """
    cd = jnp.dtype(cfg.compute_dtype)
    from multimodalpfn_tpu.ops.attention import can_use_fused_item
    from multimodalpfn_tpu.ops.pallas_fused import (
        fused_feature_attention_ln_im,
        fused_mlp_ln,
    )

    state = fused_feature_attention_ln_im(
        state.astype(cd),
        layer_params["attn_feat"]["w_qkv"],
        layer_params["attn_feat"]["w_out"],
        key_mask=token_valid,
    )
    sep, S = single_eval_pos, state.shape[-2]
    if can_use_fused_item(
        sep,
        S - sep,
        fused_item=cfg.use_flash and cfg.fused_item,
        multiquery_test=cfg.multiquery_item_attention_for_test_set,
        ring_axis=cfg.seq_shard_axis,
    ):
        # whole sublayer (projections+flash+out-proj+residual+LN) in Pallas —
        # no f32 activation or out-projection boundary ever touches HBM
        from multimodalpfn_tpu.ops.pallas_item_fused import fused_item_sublayer

        state = fused_item_sublayer(
            state,
            layer_params["attn_item"]["w_qkv"],
            layer_params["attn_item"]["w_out"],
            single_eval_pos=sep,
            compute_dtype=cd,
        )
    else:
        h = item_attention(
            state,
            layer_params["attn_item"]["w_qkv"],
            layer_params["attn_item"]["w_out"],
            single_eval_pos=sep,
            multiquery_test=cfg.multiquery_item_attention_for_test_set,
            compute_dtype=cd,
            use_flash=cfg.use_flash,
            fused_item=cfg.use_flash and cfg.fused_item,
            ring_axis=cfg.seq_shard_axis,
        )
        state = residual_ln(state, h).astype(cd)
    return fused_mlp_ln(state, layer_params["mlp"]["w1"], layer_params["mlp"]["w2"])


def encoder_layer(
    state: jnp.ndarray,
    layer_params: dict,
    *,
    single_eval_pos: int,
    cfg: ModelConfig,
    token_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """One PerFeatureEncoderLayer (reference `layer.py:272-457`): post-norm
    [feature-attn, item-attn, MLP], each with residual.

    state: ``(b, s, t, e)`` where t = feature tokens + 1 target token.
    token_valid: optional ``(t,)`` bool — invalid tokens (padded mixer outputs
    in cross-cell batched HPO) are excluded from feature attention as keys;
    their own streams evolve but are never read (the decoder reads only the
    target token).
    """
    cd = jnp.dtype(cfg.compute_dtype)
    from multimodalpfn_tpu.ops.pallas_fused import MAX_FUSED_ATTN_TOKENS

    fused = (
        cfg.fused_ops
        and token_valid is None
        and state.shape[2] <= MAX_FUSED_ATTN_TOKENS
    )
    # --- attention between feature tokens (within each sample) ---
    if fused:
        from multimodalpfn_tpu.ops.pallas_fused import fused_feature_attention_ln

        state = fused_feature_attention_ln(
            state.astype(cd),
            layer_params["attn_feat"]["w_qkv"],
            layer_params["attn_feat"]["w_out"],
        )
    else:
        km = token_valid
        if km is not None and km.ndim == 2:
            # per-member (b, t) mask against (b, s, h, q, k) logits
            km = km[:, None, None, None, :]
        h = self_attention(
            state,
            layer_params["attn_feat"]["w_qkv"],
            layer_params["attn_feat"]["w_out"],
            compute_dtype=cd,
            key_mask=km,
        )
        # residuals/LN run in fp32 (accumulated outputs); cast back to the
        # compute dtype so the scan carry dtype is stable in bf16 mode
        state = residual_ln(state, h).astype(cd)
    # --- attention between items (per feature token) ---
    st = jnp.swapaxes(state, 1, 2)  # (b, t, s, e)
    h = item_attention(
        st,
        layer_params["attn_item"]["w_qkv"],
        layer_params["attn_item"]["w_out"],
        single_eval_pos=single_eval_pos,
        multiquery_test=cfg.multiquery_item_attention_for_test_set,
        compute_dtype=cd,
        use_flash=cfg.use_flash,
        fused_item=cfg.use_flash and cfg.fused_item,
        ring_axis=cfg.seq_shard_axis,
    )
    state = residual_ln(state, jnp.swapaxes(h, 1, 2)).astype(cd)
    # --- MLP ---
    # row-local with no mask dependence: fused whenever cfg.fused_ops, even
    # under a token_valid mask (padded token streams evolve but are never read)
    if cfg.fused_ops:
        from multimodalpfn_tpu.ops.pallas_fused import fused_mlp_ln

        return fused_mlp_ln(
            state, layer_params["mlp"]["w1"], layer_params["mlp"]["w2"]
        )
    h = _mlp(state, layer_params["mlp"]["w1"], layer_params["mlp"]["w2"], cd)
    return residual_ln(state, h).astype(cd)


def _group_features(x: jnp.ndarray, fpg: int) -> jnp.ndarray:
    """Pad F to a multiple of features_per_group and group
    (reference `transformer.py:626-657`). (b, s, F) -> (b, s, f, n)."""
    b, s, F = x.shape
    pad = (-F) % fpg
    if pad:
        x = jnp.concatenate([x, jnp.zeros((b, s, pad), dtype=x.dtype)], axis=-1)
    return x.reshape(b, s, (F + pad) // fpg, fpg)


def forward(
    params: dict,
    cfg: ModelConfig,
    x: jnp.ndarray | None,
    y_train: jnp.ndarray,
    image: jnp.ndarray | None = None,
    *,
    single_eval_pos: int,
    train: bool = False,
    rng: jax.Array | None = None,
    remat: bool = False,
    return_embeddings: bool = False,
    mgm_active: jnp.ndarray | None = None,
    feat_pos_noise: jnp.ndarray | None = None,
    tab_valid: jnp.ndarray | None = None,
) -> jnp.ndarray | dict[str, Any]:
    """Forward pass.

    Args:
      x: tabular features ``(b, S, F)`` float32 (NaN/inf allowed), or None for
        image-only mode (reference `transformer.py:765-766`).
      y_train: train targets ``(b, sep)`` float32.
      image: frozen-encoder embeddings ``(b, S, N_img, in_dim)`` or None.
      single_eval_pos: static train/test split position.
      mgm_active: traced head/expert count activating a prefix of PADDED mixer
        params (cross-cell batched HPO); inactive heads/tokens are masked
        exactly, so the result equals an unpadded mixer of the active size.
      feat_pos_noise: per-run subspace-noise table override (see _forward_impl).
      tab_valid: optional ``(b, f_tab)`` bool — per-member validity of the
        tabular feature-group token slots (cross-width batched inference:
        members zero-padded to a shared width mask their padded slots out of
        feature attention as keys). Image and target tokens stay valid.

    Returns logits ``(b, S - sep, n_out)`` (or a dict with embeddings).
    """
    # fp32 parity mode must defeat the TPU default (bf16-input matmul passes);
    # bf16 production mode keeps the fast default. Trace-time context, so it
    # composes with jit.
    prec = "highest" if cfg.compute_dtype == "float32" else "default"
    with jax.default_matmul_precision(prec):
        return _forward_impl(
            params,
            cfg,
            x,
            y_train,
            image,
            single_eval_pos=single_eval_pos,
            train=train,
            rng=rng,
            remat=remat,
            return_embeddings=return_embeddings,
            mgm_active=mgm_active,
            feat_pos_noise=feat_pos_noise,
            tab_valid=tab_valid,
        )


def _forward_impl(
    params: dict,
    cfg: ModelConfig,
    x: jnp.ndarray | None,
    y_train: jnp.ndarray,
    image: jnp.ndarray | None = None,
    *,
    single_eval_pos: int,
    train: bool = False,
    rng: jax.Array | None = None,
    remat: bool = False,
    return_embeddings: bool = False,
    mgm_active: jnp.ndarray | None = None,
    feat_pos_noise: jnp.ndarray | None = None,
    tab_valid: jnp.ndarray | None = None,
) -> jnp.ndarray | dict[str, Any]:
    sep = single_eval_pos
    b = y_train.shape[0]
    S = x.shape[1] if x is not None else image.shape[1]

    # ---- target tokens: pad test region with NaN then encode (transformer.py:682-724)
    y_full = jnp.concatenate(
        [
            y_train.astype(jnp.float32),
            jnp.full((b, S - sep), jnp.nan, dtype=jnp.float32),
        ],
        axis=1,
    )
    embedded_y = encode_y(params["y_encoder"], cfg, y_full, sep)  # (b, S, e)

    # ---- feature tokens
    if x is not None:
        xg = _group_features(x.astype(jnp.float32), cfg.features_per_group)
        embedded_x = encode_x(params["encoder"], cfg, xg, sep)  # (b, S, f, e)
    else:
        embedded_x = None

    # ---- multimodal mixer tokens appended on the feature axis (transformer.py:755-768)
    n_img_tokens = 0
    active_img = None
    if image is not None:
        mixer_rng = None
        if train and rng is not None:
            rng, mixer_rng = jax.random.split(rng)
        tokens = apply_mixer(
            params["mixer"], cfg.mixer, image.astype(jnp.float32),
            rng=mixer_rng, train=train, mgm_active=mgm_active,
        )
        n_img_tokens = tokens.shape[-2]
        # active image-token count for the padded-mixer token mask (traced).
        # MGM+CAP always emits exactly cap_heads tokens (the CAP queries are
        # never padded), so no transformer-level mask is needed there.
        if mgm_active is not None:
            if cfg.mixer.mixer_type == "MGM":
                active_img = mgm_active * image.shape[-2]
            elif cfg.mixer.mixer_type == "MoE":
                active_img = mgm_active  # one token per expert; inactive gate=0
        if tokens.shape[0] == 1 and b > 1:
            # ensemble members share the image: callers pass it with a singleton
            # batch axis, the mixer runs once, and tokens broadcast to members
            tokens = jnp.broadcast_to(tokens, (b, *tokens.shape[1:]))
        embedded_x = (
            tokens
            if embedded_x is None
            else jnp.concatenate([embedded_x, tokens], axis=-2)
        )

    # ---- feature positional embedding ("subspace", transformer.py:925-933)
    if cfg.feature_positional_embedding == "subspace":
        f_total = embedded_x.shape[-2]
        if feat_pos_noise is not None:
            # per-run override for padded-mixer batching: torch draws are not
            # prefix-stable across token counts, so a run whose ACTIVE token
            # count differs from the padded one passes its own table (rows
            # beyond the active count are irrelevant — those tokens are masked)
            noise = feat_pos_noise
        else:
            noise = jnp.asarray(
                get_subspace_noise(cfg.model_seed, f_total, cfg.emsize // 4)
            )
        embs = noise @ params["feat_pos_emb"]["w"] + params["feat_pos_emb"]["b"]
        # shared table (t_x, k) or per-member tables (b, t_x, k)
        embedded_x = embedded_x + (
            embs[:, None] if embs.ndim == 3 else embs[None, None]
        )

    state = jnp.concatenate([embedded_x, embedded_y[:, :, None, :]], axis=2)
    state = state.astype(jnp.dtype(cfg.compute_dtype))

    token_valid = None
    if active_img is not None:
        t_total = state.shape[2]
        f_tab = t_total - n_img_tokens - 1
        idx = jnp.arange(t_total)
        # tabular feature tokens and the target token are always valid; only an
        # active prefix of the (padded) image tokens is
        token_valid = (idx < f_tab) | (idx - f_tab < active_img) | (idx == t_total - 1)
    if tab_valid is not None:
        # cross-width batched inference: per-member (b, t) mask over the full
        # token axis — padded tabular slots invalid, image/target tokens valid
        assert active_img is None, "tab_valid and mgm_active are exclusive"
        assert not train, "cross-width masks are inference-only (no fused vjp)"
        token_valid = jnp.concatenate(
            [
                tab_valid.astype(bool),
                jnp.ones(
                    (tab_valid.shape[0], n_img_tokens + 1), dtype=bool
                ),
            ],
            axis=1,
        )

    # ---- encoder stack under scan (stacked layer params)
    # item-major canonical layout whenever the fully-fused sublayers apply:
    # ONE transpose before the stack instead of a (b,s,t,e)<->(b,t,s,e) HBM
    # copy pair per layer (see encoder_layer_im)
    from multimodalpfn_tpu.ops.pallas_fused import MAX_FUSED_ATTN_TOKENS

    # per-member (b, t) inference masks keep the item-major fused pipeline
    # (the masked fused feature-attn forward, see pallas_fused); traced/shared
    # training masks stay on the sample-major XLA path
    im_mask = token_valid is not None and tab_valid is not None
    item_major = (
        cfg.fused_ops
        and (token_valid is None or im_mask)
        and state.shape[2] <= MAX_FUSED_ATTN_TOKENS
    )
    if item_major:
        state = jnp.swapaxes(state, 1, 2)  # (b, t, s, e)
        layer_fn = partial(
            encoder_layer_im, single_eval_pos=sep, cfg=cfg,
            token_valid=token_valid if im_mask else None,
        )
    else:
        layer_fn = partial(
            encoder_layer, single_eval_pos=sep, cfg=cfg, token_valid=token_valid
        )
    if remat:
        layer_fn = jax.checkpoint(layer_fn)

    def body(carry, lp):
        return layer_fn(carry, lp), None

    state, _ = jax.lax.scan(body, state, params["layers"])

    # ---- decode target tokens of test rows (transformer.py:849-864)
    # (the decoder reads only the target-token stream, so the item-major
    # path never transposes back — it slices token -1 directly)
    if item_major:
        test_targets = state[:, -1, sep:, :].astype(jnp.float32)
    else:
        test_targets = state[:, sep:, -1, :].astype(jnp.float32)
    dec = params["decoder"]
    hidden = jax.nn.gelu(test_targets @ dec["w1"] + dec["b1"], approximate=False)
    logits = hidden @ dec["w2"] + dec["b2"]

    if return_embeddings:
        train_emb = (
            state[:, -1, :sep, :] if item_major else state[:, :sep, -1, :]
        )
        return {
            "standard": logits,
            "train_embeddings": train_emb.astype(jnp.float32),
            "test_embeddings": test_targets,
        }
    return logits


def forward_train_test(
    params: dict,
    cfg: ModelConfig,
    train_x: jnp.ndarray | None,
    train_y: jnp.ndarray,
    test_x: jnp.ndarray | None,
    train_image: jnp.ndarray | None = None,
    test_image: jnp.ndarray | None = None,
    **kw,
):
    """Kwargs-style calling convention used by fine-tuning
    (reference `transformer.py:518-530`)."""
    x = None
    if train_x is not None:
        x = jnp.concatenate([train_x, test_x], axis=1)
    image = None
    if train_image is not None and test_image is not None:
        image = jnp.concatenate([train_image, test_image], axis=1)
    return forward(
        params,
        cfg,
        x,
        train_y,
        image,
        single_eval_pos=train_y.shape[1],
        **kw,
    )
