"""KV-cached inference: prime on the train set once, predict test rows cheaply.

Functional re-design of the reference's CacheKV mode
(`mmpfn/models/mmpfn/inference.py:354-513` + the KV-cache buffers in
`multi_head_attention.py:317-353`): a *prime* forward over the train rows records,
per layer, the item-attention K/V of KV-head 0 (the only head test queries use in
multiquery mode, `layer.py:344-358`) plus the fitted on-device encoder statistics;
*predict* then runs only the test rows through the stack, cross-attending to the
cached KV — skipping the O(S_train²) train self-attention entirely.

Note (matches the reference): cached-mode encoder statistics are fitted on the
train rows only, whereas the fused fit+predict forward computes
`RemoveEmptyFeatures`/variance-rescale masks over the full sequence
(`encoders.py:515,615`); predictions agree exactly whenever the train rows alone
determine those masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from multimodalpfn_tpu.models.config import ModelConfig
from multimodalpfn_tpu.models.encoders import (
    _constant_column_mask,
    torch_nanmean,
    torch_nanstd,
)
from multimodalpfn_tpu.models.mixers import apply_mixer
from multimodalpfn_tpu.models.params import get_subspace_noise
from multimodalpfn_tpu.models.transformer import (
    _group_features,
    _layer_norm,
    _mlp,
)
from multimodalpfn_tpu.ops.attention import mha, self_attention


class EncoderStats(NamedTuple):
    """Train-fitted statistics of the on-device encoder steps."""

    sel: jnp.ndarray  # (b, f, n) non-constant mask (RemoveEmpty)
    order: jnp.ndarray | None  # (b, f, n) left-compaction order (n > 1)
    nan_means: jnp.ndarray  # (b, f, n)
    out_lower: jnp.ndarray | None
    out_upper: jnp.ndarray | None
    norm_mean: jnp.ndarray
    norm_std: jnp.ndarray
    used: jnp.ndarray  # (b, f, 1)
    y_mean: jnp.ndarray  # (b,)
    y_sorted: jnp.ndarray  # (b, S_tr) sorted train targets
    y_is_first: jnp.ndarray  # (b, S_tr)


def fit_encoder_stats(
    cfg: ModelConfig, xg: jnp.ndarray | None, y_train: jnp.ndarray
) -> EncoderStats:
    """Fit the pipeline statistics on train rows (the reference's SeqEncStep._fit
    with cache_trainset_representation, `encoders.py:349-379`)."""
    sel = order = nan_means = out_lo = out_hi = norm_mean = norm_std = used = None
    if xg is not None:
        sep = xg.shape[1]
        sel = _constant_column_mask(xg)
        if xg.shape[-1] > 1:
            order = jnp.argsort(~sel, axis=-1, stable=True)
            x = jnp.where(
                jnp.take_along_axis(sel, order, axis=-1)[:, None],
                jnp.take_along_axis(xg, order[:, None], axis=-1),
                0.0,
            )
        else:
            x = jnp.where(sel[:, None], xg, 0.0)
        isnan = jnp.isnan(x)
        cnt = jnp.sum(~isnan, axis=1).astype(x.dtype)
        nan_means = jnp.sum(jnp.where(isnan, 0.0, x), axis=1) / cnt
        x = jnp.where(isnan | jnp.isinf(x), nan_means[:, None], x)
        if cfg.remove_outliers:
            # bounds from the two-pass train estimate, then squash train rows so
            # downstream stats match the main path
            data = x
            m1, s1 = torch_nanmean(data, 1), torch_nanstd(data, 1)
            clean = jnp.where(
                (data > (m1 + s1 * cfg.remove_outliers_sigma)[:, None])
                | (data < (m1 - s1 * cfg.remove_outliers_sigma)[:, None]),
                jnp.nan,
                data,
            )
            m2, s2 = torch_nanmean(clean, 1), torch_nanstd(clean, 1)
            out_lo = (m2 - s2 * cfg.remove_outliers_sigma)[:, None]
            out_hi = (m2 + s2 * cfg.remove_outliers_sigma)[:, None]
            x = jnp.maximum(-jnp.log1p(jnp.abs(x)) + out_lo, x)
            x = jnp.minimum(jnp.log1p(jnp.abs(x)) + out_hi, x)
        norm_mean = torch_nanmean(x, 1)
        norm_std = torch_nanstd(x, 1) + 1e-20
        if sep == 1:
            norm_std = jnp.ones_like(norm_std)
        xn = jnp.clip((x - norm_mean[:, None]) / norm_std[:, None], -100, 100)
        used = jnp.clip(
            _constant_column_mask(xn).sum(-1, keepdims=True).astype(x.dtype), min=1.0
        )
    y = y_train.astype(jnp.float32)
    isnan_y = jnp.isnan(y)
    cnt_y = jnp.sum(~isnan_y, axis=1).astype(jnp.float32)
    y_mean = jnp.sum(jnp.where(isnan_y, 0.0, y), axis=1) / cnt_y
    y_filled = jnp.where(isnan_y | jnp.isinf(y), y_mean[:, None], y)
    y_sorted = jnp.sort(y_filled, axis=1)
    y_is_first = jnp.concatenate(
        [jnp.ones_like(y_sorted[:, :1], bool), y_sorted[:, 1:] != y_sorted[:, :-1]],
        axis=1,
    )
    return EncoderStats(
        sel, order, nan_means, out_lo, out_hi, norm_mean, norm_std, used,
        y_mean, y_sorted, y_is_first,
    )


def apply_encoder(
    params_enc: dict, cfg: ModelConfig, stats: EncoderStats, xg: jnp.ndarray
) -> jnp.ndarray:
    """Transform any rows with the fitted stats -> (b, s, f, emsize)."""
    if stats.order is not None:
        x = jnp.where(
            jnp.take_along_axis(stats.sel, stats.order, axis=-1)[:, None],
            jnp.take_along_axis(xg, stats.order[:, None], axis=-1),
            0.0,
        )
    else:
        x = jnp.where(stats.sel[:, None], xg, 0.0)
    isnan, isinf = jnp.isnan(x), jnp.isinf(x)
    indicators = (
        isnan * -2.0 + (isinf & (x > 0)) * 2.0 + (isinf & (x < 0)) * 4.0
    ).astype(x.dtype)
    x = jnp.where(isnan | isinf, stats.nan_means[:, None], x)
    if stats.out_lower is not None:
        x = jnp.maximum(-jnp.log1p(jnp.abs(x)) + stats.out_lower, x)
        x = jnp.minimum(jnp.log1p(jnp.abs(x)) + stats.out_upper, x)
    x = jnp.clip(
        (x - stats.norm_mean[:, None]) / stats.norm_std[:, None], -100, 100
    )
    x = x * jnp.sqrt(x.shape[-1] / stats.used)[:, None]
    feats = jnp.concatenate([x, indicators], axis=-1)
    return jnp.einsum(
        "bsfn,ne->bsfe", feats.astype(params_enc["w"].dtype), params_enc["w"],
        preferred_element_type=jnp.float32,
    )


def apply_y_encoder(
    params_y: dict, cfg: ModelConfig, stats: EncoderStats, y: jnp.ndarray
) -> jnp.ndarray:
    isnan, isinf = jnp.isnan(y), jnp.isinf(y)
    indicators = (
        isnan * -2.0 + (isinf & (y > 0)) * 2.0 + (isinf & (y < 0)) * 4.0
    ).astype(jnp.float32)
    y = jnp.where(isnan | isinf, stats.y_mean[:, None], y.astype(jnp.float32))
    if cfg.max_num_classes >= 2:
        below = (stats.y_sorted[:, None, :] < y[:, :, None]) & stats.y_is_first[:, None, :]
        y = below.sum(-1).astype(jnp.float32)
    feats = jnp.stack([y, indicators], axis=-1)
    return (
        jnp.einsum(
            "bsn,ne->bse", feats.astype(params_y["w"].dtype), params_y["w"],
            preferred_element_type=jnp.float32,
        )
        + params_y["b"]
    )


class TrainsetCache(NamedTuple):
    stats: EncoderStats
    # (L, b, t, 2, d, S_tr) item-attn KV head 0 per layer, stored in the flash
    # kernel's transposed layout (d on sublanes, S on lanes) so every predict
    # consumes it with zero relayouts (see ops/pallas_attention docstring)
    kv0: jnp.ndarray
    # cross-width batching (optional): (b, t) bool per-member feature-attn key
    # mask and (b, t_x, k) per-member subspace-noise tables — members padded to
    # a shared feature width keep their NATIVE noise draws and mask their
    # padded token slots (see estimator/inference.py group merging)
    token_valid: jnp.ndarray | None = None
    feat_pos_noise: jnp.ndarray | None = None



def _feat_sublayer(st, lp, cd, cfg, token_valid=None):
    """Feature attention + residual + post-norm; fused Pallas sublayer on
    accelerators (cfg.fused_ops), XLA formulation otherwise.

    token_valid: optional (b, t) bool — per-member key mask for cross-width
    batching (members padded to a shared feature width; see
    estimator/inference.py). st is (b, s, t, e)."""
    from multimodalpfn_tpu.ops.pallas_fused import (
        MAX_FUSED_ATTN_TOKENS,
        fused_feature_attention_ln,
    )

    if cfg.fused_ops and st.shape[-2] <= MAX_FUSED_ATTN_TOKENS:
        km = None if token_valid is None else token_valid[:, None, :]
        return fused_feature_attention_ln(
            st.astype(cd), lp["attn_feat"]["w_qkv"], lp["attn_feat"]["w_out"],
            key_mask=km,
        )
    km = None if token_valid is None else token_valid[:, None, None, None, :]
    h = self_attention(
        st, lp["attn_feat"]["w_qkv"], lp["attn_feat"]["w_out"],
        compute_dtype=cd, key_mask=km,
    )
    return _layer_norm(st + h).astype(cd)


def _mlp_sublayer(st, lp, cd, cfg):
    if cfg.fused_ops:
        from multimodalpfn_tpu.ops.pallas_fused import fused_mlp_ln

        return fused_mlp_ln(st.astype(cd), lp["mlp"]["w1"], lp["mlp"]["w2"])
    h = _mlp(st, lp["mlp"]["w1"], lp["mlp"]["w2"], cd)
    return _layer_norm(st + h).astype(cd)


def prime_cache(
    params: dict,
    cfg: ModelConfig,
    x_train: jnp.ndarray | None,
    y_train: jnp.ndarray,
    image_train: jnp.ndarray | None = None,
    token_valid: jnp.ndarray | None = None,
    feat_pos_noise: jnp.ndarray | None = None,
) -> TrainsetCache:
    """Run the train rows through the stack, recording per-layer KV-head-0.

    token_valid / feat_pos_noise: cross-width member batching — see
    TrainsetCache; both ride along in the returned cache so predicts reuse
    them."""
    prec = "highest" if cfg.compute_dtype == "float32" else "default"
    with jax.default_matmul_precision(prec):
        return _prime_impl(
            params, cfg, x_train, y_train, image_train, token_valid,
            feat_pos_noise,
        )


def _prime_impl(
    params, cfg, x_train, y_train, image_train, token_valid=None,
    feat_pos_noise=None,
):
    cd = jnp.dtype(cfg.compute_dtype)
    xg = (
        None
        if x_train is None
        else _group_features(x_train.astype(jnp.float32), cfg.features_per_group)
    )
    stats = fit_encoder_stats(cfg, xg, y_train)
    embedded_x = None
    if xg is not None:
        embedded_x = apply_encoder(params["encoder"], cfg, stats, xg)
    if image_train is not None:
        tokens = apply_mixer(params["mixer"], cfg.mixer, image_train.astype(jnp.float32))
        b = y_train.shape[0]
        if tokens.shape[0] == 1 and b > 1:
            # members share the image: callers pass a singleton batch axis so
            # the mixer runs once and only one copy transfers to the device
            tokens = jnp.broadcast_to(tokens, (b, *tokens.shape[1:]))
        embedded_x = (
            tokens if embedded_x is None else jnp.concatenate([embedded_x, tokens], -2)
        )
    if cfg.feature_positional_embedding == "subspace":
        if feat_pos_noise is not None:
            noise = feat_pos_noise  # (b, t_x, k) per-member native draws
        else:
            noise = jnp.asarray(
                get_subspace_noise(
                    cfg.model_seed, embedded_x.shape[-2], cfg.emsize // 4
                )
            )
        embs = noise @ params["feat_pos_emb"]["w"] + params["feat_pos_emb"]["b"]
        embedded_x = embedded_x + (
            embs[:, None] if embs.ndim == 3 else embs[None, None]
        )
    embedded_y = apply_y_encoder(params["y_encoder"], cfg, stats, y_train)
    state = jnp.concatenate([embedded_x, embedded_y[:, :, None, :]], 2).astype(cd)

    w_item = params["layers"]["attn_item"]

    def body(carry, lp):
        st = carry
        # KV of this layer's item attention, head 0, from the pre-layer state's
        # post-feature-attn representation (reference caches inside the train
        # self-attention call, `layer.py:362-372`) — emitted directly in the
        # transposed (d, S) layout the flash predict consumes
        st = _feat_sublayer(st, lp, cd, cfg, token_valid)
        sti = jnp.swapaxes(st, 1, 2)  # (b, t, s, e)
        wk = lp["attn_item"]["w_qkv"][1, 0]
        wv = lp["attn_item"]["w_qkv"][2, 0]
        k0 = jnp.einsum("btsi,di->btds", sti.astype(cd), wk.astype(cd),
                        preferred_element_type=jnp.float32)
        v0 = jnp.einsum("btsi,di->btds", sti.astype(cd), wv.astype(cd),
                        preferred_element_type=jnp.float32)
        kv0 = jnp.stack([k0, v0], axis=2).astype(cd)  # (b, t, 2, d, s)
        # full train self-attention to advance the state; the flash kernel
        # never materializes the (t, h, S_tr, S_tr) score tensor the einsum
        # path writes through HBM (~GBs per layer at PAD-UFES scale)
        h = mha(sti, sti, lp["attn_item"]["w_qkv"], lp["attn_item"]["w_out"],
                compute_dtype=cd, use_flash=cfg.use_flash)
        st = _layer_norm(st + jnp.swapaxes(h, 1, 2)).astype(cd)
        st = _mlp_sublayer(st, lp, cd, cfg)
        return st, kv0

    _, kv0 = jax.lax.scan(body, state, params["layers"])
    return TrainsetCache(stats, kv0, token_valid, feat_pos_noise)


def forward_cached(
    params: dict,
    cfg: ModelConfig,
    cache: TrainsetCache,
    x_test: jnp.ndarray | None,
    image_test: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Predict test rows against the primed cache (reference `inference.py:461-513`
    with single_eval_pos=None)."""
    prec = "highest" if cfg.compute_dtype == "float32" else "default"
    with jax.default_matmul_precision(prec):
        return _forward_cached_impl(params, cfg, cache, x_test, image_test)


def _forward_cached_impl(params, cfg, cache, x_test, image_test):
    cd = jnp.dtype(cfg.compute_dtype)
    embedded_x = None
    if x_test is not None:
        xg = _group_features(x_test.astype(jnp.float32), cfg.features_per_group)
        embedded_x = apply_encoder(params["encoder"], cfg, cache.stats, xg)
    if image_test is not None:
        tokens = apply_mixer(params["mixer"], cfg.mixer, image_test.astype(jnp.float32))
        b = embedded_x.shape[0] if embedded_x is not None else cache.kv0.shape[1]
        if tokens.shape[0] == 1 and b > 1:
            # shared test image with a singleton batch axis (see _prime_impl)
            tokens = jnp.broadcast_to(tokens, (b, *tokens.shape[1:]))
        embedded_x = (
            tokens if embedded_x is None else jnp.concatenate([embedded_x, tokens], -2)
        )
    n_feature_tokens = cache.kv0.shape[2] - 1  # static (t = features + y token)
    assert embedded_x.shape[-2] == n_feature_tokens
    if cfg.feature_positional_embedding == "subspace":
        if cache.feat_pos_noise is not None:
            noise = cache.feat_pos_noise  # (b, t_x, k), same draws as prime
        else:
            noise = jnp.asarray(
                get_subspace_noise(
                    cfg.model_seed, n_feature_tokens, cfg.emsize // 4
                )
            )
        embs = noise @ params["feat_pos_emb"]["w"] + params["feat_pos_emb"]["b"]
        embedded_x = embedded_x + (
            embs[:, None] if embs.ndim == 3 else embs[None, None]
        )
    s_te = embedded_x.shape[1]
    y_nan = jnp.full((embedded_x.shape[0], s_te), jnp.nan, jnp.float32)
    embedded_y = apply_y_encoder(params["y_encoder"], cfg, cache.stats, y_nan)
    state = jnp.concatenate([embedded_x, embedded_y[:, :, None, :]], 2).astype(cd)

    def body(carry, layer_in):
        lp, kv0 = layer_in  # kv0: (b, t, 2, d, S_tr), transposed layout
        st = carry
        st = _feat_sublayer(st, lp, cd, cfg, cache.token_valid)
        sti = jnp.swapaxes(st, 1, 2)  # (b, t, s_te, e)
        wq = lp["attn_item"]["w_qkv"][0]  # (h, d, e)
        h_n, d = wq.shape[0], wq.shape[1]
        k0 = kv0[:, :, 0].astype(cd)  # (b, t, d, S_tr)
        v0 = kv0[:, :, 1].astype(cd)
        if cfg.use_flash:
            # multiquery flash: fold query heads into the lane axis and
            # cross-attend to the cached single KV head — scores stream
            # through VMEM instead of a (b,t,h,q,k) HBM tensor
            from multimodalpfn_tpu.ops.pallas_attention import flash_mha_t

            b_, t_, s_, _ = sti.shape
            q3 = jnp.einsum(
                "btsi,hdi->btdhs", sti.astype(cd), wq.astype(cd),
                preferred_element_type=cd,
            ).reshape(b_ * t_, d, h_n * s_)
            o3 = flash_mha_t(
                q3, k0.reshape(b_ * t_, d, -1), v0.reshape(b_ * t_, d, -1)
            )
            o = o3.reshape(b_, t_, d, h_n, s_)
            h = jnp.einsum(
                "btdhq,hdo->btqo", o.astype(cd),
                lp["attn_item"]["w_out"].astype(cd),
                preferred_element_type=jnp.float32,
            )
        else:
            q = jnp.einsum("btsi,hdi->btshd", sti.astype(cd), wq.astype(cd),
                           preferred_element_type=jnp.float32)
            scale = 1.0 / (d ** 0.5)
            logits = jnp.einsum("btqhd,btdk->bthqk", q.astype(cd), k0,
                                preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            o = jnp.einsum("bthqk,btdk->btqhd", p.astype(cd), v0,
                           preferred_element_type=jnp.float32)
            h = jnp.einsum("btqhd,hdo->btqo", o.astype(cd),
                           lp["attn_item"]["w_out"].astype(cd),
                           preferred_element_type=jnp.float32)
        st = _layer_norm(st + jnp.swapaxes(h, 1, 2)).astype(cd)
        st = _mlp_sublayer(st, lp, cd, cfg)
        return st, None

    state, _ = jax.lax.scan(body, state, (params["layers"], cache.kv0))
    test_targets = state[:, :, -1, :].astype(jnp.float32)
    dec = params["decoder"]
    hidden = jax.nn.gelu(test_targets @ dec["w1"] + dec["b1"], approximate=False)
    return hidden @ dec["w2"] + dec["b2"]
