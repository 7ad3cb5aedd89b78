"""On-device input/target tokenizers as pure JAX functions.

Re-expresses the reference's `SequentialEncoder` step pipeline
(`mmpfn/models/mmpfn/model/encoders.py:17-974`) as shape-static jit-able transforms.
Because the reference re-fits every step on each forward (its `SeqEncStep.forward`
calls `_fit` whenever ``single_eval_pos`` is set, `encoders.py:349-379`), the whole
pipeline is a pure function of ``(x, single_eval_pos)`` — a perfect match for jit.

Dynamic feature removal becomes masking + stable left-compaction (XLA needs static
shapes); this reproduces the reference's ``select_features`` batch>1 semantics
(`encoders.py:102-130`) exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multimodalpfn_tpu.models.config import ModelConfig

# NaN/inf indicator codes (reference `encoders.py:431-433`)
NAN_INDICATOR = -2.0
INF_INDICATOR = 2.0
NEG_INF_INDICATOR = 4.0


def torch_nanmean(x: jnp.ndarray, axis: int, clip_num: bool = True) -> jnp.ndarray:
    """`torch_nanmean` parity (`encoders.py:17-34`): NaN-aware mean; infs count."""
    nan_mask = jnp.isnan(x)
    num = jnp.sum(~nan_mask, axis=axis).astype(x.dtype)
    value = jnp.sum(jnp.where(nan_mask, 0.0, x), axis=axis)
    if clip_num:
        num = jnp.clip(num, min=1.0)
    return value / num


def torch_nanstd(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """`torch_nanstd` parity (`encoders.py:37-50`): unbiased, NaN-aware."""
    nan_mask = jnp.isnan(x)
    num = jnp.sum(~nan_mask, axis=axis).astype(x.dtype)
    value = jnp.sum(jnp.where(nan_mask, 0.0, x), axis=axis)
    mean = value / num  # NaN if num == 0, matching torch
    diff2 = jnp.square(jnp.expand_dims(mean, axis) - x)
    ss = jnp.sum(jnp.where(nan_mask, 0.0, diff2), axis=axis)
    return jnp.sqrt(ss / (num - 1.0))


def _constant_column_mask(x: jnp.ndarray) -> jnp.ndarray:
    """sel = column varies (reference `encoders.py:515,615`): computed over the FULL
    sequence with torch equality semantics (NaN != NaN)."""
    eq = (x[:, 1:] == x[:, :1]).sum(axis=1)
    return eq != (x.shape[1] - 1)


def remove_empty_features(x: jnp.ndarray) -> jnp.ndarray:
    """Zero out constant columns, left-compacting within each feature group.

    x: ``(b, s, f, n)``. Mirrors `RemoveEmptyFeaturesEncoderStep` +
    `select_features` (batch>1 branch) semantics (`encoders.py:102-130,496-527`).
    """
    sel = _constant_column_mask(x)  # (b, f, n) bool
    n = x.shape[-1]
    if n == 1:
        return jnp.where(sel[:, None], x, 0.0)
    order = jnp.argsort(~sel, axis=-1, stable=True)  # kept columns first
    xg = jnp.take_along_axis(x, order[:, None], axis=-1)
    selg = jnp.take_along_axis(sel, order, axis=-1)
    return jnp.where(selg[:, None], xg, 0.0)


def nan_handling(x: jnp.ndarray, sep: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """NaN/inf replacement by train means + indicator channels.

    x: ``(b, s, ...)`` — stats over axis 1 restricted to ``[:sep]``.
    Mirrors `NanHandlingEncoderStep` (`encoders.py:428-493`): means via
    ``torch.nanmean`` (infs included), indicators -2/2/4.
    """
    isnan = jnp.isnan(x)
    isinf = jnp.isinf(x)
    indicators = (
        isnan * NAN_INDICATOR
        + (isinf & (x > 0)) * INF_INDICATOR
        + (isinf & (x < 0)) * NEG_INF_INDICATOR
    ).astype(x.dtype)
    train = x[:, :sep]
    cnt = jnp.sum(~jnp.isnan(train), axis=1).astype(x.dtype)
    means = jnp.sum(jnp.where(jnp.isnan(train), 0.0, train), axis=1) / cnt
    x = jnp.where(isnan | isinf, means[:, None], x)
    return x, indicators


def outlier_squash(x: jnp.ndarray, sep: int, n_sigma: float) -> jnp.ndarray:
    """Two-pass soft outlier squashing (reference `remove_outliers`,
    `encoders.py:133-162`): bounds from train stats, re-estimated after masking
    outliers, then log-squash beyond the bounds applied to the full sequence."""
    data = x[:, :sep]
    mean1 = torch_nanmean(data, axis=1)
    std1 = torch_nanstd(data, axis=1)
    cut = std1 * n_sigma
    lower1, upper1 = mean1 - cut, mean1 + cut
    clean = jnp.where(
        (data > upper1[:, None]) | (data < lower1[:, None]), jnp.nan, data
    )
    mean2 = torch_nanmean(clean, axis=1)
    std2 = torch_nanstd(clean, axis=1)
    cut2 = std2 * n_sigma
    lower, upper = (mean2 - cut2)[:, None], (mean2 + cut2)[:, None]
    x = jnp.maximum(-jnp.log1p(jnp.abs(x)) + lower, x)
    return jnp.minimum(jnp.log1p(jnp.abs(x)) + upper, x)


def normalize_by_train_stats(x: jnp.ndarray, sep: int, seq_len: int) -> jnp.ndarray:
    """Train-stat z-normalization with ±100 clipping (`normalize_data`,
    `encoders.py:53-99`)."""
    train = x[:, :sep]
    mean = torch_nanmean(train, axis=1)
    std = torch_nanstd(train, axis=1) + 1e-20
    if seq_len == 1 or sep == 1:
        std = jnp.ones_like(std)
    x = (x - mean[:, None]) / std[:, None]
    return jnp.clip(x, -100, 100)


def variance_rescale(x: jnp.ndarray) -> jnp.ndarray:
    """`VariableNumFeaturesEncoderStep` with normalization (`encoders.py:579-655`):
    multiply by sqrt(n_features / n_used) where n_used counts non-constant columns of
    the FULL sequence per feature group (its `_fit` sees the whole x)."""
    sel = _constant_column_mask(x)  # (b, f, n)
    used = jnp.clip(sel.sum(axis=-1, keepdims=True).astype(x.dtype), min=1.0)
    n = x.shape[-1]
    return x * jnp.sqrt(n / used)[:, None]


def encode_x(
    params_enc: dict, cfg: ModelConfig, x: jnp.ndarray, sep: int
) -> jnp.ndarray:
    """Full input-encoder pipeline.

    Args:
      params_enc: ``{"w": (2*fpg, emsize)}`` (bias-free, `config.py:44`).
      x: grouped input ``(b, s, f, n)`` (n = features_per_group), may contain NaN/inf.
      sep: single_eval_pos (static).

    Step order mirrors reference `loading.py:308-371`:
    RemoveEmpty -> NanHandling -> [pad indicators] -> InputNormalization ->
    VariableNumFeatures -> Linear.
    """
    if cfg.remove_empty_features:
        x = remove_empty_features(x)
    if cfg.nan_handling_enabled:
        x, indicators = nan_handling(x, sep)
    else:
        indicators = jnp.zeros_like(x)
    if cfg.remove_outliers:
        x = outlier_squash(x, sep, cfg.remove_outliers_sigma)
    if cfg.normalize_x:
        x = normalize_by_train_stats(x, sep, x.shape[1])
    if cfg.normalize_by_used_features:
        x = variance_rescale(x)
    feats = jnp.concatenate([x, indicators], axis=-1)
    return jnp.einsum(
        "bsfn,ne->bsfe",
        feats.astype(params_enc["w"].dtype),
        params_enc["w"],
        preferred_element_type=jnp.float32,
    )


def flatten_targets(y: jnp.ndarray, sep: int) -> jnp.ndarray:
    """`MulticlassClassificationTargetEncoder` parity (`encoders.py:949-974`):
    map each y to the count of *distinct* train-y values strictly below it.

    y: ``(b, s)``. Uses sorted train values with first-occurrence masking, which
    equals ``(y[:, :, None] > unique(train_y)).sum(-1)`` without dynamic shapes.
    """
    train = y[:, :sep]
    t = jnp.sort(train, axis=1)
    is_first = jnp.concatenate(
        [jnp.ones_like(t[:, :1], dtype=bool), t[:, 1:] != t[:, :-1]], axis=1
    )
    below = (t[:, None, :] < y[:, :, None]) & is_first[:, None, :]
    return below.sum(axis=-1).astype(y.dtype)


def frequency_features(
    x: jnp.ndarray,
    num_frequencies: int,
    freq_power_base: float = 2.0,
    max_wave_length: float = 4.0,
) -> jnp.ndarray:
    """`FrequencyFeatureEncoderStep` (`encoders.py:785-852`): append sin/cos
    features at geometrically-spaced wavelengths. (..., F) -> (..., F*(1+2K))."""
    waves = jnp.asarray(
        [freq_power_base**i for i in range(num_frequencies)], jnp.float32
    )
    waves = waves / waves[-1] * max_wave_length
    ext = x[..., None] / waves * 2 * jnp.pi
    feats = jnp.concatenate([x[..., None], jnp.sin(ext), jnp.cos(ext)], axis=-1)
    return feats.reshape(*x.shape[:-1], -1)


def categorical_embedding_encoder(
    params: dict, x: jnp.ndarray, is_categorical: jnp.ndarray, continuous_embs: jnp.ndarray
) -> jnp.ndarray:
    """`CategoricalInputEncoderPerFeatureEncoderStep` (`encoders.py:855-918`):
    categorical feature groups use an embedding table (NaN/inf -> last slot),
    continuous groups use the base encoder output. x: (b, s, f) single-feature
    groups; is_categorical: (b, f) bool; params: {"embedding": (num_embs, e)}."""
    table = params["embedding"]
    num_embs = table.shape[0]
    bad = jnp.isnan(x) | jnp.isinf(x)
    idx = jnp.clip(x.astype(jnp.int32), 0, num_embs - 2)
    idx = jnp.where(bad, num_embs - 1, idx)
    cat_embs = table[idx]  # (b, s, f, e)
    return jnp.where(is_categorical[:, None, :, None], cat_embs, continuous_embs)


def style_encoder(params: dict, hyperparameters: jnp.ndarray) -> jnp.ndarray:
    """`StyleEncoder` (`encoders.py:921-928`): linear embed of style/HP vectors."""
    return hyperparameters @ params["w"] + params["b"]


def encode_y(
    params_y: dict, cfg: ModelConfig, y: jnp.ndarray, sep: int
) -> jnp.ndarray:
    """Target encoder: NanHandling -> (classification) target flattening -> Linear.

    y: ``(b, s)`` float with NaN at test positions (the transformer masks them,
    reference `transformer.py:718`). Returns ``(b, s, emsize)``.
    Mirrors `get_y_encoder` (`loading.py:374-398`).
    """
    if cfg.nan_handling_y_encoder:
        y, indicators = nan_handling(y, sep)
    else:
        indicators = jnp.zeros_like(y)
    if cfg.max_num_classes >= 2:
        y = flatten_targets(y, sep)
    feats = jnp.stack([y, indicators], axis=-1)
    return (
        jnp.einsum(
            "bsn,ne->bse",
            feats.astype(params_y["w"].dtype),
            params_y["w"],
            preferred_element_type=jnp.float32,
        )
        + params_y["b"]
    )
