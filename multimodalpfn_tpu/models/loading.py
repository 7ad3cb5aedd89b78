"""Checkpoint loading/saving.

Consumes the reference's ``{"state_dict": ..., "config": ...}`` torch checkpoint
format (`mmpfn/models/mmpfn/model/loading.py:401-543`) — including the published
``tabpfn-v2-classifier.ckpt`` / ``tabpfn-v2-regressor.ckpt`` — and produces
(params pytree, ModelConfig, extras). Mixer weights absent from the checkpoint are
freshly initialized from the model seed, the JAX analogue of
``load_state_dict(strict=False)`` (`loading.py:540`).

Also provides torch-format export (so reference code can consume our fine-tuned
checkpoints) and native orbax save/restore for pure-JAX round-trips.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import jax
import numpy as np

from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
from multimodalpfn_tpu.models.params import (
    convert_torch_state_dict,
    export_torch_state_dict,
)

# Published checkpoint registry — single source of truth lives with the
# downloader chain (models/download.py, reference `loading.py:46-87`).
from multimodalpfn_tpu.models.download import ModelSource  # noqa: E402

CLASSIFIER_V2_FILENAMES = list(ModelSource.classifier_v2().filenames)
REGRESSOR_V2_FILENAMES = list(ModelSource.regressor_v2().filenames)


@dataclasses.dataclass
class LoadedModel:
    params: dict
    config: ModelConfig
    ckpt_config: dict
    # FullSupportBarDistribution borders for regression checkpoints, else None
    criterion_borders: np.ndarray | None = None


def load_model(
    path: str | Path,
    *,
    model_seed: int = 0,
    mixer_type: str = "none",
    mgm_heads: int = 8,
    cap_heads: int = 8,
    features_per_group: int | None = None,
) -> LoadedModel:
    """Load a reference-format torch checkpoint into a JAX param tree."""
    import torch  # local import: torch is only needed at conversion time

    ckpt = torch.load(Path(path), map_location="cpu", weights_only=False)
    assert "state_dict" in ckpt and "config" in ckpt, "unrecognized checkpoint format"
    state_dict = dict(ckpt["state_dict"])
    ckpt_config = dict(ckpt["config"])

    criterion_borders = None
    criterion_keys = [k for k in state_dict if "criterion." in k]
    if ckpt_config.get("max_num_classes", 10) == 0:
        borders = state_dict.pop("criterion.borders", None)
        for k in criterion_keys:
            state_dict.pop(k, None)
        if borders is not None:
            criterion_borders = np.asarray(borders)

    n_out = None
    if criterion_borders is not None:
        n_out = len(criterion_borders) - 1

    mixer = MixerConfig(
        mixer_type=mixer_type, mgm_heads=mgm_heads, cap_heads=cap_heads
    )
    cfg = ModelConfig.from_ckpt_config(
        ckpt_config,
        features_per_group=features_per_group,
        mixer=mixer,
        n_out=n_out,
        model_seed=model_seed,
    )
    params = convert_torch_state_dict(state_dict, cfg, model_seed=model_seed)
    return LoadedModel(
        params=params,
        config=cfg,
        ckpt_config=ckpt_config,
        criterion_borders=criterion_borders,
    )


def model_config_to_ckpt_config(cfg: ModelConfig, base: dict | None = None) -> dict:
    """Build a reference-compatible ``config`` dict (fields of
    `model/config.py:19-84`). ``base`` (the dict loaded from an upstream ckpt) is
    passed through when available so unknown training-era fields survive."""
    out = dict(base) if base else {}
    out.update(
        {
            "emsize": cfg.emsize,
            "nhead": cfg.nhead,
            "nhid_factor": cfg.nhid_factor,
            "nlayers": cfg.nlayers,
            "features_per_group": cfg.features_per_group,
            "max_num_classes": cfg.max_num_classes,
            "remove_duplicate_features": cfg.remove_duplicate_features,
            "remove_empty_features": cfg.remove_empty_features,
            "nan_handling_enabled": cfg.nan_handling_enabled,
            "nan_handling_y_encoder": cfg.nan_handling_y_encoder,
            "normalize_on_train_only": cfg.normalize_on_train_only,
            "normalize_x": cfg.normalize_x,
            "remove_outliers": False,
            "normalize_by_used_features": cfg.normalize_by_used_features,
            "encoder_use_bias": cfg.encoder_use_bias,
            "feature_positional_embedding": (
                None
                if cfg.feature_positional_embedding == "none"
                else cfg.feature_positional_embedding
            ),
            "multiquery_item_attention": False,
            "multiquery_item_attention_for_test_set": cfg.multiquery_item_attention_for_test_set,
            "seq_len": cfg.seq_len,
            "max_num_features": cfg.max_num_features,
            "num_buckets": cfg.num_buckets,
            "use_separate_decoder": False,
            "recompute_attn": False,
            "recompute_layer": True,
            "batch_size": out.get("batch_size", 8),
            "aggregate_k_gradients": out.get("aggregate_k_gradients", 1),
            "task_type": "multiclass" if cfg.max_num_classes > 0 else "regression",
            "adaptive_max_seq_len_to_max_full_table_size": out.get(
                "adaptive_max_seq_len_to_max_full_table_size", 75000
            ),
            "two_sets_of_queries": False,
        }
    )
    return out


def save_model(
    path: str | Path,
    params: dict,
    cfg: ModelConfig,
    *,
    ckpt_config: dict | None = None,
    criterion_borders: np.ndarray | None = None,
) -> None:
    """Save in the reference's torch checkpoint format (`loading.py:546-567`)."""
    import torch

    state = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in export_torch_state_dict(params, cfg).items()
    }
    if criterion_borders is not None:
        state["criterion.borders"] = torch.from_numpy(np.asarray(criterion_borders))
    torch.save(
        {"state_dict": state, "config": model_config_to_ckpt_config(cfg, ckpt_config)},
        Path(path),
    )


# ---------------------------------------------------------------------------
# native (orbax) checkpointing — the fast path for fine-tune snapshots
# ---------------------------------------------------------------------------


def save_native(path: str | Path, params: dict, cfg: ModelConfig, **extras: Any) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            path,
            {
                "params": jax.device_get(params),  # one batched fetch
                "config": dataclasses.asdict(cfg),
                "extras": extras,
            },
            force=True,
        )


def load_native(path: str | Path) -> tuple[dict, ModelConfig, dict]:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    cfg_dict = dict(tree["config"])
    mixer = MixerConfig(**cfg_dict.pop("mixer"))
    cfg = ModelConfig(mixer=mixer, **cfg_dict)
    return tree["params"], cfg, dict(tree.get("extras", {}))
