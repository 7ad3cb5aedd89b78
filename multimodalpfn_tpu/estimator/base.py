"""Model initialization + precision policy for the estimators.

Reference semantics: `mmpfn/models/mmpfn/base.py:59-257` and `utils.py:98-190`.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Literal

import jax
import numpy as np

from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
from multimodalpfn_tpu.models.loading import LoadedModel, load_model
from multimodalpfn_tpu.models.params import init_params

_DEFAULT_CLF_CKPT = "tabpfn-v2-classifier.ckpt"
_DEFAULT_REG_CKPT = "tabpfn-v2-regressor.ckpt"


def _cache_dir() -> Path:
    env = os.environ.get("TABPFN_MODEL_CACHE_DIR")
    if env:
        return Path(env)
    return Path.home() / ".cache" / "multimodalpfn_tpu"


def default_model_config(which: Literal["classifier", "regressor"]) -> dict:
    """The published TabPFN-v2 architecture (reference `model/config.py:25-84`,
    `loading.py:492-495`)."""
    return {
        "emsize": 192,
        "nhead": 6,
        "nhid_factor": 4,
        "nlayers": 12,
        "features_per_group": 1,
        "max_num_classes": 10 if which == "classifier" else 0,
        "num_buckets": 1000 if which == "classifier" else 5000,
        "seq_len": 2000,
        "max_num_features": 85,
        "remove_duplicate_features": False,
    }


def initialize_model(
    *,
    model_path: str | Path | Literal["auto"],
    which: Literal["classifier", "regressor"],
    static_seed: int,
    mixer_type: str,
    mgm_heads: int,
    cap_heads: int,
    features_per_group: int | None,
) -> LoadedModel:
    """Load (or synthesize) the model.

    - ``"auto"``: look for the published checkpoint in the model cache dir
      (downloads are environment-gated; see models/loading.py registry).
    - an existing path: reference-format torch checkpoint.
    - ``"random"`` / ``"random:<seed>"``: fresh random initialization with the
      published architecture — for benchmarking/testing without weights.
    """
    from multimodalpfn_tpu.utils.compile_cache import (
        apply_compile_effort,
        enable_persistent_cache,
    )

    enable_persistent_cache()
    apply_compile_effort()
    mixer = MixerConfig(
        mixer_type=mixer_type, mgm_heads=mgm_heads, cap_heads=cap_heads
    )

    if isinstance(model_path, str) and model_path.startswith("random"):
        seed = int(model_path.split(":", 1)[1]) if ":" in model_path else static_seed
        ckpt_cfg = default_model_config(which)
        n_out = None
        borders = None
        if which == "regressor":
            n_out = ckpt_cfg["num_buckets"]
            borders = np.linspace(-12.0, 12.0, n_out + 1)
        cfg = ModelConfig.from_ckpt_config(
            ckpt_cfg,
            features_per_group=features_per_group,
            mixer=mixer,
            n_out=n_out,
            model_seed=seed,
        )
        params = init_params(jax.random.PRNGKey(seed), cfg, model_seed=seed)
        return LoadedModel(
            params=params, config=cfg, ckpt_config=ckpt_cfg, criterion_borders=borders
        )

    if model_path == "auto":
        name = _DEFAULT_CLF_CKPT if which == "classifier" else _DEFAULT_REG_CKPT
        legacy = _cache_dir() / name  # pre-downloader cache location
        if legacy.exists():
            model_path = legacy
        else:
            # reference-compatible resolution + download chain
            # (HF hub -> direct URL; see models/download.py)
            from multimodalpfn_tpu.models.download import ensure_model

            try:
                model_path = ensure_model("auto", which)
            except (RuntimeError, ValueError) as e:
                raise FileNotFoundError(
                    f"No checkpoint named {name} in the cache dir and download "
                    f"failed (no egress?). Place the published {name} in "
                    f"$TABPFN_MODEL_CACHE_DIR (or ~/.cache/tabpfn), pass "
                    f"model_path=..., or use model_path='random:<seed>' for an "
                    f"untrained model."
                ) from e

    return load_model(
        model_path,
        model_seed=static_seed,
        mixer_type=mixer_type,
        mgm_heads=mgm_heads,
        cap_heads=cap_heads,
        features_per_group=features_per_group,
    )


def determine_precision(
    inference_precision, default_device=None
) -> tuple[bool, str | None]:
    """Map the user precision knob to (autocast, forced_dtype)
    (reference `base.py:126-165`, `utils.py:150-190`): "auto" enables bf16 compute
    on TPU-class accelerators and fp32 on CPU; an explicit dtype forces it."""
    if inference_precision == "autocast":
        return True, None
    if inference_precision == "auto":
        platform = jax.devices()[0].platform
        return platform not in ("cpu",), None
    if inference_precision in ("float32", np.float32, "f32"):
        return False, "float32"
    if inference_precision in ("bfloat16", "bf16"):
        return True, "bfloat16"
    raise ValueError(f"Invalid inference_precision: {inference_precision}")


def pipeline_requests(dispatch, finalize, Xs, image_tests, max_in_flight: int):
    """Shared scheduling loop for pipelined request streams
    (`MMPFNClassifier.predict_proba_many` / `MMPFNRegressor.predict_many`):
    dispatch request N+1 (host transforms + async device dispatch) BEFORE
    finalizing request N so host and device overlap; ``max_in_flight`` bounds
    the dispatched requests awaiting finalization. Results are exactly
    ``[finalize(dispatch(X, img)) for X, img in zip(Xs, image_tests)]``."""
    if max_in_flight < 1:
        raise ValueError("max_in_flight must be >= 1")
    if image_tests is None:
        image_tests = [None] * len(Xs)
    if len(image_tests) != len(Xs):
        raise ValueError(
            f"got {len(Xs)} X requests but {len(image_tests)} image requests"
        )
    results: list = [None] * len(Xs)
    in_flight: list[tuple[int, object]] = []
    for i, (X, img) in enumerate(zip(Xs, image_tests)):
        in_flight.append((i, dispatch(X, img)))
        if len(in_flight) > max_in_flight:
            j, handle = in_flight.pop(0)
            results[j] = finalize(handle)
    for j, handle in in_flight:
        results[j] = finalize(handle)
    return results
