"""multimodalpfn_tpu — TPU-native multimodal TabPFN framework.

A JAX/XLA/Pallas re-design of too-z/MultiModalPFN: the TabPFN-v2 dual-axis
in-context transformer with multimodal mixers (MGM / CAP / MoE), sklearn-style
estimators, episode fine-tuning, and mesh-sharded batched HPO.
"""

__version__ = "0.1.0"

import os as _os


def _honor_jax_platforms_env() -> None:
    """Some environments inject a PJRT plugin via sitecustomize that overrides
    ``jax_platforms`` programmatically at interpreter start, silently ignoring the
    user's JAX_PLATFORMS env var. Re-apply the env var (no-op when unset or when
    backends are already initialized)."""
    env = _os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    try:
        import jax

        if (jax.config.jax_platforms or "") != env:
            jax.config.update("jax_platforms", env)
    except Exception:
        pass


_honor_jax_platforms_env()

from multimodalpfn_tpu.estimator.classifier import MMPFNClassifier, TabPFNClassifier
from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
from multimodalpfn_tpu.models.loading import load_model, save_model

__all__ = [
    "MMPFNClassifier",
    "TabPFNClassifier",
    "MMPFNRegressor",
    "TabPFNRegressor",
    "ModelConfig",
    "MixerConfig",
    "load_model",
    "save_model",
]


def __getattr__(name):
    # regressors import lazily (bar-distribution module)
    if name in ("MMPFNRegressor", "TabPFNRegressor"):
        from multimodalpfn_tpu.estimator.regressor import (
            MMPFNRegressor,
            TabPFNRegressor,
        )

        return {"MMPFNRegressor": MMPFNRegressor, "TabPFNRegressor": TabPFNRegressor}[
            name
        ]
    raise AttributeError(name)
