"""multimodalpfn_tpu — TPU-native multimodal TabPFN framework.

A JAX/XLA/Pallas re-design of too-z/MultiModalPFN: the TabPFN-v2 dual-axis
in-context transformer with multimodal mixers (MGM / CAP / MoE), sklearn-style
estimators, episode fine-tuning, and mesh-sharded batched HPO.
"""

__version__ = "0.1.0"

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
