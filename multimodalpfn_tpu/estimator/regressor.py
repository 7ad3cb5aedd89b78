"""MMPFNRegressor — sklearn-style multimodal in-context regressor.

API parity anchor: reference `mmpfn/models/mmpfn/regressor.py:84-765`
(`fit(X, image, y)`, `predict(X, image_test, output_type=...)`) with
`TabPFNRegressor` exposing the vanilla tabular API of the reference twin tree.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Literal, Sequence

import jax.numpy as jnp
import numpy as np
from sklearn.base import BaseEstimator, RegressorMixin

from multimodalpfn_tpu.estimator.base import (
    determine_precision,
    initialize_model,
    pipeline_requests,
)
from multimodalpfn_tpu.estimator.borders import (
    transform_borders_one,
    translate_probs_across_borders,
)
from multimodalpfn_tpu.estimator.data_utils import (
    fix_dtypes,
    infer_categorical_features,
    make_ordinal_encoder,
    validate_X_predict,
    validate_Xy_fit,
)
from multimodalpfn_tpu.estimator.inference import create_inference_engine
from multimodalpfn_tpu.estimator.interface_config import ModelInterfaceConfig
from multimodalpfn_tpu.models.bar_distribution import FullSupportBarDistribution
from multimodalpfn_tpu.preprocess.ensemble import (
    EnsembleConfig,
    default_regressor_preprocessor_configs,
)
from multimodalpfn_tpu.preprocess.steps import ReshapeFeatureDistributionsStep
from multimodalpfn_tpu.utils.rng import infer_random_state

_OUTPUT_TYPES = ("mean", "median", "mode", "quantiles")
_USABLE_OUTPUT_TYPES = (*_OUTPUT_TYPES, "full", "main")


class MMPFNRegressor(RegressorMixin, BaseEstimator):
    """Multimodal TabPFN-v2 regressor on TPU (bar-distribution head)."""

    def __init__(
        self,
        *,
        mixer_type: str = "MGM+CAP",
        mgm_heads: int = 8,
        cap_heads: int = 8,
        features_per_group: int = 1,
        n_estimators: int = 8,
        categorical_features_indices: Sequence[int] | None = None,
        softmax_temperature: float = 0.9,
        average_before_softmax: bool = False,
        model_path: str | Path | Literal["auto"] = "auto",
        device: str | Literal["auto"] = "auto",
        ignore_pretraining_limits: bool = False,
        inference_precision: str | Literal["autocast", "auto"] = "auto",
        fit_mode: Literal["low_memory", "fit_preprocessors", "fit_with_cache"] = "fit_preprocessors",
        memory_saving_mode: bool | Literal["auto"] | float | int = "auto",
        random_state: int | np.random.RandomState | np.random.Generator | None = 0,
        n_jobs: int = -1,
        inference_config: dict | ModelInterfaceConfig | None = None,
    ) -> None:
        super().__init__()
        self.n_estimators = n_estimators
        self.categorical_features_indices = categorical_features_indices
        self.softmax_temperature = softmax_temperature
        self.average_before_softmax = average_before_softmax
        self.model_path = model_path
        self.device = device
        self.ignore_pretraining_limits = ignore_pretraining_limits
        self.inference_precision = inference_precision
        self.fit_mode = fit_mode
        self.memory_saving_mode = memory_saving_mode
        self.random_state = random_state
        self.n_jobs = n_jobs
        self.inference_config = inference_config
        self.mixer_type = mixer_type
        self.mgm_heads = mgm_heads
        self.cap_heads = cap_heads
        self.features_per_group = features_per_group

    def _more_tags(self):
        return {"allow_nan": True}

    def __sklearn_tags__(self):
        tags = super().__sklearn_tags__()
        tags.input_tags.allow_nan = True
        tags.estimator_type = "regressor"
        return tags

    def fit(self, X, image: np.ndarray | None, y) -> "MMPFNRegressor":
        """reference `regressor.py:390-538`."""
        static_seed, rng = infer_random_state(self.random_state)

        loaded = initialize_model(
            model_path=self.model_path,
            which="regressor",
            static_seed=static_seed,
            mixer_type=self.mixer_type if image is not None else "none",
            mgm_heads=self.mgm_heads,
            cap_heads=self.cap_heads,
            features_per_group=self.features_per_group,
        )
        assert loaded.criterion_borders is not None, "regressor ckpt must have borders"
        self.bardist_ = FullSupportBarDistribution(
            jnp.asarray(np.asarray(loaded.criterion_borders, dtype=np.float32))
        )
        self.use_autocast_, forced = determine_precision(self.inference_precision)
        if forced is not None:
            self.use_autocast_ = forced == "bfloat16"

        self.interface_config_ = ModelInterfaceConfig.from_user_input(
            inference_config=self.inference_config
        )
        icfg = self.interface_config_

        outlier_std = icfg.OUTLIER_REMOVAL_STD
        if outlier_std == "auto":
            outlier_std = icfg._REGRESSION_DEFAULT_OUTLIER_REMOVAL_STD
        cfg = dataclasses.replace(
            loaded.config,
            remove_outliers=outlier_std is not None and outlier_std > 0,
            remove_outliers_sigma=float(outlier_std) if outlier_std else 12.0,
        )
        self.config_ = cfg
        self.params_ = loaded.params

        if X is not None:
            X, y, feature_names_in, n_features_in = validate_Xy_fit(
                X,
                y,
                estimator=self,
                max_num_samples=icfg.MAX_NUMBER_OF_SAMPLES,
                max_num_features=icfg.MAX_NUMBER_OF_FEATURES,
                ignore_pretraining_limits=self.ignore_pretraining_limits,
            )
            if feature_names_in is not None:
                self.feature_names_in_ = feature_names_in
            self.n_features_in_ = n_features_in
            X = fix_dtypes(X, cat_indices=self.categorical_features_indices)
            ord_encoder = make_ordinal_encoder()
            X = np.asarray(ord_encoder.fit_transform(X))
            self.preprocessor_ = ord_encoder
            self.inferred_categorical_indices_ = infer_categorical_features(
                X,
                provided=self.categorical_features_indices,
                min_samples_for_inference=icfg.MIN_NUMBER_SAMPLES_FOR_CATEGORICAL_INFERENCE,
                max_unique_for_category=icfg.MAX_UNIQUE_FOR_CATEGORICAL_FEATURES,
                min_unique_for_numerical=icfg.MIN_UNIQUE_FOR_NUMERICAL_FEATURES,
            )
            max_index = len(X)
        else:
            self.inferred_categorical_indices_ = []
            max_index = len(image)

        y = np.asarray(y, dtype=np.float64)

        # per-member target transforms (reference `regressor.py:477-493`)
        target_preprocessors = []
        for name in icfg.REGRESSION_Y_PREPROCESS_TRANSFORMS or (None,):
            if name is None:
                target_preprocessors.append(None)
            else:
                target_preprocessors.append(
                    ReshapeFeatureDistributionsStep.make_transformer(
                        name, num_examples=y.shape[0], random_state=static_seed
                    )
                )

        preprocess_transforms = icfg.PREPROCESS_TRANSFORMS
        ensemble_configs = EnsembleConfig.generate_for_regression(
            n=self.n_estimators,
            subsample_size=icfg.SUBSAMPLE_SAMPLES,
            add_fingerprint_feature=icfg.FINGERPRINT_FEATURE,
            feature_shift_decoder=icfg.FEATURE_SHIFT_METHOD,
            polynomial_features=icfg.POLYNOMIAL_FEATURES,
            max_index=max_index,
            preprocessor_configs=(
                preprocess_transforms
                if preprocess_transforms is not None
                else default_regressor_preprocessor_configs()
            ),
            target_transforms=target_preprocessors,
            random_state=rng,
        )
        assert len(ensemble_configs) == self.n_estimators

        # standardize y; renormalized criterion maps back to raw-y space
        # (reference `regressor.py:510-518`)
        mean, std = float(np.mean(y)), float(np.std(y))
        self.y_train_std_ = std + 1e-20
        self.y_train_mean_ = mean
        y = (y - self.y_train_mean_) / self.y_train_std_
        self.renormalized_criterion_ = FullSupportBarDistribution(
            self.bardist_.borders * self.y_train_std_ + self.y_train_mean_
        )

        self.executor_ = create_inference_engine(
            X_train=X,
            y_train=y,
            image_train=image,
            params=self.params_,
            cfg=self.config_,
            ensemble_configs=ensemble_configs,
            cat_ix=self.inferred_categorical_indices_,
            fit_mode=self.fit_mode,
            rng=rng,
            autocast=self.use_autocast_,
        )
        return self

    def predict(
        self,
        X,
        image_test: np.ndarray | None = None,
        *,
        output_type: Literal["mean", "median", "mode", "quantiles", "full", "main"] = "mean",
        quantiles: list[float] | None = None,
    ):
        """Member logits -> border transform -> probability translation -> average
        -> distribution statistics (reference `regressor.py:577-765`)."""
        return self._finalize_predict(
            self._dispatch_predict(X, image_test),
            output_type=output_type,
            quantiles=quantiles,
        )

    def predict_many(
        self,
        Xs,
        image_tests=None,
        *,
        output_type: Literal["mean", "median", "mode", "quantiles", "full", "main"] = "mean",
        quantiles: list[float] | None = None,
        max_in_flight: int = 2,
    ) -> list:
        """Pipelined ``predict`` over a request stream — the regressor twin of
        ``MMPFNClassifier.predict_proba_many`` (host work of request N+1
        overlaps device execution of request N; ``max_in_flight`` bounds the
        dispatched requests awaiting finalization; results exactly equal
        sequential predicts)."""
        return pipeline_requests(
            self._dispatch_predict,
            lambda h: self._finalize_predict(h, output_type=output_type, quantiles=quantiles),
            Xs,
            image_tests,
            max_in_flight,
        )

    def _dispatch_predict(self, X, image_test: np.ndarray | None):
        """Validation + host transforms + async engine dispatch (no device sync)."""
        from sklearn.utils.validation import check_is_fitted

        check_is_fitted(self)
        if X is not None:
            X = validate_X_predict(X, self)
            X = fix_dtypes(X, cat_indices=self.categorical_features_indices)
            X = np.asarray(self.preprocessor_.transform(X))
        return self.executor_.dispatch_outputs(X, image_test)

    def _finalize_predict(
        self,
        handle,
        *,
        output_type: str = "mean",
        quantiles: list[float] | None = None,
    ):
        if quantiles is None:
            quantiles = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
        else:
            assert all(isinstance(q, float) and 0 <= q <= 1 for q in quantiles)
        if output_type not in _USABLE_OUTPUT_TYPES:
            raise ValueError(f"Invalid output type: {output_type}")

        std_borders = np.asarray(self.bardist_.borders, dtype=np.float64)
        outputs, borders = [], []
        for output, config in self.executor_.finalize_outputs(handle):
            output = np.asarray(output, dtype=np.float64)
            if self.softmax_temperature != 1:
                output = output / self.softmax_temperature
            if config.target_transform is None:
                borders_t = std_borders.copy()
                logit_cancel_mask = None
            else:
                logit_cancel_mask, _desc, borders_t = transform_borders_one(
                    std_borders,
                    target_transform=config.target_transform,
                    repair_nan_borders_after_transform=self.interface_config_.FIX_NAN_BORDERS_AFTER_TARGET_TRANSFORM,
                )
            borders.append(borders_t)
            if logit_cancel_mask is not None:
                output = output.copy()
                output[..., logit_cancel_mask] = -np.inf
            outputs.append(output)

        translated = [
            translate_probs_across_borders(lo, frm=np.asarray(bt), to=std_borders)
            for lo, bt in zip(outputs, borders)
        ]
        stacked = np.stack(translated, axis=0)
        if self.average_before_softmax:
            logs = np.log(np.clip(stacked, 1e-300, None)).mean(axis=0)
            probs = np.exp(logs - logs.max(axis=-1, keepdims=True))
            probs = probs / probs.sum(axis=-1, keepdims=True)
        else:
            probs = stacked.mean(axis=0)
        logits = jnp.asarray(np.log(np.clip(probs, 1e-300, None)))

        crit = self.renormalized_criterion_

        def to_output(kind):
            if kind == "quantiles":
                return [np.asarray(crit.icdf(logits, q)) for q in quantiles]
            if kind == "mean":
                return np.asarray(crit.mean(logits))
            if kind == "median":
                return np.asarray(crit.median(logits))
            if kind == "mode":
                return np.asarray(crit.mode(logits))
            raise ValueError(kind)

        if output_type in ("full", "main"):
            out = {k: to_output(k) for k in _OUTPUT_TYPES}
            if output_type == "full":
                out = {"criterion": crit, "logits": np.asarray(logits), **out}
            return out
        return to_output(output_type)


class TabPFNRegressor(MMPFNRegressor):
    """Vanilla tabular-only TabPFN-v2 regressor API (reference twin tree)."""

    def __init__(self, **kwargs):
        kwargs.setdefault("mixer_type", "none")
        super().__init__(**kwargs)

    @classmethod
    def _get_param_names(cls):
        # sklearn introspects __init__; ours forwards **kwargs to the parent
        return MMPFNRegressor._get_param_names()

    def fit(self, X, y):  # type: ignore[override]
        return super().fit(X, None, y)

    def predict(self, X, **kw):  # type: ignore[override]
        return super().predict(X, None, **kw)
