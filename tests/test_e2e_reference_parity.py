"""END-TO-END parity: the reference MMPFNClassifier (torch, CPU) and ours produce
matching predict_proba on the same checkpoint, data, and random_state.

This closes the loop over every layer at once: ckpt loading, ensemble RNG
protocol, member preprocessing, on-device encoders, the transformer forward,
and the predict post-processing. Fingerprints are disabled (the one documented
hash divergence)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")
pytest.importorskip("mmpfn.models.mmpfn.classifier")


def _shim_sklearn_compat():
    from sklearn.base import BaseEstimator
    from sklearn.utils.validation import validate_data

    if not hasattr(BaseEstimator, "_validate_data"):

        def _validate_data(self, X="no_validation", y="no_validation", **kw):
            kw.pop("estimator", None)
            if "force_all_finite" in kw:
                kw["ensure_all_finite"] = kw.pop("force_all_finite")
            return validate_data(self, X, y, **kw)

        BaseEstimator._validate_data = _validate_data

    import sklearn.utils.validation as skval

    import mmpfn.models.mmpfn.utils as ref_utils

    def _check_array_compat(*args, **kw):
        if "force_all_finite" in kw:
            kw["ensure_all_finite"] = kw.pop("force_all_finite")
        return skval.check_array(*args, **kw)

    ref_utils.check_array = _check_array_compat


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """Reference-format checkpoint from a tiny randomized torch reference model."""
    from tools.gen_golden import build_reference_model

    from multimodalpfn_tpu.models.loading import model_config_to_ckpt_config
    from multimodalpfn_tpu.models.config import ModelConfig

    model = build_reference_model(
        seed=3, nlayers=2, emsize=24, nhead=6, nhid=96, features_per_group=1,
        max_num_classes=10, n_out=10, mixer_type=None,
    )
    cfg = ModelConfig(emsize=24, nhead=6, nhid_factor=4, nlayers=2, n_out=10)
    path = tmp_path_factory.mktemp("e2e") / "tiny.ckpt"
    torch.save(
        {"state_dict": model.state_dict(), "config": model_config_to_ckpt_config(cfg)},
        path,
    )
    return path


@pytest.mark.slow
def test_classifier_predict_proba_matches_reference(tiny_ckpt):
    _shim_sklearn_compat()
    from mmpfn.models.mmpfn.classifier import MMPFNClassifier as RefClf
    from mmpfn.models.mmpfn.constants import ModelInterfaceConfig as RefMIC
    from mmpfn.models.mmpfn.preprocessing import PreprocessorConfig as RefPC

    from multimodalpfn_tpu import MMPFNClassifier
    from multimodalpfn_tpu.estimator.interface_config import ModelInterfaceConfig
    from multimodalpfn_tpu.preprocess.ensemble import PreprocessorConfig

    rng = np.random.default_rng(0)
    n, F = 70, 5
    X = rng.normal(size=(n, F))
    X[:, 0] = rng.integers(0, 3, size=n)
    y = rng.integers(0, 3, size=n)
    Xtr, Xte, ytr = X[:55], X[55:], y[:55]

    # identical member recipes, fingerprint disabled (hash divergence documented)
    ref_cfgs = [
        RefPC("quantile_uni_coarse", append_original=True,
              categorical_name="ordinal_very_common_categories_shuffled",
              global_transformer_name="svd"),
        RefPC("none", categorical_name="numeric"),
    ]
    our_cfgs = [
        PreprocessorConfig("quantile_uni_coarse", append_original=True,
                           categorical_name="ordinal_very_common_categories_shuffled",
                           global_transformer_name="svd"),
        PreprocessorConfig("none", categorical_name="numeric"),
    ]

    ref = RefClf(
        model_path=str(tiny_ckpt), mixer_type="MGM", mgm_heads=1, cap_heads=1,
        features_per_group=1, n_estimators=2, random_state=0, device="cpu",
        inference_config=RefMIC(FINGERPRINT_FEATURE=False, PREPROCESS_TRANSFORMS=ref_cfgs),
    )
    ref.fit(Xtr, None, ytr)
    want = ref.predict_proba(Xte, None)

    ours = MMPFNClassifier(
        model_path=str(tiny_ckpt), mixer_type="none", mgm_heads=1, cap_heads=1,
        features_per_group=1, n_estimators=2, random_state=0,
        inference_config=ModelInterfaceConfig(
            FINGERPRINT_FEATURE=False, PREPROCESS_TRANSFORMS=our_cfgs
        ),
    )
    ours.fit(Xtr, None, ytr)
    got = ours.predict_proba(Xte, None)

    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.fixture(scope="module")
def tiny_reg_ckpt(tmp_path_factory):
    import numpy as np

    from tools.gen_golden import build_reference_model

    from multimodalpfn_tpu.models.config import ModelConfig
    from multimodalpfn_tpu.models.loading import model_config_to_ckpt_config

    model = build_reference_model(
        seed=5, nlayers=2, emsize=24, nhead=6, nhid=96, features_per_group=1,
        max_num_classes=0, n_out=8, mixer_type=None,
    )
    cfg = ModelConfig(
        emsize=24, nhead=6, nhid_factor=4, nlayers=2, n_out=8, max_num_classes=0,
        num_buckets=8,
    )
    sd = dict(model.state_dict())
    sd["criterion.borders"] = torch.from_numpy(
        np.linspace(-4.0, 4.0, 9).astype(np.float32)
    )
    sd["criterion.losses_per_bucket"] = torch.zeros(8)
    path = tmp_path_factory.mktemp("e2e_reg") / "tiny_reg.ckpt"
    torch.save(
        {"state_dict": sd, "config": model_config_to_ckpt_config(cfg)}, path
    )
    return path


@pytest.mark.slow
def test_regressor_predict_matches_reference(tiny_reg_ckpt):
    _shim_sklearn_compat()
    from mmpfn.models.mmpfn.constants import ModelInterfaceConfig as RefMIC
    from mmpfn.models.mmpfn.preprocessing import PreprocessorConfig as RefPC
    from mmpfn.models.mmpfn.regressor import MMPFNRegressor as RefReg

    from multimodalpfn_tpu import MMPFNRegressor
    from multimodalpfn_tpu.estimator.interface_config import ModelInterfaceConfig
    from multimodalpfn_tpu.preprocess.ensemble import PreprocessorConfig

    rng = np.random.default_rng(1)
    n, F = 60, 4
    X = rng.normal(size=(n, F))
    y = X @ rng.normal(size=F) + 0.1 * rng.normal(size=n)
    Xtr, Xte, ytr = X[:45], X[45:], y[:45]

    ref_cfgs = [RefPC("quantile_uni", append_original=True,
                      categorical_name="ordinal_very_common_categories_shuffled",
                      global_transformer_name="svd"),
                RefPC("safepower", categorical_name="onehot")]
    our_cfgs = [PreprocessorConfig("quantile_uni", append_original=True,
                                   categorical_name="ordinal_very_common_categories_shuffled",
                                   global_transformer_name="svd"),
                PreprocessorConfig("safepower", categorical_name="onehot")]

    ref = RefReg(
        model_path=str(tiny_reg_ckpt), mixer_type="MGM", mgm_heads=1, cap_heads=1,
        features_per_group=1, n_estimators=4, random_state=0, device="cpu",
        inference_config=RefMIC(FINGERPRINT_FEATURE=False, PREPROCESS_TRANSFORMS=ref_cfgs),
    )
    ref.fit(Xtr, None, ytr)
    want_mean = ref.predict(Xte, None)
    want_full = ref.predict(Xte, None, output_type="main")

    ours = MMPFNRegressor(
        model_path=str(tiny_reg_ckpt), mixer_type="none", mgm_heads=1, cap_heads=1,
        features_per_group=1, n_estimators=4, random_state=0,
        inference_config=ModelInterfaceConfig(
            FINGERPRINT_FEATURE=False, PREPROCESS_TRANSFORMS=our_cfgs
        ),
    )
    ours.fit(Xtr, None, ytr)
    got_mean = ours.predict(Xte, None)
    got_full = ours.predict(Xte, None, output_type="main")

    np.testing.assert_allclose(got_mean, np.asarray(want_mean), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        got_full["median"], np.asarray(want_full["median"]), rtol=2e-3, atol=2e-3
    )
    for q_got, q_want in zip(got_full["quantiles"], want_full["quantiles"]):
        np.testing.assert_allclose(q_got, np.asarray(q_want), rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_multimodal_classifier_matches_reference(tmp_path):
    """Image-embedding path end-to-end: mixer weights shipped IN the checkpoint
    (as a fine-tuned ckpt would), so both sides load identical MGM+CAP mixers."""
    _shim_sklearn_compat()
    from tools.gen_golden import build_reference_model

    from mmpfn.models.mmpfn.classifier import MMPFNClassifier as RefClf
    from mmpfn.models.mmpfn.constants import ModelInterfaceConfig as RefMIC
    from mmpfn.models.mmpfn.preprocessing import PreprocessorConfig as RefPC

    from multimodalpfn_tpu import MMPFNClassifier
    from multimodalpfn_tpu.estimator.interface_config import ModelInterfaceConfig
    from multimodalpfn_tpu.models.config import ModelConfig
    from multimodalpfn_tpu.models.loading import model_config_to_ckpt_config
    from multimodalpfn_tpu.preprocess.ensemble import PreprocessorConfig

    model = build_reference_model(
        seed=9, nlayers=2, emsize=24, nhead=6, nhid=96, features_per_group=1,
        max_num_classes=10, n_out=10, mixer_type="MGM+CAP", mgm_heads=2, cap_heads=2,
    )
    cfg = ModelConfig(emsize=24, nhead=6, nhid_factor=4, nlayers=2, n_out=10)
    path = tmp_path / "mm.ckpt"
    torch.save(
        {"state_dict": model.state_dict(), "config": model_config_to_ckpt_config(cfg)},
        path,
    )

    rng = np.random.default_rng(2)
    n, F = 60, 4
    X = rng.normal(size=(n, F))
    emb = rng.normal(size=(n, 1, 96)).astype(np.float32)
    y = rng.integers(0, 3, size=n)
    Xtr, Xte, ytr = X[:45], X[45:], y[:45]

    mic_kw = dict(FINGERPRINT_FEATURE=False)
    ref = RefClf(
        model_path=str(path), mixer_type="MGM+CAP", mgm_heads=2, cap_heads=2,
        features_per_group=1, n_estimators=2, random_state=0, device="cpu",
        inference_config=RefMIC(
            **mic_kw, PREPROCESS_TRANSFORMS=[RefPC("none", categorical_name="numeric")]
        ),
    )
    ref.fit(Xtr, torch.from_numpy(emb[:45]), ytr)
    want = ref.predict_proba(Xte, torch.from_numpy(emb[45:]))

    ours = MMPFNClassifier(
        model_path=str(path), mixer_type="MGM+CAP", mgm_heads=2, cap_heads=2,
        features_per_group=1, n_estimators=2, random_state=0,
        inference_config=ModelInterfaceConfig(
            **mic_kw,
            PREPROCESS_TRANSFORMS=[PreprocessorConfig("none", categorical_name="numeric")],
        ),
    )
    ours.fit(Xtr, emb[:45], ytr)
    got = ours.predict_proba(Xte, emb[45:])
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_full_published_architecture_matches_reference(tmp_path):
    """PUBLISHED-SHAPE e2e parity: 12 layers / emsize 192 / nhead 6 / nhid 768 /
    features_per_group 2 / n_estimators 4 / MGM+CAP mixers — the exact config of
    the shipped tabpfn-v2 checkpoints (reference `model/config.py:25-50`,
    `loading.py:492-496`), on shared random weights. Catches scale-dependent
    bugs (bf16 accumulation policy, subspace-noise table size) that the tiny
    2-layer fixtures cannot."""
    _shim_sklearn_compat()
    from tools.gen_golden import build_reference_model

    from mmpfn.models.mmpfn.classifier import MMPFNClassifier as RefClf
    from mmpfn.models.mmpfn.constants import ModelInterfaceConfig as RefMIC
    from mmpfn.models.mmpfn.preprocessing import PreprocessorConfig as RefPC

    from multimodalpfn_tpu import MMPFNClassifier
    from multimodalpfn_tpu.estimator.interface_config import ModelInterfaceConfig
    from multimodalpfn_tpu.models.config import ModelConfig
    from multimodalpfn_tpu.models.loading import model_config_to_ckpt_config
    from multimodalpfn_tpu.preprocess.ensemble import PreprocessorConfig

    model = build_reference_model(
        seed=11, nlayers=12, emsize=192, nhead=6, nhid=768, features_per_group=2,
        max_num_classes=10, n_out=10, mixer_type="MGM+CAP", mgm_heads=4, cap_heads=2,
    )
    cfg = ModelConfig(
        emsize=192, nhead=6, nhid_factor=4, nlayers=12, features_per_group=2,
        n_out=10,
    )
    path = tmp_path / "published_shape.ckpt"
    torch.save(
        {"state_dict": model.state_dict(), "config": model_config_to_ckpt_config(cfg)},
        path,
    )

    rng = np.random.default_rng(4)
    n, F = 120, 11  # odd F exercises the features_per_group=2 padding
    X = rng.normal(size=(n, F))
    X[:, 0] = rng.integers(0, 4, size=n)
    emb = rng.normal(size=(n, 1, 768)).astype(np.float32)
    y = rng.integers(0, 4, size=n)
    ntr = 90
    Xtr, Xte, ytr = X[:ntr], X[ntr:], y[:ntr]

    ref_cfgs = [
        RefPC("quantile_uni_coarse", append_original=True,
              categorical_name="ordinal_very_common_categories_shuffled",
              global_transformer_name="svd"),
        RefPC("none", categorical_name="numeric"),
    ]
    our_cfgs = [
        PreprocessorConfig("quantile_uni_coarse", append_original=True,
                           categorical_name="ordinal_very_common_categories_shuffled",
                           global_transformer_name="svd"),
        PreprocessorConfig("none", categorical_name="numeric"),
    ]

    ref = RefClf(
        model_path=str(path), mixer_type="MGM+CAP", mgm_heads=4, cap_heads=2,
        features_per_group=2, n_estimators=4, random_state=0, device="cpu",
        inference_config=RefMIC(FINGERPRINT_FEATURE=False,
                                PREPROCESS_TRANSFORMS=ref_cfgs),
    )
    ref.fit(Xtr, torch.from_numpy(emb[:ntr]), ytr)
    want = np.asarray(ref.predict_proba(Xte, torch.from_numpy(emb[ntr:])))

    ours = MMPFNClassifier(
        model_path=str(path), mixer_type="MGM+CAP", mgm_heads=4, cap_heads=2,
        features_per_group=2, n_estimators=4, random_state=0,
        inference_config=ModelInterfaceConfig(
            FINGERPRINT_FEATURE=False, PREPROCESS_TRANSFORMS=our_cfgs
        ),
    )
    ours.fit(Xtr, emb[:ntr], ytr)
    got = ours.predict_proba(Xte, emb[ntr:])

    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
    assert (np.argmax(got, 1) == np.argmax(want, 1)).mean() == 1.0
