"""Fine-tuning smoke tests: loss decreases, snapshots load, frozen params stay put."""

import numpy as np
import pytest

from multimodalpfn_tpu.datasets.synthetic import toy_classification, toy_regression


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """Small random base checkpoint in reference torch format."""
    import jax

    from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
    from multimodalpfn_tpu.models.loading import save_model
    from multimodalpfn_tpu.models.params import init_params

    path = tmp_path_factory.mktemp("ckpt") / "base.ckpt"
    cfg = ModelConfig(
        emsize=24, nhead=6, nhid_factor=4, nlayers=2, n_out=10, max_num_classes=10,
        mixer=MixerConfig("MGM+CAP", mgm_heads=2, cap_heads=2, in_dim=96),
    )
    params = init_params(jax.random.PRNGKey(0), cfg, model_seed=0)
    save_model(path, params, cfg)
    return path


def test_finetune_classification_learns(tiny_ckpt, tmp_path):
    from multimodalpfn_tpu.train.finetune import fine_tune_mmpfn

    X, y = toy_classification(n=100, n_classes=3, nan_share=0.0, seed=0)
    out = tmp_path / "finetuned.ckpt"
    hist = fine_tune_mmpfn(
        mixer_type="none",
        mgm_heads=2,
        cap_heads=2,
        features_per_group=1,
        path_to_base_model=tiny_ckpt,
        save_path_to_fine_tuned_model=out,
        finetuning_config={"max_steps": 8, "learning_rate": 3e-4,
                           "validate_every_n_steps": 2},
        validation_metric="log_loss",
        task_type="multiclass",
        X_train=X,
        y_train=y,
        random_seed=0,
        freeze_input=True,
    )
    assert out.exists()
    assert hist["steps"] == 8
    assert len(hist["train_loss"]) == 8
    # training reduces loss on a learnable toy problem (random init, high lr)
    assert hist["train_loss"][-1] < hist["train_loss"][0]

    # the saved snapshot round-trips through the reference-format loader and the
    # estimator can consume it
    from multimodalpfn_tpu import TabPFNClassifier

    clf = TabPFNClassifier(model_path=out, n_estimators=2, random_state=0)
    clf.fit(X[:70], y[:70])
    proba = clf.predict_proba(X[70:])
    assert proba.shape == (30, 3)


def test_finetune_freezes_input_encoders(tiny_ckpt, tmp_path):
    import jax
    import torch

    from multimodalpfn_tpu.train.finetune import fine_tune_mmpfn

    X, y = toy_classification(n=80, n_classes=2, nan_share=0.0, seed=1)
    out = tmp_path / "ft.ckpt"
    fine_tune_mmpfn(
        mixer_type="none", mgm_heads=2, cap_heads=2, features_per_group=1,
        path_to_base_model=tiny_ckpt, save_path_to_fine_tuned_model=out,
        finetuning_config={"max_steps": 3, "learning_rate": 1e-2,
                           "validate_every_n_steps": 10, "optimizer": "adamw"},
        validation_metric="accuracy", task_type="binary",
        X_train=X, y_train=y, random_seed=0, freeze_input=True,
    )
    from multimodalpfn_tpu.models.loading import load_model, load_native
    from multimodalpfn_tpu.train.snapshots import wait_for_pending_snapshots

    base = load_model(tiny_ckpt, mixer_type="none").params
    # the orbax snapshot holds the final trained state unconditionally (the
    # torch-format file is best-by-validation, as in the reference); it is
    # written fire-and-forget, so an immediate reload joins the writer first
    wait_for_pending_snapshots()
    tuned, _cfg, extras = load_native(str(out) + ".orbax")
    np.testing.assert_array_equal(np.asarray(base["encoder"]["w"]), tuned["encoder"]["w"])
    np.testing.assert_array_equal(np.asarray(base["y_encoder"]["w"]), tuned["y_encoder"]["w"])
    assert not np.allclose(
        np.asarray(base["decoder"]["w2"]), tuned["decoder"]["w2"]
    ), "decoder should have trained"
    assert "best_val_error" in extras


def test_finetune_multimodal_and_regression(tiny_ckpt, tmp_path):
    import jax

    from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
    from multimodalpfn_tpu.models.loading import save_model
    from multimodalpfn_tpu.models.params import init_params
    from multimodalpfn_tpu.train.finetune import fine_tune_mmpfn

    # multimodal classification
    rng = np.random.default_rng(0)
    X, y = toy_classification(n=80, n_classes=3, nan_share=0.0, seed=2)
    emb = rng.normal(size=(80, 1, 96)).astype(np.float32)
    out = tmp_path / "mm.ckpt"
    hist = fine_tune_mmpfn(
        mixer_type="MGM+CAP", mgm_heads=2, cap_heads=2, features_per_group=1,
        path_to_base_model=tiny_ckpt, save_path_to_fine_tuned_model=out,
        finetuning_config={"max_steps": 3, "learning_rate": 1e-4,
                           "validate_every_n_steps": 3},
        validation_metric="accuracy", task_type="multiclass",
        X_train=X, y_train=y, image_train=emb, random_seed=0, freeze_input=True,
    )
    assert np.isfinite(hist["train_loss"]).all()

    # regression with bar-distribution loss
    cfg = ModelConfig(
        emsize=24, nhead=6, nhid_factor=4, nlayers=2, n_out=8, max_num_classes=0,
    )
    params = init_params(jax.random.PRNGKey(1), cfg, model_seed=1)
    reg_ckpt = tmp_path / "reg_base.ckpt"
    save_model(reg_ckpt, params, cfg, criterion_borders=np.linspace(-6, 6, 9))
    Xr, yr = toy_regression(n=80, nan_share=0.0, seed=3)
    outr = tmp_path / "reg.ckpt"
    hist = fine_tune_mmpfn(
        mixer_type="none", mgm_heads=2, cap_heads=2, features_per_group=1,
        path_to_base_model=reg_ckpt, save_path_to_fine_tuned_model=outr,
        finetuning_config={"max_steps": 3, "learning_rate": 1e-4,
                           "validate_every_n_steps": 3},
        validation_metric="rmse", task_type="regression",
        X_train=Xr, y_train=yr, random_seed=0,
    )
    assert np.isfinite(hist["train_loss"]).all()
