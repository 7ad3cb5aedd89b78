"""Cross-call compiled-program reuse in fine_tune_mmpfn.

The reference HPO protocol re-runs fine-tuning grid x 5 seeds times
(`run.py:26-201`); each run used to re-pay the full XLA compile. The program
cache keys on the traced computation only — in particular the subspace noise
table rides as a traced argument so different random seeds share one program.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
    from multimodalpfn_tpu.models.loading import save_model
    from multimodalpfn_tpu.models.params import init_params

    path = tmp_path_factory.mktemp("ckpt") / "base.ckpt"
    cfg = ModelConfig(
        emsize=24, nhead=6, nhid_factor=4, nlayers=2, n_out=10, max_num_classes=10,
        mixer=MixerConfig("MGM+CAP", mgm_heads=2, cap_heads=2, in_dim=96),
    )
    save_model(path, init_params(jax.random.PRNGKey(0), cfg, model_seed=3), cfg)
    return path


def _run(tiny_ckpt, tmp_path, seed, tag):
    from multimodalpfn_tpu.train.finetune import fine_tune_mmpfn

    rng = np.random.default_rng(0)
    X = rng.normal(size=(48, 5)).astype(np.float32)
    emb = rng.normal(size=(48, 1, 96)).astype(np.float32)
    y = rng.integers(0, 3, size=48)
    return fine_tune_mmpfn(
        mixer_type="MGM+CAP", mgm_heads=2, cap_heads=2, features_per_group=1,
        path_to_base_model=tiny_ckpt,
        save_path_to_fine_tuned_model=tmp_path / f"ft{tag}.ckpt",
        finetuning_config={"max_steps": 2, "validate_every_n_steps": 1},
        X_train=X, image_train=emb, y_train=y,
        random_seed=seed, freeze_input=True, logger_level=30,
    )


def test_programs_shared_across_seeds(tiny_ckpt, tmp_path):
    from multimodalpfn_tpu.train import finetune as ft

    ft._PROGRAM_CACHE.clear()
    h0 = _run(tiny_ckpt, tmp_path, seed=0, tag="a")
    assert len(ft._PROGRAM_CACHE) == 1
    h1 = _run(tiny_ckpt, tmp_path, seed=7, tag="b")
    # a different random seed must NOT mint a new program set
    assert len(ft._PROGRAM_CACHE) == 1
    assert np.isfinite(h0["train_loss"]).all() and np.isfinite(h1["train_loss"]).all()
    # same-seed re-run is bit-exact through the cached programs
    h2 = _run(tiny_ckpt, tmp_path, seed=0, tag="c")
    assert h2["train_loss"] == h0["train_loss"]
    assert h2["val_error"] == h0["val_error"]


def test_noise_argument_matches_baked_constant(tiny_ckpt):
    """val_forward with the noise table passed as an argument must equal the
    forward that bakes get_subspace_noise(model_seed, .) in as a constant."""
    from multimodalpfn_tpu.models.loading import load_model
    from multimodalpfn_tpu.models.params import get_subspace_noise
    from multimodalpfn_tpu.models.transformer import forward_train_test
    from multimodalpfn_tpu.train.finetune import _n_episode_feature_tokens

    loaded = load_model(tiny_ckpt, mixer_type="MGM+CAP", mgm_heads=2, cap_heads=2)
    cfg, params = loaded.config, loaded.params
    rng = np.random.default_rng(1)
    xtr = jnp.asarray(rng.normal(size=(1, 30, 5)), jnp.float32)
    ytr = jnp.asarray(rng.integers(0, 3, size=(1, 30)), jnp.float32)
    xte = jnp.asarray(rng.normal(size=(1, 10, 5)), jnp.float32)
    itr = jnp.asarray(rng.normal(size=(1, 30, 1, 96)), jnp.float32)
    ite = jnp.asarray(rng.normal(size=(1, 10, 1, 96)), jnp.float32)

    f_total = _n_episode_feature_tokens(cfg, 5, 1)
    noise = jnp.asarray(
        get_subspace_noise(cfg.model_seed, f_total, cfg.emsize // 4)
    )
    baked = forward_train_test(params, cfg, xtr, ytr, xte, itr, ite)
    as_arg = forward_train_test(
        params, cfg, xtr, ytr, xte, itr, ite, feat_pos_noise=noise
    )
    np.testing.assert_allclose(np.asarray(as_arg), np.asarray(baked), rtol=1e-6)


@pytest.mark.parametrize(
    "mixer_kw, n_tab, n_img",
    [
        (dict(mixer_type="MGM", mgm_heads=3, cap_heads=2), 5, 2),
        (dict(mixer_type="MGM+CAP", mgm_heads=2, cap_heads=3), 5, 2),
        (dict(mixer_type="MoE", mgm_heads=4, cap_heads=2), 5, 2),
        (dict(mixer_type="MGM+CAP", mgm_heads=2, cap_heads=2), 0, 1),  # image-only
        (dict(mixer_type="none", mgm_heads=2, cap_heads=2), 7, 0),  # tabular-only
    ],
)
def test_token_count_formula_matches_forward(mixer_kw, n_tab, n_img):
    """_n_episode_feature_tokens must agree with the real forward: a wrong
    count makes the noise table's shape incompatible (broadcast error)."""
    from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
    from multimodalpfn_tpu.models.params import get_subspace_noise, init_params
    from multimodalpfn_tpu.models.transformer import forward_train_test
    from multimodalpfn_tpu.train.finetune import _n_episode_feature_tokens

    cfg = ModelConfig(
        emsize=24, nhead=6, nhid_factor=4, nlayers=1, n_out=10, max_num_classes=10,
        features_per_group=2,
        mixer=MixerConfig(in_dim=96, **mixer_kw),
    )
    params = init_params(jax.random.PRNGKey(0), cfg, model_seed=0)
    f_total = _n_episode_feature_tokens(cfg, n_tab, n_img)
    assert f_total is not None and f_total > 0
    rng = np.random.default_rng(2)
    xtr = (
        None if n_tab == 0
        else jnp.asarray(rng.normal(size=(1, 20, n_tab)), jnp.float32)
    )
    xte = (
        None if n_tab == 0
        else jnp.asarray(rng.normal(size=(1, 8, n_tab)), jnp.float32)
    )
    ytr = jnp.asarray(rng.integers(0, 3, size=(1, 20)), jnp.float32)
    itr = ite = None
    if n_img:
        itr = jnp.asarray(rng.normal(size=(1, 20, n_img, 96)), jnp.float32)
        ite = jnp.asarray(rng.normal(size=(1, 8, n_img, 96)), jnp.float32)
    noise = jnp.asarray(get_subspace_noise(0, f_total, cfg.emsize // 4))
    out = forward_train_test(
        params, cfg, xtr, ytr, xte, itr, ite, feat_pos_noise=noise
    )
    assert np.isfinite(np.asarray(out)).all()


def test_sample_indices_matches_sample_rows():
    """sample() and sample_indices() must draw identical episodes from the
    same fold stream — the device-gather training path depends on it."""
    from multimodalpfn_tpu.train.data import EpisodeSampler

    rng = np.random.default_rng(0)
    X = rng.normal(size=(53, 4)).astype(np.float32)
    im = rng.normal(size=(53, 1, 8)).astype(np.float32)
    y = rng.integers(0, 3, size=53)
    a = EpisodeSampler(X=X, image=im, y=y, is_classification=True, seed=7)
    b = EpisodeSampler(X=X, image=im, y=y, is_classification=True, seed=7)
    for _ in range(12):  # crosses a fold-stream reshuffle boundary (n_splits=10)
        rows = a.sample(2)
        idx = b.sample_indices(2)
        np.testing.assert_array_equal(rows["x_train"], X[idx["train_idx"]])
        np.testing.assert_array_equal(rows["x_test"], X[idx["test_idx"]])
        np.testing.assert_array_equal(rows["y_train"], y[idx["train_idx"]].astype(np.float32))
        np.testing.assert_array_equal(rows["image_train"], im[idx["train_idx"]])
        assert idx["train_idx"].shape == (2, a.train_size)
        assert idx["test_idx"].shape == (2, a.test_size)
