"""Vmapped multi-run fine-tuning: equivalence of shapes, per-run independence,
and dp-mesh sharding (the 'vmapped HPO trials' path)."""

import numpy as np
import pytest

from multimodalpfn_tpu.datasets.synthetic import toy_multimodal_classification


def _tiny_base(tmp_path):
    import jax

    from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
    from multimodalpfn_tpu.models.loading import save_model
    from multimodalpfn_tpu.models.params import init_params

    path = tmp_path / "base.ckpt"
    cfg = ModelConfig(
        emsize=24, nhead=6, nhid_factor=4, nlayers=2, n_out=10, max_num_classes=10,
        mixer=MixerConfig("MGM+CAP", mgm_heads=2, cap_heads=2, in_dim=96),
    )
    save_model(path, init_params(jax.random.PRNGKey(0), cfg, model_seed=0), cfg)
    return path


def test_fine_tune_batched_runs(tmp_path):
    from multimodalpfn_tpu.train.finetune_batch import fine_tune_batched

    base = _tiny_base(tmp_path)
    X, emb, y = toy_multimodal_classification(n=80, n_classes=3, emb_dim=96, seed=0)
    out = fine_tune_batched(
        mixer_type="MGM+CAP",
        mgm_heads=2,
        cap_heads=2,
        features_per_group=1,
        path_to_base_model=str(base),
        X=X,
        image=emb,
        y=y,
        seeds=[0, 1, 2],
        finetuning_config={"max_steps": 3, "validate_every_n_steps": 3},
    )
    hist = out["history"]
    losses = np.asarray(hist["train_loss"])  # (steps, runs)
    assert losses.shape == (3, 3)
    assert np.isfinite(losses).all()
    # runs have different mixer inits + different splits -> different losses
    assert not np.allclose(losses[:, 0], losses[:, 1])
    # per-run mixer params differ, base weights identical across runs
    p = out["params_stacked"]
    mgm_w = np.asarray(p["mixer"]["mgm"]["w1"])
    assert not np.allclose(mgm_w[0], mgm_w[1])
    enc_w = np.asarray(p["encoder"]["w"])
    np.testing.assert_allclose(enc_w[0], enc_w[1], atol=1e-6)
    assert len(hist["best_val_error"]) == 3


def test_fine_tune_batched_reduces_val_error(tmp_path):
    """Learning-quality gate (round-5): the vmapped sweep must actually LEARN,
    not merely produce finite losses of the right shape — the round-4 zero-lr
    bug (`train/step.py` warmup normalization) passed every shape/finiteness
    assertion for three rounds. On a task whose embeddings carry strong class
    signal, fine-tuning a random-init model must beat the initial validation
    error by a clear margin; with a constant-zero learning rate the params
    never move and this fails."""
    from multimodalpfn_tpu.train.finetune_batch import fine_tune_batched

    base = _tiny_base(tmp_path)
    X, emb, y = toy_multimodal_classification(n=100, n_classes=3, emb_dim=96, seed=3)
    out = fine_tune_batched(
        mixer_type="MGM+CAP",
        mgm_heads=2,
        cap_heads=2,
        features_per_group=1,
        path_to_base_model=str(base),
        X=X,
        image=emb,
        y=y,
        seeds=[0, 1],
        finetuning_config={
            "max_steps": 30,
            "validate_every_n_steps": 5,
            "learning_rate": 3e-3,
        },
    )
    hist = out["history"]
    initial = np.asarray(hist["val_error"][0][1])  # step-0 validation, per run
    best = np.asarray(hist["best_val_error"])
    # per-run improvement with a robust margin: random-init on a 3-class task
    # sits near error 0.66; the embedding signal is near-separable
    assert (best < initial - 0.1).all(), (
        f"fine-tuning did not improve validation: initial {initial}, best {best}"
    )


def test_fine_tune_batched_on_mesh(tmp_path):
    """Runs shard over dp on the virtual 8-device mesh."""
    import jax

    from multimodalpfn_tpu.parallel.mesh import make_mesh
    from multimodalpfn_tpu.train.finetune_batch import fine_tune_batched

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs >=4 virtual devices")
    base = _tiny_base(tmp_path)
    X, emb, y = toy_multimodal_classification(n=60, n_classes=2, emb_dim=96, seed=1)
    mesh = make_mesh(4, mp=1)
    out = fine_tune_batched(
        mixer_type="MGM+CAP",
        mgm_heads=2,
        cap_heads=2,
        features_per_group=1,
        path_to_base_model=str(base),
        X=X,
        image=emb,
        y=y,
        seeds=[0, 1, 2, 3],
        finetuning_config={"max_steps": 2, "validate_every_n_steps": 2},
        mesh=mesh,
    )
    assert np.isfinite(np.asarray(out["history"]["train_loss"])).all()


@pytest.mark.slow
def test_fine_tune_batched_on_mesh_published_geometry(tmp_path):
    """Batched fine-tuning sharded over the virtual 8-device mesh at the
    PUBLISHED architecture (192/768, 6 heads, 12 layers — reference
    `model/config.py:25-50`), short sequences. Deepens the multichip gate
    beyond one train step (round-3 verdict #6)."""
    import jax

    from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
    from multimodalpfn_tpu.models.loading import save_model
    from multimodalpfn_tpu.models.params import init_params
    from multimodalpfn_tpu.parallel.mesh import make_mesh
    from multimodalpfn_tpu.train.finetune_batch import fine_tune_batched

    if len(jax.devices()) < 8:
        pytest.skip("needs >=8 virtual devices")
    path = tmp_path / "published.ckpt"
    cfg = ModelConfig(
        emsize=192, nhead=6, nhid_factor=4, nlayers=12, n_out=10,
        max_num_classes=10,
        mixer=MixerConfig("MGM+CAP", mgm_heads=16, cap_heads=8, in_dim=768),
    )
    save_model(path, init_params(jax.random.PRNGKey(0), cfg, model_seed=0), cfg)
    X, emb, y = toy_multimodal_classification(
        n=64, n_classes=3, emb_dim=768, seed=2
    )
    mesh = make_mesh(8, mp=1)
    out = fine_tune_batched(
        mixer_type="MGM+CAP",
        mgm_heads=16,
        cap_heads=8,
        features_per_group=1,
        path_to_base_model=str(path),
        X=X,
        image=emb,
        y=y,
        seeds=[0, 1, 2, 3, 4, 5, 6, 7],
        finetuning_config={"max_steps": 3, "validate_every_n_steps": 3},
        mesh=mesh,
    )
    losses = np.asarray(out["history"]["train_loss"])
    assert losses.shape == (3, 8)
    assert np.isfinite(losses).all()
    assert len(out["history"]["best_val_error"]) == 8
