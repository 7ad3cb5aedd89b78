"""The north-star sweep shape: 64 vmapped fine-tuning runs on an 8-device mesh
(BASELINE.json config 5) — tiny model on the virtual CPU mesh; the same code path
scales run-count × model size by chip memory on real hardware."""

import numpy as np
import pytest

import jax


@pytest.mark.slow
def test_64_vmapped_runs_on_8_device_mesh(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")

    from multimodalpfn_tpu.datasets.synthetic import toy_multimodal_classification
    from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
    from multimodalpfn_tpu.models.loading import save_model
    from multimodalpfn_tpu.models.params import init_params
    from multimodalpfn_tpu.parallel.mesh import make_mesh
    from multimodalpfn_tpu.train.finetune_batch import fine_tune_batched

    cfg = ModelConfig(
        emsize=24, nhead=6, nhid_factor=4, nlayers=2, n_out=10, max_num_classes=10,
        mixer=MixerConfig("MGM+CAP", mgm_heads=2, cap_heads=2, in_dim=96),
    )
    base = tmp_path / "base.ckpt"
    save_model(base, init_params(jax.random.PRNGKey(0), cfg, model_seed=0), cfg)

    X, emb, y = toy_multimodal_classification(n=60, n_classes=3, emb_dim=96, seed=0)
    mesh = make_mesh(8, mp=1)
    out = fine_tune_batched(
        mixer_type="MGM+CAP",
        mgm_heads=2,
        cap_heads=2,
        features_per_group=1,
        path_to_base_model=str(base),
        X=X,
        image=emb,
        y=y,
        seeds=list(range(64)),
        finetuning_config={"max_steps": 2, "validate_every_n_steps": 2},
        mesh=mesh,
    )
    losses = np.asarray(out["history"]["train_loss"])
    assert losses.shape == (2, 64)
    assert np.isfinite(losses).all()
    assert len(out["history"]["best_val_error"]) == 64
    # 64 distinct mixer inits
    w = np.asarray(out["params_stacked"]["mixer"]["mgm"]["w1"])
    assert w.shape[0] == 64
    assert len({float(w[i].sum()) for i in range(0, 64, 7)}) > 1
