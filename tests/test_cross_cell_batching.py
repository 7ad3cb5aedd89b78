"""Cross-cell HPO batching: padded mixers + activation masks.

Grid cells with different (mgm_heads, cap_heads) can share ONE vmapped train
stream by zero-padding the per-head mixer params to the group maximum and
masking the inactive heads/tokens at runtime. These tests pin the contract:
padded+masked == unpadded (to compiler reduction-order tolerance), padded params get zero grads, and
fine_tune_batched_cells reproduces the per-cell single-cell stream.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
from multimodalpfn_tpu.models.params import (
    init_mixer_params,
    init_params,
    pad_mixer_params,
    slice_mixer_params,
)
from multimodalpfn_tpu.models.transformer import forward


def _cfg(mixer_type, mgm, cap):
    return ModelConfig(
        emsize=32, nhead=4, nhid_factor=2, nlayers=2, n_out=4, max_num_classes=4,
        compute_dtype="float32",
        mixer=MixerConfig(mixer_type=mixer_type, mgm_heads=mgm, cap_heads=cap,
                          in_dim=64),
    )


def _data(seed=0, b=2, S=20, F=3, n_img=1, in_dim=64):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(b, S, F)).astype(np.float32)
    y = rng.integers(0, 3, size=(b, 12)).astype(np.float32)
    img = rng.normal(size=(b, S, n_img, in_dim)).astype(np.float32)
    return x, y, img


def _densify(params, seed=7):
    """init_params zero-inits attention output projections (reference
    semantics), which makes a fresh model ignore cross-token mixing — perturb
    every leaf so the parity checks actually exercise attention."""
    key = jax.random.PRNGKey(seed)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    leaves = [
        l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


@pytest.mark.parametrize(
    "mixer_type,m_active,m_padded,cap",
    [
        ("MGM+CAP", 2, 5, 2),  # cap shared by the group (not paddable)
        ("MGM", 2, 6, 2),
        ("MoE", 3, 7, 2),
    ],
)
def test_padded_masked_forward_equals_unpadded(mixer_type, m_active, m_padded, cap):
    cfg_a = _cfg(mixer_type, m_active, cap)
    cfg_p = _cfg(mixer_type, m_padded, cap)
    x, y, img = _data()

    params = _densify(init_params(jax.random.PRNGKey(0), cfg_a, model_seed=0))
    want = forward(params, cfg_a, x, y, img, single_eval_pos=12)

    params_p = dict(params)
    params_p["mixer"] = pad_mixer_params(params["mixer"], cfg_p.mixer)
    noise = None
    if mixer_type != "MGM+CAP":
        # token count changes under padding for MGM/MoE; torch noise draws are
        # not prefix-stable, so the run passes its ACTIVE-count table (padded)
        from multimodalpfn_tpu.models.params import get_subspace_noise

        F = x.shape[-1]
        n_act = m_active * img.shape[-2] if mixer_type == "MGM" else m_active
        n_pad = m_padded * img.shape[-2] if mixer_type == "MGM" else m_padded
        tab = get_subspace_noise(0, F + n_act, cfg_a.emsize // 4)
        noise = jnp.asarray(
            np.pad(tab, ((0, n_pad - n_act), (0, 0)))
        )
    got = forward(
        params_p, cfg_p, x, y, img, single_eval_pos=12,
        mgm_active=jnp.int32(m_active), feat_pos_noise=noise,
    )
    # identical math; tolerance covers XLA reduction-order differences
    # between the differently-shaped compiled programs (~1 ulp)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-6, atol=3e-6
    )

    # round-trip: slicing the padded params back gives the original tree
    back = slice_mixer_params(params_p["mixer"], cfg_a.mixer)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params["mixer"],
        back,
    )


def test_padded_params_get_zero_grads():
    """Inactive mixer heads must receive exactly-zero gradients — otherwise
    cross-cell batching would corrupt the optimizer state of padded slots."""
    cfg_a = _cfg("MGM+CAP", 2, 2)
    cfg_p = _cfg("MGM+CAP", 4, 2)
    x, y, img = _data(seed=1)

    params = _densify(init_params(jax.random.PRNGKey(1), cfg_a, model_seed=0))
    params_p = dict(params)
    params_p["mixer"] = pad_mixer_params(params["mixer"], cfg_p.mixer)

    def loss(mixer):
        p = dict(params_p)
        p["mixer"] = mixer
        out = forward(
            p, cfg_p, x, y, img, single_eval_pos=12, mgm_active=jnp.int32(2),
        )
        return (out.astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss)(params_p["mixer"])
    # padded MGM heads (index >= 2): zero grad in every head-stacked leaf
    for k, v in g["mgm"].items():
        pad_part = np.asarray(v)[2:]
        assert np.all(pad_part == 0.0), f"mgm.{k} pad grads nonzero"
        assert np.any(np.asarray(v)[:2] != 0.0), f"mgm.{k} active grads all zero"
    q = np.asarray(g["cap"]["queries"])
    assert np.any(q != 0.0)  # cap is shared (unpadded); all queries train


def _tiny_ckpt(tmp_path, cap=2):
    from multimodalpfn_tpu.models.loading import save_model

    cfg = ModelConfig(
        emsize=32, nhead=4, nhid_factor=2, nlayers=1, n_out=4, max_num_classes=4,
        compute_dtype="float32",
    )
    params = init_params(jax.random.PRNGKey(3), cfg, model_seed=0)
    path = tmp_path / "base.ckpt"
    save_model(path, params, cfg)
    return path


@pytest.mark.slow  # 85 s: e2e batched-vs-per-cell; the padded-masked
# forward parity tests above cover the kernel math in the fast set
def test_cells_batched_matches_per_cell_runs(tmp_path):
    """Two grid cells with DIFFERENT mgm_heads × 2 seeds each advance in ONE
    vmapped stream; per-cell histories and final mixer params must match the
    cells run one-at-a-time (unpadded)."""
    pytest.importorskip("torch")
    from multimodalpfn_tpu.train.finetune_batch import (
        extract_run_params,
        fine_tune_batched_cells,
    )

    rng = np.random.default_rng(0)
    n, F, in_dim = 40, 3, 128  # in_dim is tied to nhid = 32*2... use model nhid
    X = rng.normal(size=(n, F)).astype(np.float32)
    img = rng.normal(size=(n, 1, 64)).astype(np.float32)
    y = rng.integers(0, 3, size=n)
    ckpt = _tiny_ckpt(tmp_path)

    cell_a = {"mgm_heads": 2, "cap_heads": 2, "seeds": [0, 1]}
    cell_b = {"mgm_heads": 4, "cap_heads": 2, "seeds": [2, 3]}
    common = dict(
        mixer_type="MGM+CAP", features_per_group=1,
        path_to_base_model=str(ckpt), X=X, image=img, y=y,
        finetuning_config={"max_steps": 3, "validate_every_n_steps": 1,
                           "learning_rate": 1e-3},
        static_seed=0,
    )

    both = fine_tune_batched_cells(cells=[cell_a, cell_b], **common)
    only_a = fine_tune_batched_cells(cells=[cell_a], **common)
    only_b = fine_tune_batched_cells(cells=[cell_b], **common)

    # per-run validation-error histories separate cleanly per cell.
    # Tolerance: the two streams compile DIFFERENTLY-PADDED programs (mgm
    # 2 -> max(2,4) vs true shapes), whose f32 reduction-order noise feeds
    # back through three real optimizer steps — ~3e-4 observed once the
    # schedule-free lr bug was fixed and training actually moves params.
    for step_err_both, step_err_a in zip(
        both["history"]["val_error"], only_a["history"]["val_error"]
    ):
        np.testing.assert_allclose(
            step_err_both[1][:2], step_err_a[1], rtol=2e-3, atol=1e-4
        )
    for step_err_both, step_err_b in zip(
        both["history"]["val_error"], only_b["history"]["val_error"]
    ):
        np.testing.assert_allclose(
            step_err_both[1][2:], step_err_b[1], rtol=2e-3, atol=1e-4
        )

    # Final params: schedule-free Adam updates are ~sign(g)·lr, so on
    # near-zero-grad elements (the tiny ckpt zero-inits attention out
    # projections) reduction-order noise between the differently-padded
    # programs legitimately flips update signs — per-element divergence up to
    # ~2·steps·lr is correct behavior, not leakage. Two-part pin instead:
    # (1) at real lr, the streams stay inside that sign-flip envelope;
    # (2) at lr≈0 (no optimizer amplification) the streams agree to f64-level
    #     — the discriminating check for cross-run leakage / masking /
    #     extraction bugs (measured 4e-17).
    envelope = 2 * 3 * 1e-3 * 1.25
    for r_both, r_single, single in ((0, 0, only_a), (2, 0, only_b)):
        p_b, cfg_b = extract_run_params(both, r_both)
        p_s, cfg_s = extract_run_params(single, r_single)
        assert cfg_b.mixer.mgm_heads == cfg_s.mixer.mgm_heads
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=envelope
            ),
            p_b["mixer"],
            p_s["mixer"],
        )

    common_lr0 = dict(common)
    common_lr0["finetuning_config"] = {
        "max_steps": 3, "validate_every_n_steps": 3, "learning_rate": 1e-12,
    }
    both0 = fine_tune_batched_cells(cells=[cell_a, cell_b], **common_lr0)
    only0 = fine_tune_batched_cells(cells=[cell_a], **common_lr0)
    p_b0, _ = extract_run_params(both0, 0)
    p_s0, _ = extract_run_params(only0, 0)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-9
        ),
        p_b0["mixer"],
        p_s0["mixer"],
    )


@pytest.mark.slow  # 33 s: experiment-driver e2e over the same path
def test_run_experiment_cross_cell(tmp_path):
    """Grid driver: 2x1 grid (+1 pruned cell) x 2 seeds through the cross-cell
    stream, per-cell accuracies recorded as separate trials."""
    pytest.importorskip("torch")
    from multimodalpfn_tpu.hpo.experiment import run_experiment_cross_cell

    rng = np.random.default_rng(1)
    n, F = 40, 3
    X = rng.normal(size=(n, F)).astype(np.float32)
    img = rng.normal(size=(n, 1, 64)).astype(np.float32)
    y = rng.integers(0, 2, size=n)
    ckpt = _tiny_ckpt(tmp_path)

    study = run_experiment_cross_cell(
        X=X, embeddings=img, y=y, n_categorical=0,
        config={"mgm_heads_list": [1, 2, 4], "cap_heads_list": [2],
                "mixer_type": "MGM+CAP", "features_per_group": 1},
        dataset_name="toy",
        path_to_base_model=str(ckpt),
        n_seeds=2,
        checkpoint_dir=str(tmp_path / "ckpts"),
        finetuning_config={"max_steps": 2, "validate_every_n_steps": 2},
        results_path=str(tmp_path / "res.json"),
    )
    states = {(t.params["mgm_heads"], t.params["cap_heads"]): t.state
              for t in study.trials}
    assert states[(1, 2)] == "pruned"  # mgm < cap
    assert states[(2, 2)] == "complete" and states[(4, 2)] == "complete"
    done = study.completed_trials
    assert all(t.user_attrs["n_completed_seeds"] == 2 for t in done)
    assert all(0.0 <= t.value <= 1.0 for t in done)
    assert (tmp_path / "res.json").exists()


def test_padded_mgm_cap_fused_path_matches_unpadded():
    """The hetero MGM+CAP group runs the FUSED sublayer kernels: the mixer
    emits exactly cap_heads tokens for every run, so there is no token mask
    and `fine_tune_batched_cells` keeps cfg.fused_ops on (round-4 gate,
    `finetune_batch.sweep_needs_token_mask`). Pin: the fused forward with a
    padded+masked mixer equals the unpadded XLA forward (interpret mode)."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    cfg_a = _cfg("MGM+CAP", 2, 2)
    cfg_p = dataclasses.replace(_cfg("MGM+CAP", 5, 2), fused_ops=True)
    x, y, img = _data(seed=3)

    params = _densify(init_params(jax.random.PRNGKey(4), cfg_a, model_seed=0))
    want = forward(params, cfg_a, x, y, img, single_eval_pos=12)

    params_p = dict(params)
    params_p["mixer"] = pad_mixer_params(params["mixer"], cfg_p.mixer)
    with pltpu.force_tpu_interpret_mode():
        got = forward(
            params_p, cfg_p, x, y, img, single_eval_pos=12,
            mgm_active=jnp.int32(2),
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-6, atol=3e-6
    )


def test_sweep_token_mask_gate():
    """Only padded MGM/MoE groups need the (XLA-only) token mask; MGM+CAP
    hetero groups — the reference grid's actual shape — stay on the fused
    path."""
    from multimodalpfn_tpu.train.finetune_batch import sweep_needs_token_mask

    assert not sweep_needs_token_mask(True, True, "MGM+CAP")
    assert not sweep_needs_token_mask(True, False, "MGM")
    assert not sweep_needs_token_mask(False, True, "MGM")
    assert sweep_needs_token_mask(True, True, "MGM")
    assert sweep_needs_token_mask(True, True, "MoE")
