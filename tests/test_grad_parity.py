"""Gradient parity vs the torch reference: same weights, same episode, same CE
loss -> same gradients (training-path correctness, not just inference)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalpfn_tpu.train.losses import get_loss_fn
from tests.golden_utils import GoldenCase


@pytest.mark.slow
def test_ce_gradients_match_reference():
    import sys

    sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    from tools.gen_golden import build_reference_model

    case = GoldenCase("tabular_clf_fpg1")
    cfg = case.cfg
    ref = build_reference_model(
        seed=case.model_seed, nlayers=cfg.nlayers, emsize=cfg.emsize,
        nhead=cfg.nhead, nhid=cfg.nhid, features_per_group=cfg.features_per_group,
        max_num_classes=cfg.max_num_classes, n_out=cfg.n_out, mixer_type=None,
        cache_trainset_representation=False,  # the reference finetune loads this way
    )
    ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in case.state_dict.items()}, strict=False
    )
    ref.train()  # mixers unused; dropout only lives in mixers

    rng = np.random.default_rng(0)
    S, sep, F = 32, 24, 4
    x = rng.normal(size=(S, 1, F)).astype(np.float32)
    y = rng.integers(0, 3, size=(sep, 1)).astype(np.float32)
    y_test = rng.integers(0, 3, size=(S - sep,)).astype(np.int64)

    # torch grads
    xt = torch.from_numpy(x)
    yt = torch.from_numpy(y)
    out = ref(None, xt, None, yt, only_return_standard_out=True, single_eval_pos=sep)
    loss_t = torch.nn.functional.cross_entropy(
        out.reshape(-1, out.shape[-1]), torch.from_numpy(y_test)
    )
    loss_t.backward()
    tgrads = {k: p.grad.numpy() for k, p in ref.named_parameters() if p.grad is not None}

    # jax grads
    params = case.params()
    loss_fn = get_loss_fn("multiclass")

    def compute(p):
        from multimodalpfn_tpu.models.transformer import forward

        logits = forward(
            p, cfg, jnp.asarray(np.swapaxes(x, 0, 1)), jnp.asarray(np.swapaxes(y, 0, 1)),
            None, single_eval_pos=sep,
        )
        return loss_fn(logits, jnp.asarray(y_test[None].astype(np.float32)))

    loss_j, grads = jax.value_and_grad(compute)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)

    pairs = [
        ("decoder_dict.standard.0.weight", grads["decoder"]["w1"], True),
        ("decoder_dict.standard.2.bias", grads["decoder"]["b2"], False),
        ("y_encoder.2.layer.weight", grads["y_encoder"]["w"], True),
        ("encoder.5.layer.weight", grads["encoder"]["w"], True),
        ("feature_positional_embedding_embeddings.weight", grads["feat_pos_emb"]["w"], True),
    ]
    for tname, jgrad, transpose in pairs:
        want = tgrads[tname].T if transpose else tgrads[tname]
        np.testing.assert_allclose(
            np.asarray(jgrad), want, rtol=2e-3, atol=2e-6, err_msg=tname
        )
    # stacked layer grads
    for l in range(cfg.nlayers):
        want = tgrads[f"transformer_encoder.layers.{l}.self_attn_between_items._w_qkv"]
        got = np.asarray(grads["layers"]["attn_item"]["w_qkv"][l])
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-6)
        want = tgrads[f"transformer_encoder.layers.{l}.mlp.linear1.weight"].T
        got = np.asarray(grads["layers"]["mlp"]["w1"][l])
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-6)
