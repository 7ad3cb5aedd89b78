"""DINOv2 JAX ViT: shape/pipeline checks + parity vs the reference torch ViT."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodalpfn_tpu.modal.dinov2 import (
    ViTConfig,
    embed_images,
    forward_features,
    init_vit_params,
    interpolate_pos_embed,
)


@pytest.fixture(scope="module")
def tiny_vit():
    cfg = ViTConfig(
        patch_size=14, embed_dim=48, depth=2, num_heads=4, mlp_ratio=2,
        pos_embed_size=37, compute_dtype="float32",
    )
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


def test_forward_features_shapes(tiny_vit):
    params, cfg = tiny_vit
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 14 * 8, 14 * 8)),
                       jnp.float32)
    out = forward_features(params, cfg, imgs)
    assert out["x_norm_clstoken"].shape == (2, 48)
    assert out["x_norm_patchtokens"].shape == (2, 64, 48)
    assert np.isfinite(np.asarray(out["x_norm_clstoken"])).all()


def test_pos_embed_interpolation(tiny_vit):
    params, cfg = tiny_vit
    pos = params["pos_embed"]
    out = interpolate_pos_embed(pos, grid=8, base=37)
    assert out.shape == (1, 65, 48)
    same = interpolate_pos_embed(pos, grid=37, base=37)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(pos))


def test_embed_images_batching(tiny_vit):
    params, cfg = tiny_vit
    imgs = np.random.default_rng(1).normal(size=(5, 2, 3, 14 * 4, 14 * 4)).astype(np.float32)
    emb = embed_images(params, cfg, imgs, batch_size=4)
    assert emb.shape == (5, 2, 48)
    # batching must not change results
    emb2 = embed_images(params, cfg, imgs, batch_size=16)
    np.testing.assert_allclose(emb, emb2, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_vitb14_matches_reference_torch():
    """Full ViT-B/14 with shared random weights: JAX forward == reference torch
    DINOv2 forward_features (the embedding-cache interchangeability guarantee)."""
    import sys

    sys.path.insert(0, "/root/reference")
    torch = pytest.importorskip("torch")
    try:
        from mmpfn.models.dino_v2.models.vision_transformer import vit_base
    except Exception:
        pytest.skip("reference DINOv2 unavailable")

    ref = vit_base(
        patch_size=14, img_size=518, init_values=1.0, num_register_tokens=0,
        block_chunks=0,
    )
    gen = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.02)
    ref.eval()
    sd = ref.state_dict()
    torch.save(sd, "/tmp/dinov2_rand.pth")

    from multimodalpfn_tpu.modal.dinov2 import load_dinov2_vitb14

    params, cfg = load_dinov2_vitb14("/tmp/dinov2_rand.pth")
    import dataclasses

    cfg = dataclasses.replace(cfg, compute_dtype="float32")
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 3, 14 * 6, 14 * 6)).astype(np.float32)
    with torch.no_grad():
        want = ref.forward_features(torch.from_numpy(imgs))["x_norm_clstoken"].numpy()
    got = np.asarray(forward_features(params, cfg, jnp.asarray(imgs))["x_norm_clstoken"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


# --- ELECTRA text encoder (JAX) vs HF transformers --------------------------


def test_electra_matches_hf_reference():
    """JAX ELECTRA forward vs a random-init HF ElectraModel (same weights)."""
    torch = pytest.importorskip("torch")
    tfs = pytest.importorskip("transformers")

    from multimodalpfn_tpu.modal.electra import (
        ElectraConfig,
        cls_embeddings,
        convert_hf_state_dict,
        forward,
    )

    hf_cfg = tfs.ElectraConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2, embedding_size=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = tfs.ElectraModel(hf_cfg).eval()

    cfg = ElectraConfig(
        vocab_size=120, hidden=32, layers=3, heads=4, intermediate=64,
        max_position=40, type_vocab=2, embedding_size=32,
    )
    params = convert_hf_state_dict(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 120, size=(3, 17)).astype(np.int64)
    mask = np.ones((3, 17), np.int64)
    mask[1, 12:] = 0  # padding on one row
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(
        forward(params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32))
    )
    # padded positions diverge (HF still computes them; values are unused)
    np.testing.assert_allclose(got[0], want[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[2], want[2], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[1, :12], want[1, :12], rtol=2e-5, atol=2e-5)

    # CLS-embedding contract: (B, 1, hidden), batched with a padded tail chunk
    emb = cls_embeddings(params, cfg, ids, mask, batch_size=2)
    assert emb.shape == (3, 1, 32)
    np.testing.assert_allclose(emb[:, 0, :], got[:, 0, :], rtol=1e-5, atol=1e-5)


def test_electra_small_projection_roundtrip():
    """embedding_size != hidden exercises the embeddings_project path."""
    torch = pytest.importorskip("torch")
    tfs = pytest.importorskip("transformers")

    from multimodalpfn_tpu.modal.electra import (
        ElectraConfig,
        convert_hf_state_dict,
        forward,
    )

    hf_cfg = tfs.ElectraConfig(
        vocab_size=90, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=24, type_vocab_size=2, embedding_size=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(1)
    hf = tfs.ElectraModel(hf_cfg).eval()
    cfg = ElectraConfig(
        vocab_size=90, hidden=48, layers=2, heads=4, intermediate=96,
        max_position=24, type_vocab=2, embedding_size=16,
    )
    params = convert_hf_state_dict(hf.state_dict(), cfg)
    ids = np.random.default_rng(1).integers(0, 90, size=(2, 9)).astype(np.int64)
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    got = np.asarray(forward(params, cfg, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
