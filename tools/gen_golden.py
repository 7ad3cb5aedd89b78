"""Generate golden parity fixtures from the reference torch implementation.

Runs the reference `PerFeatureTransformer` (from /root/reference, CPU torch) with a
tiny randomized configuration and records (state_dict-as-npz, inputs, outputs) for
each scenario into tests/golden/. The committed fixtures let the parity tests run
without the reference tree or torch present.

Usage: python tools/gen_golden.py [--out tests/golden]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REFERENCE = "/root/reference"


def build_reference_model(
    *,
    seed: int,
    nlayers: int,
    emsize: int,
    nhead: int,
    nhid: int,
    features_per_group: int,
    max_num_classes: int,
    n_out: int,
    mixer_type: str | None,
    mgm_heads: int = 2,
    cap_heads: int = 2,
    remove_outliers_sigma: float | None = None,
    cache_trainset_representation: bool = True,
):
    import torch

    from mmpfn.models.mmpfn.model.loading import get_encoder, get_y_encoder
    from mmpfn.models.mmpfn.model.transformer import PerFeatureTransformer

    torch.manual_seed(seed)
    encoder = get_encoder(
        num_features=features_per_group,
        embedding_size=emsize,
        remove_empty_features=True,
        remove_duplicate_features=False,
        nan_handling_enabled=True,
        normalize_on_train_only=True,
        normalize_to_ranking=False,
        normalize_x=True,
        remove_outliers=False,
        normalize_by_used_features=True,
        encoder_use_bias=False,
    )
    y_encoder = get_y_encoder(
        num_inputs=1,
        embedding_size=emsize,
        nan_handling_y_encoder=True,
        max_num_classes=max_num_classes,
    )
    kwargs = dict(
        seed=seed,
        encoder=encoder,
        y_encoder=y_encoder,
        nhead=nhead,
        ninp=emsize,
        nhid=nhid,
        nlayers=nlayers,
        features_per_group=features_per_group,
        cache_trainset_representation=cache_trainset_representation,
        decoder_dict={"standard": (None, n_out)},
        feature_positional_embedding="subspace",
        multiquery_item_attention=False,
        multiquery_item_attention_for_test_set=True,
        attention_init_gain=1.0,
        two_sets_of_queries=False,
    )
    if mixer_type is None:
        # reference requires mixer args; give it a minimal MGM and never use it
        model = PerFeatureTransformer(
            mixer_type="MGM", mgm_heads=1, cap_heads=1, **kwargs
        )
    else:
        model = PerFeatureTransformer(
            mixer_type=mixer_type, mgm_heads=mgm_heads, cap_heads=cap_heads, **kwargs
        )

    # Randomize every parameter (zero-init outputs would hide attention errors)
    gen = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)

    if remove_outliers_sigma is not None:
        from mmpfn.models.mmpfn.utils import update_encoder_outlier_params

        update_encoder_outlier_params(
            model=model,
            remove_outliers_std=remove_outliers_sigma,
            seed=seed,
            inplace=True,
        )
    model.eval()
    return model


def run_scenario(name: str, out_dir: Path, **cfg):
    import torch

    rng = np.random.default_rng(42)
    S, sep, F = cfg.pop("S", 40), cfg.pop("sep", 30), cfg.pop("F", 5)
    n_classes = cfg.pop("n_classes", 3)
    n_img_tokens = cfg.pop("n_img_tokens", 0)
    img_dim = cfg.pop("img_dim", 768)
    tabular = cfg.pop("tabular", True)

    model = build_reference_model(**cfg)

    x = None
    if tabular:
        x = rng.normal(size=(S, 1, F)).astype(np.float32)
        x[rng.random(size=x.shape) < 0.08] = np.nan  # exercise NaN path
        # NOTE: +/-inf is NOT golden-tested: the reference itself crashes on inf
        # inputs (NanHandling replaces inf with the inf-contaminated feature mean,
        # normalization then yields NaN -> forward assert, transformer.py:790).
        x[:, 0, F - 1] = 1.7  # a constant column exercises RemoveEmpty
        x[5, 0, 0] = 40.0  # an outlier exercises the squash path
    if cfg["max_num_classes"] > 0:
        y = rng.integers(0, n_classes, size=(sep, 1)).astype(np.float32)
    else:
        y = rng.normal(size=(sep, 1)).astype(np.float32)
    image = None
    if n_img_tokens:
        image = rng.normal(size=(S, 1, n_img_tokens, img_dim)).astype(np.float32)

    with torch.inference_mode():
        out = model(
            None,
            torch.from_numpy(x) if x is not None else None,
            torch.from_numpy(image) if image is not None else None,
            torch.from_numpy(y),
            only_return_standard_out=True,
            single_eval_pos=sep,
        )
    logits = out.squeeze(1).numpy()

    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    fixture = {
        "logits": logits,
        "y": y,
        "sep": np.array(sep),
        "seed": np.array(cfg["seed"]),
        "nlayers": np.array(cfg["nlayers"]),
        "emsize": np.array(cfg["emsize"]),
        "nhead": np.array(cfg["nhead"]),
        "nhid": np.array(cfg["nhid"]),
        "features_per_group": np.array(cfg["features_per_group"]),
        "max_num_classes": np.array(cfg["max_num_classes"]),
        "n_out": np.array(cfg["n_out"]),
        "mixer_type": np.array(cfg.get("mixer_type") or "none"),
        "mgm_heads": np.array(cfg.get("mgm_heads", 2)),
        "cap_heads": np.array(cfg.get("cap_heads", 2)),
        "remove_outliers_sigma": np.array(cfg.get("remove_outliers_sigma") or 0.0),
    }
    if x is not None:
        fixture["x"] = x
    if image is not None:
        fixture["image"] = image
    np.savez_compressed(
        out_dir / f"{name}.npz",
        **fixture,
        **{f"sd::{k}": v for k, v in state.items()},
    )
    print(f"{name}: logits {logits.shape}, |logits| mean {np.abs(logits).mean():.4f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(Path(__file__).parent.parent / "tests/golden"))
    args = ap.parse_args()
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    sys.path.insert(0, REFERENCE)

    tiny = dict(seed=7, nlayers=3, emsize=24, nhead=6, nhid=96)

    run_scenario(
        "tabular_clf_fpg1",
        out_dir,
        **tiny,
        features_per_group=1,
        max_num_classes=10,
        n_out=10,
        mixer_type=None,
    )
    run_scenario(
        "tabular_clf_fpg2_outlier12",
        out_dir,
        **tiny,
        features_per_group=2,
        max_num_classes=10,
        n_out=10,
        mixer_type=None,
        remove_outliers_sigma=12.0,
    )
    run_scenario(
        "tabular_reg_fpg2",
        out_dir,
        **tiny,
        features_per_group=2,
        max_num_classes=0,
        n_out=8,
        mixer_type=None,
    )
    run_scenario(
        "mm_mgm_cap",
        out_dir,
        **tiny,
        features_per_group=1,
        max_num_classes=10,
        n_out=10,
        mixer_type="MGM+CAP",
        mgm_heads=3,
        cap_heads=2,
        n_img_tokens=2,
        img_dim=96,
    )
    run_scenario(
        "mm_mgm_only",
        out_dir,
        **tiny,
        features_per_group=1,
        max_num_classes=10,
        n_out=10,
        mixer_type="MGM",
        mgm_heads=2,
        n_img_tokens=1,
        img_dim=96,
    )
    run_scenario(
        "mm_moe",
        out_dir,
        **tiny,
        features_per_group=1,
        max_num_classes=10,
        n_out=10,
        mixer_type="MoE",
        mgm_heads=3,
        cap_heads=2,
        n_img_tokens=1,
        img_dim=96,
    )
    run_scenario(
        "image_only_mgm_cap",
        out_dir,
        **tiny,
        features_per_group=1,
        max_num_classes=10,
        n_out=10,
        mixer_type="MGM+CAP",
        mgm_heads=2,
        cap_heads=2,
        n_img_tokens=2,
        img_dim=96,
        tabular=False,
    )


if __name__ == "__main__":
    main()
