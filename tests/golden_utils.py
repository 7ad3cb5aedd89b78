"""Helpers to load golden fixtures produced by tools/gen_golden.py."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
from multimodalpfn_tpu.models.params import convert_torch_state_dict

GOLDEN_DIR = Path(__file__).parent / "golden"


class GoldenCase:
    def __init__(self, name: str):
        data = np.load(GOLDEN_DIR / f"{name}.npz", allow_pickle=False)
        self.name = name
        self.logits = data["logits"]
        self.x = data["x"] if "x" in data else None  # (S, 1, F)
        self.image = data["image"] if "image" in data else None  # (S, 1, N, D)
        self.y = data["y"]  # (sep, 1)
        self.sep = int(data["sep"])
        mixer_type = str(data["mixer_type"])
        nhid = int(data["nhid"])
        emsize = int(data["emsize"])
        sigma = float(data["remove_outliers_sigma"])
        self.cfg = ModelConfig(
            emsize=emsize,
            nhead=int(data["nhead"]),
            nhid_factor=nhid // emsize,
            nlayers=int(data["nlayers"]),
            features_per_group=int(data["features_per_group"]),
            n_out=int(data["n_out"]),
            max_num_classes=int(data["max_num_classes"]),
            remove_outliers=sigma > 0,
            remove_outliers_sigma=sigma if sigma > 0 else 12.0,
            mixer=MixerConfig(
                mixer_type=mixer_type if mixer_type != "none" else "none",
                mgm_heads=int(data["mgm_heads"]),
                cap_heads=int(data["cap_heads"]),
                in_dim=nhid,
            ),
            model_seed=int(data["seed"]),
        )
        self.state_dict = {
            k[len("sd::") :]: data[k] for k in data.files if k.startswith("sd::")
        }
        self.model_seed = int(data["seed"])

    def params(self):
        return convert_torch_state_dict(
            self.state_dict, self.cfg, model_seed=self.model_seed
        )

    def jax_inputs(self):
        """Golden inputs are torch layout (S, b, ...); ours are (b, S, ...)."""
        x = None if self.x is None else np.swapaxes(self.x, 0, 1)
        image = None if self.image is None else np.swapaxes(self.image, 0, 1)
        y = np.swapaxes(self.y, 0, 1)
        return x, y, image
