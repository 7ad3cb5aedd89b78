"""Stage-by-stage activation comparison vs the torch reference (debug aid)."""

import sys

sys.path.insert(0, "/root/reference")
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests.golden_utils import GoldenCase
from tools.gen_golden import build_reference_model

name = sys.argv[1] if len(sys.argv) > 1 else "tabular_clf_fpg1"
case = GoldenCase(name)

# --- rebuild reference model and load exact weights
ref = build_reference_model(
    seed=case.model_seed,
    nlayers=case.cfg.nlayers,
    emsize=case.cfg.emsize,
    nhead=case.cfg.nhead,
    nhid=case.cfg.nhid,
    features_per_group=case.cfg.features_per_group,
    max_num_classes=case.cfg.max_num_classes,
    n_out=case.cfg.n_out,
    mixer_type=case.cfg.mixer.mixer_type if case.cfg.mixer.mixer_type != "none" else None,
    mgm_heads=case.cfg.mixer.mgm_heads,
    cap_heads=case.cfg.mixer.cap_heads,
    remove_outliers_sigma=(
        case.cfg.remove_outliers_sigma if case.cfg.remove_outliers else None
    ),
)
ref.load_state_dict({k: torch.from_numpy(v) for k, v in case.state_dict.items()}, strict=False)
ref.eval()

captured = {}


def cap_hook(key):
    def hook(mod, inp, out):
        captured.setdefault(key, []).append(
            out.detach().clone() if isinstance(out, torch.Tensor) else out
        )

    return hook


ref.encoder.register_forward_hook(cap_hook("enc_x"))
ref.y_encoder.register_forward_hook(cap_hook("enc_y"))
for j, step in enumerate(ref.encoder):
    step.register_forward_hook(cap_hook(f"enc_step{j}_{type(step).__name__}"))
for i, layer in enumerate(ref.transformer_encoder.layers):
    layer.register_forward_hook(cap_hook(f"layer{i}"))

x, y, image = case.jax_inputs()  # (b, S, ...)
with torch.inference_mode():
    out = ref(
        None,
        torch.from_numpy(case.x) if case.x is not None else None,
        torch.from_numpy(case.image) if case.image is not None else None,
        torch.from_numpy(case.y),
        only_return_standard_out=True,
        single_eval_pos=case.sep,
    )

# --- mine, stage by stage
import jax.numpy as jnp

from multimodalpfn_tpu.models import encoders as enc
from multimodalpfn_tpu.models.transformer import _group_features, encoder_layer

params = case.params()
cfg = case.cfg
sep = case.sep

if x is not None:
    xg = _group_features(jnp.asarray(x), cfg.features_per_group)
    my_enc_x = enc.encode_x(params["encoder"], cfg, xg, sep)  # (b,S,f,e)
    ref_enc_x = captured["enc_x"][0].numpy()  # (s, b*f, e)
    s, bf, e = ref_enc_x.shape
    ref_enc_x = ref_enc_x.reshape(s, 1, bf, e).transpose(1, 0, 2, 3)
    print(
        "enc_x maxdiff:",
        np.abs(np.asarray(my_enc_x) - ref_enc_x).max(),
        "scale",
        np.abs(ref_enc_x).max(),
    )

    # sub-step comparison: my pipeline vs reference SeqEncStep state dicts
    def ref_state(key, field="main"):
        st = captured[key][0]
        arr = st[field].numpy()  # (s, b*f, n)
        return arr.transpose(1, 0, 2).reshape(1, -1, arr.shape[0], arr.shape[2]).transpose(0, 2, 1, 3)

    xs = jnp.asarray(xg)
    xs = enc.remove_empty_features(xs)
    for key in sorted(k for k in captured if k.startswith("enc_step")):
        if "RemoveEmpty" in key:
            diff = np.abs(np.asarray(xs) - ref_state(key)).max()
            print(f"{key} main maxdiff: {diff}")
    xs, ind = enc.nan_handling(xs, sep)
    for key in sorted(k for k in captured if "NanHandling" in k and "enc_step" in k):
        print(f"{key} main maxdiff: {np.nanmax(np.abs(np.asarray(xs) - ref_state(key)))}")
        print(f"{key} ind maxdiff: {np.abs(np.asarray(ind) - ref_state(key, 'nan_indicators')).max()}")
    if cfg.remove_outliers:
        xs = enc.outlier_squash(xs, sep, cfg.remove_outliers_sigma)
    xs = enc.normalize_by_train_stats(xs, sep, xs.shape[1])
    for key in sorted(k for k in captured if "InputNormalization" in k):
        print(f"{key} main maxdiff: {np.abs(np.asarray(xs) - ref_state(key)).max()}")
    xs = enc.variance_rescale(xs)
    for key in sorted(k for k in captured if "VariableNumFeatures" in k):
        st = captured[key][0]["main"].numpy()
        st = st.transpose(1, 0, 2).reshape(1, -1, st.shape[0], st.shape[2]).transpose(0, 2, 1, 3)
        print(f"{key} main maxdiff: {np.abs(np.asarray(xs) - st).max()}")

y_full = np.concatenate(
    [y.astype(np.float32), np.full((1, (x if x is not None else image).shape[1] - sep), np.nan, np.float32)],
    axis=1,
)
my_enc_y = enc.encode_y(params["y_encoder"], cfg, jnp.asarray(y_full), sep)
ref_enc_y = captured["enc_y"][0].numpy()  # (s, b, e) -> transpose
ref_enc_y = ref_enc_y.transpose(1, 0, 2)
print(
    "enc_y maxdiff:",
    np.abs(np.asarray(my_enc_y) - ref_enc_y).max(),
    "scale",
    np.abs(ref_enc_y).max(),
)

# assemble state like forward() does
from multimodalpfn_tpu.models.mixers import apply_mixer

embedded_x = my_enc_x if x is not None else None
if image is not None:
    tokens = apply_mixer(params["mixer"], cfg.mixer, jnp.asarray(image))
    embedded_x = tokens if embedded_x is None else jnp.concatenate([embedded_x, tokens], -2)
from multimodalpfn_tpu.models.params import get_subspace_noise

f_total = embedded_x.shape[-2]
noise = jnp.asarray(get_subspace_noise(cfg.model_seed, f_total, cfg.emsize // 4))
embs = noise @ params["feat_pos_emb"]["w"] + params["feat_pos_emb"]["b"]
embedded_x = embedded_x + embs[None, None]
state = jnp.concatenate([embedded_x, my_enc_y[:, :, None, :]], axis=2)

for i in range(cfg.nlayers):
    lp = {
        k: {kk: vv[i] for kk, vv in v.items()} for k, v in params["layers"].items()
    }
    state = encoder_layer(state, lp, single_eval_pos=sep, cfg=cfg)
    ref_l = captured[f"layer{i}"][0].numpy()  # (b, s, t, e)
    print(
        f"layer{i} maxdiff:",
        np.abs(np.asarray(state) - ref_l).max(),
        "scale",
        np.abs(ref_l).max(),
    )
