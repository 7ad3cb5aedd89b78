"""Cross-width member batching: ONE padded+masked batched forward must equal
the per-width split groups (which the e2e tests pin to the torch reference's
sequential per-member loop, `mmpfn/models/mmpfn/inference.py:294-349`).

Members whose preprocessed feature widths differ zero-pad to the group max,
mask padded token slots out of feature attention, and keep their NATIVE
subspace-noise draws (torch draws are not prefix-stable across token counts).
"""

from types import SimpleNamespace

import numpy as np
import pytest

import multimodalpfn_tpu.estimator.inference as inf
from multimodalpfn_tpu.estimator.inference import (
    InferenceEngineCacheKV,
    _group_and_run,
    _Member,
)
from tests.golden_utils import GoldenCase


def _members(case_widths, sep, seed=0):
    rng = np.random.default_rng(seed)
    wmax_src = max(case_widths) + 1
    X_full = rng.normal(size=(sep + 9, wmax_src)).astype(np.float32)
    y = rng.integers(0, 3, size=(sep,)).astype(np.float32)
    members, X_tests = [], []
    for w in case_widths:
        Xw = X_full[:, :w]
        members.append(
            _Member(
                config=None,
                preprocessor=SimpleNamespace(
                    transform=lambda X, Xw=Xw, sep=sep: SimpleNamespace(
                        X=Xw[sep:]
                    )
                ),
                X_train=Xw[:sep],
                y_train=y,
                cat_ix=None,
            )
        )
        X_tests.append(Xw[sep:])
    return members, X_tests, y


def test_plan_groups_cost_model_decisions():
    """The merge decision is a measured device-cost comparison, not a static
    pad-ratio guess (round-5; calibrated by tools/probes/probe_merge_cost.py).
    At the flagship bench shape (widths 39/39/22/22, sep 1838, 512 test rows)
    the SPLIT is measured 271.7 ms vs 334.8 ms merged — the model must choose
    split. At short sequences with near-equal widths, the per-group dispatch
    overhead dominates the few padded tokens — the model must choose merge."""
    from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig

    cfg = ModelConfig(
        emsize=192, nhead=6, nhid_factor=4, nlayers=12, features_per_group=1,
        n_out=10, max_num_classes=10,
        mixer=MixerConfig("MGM+CAP", mgm_heads=16, cap_heads=8, in_dim=768),
    )
    # flagship: two width groups at long sequences -> split (2 tabular plans)
    groups = {(39, 1838): [0, 1], (22, 1838): [2, 3]}
    plans = inf._plan_groups(groups, cfg, 8, 512)
    assert len(plans) == 2
    assert all(tv is None for _, _, tv, _ in plans)
    # near-equal widths at a short sequence -> one merged masked plan
    groups = {(10, 60): [0], (9, 60): [1]}
    plans = inf._plan_groups(groups, cfg, 8, 16)
    assert len(plans) == 1
    idxs, width, tab_valid, noise = plans[0]
    assert sorted(idxs) == [0, 1] and width == 10
    assert tab_valid is not None and tab_valid.shape == (2, 10)


@pytest.mark.parametrize("case_name", ["tabular_clf_fpg1", "mm_mgm_cap"])
def test_merged_group_matches_split_groups_full_forward(case_name, monkeypatch):
    case = GoldenCase(case_name)
    params, cfg = case.params(), case.cfg
    sep = 24
    members, X_tests, _ = _members([5, 3, 4], sep)
    img_tr = img_te = None
    if case_name == "mm_mgm_cap":
        rng = np.random.default_rng(3)
        img = rng.normal(size=(sep + 9, 2, 96)).astype(np.float32)
        img_tr, img_te = img[:sep], img[sep:]

    monkeypatch.setattr(inf, "_FORCE_MERGE", True)
    merged = _group_and_run(
        params, cfg, members, X_tests, img_tr, img_te,
        autocast=False, bucket_test_rows=False,
    )
    monkeypatch.setattr(inf, "_FORCE_MERGE", False)  # force split groups
    split = _group_and_run(
        params, cfg, members, X_tests, img_tr, img_te,
        autocast=False, bucket_test_rows=False,
    )
    for m, s in zip(merged, split):
        np.testing.assert_allclose(m, s, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("case_name", ["tabular_clf_fpg1", "mm_mgm_cap"])
def test_merged_group_matches_split_groups_cachekv(case_name, monkeypatch):
    case = GoldenCase(case_name)
    params, cfg = case.params(), case.cfg
    sep = 24
    members, X_tests, _ = _members([5, 3, 4], sep, seed=1)
    img_tr = img_te = None
    if case_name == "mm_mgm_cap":
        rng = np.random.default_rng(4)
        img = rng.normal(size=(sep + 9, 2, 96)).astype(np.float32)
        img_tr, img_te = img[:sep], img[sep:]

    def run():
        eng = InferenceEngineCacheKV(
            params=params, cfg=cfg, members=members,
            image_train=img_tr, autocast=False,
        )
        outs = eng.iter_outputs(None, img_te)
        return [o for o, _ in outs]

    monkeypatch.setattr(inf, "_FORCE_MERGE", True)
    merged = run()
    monkeypatch.setattr(inf, "_FORCE_MERGE", False)
    split = run()
    for m, s in zip(merged, split):
        np.testing.assert_allclose(m, s, rtol=1e-5, atol=1e-5)
