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

    merged = _group_and_run(
        params, cfg, members, X_tests, img_tr, img_te,
        autocast=False, bucket_test_rows=False,
    )
    assert inf._MERGE_PAD_LIMIT > 0  # merge engaged above
    monkeypatch.setattr(inf, "_MERGE_PAD_LIMIT", -1.0)  # force split groups
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

    merged = run()
    monkeypatch.setattr(inf, "_MERGE_PAD_LIMIT", -1.0)
    split = run()
    for m, s in zip(merged, split):
        np.testing.assert_allclose(m, s, rtol=1e-5, atol=1e-5)
