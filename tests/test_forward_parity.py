"""Numerical parity of the JAX forward vs. the torch reference (golden fixtures).

Fixtures in tests/golden/ were produced by tools/gen_golden.py from the reference
implementation (random tiny weights, CPU torch, fp32). Tolerances are fp32-level:
both sides are float32 graphs with different op orderings.
"""

import numpy as np
import pytest

from multimodalpfn_tpu.models.transformer import forward
from tests.golden_utils import GOLDEN_DIR, GoldenCase

CASES = sorted(p.stem for p in GOLDEN_DIR.glob("*.npz"))


@pytest.mark.parametrize("name", CASES)
def test_forward_matches_reference(name):
    case = GoldenCase(name)
    params = case.params()
    x, y, image = case.jax_inputs()
    logits = forward(
        params, case.cfg, x, y, image, single_eval_pos=case.sep
    )
    got = np.asarray(logits)[0]
    want = case.logits
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_batched_members_equal_looped():
    """Stacking ensemble members on the batch axis must equal per-member forwards
    (replaces the reference's sequential member loop, `inference.py:294-349`)."""
    case = GoldenCase("tabular_clf_fpg1")
    params = case.params()
    x, y, image = case.jax_inputs()
    rng = np.random.default_rng(0)
    x2 = rng.permutation(x[0], axis=1)[None]  # feature-shuffled second member
    xb = np.concatenate([x, x2], axis=0)
    yb = np.concatenate([y, y], axis=0)
    batched = np.asarray(
        forward(params, case.cfg, xb, yb, None, single_eval_pos=case.sep)
    )
    solo0 = np.asarray(forward(params, case.cfg, x, y, None, single_eval_pos=case.sep))
    solo1 = np.asarray(forward(params, case.cfg, x2, y, None, single_eval_pos=case.sep))
    np.testing.assert_allclose(batched[0], solo0[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(batched[1], solo1[0], rtol=1e-5, atol=1e-6)
