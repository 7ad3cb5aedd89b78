"""Determinism guarantees (the aux-subsystem analogue of race detection: JAX is
functional — the reference relies on seeding, `utils.py:620`, `transformer.py:498`;
here identical seeds must give bit-identical results)."""

import numpy as np

from multimodalpfn_tpu import TabPFNClassifier
from multimodalpfn_tpu.datasets.synthetic import toy_classification


def _fit_predict(seed, precision="auto"):
    X, y = toy_classification(n=60, n_classes=3, seed=7)
    clf = TabPFNClassifier(
        model_path="random:0",
        n_estimators=2,
        random_state=seed,
        inference_precision=precision,
    )
    clf.fit(X[:45], y[:45])
    return clf.predict_proba(X[45:])


def test_same_seed_same_predictions():
    p1 = _fit_predict(0)
    p2 = _fit_predict(0)
    np.testing.assert_array_equal(p1, p2)


def test_different_seed_different_ensemble():
    p1 = _fit_predict(0)
    p2 = _fit_predict(1)
    assert not np.allclose(p1, p2)  # different shifts/permutations


def test_forced_fp32_close_to_auto():
    p_auto = _fit_predict(0, precision="auto")
    p_f32 = _fit_predict(0, precision="float32")
    np.testing.assert_allclose(p_auto, p_f32, atol=5e-2)


def test_subspace_noise_reproduces_torch_draws():
    """The feature positional embedding must equal torch generator draws
    (reference `transformer.py:925-933` reseeded per forward)."""
    import pytest

    torch = pytest.importorskip("torch")
    from multimodalpfn_tpu.models.params import get_subspace_noise

    for seed, f, sub in [(7, 6, 6), (42, 48, 48), (12345, 17, 48)]:
        gen = torch.Generator(device="cpu")
        gen.manual_seed(seed)
        want = torch.randn((f, sub), generator=gen).numpy()
        got = get_subspace_noise(seed, f, sub)
        np.testing.assert_array_equal(got, want)
    # seed=0 is falsy in the reference (`transformer.py:423`): the generator stays
    # at torch's deterministic default seed, NOT manual_seed(0)
    want0 = torch.randn((5, 6), generator=torch.Generator(device="cpu")).numpy()
    np.testing.assert_array_equal(get_subspace_noise(0, 5, 6), want0)
