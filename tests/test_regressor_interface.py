"""Regressor interface tests (models the reference's
`models/tabpfn_v2/tests/test_regressor_interface.py` grid, plus mm coverage)."""

import numpy as np
import pytest

from multimodalpfn_tpu import MMPFNRegressor, TabPFNRegressor
from multimodalpfn_tpu.datasets.synthetic import toy_regression


def test_regressor_fit_predict_shapes():
    X, y = toy_regression(n=80, seed=0)
    reg = TabPFNRegressor(model_path="random:0", n_estimators=2, random_state=0)
    reg.fit(X[:60], y[:60])
    pred = reg.predict(X[60:])
    assert pred.shape == (20,)
    assert np.isfinite(pred).all()


def test_regressor_output_types():
    X, y = toy_regression(n=60, seed=1)
    reg = TabPFNRegressor(model_path="random:0", n_estimators=2, random_state=0)
    reg.fit(X[:45], y[:45])
    full = reg.predict(X[45:], output_type="full")
    assert set(full) >= {"mean", "median", "mode", "quantiles", "logits", "criterion"}
    qs = full["quantiles"]
    assert len(qs) == 9
    # quantiles are monotone in probability level
    stacked = np.stack(qs)
    assert (np.diff(stacked, axis=0) >= -1e-6).all()
    # median between the 0.1/0.9 quantiles
    assert (full["median"] >= qs[0] - 1e-6).all()
    assert (full["median"] <= qs[-1] + 1e-6).all()


def test_regressor_multimodal():
    rng = np.random.default_rng(2)
    X, y = toy_regression(n=60, seed=2)
    emb = rng.normal(size=(60, 1, 768)).astype(np.float32)
    reg = MMPFNRegressor(
        model_path="random:0",
        mixer_type="MGM",
        mgm_heads=2,
        n_estimators=2,
        random_state=0,
    )
    reg.fit(X[:45], emb[:45], y[:45])
    pred = reg.predict(X[45:], emb[45:])
    assert pred.shape == (15,)
    assert np.isfinite(pred).all()


def test_bar_distribution_roundtrip():
    """Distribution statistics sanity: mean/median/mode close for a symmetric
    distribution; cdf(icdf(p)) == p."""
    import jax.numpy as jnp

    from multimodalpfn_tpu.models.bar_distribution import (
        FullSupportBarDistribution,
        get_bucket_limits,
    )

    borders = jnp.asarray(get_bucket_limits(100, full_range=(-5.0, 5.0)))
    bd = FullSupportBarDistribution(borders)
    rng = np.random.default_rng(0)
    logits = jnp.asarray(-0.5 * (np.linspace(-5, 5, 100) ** 2))[None, :].repeat(3, 0)
    mean = np.asarray(bd.mean(logits))
    med = np.asarray(bd.median(logits))
    np.testing.assert_allclose(mean, 0.0, atol=0.1)
    np.testing.assert_allclose(med, 0.0, atol=0.1)
    p = np.asarray(bd.cdf(logits, np.asarray(bd.icdf(logits, 0.3))[..., None]))
    np.testing.assert_allclose(p[..., 0], 0.3, atol=1e-3)
    # nll of a NaN target is exactly 0
    y = jnp.asarray([[np.nan], [0.0], [1.0]]).squeeze(-1)
    nll = np.asarray(bd.nll_loss(logits, y))
    assert nll[0] == 0.0 and np.isfinite(nll[1:]).all()
