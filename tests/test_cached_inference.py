"""KV-cached inference (fit_with_cache) parity with the fused forward."""

import numpy as np

import jax.numpy as jnp

from multimodalpfn_tpu.models.cached import forward_cached, prime_cache
from multimodalpfn_tpu.models.transformer import forward
from tests.golden_utils import GoldenCase


def _continuous_inputs(case, seed=0):
    """Data where train rows alone determine the encoder masks (no constant
    columns, no NaNs) so cached predictions must match the fused forward."""
    rng = np.random.default_rng(seed)
    S, F = 48, 5
    x = rng.normal(size=(1, S, F)).astype(np.float32)
    y = rng.integers(0, 3, size=(1, 36)).astype(np.float32)
    return x, y, 36


def test_cached_matches_full_forward_tabular():
    case = GoldenCase("tabular_clf_fpg1")
    params, cfg = case.params(), case.cfg
    x, y, sep = _continuous_inputs(case)
    full = np.asarray(forward(params, cfg, x, y, None, single_eval_pos=sep))
    cache = prime_cache(params, cfg, x[:, :sep], y, None)
    cached = np.asarray(forward_cached(params, cfg, cache, x[:, sep:], None))
    np.testing.assert_allclose(cached, full, rtol=2e-4, atol=2e-5)


def test_cached_matches_full_forward_multimodal():
    case = GoldenCase("mm_mgm_cap")
    params, cfg = case.params(), case.cfg
    rng = np.random.default_rng(1)
    x, y, sep = _continuous_inputs(case, seed=1)
    image = rng.normal(size=(1, 48, 2, 96)).astype(np.float32)
    full = np.asarray(forward(params, cfg, x, y, image, single_eval_pos=sep))
    cache = prime_cache(params, cfg, x[:, :sep], y, image[:, :sep])
    cached = np.asarray(
        forward_cached(params, cfg, cache, x[:, sep:], image[:, sep:])
    )
    np.testing.assert_allclose(cached, full, rtol=2e-4, atol=2e-5)


def test_cached_outlier_mode():
    case = GoldenCase("tabular_clf_fpg2_outlier12")
    params, cfg = case.params(), case.cfg
    x, y, sep = _continuous_inputs(case, seed=2)
    full = np.asarray(forward(params, cfg, x, y, None, single_eval_pos=sep))
    cache = prime_cache(params, cfg, x[:, :sep], y, None)
    cached = np.asarray(forward_cached(params, cfg, cache, x[:, sep:], None))
    np.testing.assert_allclose(cached, full, rtol=2e-4, atol=2e-5)


def test_device_train_image_cache_dedups_uploads():
    """Identical embedding content -> ONE device array shared across engines
    (the HPO/grid regime re-fits fresh estimators on the same dataset); new
    content -> new array; LRU-bounded."""
    from multimodalpfn_tpu.estimator.inference import (
        _DEV_IMG_CACHE,
        _DEV_IMG_CACHE_MAX,
        _device_train_image,
    )

    _DEV_IMG_CACHE.clear()
    rng = np.random.default_rng(0)
    a = rng.normal(size=(16, 1, 8)).astype(np.float32)
    d1 = _device_train_image(a)
    d2 = _device_train_image(a.copy())  # same content, different host buffer
    assert d1 is d2
    np.testing.assert_array_equal(np.asarray(d1), a)
    b = a + 1.0
    d3 = _device_train_image(b)
    assert d3 is not d1
    # a device array passes through untouched (already uploaded)
    assert _device_train_image(d1) is d1
    for i in range(_DEV_IMG_CACHE_MAX + 1):
        _device_train_image(a + 2.0 + i)
    assert len(_DEV_IMG_CACHE) <= _DEV_IMG_CACHE_MAX
