"""Bar-distribution parity vs the reference torch implementation."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

torch = pytest.importorskip("torch")
ref_bd = pytest.importorskip("mmpfn.models.mmpfn.model.bar_distribution")

import jax.numpy as jnp  # noqa: E402

from multimodalpfn_tpu.models.bar_distribution import (  # noqa: E402
    FullSupportBarDistribution,
    get_bucket_limits,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    borders = np.sort(rng.normal(size=21)).astype(np.float32)
    logits = rng.normal(size=(7, 20)).astype(np.float32)
    ys = rng.normal(size=(7,)).astype(np.float32) * 2
    ours = FullSupportBarDistribution(jnp.asarray(borders))
    theirs = ref_bd.FullSupportBarDistribution(torch.from_numpy(borders))
    return ours, theirs, logits, ys


def test_nll_matches(setup):
    ours, theirs, logits, ys = setup
    got = np.asarray(ours.nll_loss(jnp.asarray(logits), jnp.asarray(ys)))
    want = theirs(torch.from_numpy(logits), torch.from_numpy(ys.copy())).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_nll_nan_target_ignored(setup):
    ours, theirs, logits, ys = setup
    ys2 = ys.copy()
    ys2[1] = np.nan
    got = np.asarray(ours.nll_loss(jnp.asarray(logits), jnp.asarray(ys2)))
    want = theirs(torch.from_numpy(logits), torch.from_numpy(ys2.copy())).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert got[1] == 0.0


def test_moments_match(setup):
    ours, theirs, logits, _ = setup
    lt = torch.from_numpy(logits)
    lj = jnp.asarray(logits)
    np.testing.assert_allclose(
        np.asarray(ours.mean(lj)), theirs.mean(lt).numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ours.mode(lj)), theirs.mode(lt).numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ours.mean_of_square(lj)),
        theirs.mean_of_square(lt).numpy(),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ours.variance(lj)), theirs.variance(lt).numpy(), rtol=1e-4, atol=1e-5
    )


def test_icdf_median_quantiles_match(setup):
    ours, theirs, logits, _ = setup
    lt = torch.from_numpy(logits)
    lj = jnp.asarray(logits)
    for p in (0.1, 0.5, 0.9):
        np.testing.assert_allclose(
            np.asarray(ours.icdf(lj, p)), theirs.icdf(lt, p).numpy(),
            rtol=1e-5, atol=1e-6,
        )
    np.testing.assert_allclose(
        np.asarray(ours.quantile(lj, 0.682)),
        theirs.quantile(lt, 0.682).numpy(),
        rtol=1e-5,
        atol=1e-6,
    )


def test_cdf_and_border_translation_match(setup):
    ours, theirs, logits, _ = setup
    rng = np.random.default_rng(1)
    new_borders = np.sort(rng.normal(size=21) * 1.5).astype(np.float32)
    got = np.asarray(
        ours.get_probs_for_different_borders(jnp.asarray(logits), jnp.asarray(new_borders))
    )
    want = theirs.get_probs_for_different_borders(
        torch.from_numpy(logits), torch.from_numpy(new_borders)
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pi_ei_match(setup):
    ours, theirs, logits, _ = setup
    lt = torch.from_numpy(logits)
    lj = jnp.asarray(logits)
    np.testing.assert_allclose(
        np.asarray(ours.pi(lj, 0.3)), theirs.pi(lt, 0.3).numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ours.ei(lj, 0.3)), theirs.ei(lt, 0.3).numpy(), rtol=1e-4, atol=1e-5
    )


def test_bucket_limits_match():
    rng = np.random.default_rng(2)
    ys = rng.normal(size=503).astype(np.float32)
    got = get_bucket_limits(10, ys=ys)
    want = ref_bd.get_bucket_limits(10, ys=torch.from_numpy(ys)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)
    got2 = get_bucket_limits(8, full_range=(-3.0, 5.0))
    want2 = ref_bd.get_bucket_limits(8, full_range=(-3.0, 5.0)).numpy()
    np.testing.assert_allclose(got2, want2, rtol=1e-6)


def test_scaled_log_probs_and_full_ce_match(setup):
    ours, theirs, logits, _ = setup
    lt = torch.from_numpy(logits)
    lj = jnp.asarray(logits)
    np.testing.assert_allclose(
        np.asarray(ours.compute_scaled_log_probs(lj)),
        theirs.compute_scaled_log_probs(lt).numpy(),
        rtol=1e-5, atol=1e-6,
    )
    probs = torch.softmax(torch.from_numpy(
        np.random.default_rng(3).normal(size=logits.shape).astype(np.float32)
    ), -1)
    np.testing.assert_allclose(
        np.asarray(ours.full_ce(lj, jnp.asarray(probs.numpy()))),
        theirs.full_ce(lt, probs).numpy(),
        rtol=1e-5, atol=1e-6,
    )


def test_mean_loss_matches(setup):
    ours, theirs, _, _ = setup
    rng = np.random.default_rng(4)
    T, B, nb = 5, 3, 20
    logits = rng.normal(size=(T, B, nb)).astype(np.float32)
    mean_logits = rng.normal(size=(B, nb)).astype(np.float32)
    got = np.asarray(
        ours.mean_loss(jnp.asarray(logits), jnp.asarray(mean_logits))
    )
    want = theirs.mean_loss(
        torch.from_numpy(logits), torch.from_numpy(mean_logits)
    ).numpy()
    assert got.shape == want.shape == (1, B)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_cdf_temporary_matches(setup):
    ours, theirs, logits, _ = setup
    got = np.asarray(ours.cdf_temporary(jnp.asarray(logits)))
    want = theirs.cdf_temporary(torch.from_numpy(logits)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_plot_runs():
    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    rng = np.random.default_rng(5)
    borders = np.sort(rng.normal(size=21)).astype(np.float32)
    d = FullSupportBarDistribution(jnp.asarray(borders))
    logits = jnp.asarray(rng.normal(size=(20,)).astype(np.float32))
    ax = d.plot(logits)
    assert ax is not None
    ax2 = d.plot(logits, zoom_to_quantile=0.9)
    assert ax2 is not None
