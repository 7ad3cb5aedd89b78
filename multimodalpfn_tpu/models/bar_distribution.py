"""Bar distribution regression head (piecewise-uniform + half-normal tails).

JAX re-implementation of the reference `mmpfn/models/mmpfn/model/bar_distribution.py`
(`BarDistribution:18-446`, `FullSupportBarDistribution:448-760`,
`get_bucket_limits:761-843`). All ops are vectorized/jit-friendly (masked `where`
instead of boolean indexing) so losses ride inside compiled training steps.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

_SQRT2 = math.sqrt(2.0)
_HALF_NORMAL_ICDF_05 = _SQRT2 * 0.47693627620446987  # sqrt(2)*erfinv(0.5)


def _halfnormal_scale(range_max, p: float = 0.5):
    """HalfNormal scale s.t. p of the mass lies before range_max
    (reference `bar_distribution.py:477-485`)."""
    return range_max / _HALF_NORMAL_ICDF_05


def _halfnormal_logpdf(x, scale):
    return 0.5 * math.log(2.0 / math.pi) - jnp.log(scale) - 0.5 * (x / scale) ** 2


def _halfnormal_cdf(x, scale):
    return jax.scipy.special.erf(x / (scale * _SQRT2))


def _halfnormal_mean(scale):
    return scale * math.sqrt(2.0 / math.pi)


def _halfnormal_var(scale):
    return scale**2 * (1.0 - 2.0 / math.pi)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FullSupportBarDistribution:
    """Distribution over `num_bars` buckets with half-normal tail buckets."""

    borders: jnp.ndarray  # (num_bars + 1,) sorted

    def __post_init__(self):
        # normalize host numpy borders (callers may pass them for content
        # hashing) to jnp so every method can fancy-index / `.at[]` them;
        # a no-op for jnp arrays and tracers (tree_unflatten passes tracers)
        self.borders = jnp.asarray(self.borders)

    def tree_flatten(self):
        return (self.borders,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- basic geometry ------------------------------------------------------
    @property
    def bucket_widths(self) -> jnp.ndarray:
        return self.borders[1:] - self.borders[:-1]

    @property
    def num_bars(self) -> int:
        return len(self.borders) - 1

    def map_to_bucket_idx(self, y):
        """reference `bar_distribution.py:156-162`."""
        idx = jnp.searchsorted(self.borders, y) - 1
        idx = jnp.where(y == self.borders[0], 0, idx)
        return jnp.where(y == self.borders[-1], self.num_bars - 1, idx)

    def _side_scales(self):
        return (
            _halfnormal_scale(self.bucket_widths[0]),
            _halfnormal_scale(self.bucket_widths[-1]),
        )

    # -- loss -----------------------------------------------------------------
    def nll_loss(self, logits: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Negative log density; NaN targets contribute 0
        (reference `FullSupportBarDistribution.forward`, `bar_distribution.py:487-571`)."""
        ignore = jnp.isnan(y)
        y = jnp.where(ignore, self.borders[0], y)
        target = jnp.clip(self.map_to_bucket_idx(y), 0, self.num_bars - 1)
        scaled_log_probs = jax.nn.log_softmax(logits, axis=-1) - jnp.log(
            self.bucket_widths
        )
        lp = jnp.take_along_axis(scaled_log_probs, target[..., None], axis=-1)[..., 0]
        s0, s1 = self._side_scales()
        left = _halfnormal_logpdf(
            jnp.clip(self.borders[1] - y, min=1e-8), s0
        ) + jnp.log(self.bucket_widths[0])
        right = _halfnormal_logpdf(
            jnp.clip(y - self.borders[-2], min=1e-8), s1
        ) + jnp.log(self.bucket_widths[-1])
        lp = jnp.where(target == 0, lp + left, lp)
        lp = jnp.where(target == self.num_bars - 1, lp + right, lp)
        return jnp.where(ignore, 0.0, -lp)

    __call__ = nll_loss

    def compute_scaled_log_probs(self, logits: jnp.ndarray) -> jnp.ndarray:
        """log p(y) of the piecewise-uniform density
        (reference `bar_distribution.py:173-176`)."""
        return jax.nn.log_softmax(logits, axis=-1) - jnp.log(self.bucket_widths)

    def full_ce(self, logits: jnp.ndarray, probs: jnp.ndarray) -> jnp.ndarray:
        """Cross-entropy against a full bucket distribution
        (reference `bar_distribution.py:178-179`)."""
        return -(probs * jax.nn.log_softmax(logits, axis=-1)).sum(axis=-1)

    def mean_loss(
        self, logits: jnp.ndarray, mean_prediction_logits: jnp.ndarray
    ) -> jnp.ndarray:
        """NLL of each batch element's mean prediction under separate
        mean-prediction logits (reference `bar_distribution.py:220-241`,
        kept "TO BE REMOVED AFTER BO SUBMISSION" there — ported for parity).

        logits: ``(T, B, num_bars)``; mean_prediction_logits: ``(B, num_bars)``.
        Returns ``(1, B)``.
        """
        assert logits.ndim == 3, logits.ndim
        assert mean_prediction_logits.ndim == 2, mean_prediction_logits.ndim
        scaled_mean_log_probs = self.compute_scaled_log_probs(
            mean_prediction_logits
        )
        means = jax.lax.stop_gradient(self.mean(logits))  # (T, B)
        target_mean = jnp.clip(
            self.map_to_bucket_idx(means), 0, self.num_bars - 1
        )
        picked = jnp.take_along_axis(
            scaled_mean_log_probs, target_mean.T, axis=1
        )  # (B, T)
        return -picked.mean(axis=1)[None]

    def cdf_temporary(self, logits: jnp.ndarray) -> jnp.ndarray:
        """Faithful port of the reference's odd helper
        (`bar_distribution.py:248-255`): ``-cumsum(softmax(logits)).sum(-1)``
        — note it reduces the bucket axis away (NOT a per-bucket CDF; use
        `cdf` for that). Kept verbatim because it is still called upstream."""
        probs = jax.nn.softmax(logits, axis=-1)
        return -jnp.cumsum(probs, axis=-1).sum(axis=-1)

    def plot(self, logits, ax=None, zoom_to_quantile=None, **kwargs):
        """Bar plot of one distribution (reference `bar_distribution.py:411-445`).

        Host-side convenience; requires matplotlib (not imported at module
        scope — the reference's module-level pyplot import is one of its
        recorded defects, SURVEY.md §7)."""
        import matplotlib.pyplot as plt  # deferred: plotting is optional

        logits = jnp.squeeze(jnp.asarray(logits))
        assert logits.ndim == 1, "logits should be 1d, at least after squeezing."
        if ax is None:
            ax = plt.gca()
        borders = np.asarray(self.borders)
        widths = np.asarray(self.bucket_widths)
        if zoom_to_quantile is not None:
            bounds = np.asarray(self.quantile(logits, zoom_to_quantile))
            lower_bound = float(bounds[..., 0].min())
            upper_bound = float(bounds[..., 1].max())
            ax.set_xlim(lower_bound, upper_bound)
            border_mask = (borders[:-1] >= lower_bound) & (
                borders[1:] <= upper_bound
            )
        else:
            border_mask = slice(None)
        p = np.asarray(jax.nn.softmax(logits, axis=-1) / self.bucket_widths)
        ax.bar(borders[:-1][border_mask], p[border_mask],
               widths[border_mask], **kwargs)
        return ax

    # -- moments / point estimates --------------------------------------------
    def mean(self, logits):
        """reference `bar_distribution.py:588-598`: tail buckets use the
        half-normal means."""
        bucket_means = self.borders[:-1] + self.bucket_widths / 2
        s0, s1 = self._side_scales()
        bucket_means = bucket_means.at[0].set(-_halfnormal_mean(s0) + self.borders[1])
        bucket_means = bucket_means.at[-1].set(
            _halfnormal_mean(s1) + self.borders[-2]
        )
        p = jax.nn.softmax(logits, axis=-1)
        return p @ bucket_means.astype(logits.dtype)

    def mean_of_square(self, logits):
        """reference `bar_distribution.py:600-627` (reproducing its tail formula,
        including the variance-in-mean quirk on the right tail)."""
        lb, rb = self.borders[:-1], self.borders[1:]
        ms = (lb**2 + rb**2 + lb * rb) / 3.0
        s0, s1 = self._side_scales()
        ms = ms.at[0].set(
            _halfnormal_var(s0) + (-_halfnormal_mean(s0) + self.borders[1]) ** 2
        )
        ms = ms.at[-1].set(
            _halfnormal_var(s1) + (_halfnormal_var(s1) + self.borders[-2]) ** 2
        )
        p = jax.nn.softmax(logits, axis=-1)
        return p @ ms.astype(logits.dtype)

    def variance(self, logits):
        return self.mean_of_square(logits) - self.mean(logits) ** 2

    def mode(self, logits):
        density = jax.nn.softmax(logits, axis=-1) / self.bucket_widths
        inds = jnp.argmax(density, axis=-1)
        bucket_means = self.borders[:-1] + self.bucket_widths / 2
        return bucket_means[inds]

    def median(self, logits):
        return self.icdf(logits, 0.5)

    # -- cdf / quantiles --------------------------------------------------------
    def cdf(self, logits, ys):
        """P(Y <= ys) under the bucket distribution (reference
        `bar_distribution.py:59-97`). ys broadcasting: 1-d ys are evaluated for
        every leading batch element."""
        if ys.ndim < logits.ndim and ys.ndim == 1:
            ys = jnp.broadcast_to(ys, logits.shape[:-1] + ys.shape)
        probs = jax.nn.softmax(logits, axis=-1)
        buckets = jnp.clip(self.map_to_bucket_idx(ys), 0, self.num_bars - 1)
        prob_so_far = jnp.cumsum(probs, axis=-1) - probs
        left = jnp.take_along_axis(prob_so_far, buckets, axis=-1)
        share = jnp.clip(
            (ys - self.borders[buckets]) / self.bucket_widths[buckets], 0.0, 1.0
        )
        inside = jnp.take_along_axis(probs, buckets, axis=-1) * share
        out = left + inside
        out = jnp.where(ys <= self.borders[0], 0.0, out)
        out = jnp.where(ys >= self.borders[-1], 1.0, out)
        return jnp.clip(out, 0.0, 1.0)

    def icdf(self, logits, left_prob: float):
        """Quantile function (reference `bar_distribution.py:256-283`)."""
        probs = jax.nn.softmax(logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        idx = jnp.clip(
            jax.vmap(
                lambda c: jnp.searchsorted(c, jnp.asarray(left_prob, c.dtype))
            )(cum.reshape(-1, cum.shape[-1])).reshape(cum.shape[:-1]),
            0,
            cum.shape[-1] - 1,
        )
        cum0 = jnp.concatenate([jnp.zeros_like(cum[..., :1]), cum], axis=-1)
        rest = left_prob - jnp.take_along_axis(cum0, idx[..., None], axis=-1)[..., 0]
        lb = self.borders[idx]
        rb = self.borders[idx + 1]
        p_at = jnp.take_along_axis(probs, idx[..., None], axis=-1)[..., 0]
        return lb + (rb - lb) * rest / p_at

    def quantile(self, logits, center_prob: float = 0.682):
        side = (1.0 - center_prob) / 2
        return jnp.stack(
            [self.icdf(logits, side), self.icdf(logits, 1.0 - side)], axis=-1
        )

    def ucb(self, logits, best_f, rest_prob: float = (1 - 0.682) / 2, *, maximize=True):
        if maximize:
            rest_prob = 1 - rest_prob
        return self.icdf(logits, rest_prob)

    def pi(self, logits, best_f, *, maximize=True):
        """Probability of improvement with half-normal tails
        (reference `bar_distribution.py:629-676`)."""
        assert maximize
        best_f = jnp.broadcast_to(jnp.asarray(best_f, logits.dtype), logits.shape[:-1])
        p = jax.nn.softmax(logits, axis=-1)
        widths = self.bucket_widths
        factor = 1.0 - jnp.clip(
            (best_f[..., None] - self.borders[:-1]) / widths, 0.0, 1.0
        )
        s0, s1 = self._side_scales()
        pos0 = -jnp.clip(best_f - self.borders[1], max=0.0)
        pos1 = jnp.clip(best_f - self.borders[-2], min=0.0)
        f0 = jnp.where(pos0 > 0.0, _halfnormal_cdf(pos0, s0), 0.0)
        f1 = jnp.where(pos1 > 0.0, 1.0 - _halfnormal_cdf(pos1, s1), 1.0)
        factor = factor.at[..., 0].set(f0)
        factor = factor.at[..., -1].set(f1)
        return (p * factor).sum(-1)

    def _ei_for_halfnormal(self, scale, best_f):
        """EI under a half-normal tail (reference `bar_distribution.py:677-703`)."""
        u = (0.0 - best_f) / scale
        ucdf = 0.5 * (1.0 + jax.scipy.special.erf(u / _SQRT2))
        updf = jnp.exp(-0.5 * u**2) / math.sqrt(2 * math.pi)
        return 2.0 * scale * (updf + u * ucdf)

    def ei(self, logits, best_f, *, maximize=True):
        """Expected improvement with half-normal tail buckets
        (reference `FullSupportBarDistribution.ei`, `bar_distribution.py:706-760`)."""
        assert maximize
        best_f = jnp.broadcast_to(jnp.asarray(best_f, logits.dtype), logits.shape[:-1])
        diffs = self.bucket_widths
        bf = best_f[..., None]
        clamped = jnp.clip(bf, self.borders[:-1], self.borders[1:])
        contrib = (
            (self.borders[1:] ** 2 - clamped**2) / 2 - bf * (self.borders[1:] - clamped)
        ) / diffs
        s0, s1 = self._side_scales()
        pos0 = -jnp.clip(best_f - self.borders[1], max=0.0)
        pos1 = jnp.clip(best_f - self.borders[-2], min=0.0)
        contrib = contrib.at[..., -1].set(self._ei_for_halfnormal(s1, pos1))
        contrib = contrib.at[..., 0].set(
            self._ei_for_halfnormal(s0, jnp.zeros_like(pos0))
            - self._ei_for_halfnormal(s0, pos0)
        )
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("...b,...b->...", p, contrib)

    def pdf(self, logits, y):
        return jnp.exp(-self.nll_loss(logits, y))

    def sample(self, logits, key, t: float = 1.0):
        ps = jax.random.uniform(key, logits.shape[:-1])
        flat_logits = logits.reshape(-1, logits.shape[-1]) / t
        flat_ps = ps.reshape(-1)
        out = jax.vmap(lambda lo, p: self.icdf(lo, p))(flat_logits, flat_ps)
        return out.reshape(ps.shape)

    # -- border translation (ensembling) ---------------------------------------
    def get_probs_for_different_borders(self, logits, new_borders):
        """Re-express this distribution over different borders
        (reference `bar_distribution.py:99-121`)."""
        if len(self.borders) == len(new_borders) and bool(
            jnp.all(self.borders == new_borders)
        ):
            return jax.nn.softmax(logits, axis=-1)
        pl = self.cdf(logits, new_borders)
        pl = pl.at[..., 0].set(0.0)
        pl = pl.at[..., -1].set(1.0)
        return jnp.clip(pl[..., 1:] - pl[..., :-1], min=0.0)

    def average_bar_distributions_into_this(
        self, bar_dists, logits_list, *, average_logits: bool = False
    ):
        """reference `bar_distribution.py:123-148`."""
        probs = jnp.stack(
            [
                bd.get_probs_for_different_borders(lo, self.borders)
                for bd, lo in zip(bar_dists, logits_list)
            ],
            axis=0,
        )
        if average_logits:
            probs = jax.nn.softmax(jnp.log(probs).mean(axis=0), axis=-1)
        else:
            probs = probs.mean(axis=0)
        return jnp.log(probs)


def get_bucket_limits(
    num_outputs: int,
    full_range: tuple | None = None,
    ys: np.ndarray | None = None,
    *,
    widen_bucket_limits_factor: float | None = None,
) -> np.ndarray:
    """Data-driven bucket borders (reference `bar_distribution.py:761-843`)."""
    assert (ys is None) != (full_range is None)
    if ys is not None:
        ys = np.asarray(ys).flatten()
        ys = ys[~np.isnan(ys)]
        assert len(ys) > num_outputs
        if len(ys) % num_outputs:
            ys = ys[: -(len(ys) % num_outputs)]
        per = len(ys) // num_outputs
        if full_range is None:
            full_range = (float(ys.min()), float(ys.max()))
        else:
            assert full_range[0] <= ys.min() and full_range[1] >= ys.max()
        ys_sorted = np.sort(ys)
        limits = (ys_sorted[per - 1 :: per][:-1] + ys_sorted[per::per]) / 2
        limits = np.concatenate([[full_range[0]], limits, [full_range[1]]])
        if widen_bucket_limits_factor is not None:
            limits = limits * widen_bucket_limits_factor
    else:
        width = (full_range[1] - full_range[0]) / num_outputs
        limits = np.concatenate(
            [full_range[0] + np.arange(num_outputs) * width, [full_range[1]]]
        )
    assert len(limits) - 1 == num_outputs
    return limits.astype(np.float32)
