"""Real-TPU smoke of the round-5 snapshot refactor (_PaddedImage sentinel,
shared _repeat_last_pad, KV dispatch): fit+predict on all three engines at a
small PAD-UFES-like shape, pipelined predict_proba_many, and the
user-supplied jax.Array image input — asserting the device paths agree with
each other and with the numpy-image path."""

from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multimodalpfn_tpu import MMPFNClassifier
    from multimodalpfn_tpu.datasets.synthetic import pad_ufes_like

    print("backend:", jax.devices()[0].platform, jax.devices()[0].device_kind)

    X, emb, y = pad_ufes_like(seed=0)
    n = 400
    X, emb, y = X[:n], emb[:n], y[:n]
    ntr = 300
    ref = None
    for mode in ("fit_preprocessors", "low_memory", "fit_with_cache"):
        clf = MMPFNClassifier(
            model_path="random:0", n_estimators=4, fit_mode=mode, random_state=0
        )
        clf.fit(X[:ntr], emb[:ntr], y[:ntr])
        p = clf.predict_proba(X[ntr:], emb[ntr:])
        assert np.all(np.isfinite(p)) and p.shape == (n - ntr, len(np.unique(y)))
        if ref is None:
            ref = p
        else:
            np.testing.assert_allclose(p, ref, rtol=0, atol=2e-2)
        print(f"{mode}: ok  max|dp|={np.abs(p - ref).max():.2e}")

    # pipelined stream == sequential (same engine instance kinds)
    clf = MMPFNClassifier(
        model_path="random:0", n_estimators=4, fit_mode="fit_with_cache", random_state=0
    )
    clf.fit(X[:ntr], emb[:ntr], y[:ntr])
    Xs = [X[ntr:350], X[350:]]
    Es = [emb[ntr:350], emb[350:]]
    seq = [clf.predict_proba(a, b) for a, b in zip(Xs, Es)]
    pip = clf.predict_proba_many(Xs, Es, max_in_flight=2)
    for a, b in zip(seq, pip):
        np.testing.assert_array_equal(a, b)
    print("pipelined == sequential: exact")

    # user-supplied jax.Array test image == numpy test image (the round-5 bug)
    p_np = clf.predict_proba(X[ntr:], emb[ntr:])
    p_dev = clf.predict_proba(X[ntr:], jnp.asarray(emb[ntr:]))
    np.testing.assert_allclose(p_np, p_dev, rtol=0, atol=1e-6)
    print(f"jax.Array image input: ok  max|dp|={np.abs(p_np - p_dev).max():.2e}")
    print("SMOKE OK")


if __name__ == "__main__":
    main()
