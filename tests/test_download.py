"""Checkpoint downloader chain (models/download.py) with mocked transports.

Zero-egress environment: every network touchpoint is injected. Semantics anchor:
reference `mmpfn/models/mmpfn/model/loading.py:101-251`, `utils.py:193-241,300-351`.
"""

import urllib.error
from pathlib import Path

import numpy as np
import pytest

from multimodalpfn_tpu.models import download as dl


def test_cache_dir_resolution(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    assert dl.user_cache_dir("linux") == tmp_path / "xdg" / "tabpfn"
    monkeypatch.delenv("XDG_CACHE_HOME")
    assert dl.user_cache_dir("linux") == Path.home() / ".cache" / "tabpfn"
    assert dl.user_cache_dir("darwin") == (
        Path.home() / "Library" / "Caches" / "tabpfn"
    )
    monkeypatch.setenv("APPDATA", str(tmp_path / "appdata"))
    assert dl.user_cache_dir("win32") == tmp_path / "appdata" / "tabpfn"


def test_resolve_model_path_auto_and_env(tmp_path, monkeypatch):
    monkeypatch.setenv("TABPFN_MODEL_CACHE_DIR", str(tmp_path))
    path, mdir, name = dl.resolve_model_path("auto", "classifier")
    assert path == tmp_path / "tabpfn-v2-classifier.ckpt"
    assert mdir == tmp_path and name == "tabpfn-v2-classifier.ckpt"
    path, mdir, name = dl.resolve_model_path(tmp_path / "x" / "my.ckpt", "regressor")
    assert (path, mdir, name) == (tmp_path / "x" / "my.ckpt", tmp_path / "x", "my.ckpt")


def test_download_prefers_hf_hub(tmp_path):
    target = tmp_path / "m" / "tabpfn-v2-classifier.ckpt"
    calls = []

    def fake_hf(*, repo_id, filename, local_dir):
        calls.append((repo_id, filename))
        p = Path(local_dir) / filename
        p.write_bytes(b"HF")
        return p

    def fail_url(url):  # must not be reached
        raise AssertionError("direct URL used although HF succeeded")

    res = dl.download_model(
        target, which="classifier", hf_download=fake_hf, url_opener=fail_url
    )
    assert res == "ok"
    assert target.read_bytes() == b"HF"
    assert calls == [("Prior-Labs/TabPFN-v2-clf", "tabpfn-v2-classifier.ckpt")]


def test_download_falls_back_to_direct_url(tmp_path):
    target = tmp_path / "tabpfn-v2-regressor.ckpt"
    urls = []

    def broken_hf(**kw):
        raise ImportError("no huggingface_hub")

    def fake_url(url):
        urls.append(url)
        return b"DIRECT"

    res = dl.download_model(
        target, which="regressor", hf_download=broken_hf, url_opener=fake_url
    )
    assert res == "ok"
    assert target.read_bytes() == b"DIRECT"
    assert urls == [
        "https://huggingface.co/Prior-Labs/TabPFN-v2-reg/resolve/main/"
        "tabpfn-v2-regressor.ckpt?download=true"
    ]


def test_download_accumulates_errors(tmp_path):
    target = tmp_path / "tabpfn-v2-classifier.ckpt"

    def broken_hf(**kw):
        raise ImportError("no huggingface_hub")

    def broken_url(url):
        raise urllib.error.URLError("no egress")

    res = dl.download_model(
        target, which="classifier", hf_download=broken_hf, url_opener=broken_url
    )
    assert isinstance(res, list) and len(res) == 2
    assert not target.exists()


def test_download_rejects_unknown_model_name(tmp_path):
    res = dl.download_model(
        tmp_path / "x.ckpt", which="classifier", model_name="not-a-model.ckpt"
    )
    assert isinstance(res, list) and isinstance(res[0], ValueError)


def test_ensure_model_skips_download_when_cached(tmp_path, monkeypatch):
    monkeypatch.setenv("TABPFN_MODEL_CACHE_DIR", str(tmp_path))
    ckpt = tmp_path / "tabpfn-v2-classifier.ckpt"
    ckpt.write_bytes(b"CACHED")

    def explode(**kw):
        raise AssertionError("download attempted although file is cached")

    path = dl.ensure_model("auto", "classifier", hf_download=explode,
                           url_opener=explode)
    assert path == ckpt


def test_ensure_model_raises_when_disabled(tmp_path, monkeypatch):
    monkeypatch.setenv("TABPFN_MODEL_CACHE_DIR", str(tmp_path))
    with pytest.raises(ValueError, match="downloading is disabled"):
        dl.ensure_model("auto", "classifier", download=False)


def test_initialize_model_auto_resolves_reference_cache(tmp_path, monkeypatch):
    """model_path='auto' must load a reference-format ckpt already sitting in
    the (env-pointed) cache dir — end-to-end through the estimator layer."""
    import jax

    from multimodalpfn_tpu.estimator.base import initialize_model
    from multimodalpfn_tpu.models.config import MixerConfig, ModelConfig
    from multimodalpfn_tpu.models.loading import save_model
    from multimodalpfn_tpu.models.params import init_params

    monkeypatch.setenv("TABPFN_MODEL_CACHE_DIR", str(tmp_path))
    cfg = ModelConfig(
        emsize=24, nhead=2, nhid_factor=2, nlayers=1, n_out=10,
        mixer=MixerConfig(mixer_type="none"),
    )
    params = init_params(jax.random.PRNGKey(0), cfg, model_seed=0)
    save_model(tmp_path / "tabpfn-v2-classifier.ckpt", params, cfg)

    loaded = initialize_model(
        model_path="auto", which="classifier", static_seed=0,
        mixer_type="none", mgm_heads=2, cap_heads=2, features_per_group=1,
    )
    assert loaded.config.emsize == 24
    got = np.asarray(jax.tree.leaves(loaded.params)[0])
    assert np.isfinite(got).all()


def test_initialize_model_auto_download_failure_message(tmp_path, monkeypatch):
    from multimodalpfn_tpu.estimator.base import initialize_model

    # no egress in CI: stub the default transports so the chain fails fast
    def broken(*a, **kw):
        raise urllib.error.URLError("no egress")

    monkeypatch.setattr(dl, "_default_hf_download", broken)
    monkeypatch.setattr(dl, "_default_url_opener", broken)
    monkeypatch.setenv("TABPFN_MODEL_CACHE_DIR", str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError, match="random:<seed>"):
        initialize_model(
            model_path="auto", which="classifier", static_seed=0,
            mixer_type="none", mgm_heads=2, cap_heads=2, features_per_group=1,
        )
