"""Dataset loaders driven through REAL files on disk: synthetic CSVs + PNGs in
tmp dirs, through get_images (PIL loop, missing-file drop/realign) ->
get_embeddings (random-init JAX ViT) -> MMPFNClassifier fit/predict.

Covers the file-IO paths that the array-level schema tests cannot
(reference semantics: `mmpfn/datasets/pad_ufes_20.py:41-63` image loading;
`mmpfn/datasets/cbis_ddsm.py:60-78` missing-jpeg drop + x/y realignment).
"""

import numpy as np
import pandas as pd
import pytest

pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from multimodalpfn_tpu.datasets.loaders import CBISDDSMDataset, PADUFES20Dataset

IMG = 56  # multiple of 14, small enough for the 1-core CPU ViT


def _write_png(path, seed, size=24):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)


def _tiny_vit(monkeypatch):
    """Random-init ViT (768-d out, depth 1) in place of the published weights."""
    import jax

    from multimodalpfn_tpu.modal import dinov2

    cfg = dinov2.ViTConfig(depth=1, num_heads=4, compute_dtype="float32")
    params = dinov2.init_vit_params(jax.random.PRNGKey(0), cfg)
    monkeypatch.setattr(
        dinov2, "load_dinov2_vitb14", lambda path: (params, cfg)
    )
    # the loader checks for the published weight file before loading
    monkeypatch.setattr(
        "multimodalpfn_tpu.datasets.loaders.TabularImageTextDataset._image_embeddings",
        lambda self, batch_size=16: dinov2.embed_images(
            params, cfg,
            self.images if hasattr(self, "images") else self.get_images(IMG),
            batch_size=8,
        ),
    )


@pytest.fixture
def pad_ufes_dir(tmp_path):
    n = 24
    rng = np.random.default_rng(0)
    bool_cats = [
        "smoke", "drink", "pesticide", "skin_cancer_history", "cancer_history",
        "has_piped_water", "has_sewage_system", "itch", "grew", "hurt",
        "bleed", "elevation", "biopsed", "changed",
    ]
    df = pd.DataFrame({c: rng.integers(0, 2, n).astype(bool) for c in bool_cats})
    df["background_father"] = rng.choice(["POMERANIA", "GERMANY", "BRAZIL"], n)
    df["background_mother"] = rng.choice(["POMERANIA", "ITALY"], n)
    df["gender"] = rng.choice(["MALE", "FEMALE"], n)
    df["region"] = rng.choice(["ARM", "FACE", "HAND"], n)
    df["age"] = rng.integers(20, 80, n)
    df["diameter_1"] = rng.uniform(2, 12, n).round(1)
    df["diameter_2"] = rng.uniform(2, 12, n).round(1)
    df["diagnostic"] = rng.choice(["BCC", "MEL", "NEV"], n)
    df["img_id"] = [f"PAT_{i}.png" for i in range(n)]
    (tmp_path / "pad").mkdir()
    df.to_csv(tmp_path / "pad" / "metadata.csv", index=False)
    for i in range(n):
        _write_png(tmp_path / "pad" / "imgs" / f"PAT_{i}.png", seed=i)
    return tmp_path / "pad"


def test_pad_ufes_files_end_to_end(pad_ufes_dir, tmp_path, monkeypatch):
    _tiny_vit(monkeypatch)
    ds = PADUFES20Dataset(
        str(pad_ufes_dir), embeddings_root=str(tmp_path / "emb")
    )
    n = len(ds)
    assert ds.x.shape == (n, 21) and ds.y.shape == (n,)

    images = ds.get_images(IMG)
    assert images.shape == (n, 1, 3, IMG, IMG)
    assert 0.0 <= images.min() and images.max() <= 1.0

    emb = ds.get_embeddings()
    assert emb.shape == (n, 1, 768) and np.isfinite(emb).all()
    # second call must hit the .npz cache (no ViT)
    ds2 = PADUFES20Dataset(str(pad_ufes_dir), embeddings_root=str(tmp_path / "emb"))
    emb2 = ds2.get_embeddings()
    np.testing.assert_array_equal(emb, emb2)

    from multimodalpfn_tpu import MMPFNClassifier

    clf = MMPFNClassifier(
        model_path="random:0", mixer_type="MGM+CAP", mgm_heads=2, cap_heads=2,
        features_per_group=1, n_estimators=2, random_state=0,
    )
    ntr = 18
    clf.fit(ds.x[:ntr], emb[:ntr], ds.y[:ntr])
    proba = clf.predict_proba(ds.x[ntr:], emb[ntr:])
    assert proba.shape == (n - ntr, len(np.unique(ds.y)))
    np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-5)


@pytest.fixture
def cbis_dir(tmp_path):
    """CBIS-DDSM layout: CSV with DICOM-style paths; jpegs under
    jpeg/<series-uid>/. One case's cropped image is MISSING -> that row must be
    dropped and x/y realigned (reference `cbis_ddsm.py:60-78`)."""
    n = 10
    rng = np.random.default_rng(1)
    rows = []
    root = tmp_path / "cbis"
    for i in range(n):
        uids = [f"uid_full_{i}", f"uid_crop_{i}", f"uid_roi_{i}"]
        rows.append({
            "left or right breast": rng.choice(["LEFT", "RIGHT"]),
            "image view": rng.choice(["CC", "MLO"]),
            "abnormality id": int(rng.integers(1, 3)),
            "mass shape": rng.choice(["OVAL", "ROUND"]),
            "mass margins": rng.choice(["CIRCUMSCRIBED", "SPICULATED"]),
            "breast_density": int(rng.integers(1, 5)),
            "assessment": int(rng.integers(0, 6)),
            "subtlety": int(rng.integers(1, 6)),
            "pathology": rng.choice(["MALIGNANT", "BENIGN", "BENIGN_WITHOUT_CALLBACK"]),
            "image file path": f"Mass/{uids[0]}/000000.dcm",
            "cropped image file path": f"Mass/{uids[1]}/000001.dcm",
            "ROI mask file path": f"Mass/{uids[2]}/000002.dcm",
        })
        for j, uid in enumerate(uids):
            if i == 3 and j == 1:
                continue  # missing cropped jpeg for case 3
            _write_png(root / "jpeg" / uid / "1.jpg", seed=i * 3 + j)
    root.mkdir(exist_ok=True)
    pd.DataFrame(rows).to_csv(root / "mass_case.csv", index=False)
    return root


def test_cbis_ddsm_all_images_missing_file_drop(cbis_dir, tmp_path, monkeypatch):
    _tiny_vit(monkeypatch)
    ds = CBISDDSMDataset(
        str(cbis_dir), "mass_case.csv", kind="mass", image_type="all",
        embeddings_root=str(tmp_path / "emb"),
    )
    n0 = len(ds)
    assert n0 == 10
    y_before = ds.y.copy()
    x_before = ds.x.copy()

    images = ds.get_images(IMG)
    # case 3 dropped; x/y realigned
    assert images.shape == (9, 3, 3, IMG, IMG)
    assert ds.x.shape[0] == 9 and ds.y.shape[0] == 9
    np.testing.assert_array_equal(ds.y, np.delete(y_before, 3))
    np.testing.assert_array_equal(ds.x, np.delete(x_before, 3, axis=0))
    # BENIGN_WITHOUT_CALLBACK merged into BENIGN -> binary target
    assert set(np.unique(y_before)) <= {0, 1}

    emb = ds.get_embeddings()
    assert emb.shape == (9, 3, 768) and np.isfinite(emb).all()

    from multimodalpfn_tpu import MMPFNClassifier

    clf = MMPFNClassifier(
        model_path="random:0", mixer_type="MGM+CAP", mgm_heads=2, cap_heads=2,
        features_per_group=1, n_estimators=2, random_state=0,
    )
    clf.fit(ds.x[:7], emb[:7], ds.y[:7])
    proba = clf.predict_proba(ds.x[7:], emb[7:])
    assert proba.shape[0] == 2 and np.isfinite(proba).all()
