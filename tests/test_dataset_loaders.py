"""Dataset loader tests on synthetic CSVs matching the reference schemas, plus the
embeddings-cache contract (pre-seeded cache loads without encoders)."""

import numpy as np
import pandas as pd
import pytest


def _write_pad_ufes(tmp_path, n=30):
    rng = np.random.default_rng(0)
    bool_cats = [
        "smoke", "drink", "pesticide", "skin_cancer_history", "cancer_history",
        "has_piped_water", "has_sewage_system", "itch", "grew", "hurt",
        "bleed", "elevation", "biopsed", "changed",
    ]
    df = pd.DataFrame({c: rng.choice([True, False], size=n) for c in bool_cats})
    df["background_father"] = rng.choice(["POMERANIA", "GERMANY", "BRAZIL"], size=n)
    df["background_mother"] = rng.choice(["POMERANIA", "NETHERLANDS"], size=n)
    df["gender"] = rng.choice(["MALE", "FEMALE"], size=n)
    df["region"] = rng.choice(["ARM", "NECK", "FACE"], size=n)
    df["age"] = rng.integers(20, 90, size=n)
    df["diameter_1"] = rng.uniform(1, 20, size=n)
    df["diameter_2"] = rng.uniform(1, 20, size=n)
    df["img_id"] = [f"PAT_{i}.png" for i in range(n)]
    df["diagnostic"] = rng.choice(["BCC", "MEL", "NEV", "ACK", "SCC", "SEK"], size=n)
    (tmp_path / "pad").mkdir()
    df.to_csv(tmp_path / "pad" / "metadata.csv", index=False)
    return tmp_path / "pad"


def test_pad_ufes_loader_schema(tmp_path):
    from multimodalpfn_tpu.datasets.loaders import PADUFES20Dataset

    root = _write_pad_ufes(tmp_path)
    ds = PADUFES20Dataset(str(root), embeddings_root=str(tmp_path / "emb"))
    assert ds.x.shape == (30, 21)
    assert ds.y.shape == (30,)
    assert len(ds.cat_features) == 18
    assert set(ds.y) <= set(range(6))
    # cache contract: pre-seeded embeddings load without any encoder
    cache = tmp_path / "emb" / "pad_ufes_20"
    cache.mkdir(parents=True)
    emb = np.random.default_rng(1).normal(size=(30, 1, 768)).astype(np.float32)
    np.savez_compressed(cache / "pad_ufes_20_dinov2.npz", embeddings=emb)
    got = ds.get_embeddings()
    np.testing.assert_array_equal(got, emb)
    x, image, y = ds[3]
    assert image.shape == (1, 768)


def test_pad_ufes_reads_reference_pt_cache(tmp_path):
    torch = pytest.importorskip("torch")
    from multimodalpfn_tpu.datasets.loaders import PADUFES20Dataset

    root = _write_pad_ufes(tmp_path)
    ds = PADUFES20Dataset(str(root), embeddings_root=str(tmp_path / "emb"))
    cache = tmp_path / "emb" / "pad_ufes_20"
    cache.mkdir(parents=True)
    emb = torch.randn(30, 1, 768)
    torch.save(emb, cache / "pad_ufes_20_dinov2.pt")
    got = ds.get_embeddings()
    np.testing.assert_allclose(got, emb.numpy(), rtol=1e-6)


def test_cloth_loader_schema(tmp_path):
    from multimodalpfn_tpu.datasets.loaders import ClothDataset

    rng = np.random.default_rng(0)
    n = 25
    df = pd.DataFrame(
        {
            "Division Name": rng.choice(["General", "Petite"], size=n),
            "Department Name": rng.choice(["Tops", "Dresses"], size=n),
            "Class Name": rng.choice(["Blouses", "Knits"], size=n),
            "Age": rng.integers(18, 80, size=n),
            "Positive Feedback Count": rng.integers(0, 10, size=n),
            "Title": ["Nice" if i % 2 else "" for i in range(n)],
            "Review Text": [f"review {i}" for i in range(n)],
            "Rating": rng.integers(1, 6, size=n),
        }
    )
    (tmp_path / "cloth").mkdir()
    df.to_csv(tmp_path / "cloth" / "reviews.csv", index=False)
    ds = ClothDataset(str(tmp_path / "cloth"), filename="reviews.csv",
                      embeddings_root=str(tmp_path / "emb"))
    assert ds.x.shape == (n, 5)
    assert len(ds.text) == n
    assert ds.cat_features == ["Division Name", "Department Name", "Class Name"]


def test_petfinder_loader_schema(tmp_path):
    from multimodalpfn_tpu.datasets.loaders import PetfinderDataset

    rng = np.random.default_rng(0)
    n = 20
    root = tmp_path / "pf"
    (root / "train").mkdir(parents=True)
    cats = ["Breed1", "Breed2", "Color1", "Color2", "Color3", "Dewormed",
            "FurLength", "Gender", "Health", "MaturitySize", "State",
            "Sterilized", "Type", "Vaccinated"]
    df = pd.DataFrame({c: rng.integers(0, 4, size=n) for c in cats})
    for c in ["Age", "VideoAmt", "Quantity", "PhotoAmt", "Fee"]:
        df[c] = rng.integers(0, 10, size=n)
    df["PetID"] = [f"pet{i}" for i in range(n)]
    df["Description"] = [f"a pet {i}" for i in range(n)]
    df["AdoptionSpeed"] = rng.integers(0, 5, size=n)
    df.to_csv(root / "train" / "train.csv", index=False)
    ds = PetfinderDataset(str(root), embeddings_root=str(tmp_path / "emb"))
    assert ds.x.shape == (n, 19)
    assert len(ds.cat_features) == 14
    assert set(ds.y) <= set(range(5))
