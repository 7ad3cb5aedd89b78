"""The one-command published-artifact runner (`scripts/run_published.py`)
executes the full chain offline: synthetic PAD-UFES stand-in data dir +
pre-seeded embedding caches + random-init checkpoint → configs 1-4
(tabular / +image / +text / tri-modal 8-member) → AUROC JSON."""

import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


@pytest.fixture
def pad_dir(tmp_path):
    n = 120  # K-fold(10) episodes need >=10 rows/class in every train split
    rng = np.random.default_rng(0)
    bool_cats = [
        "smoke", "drink", "pesticide", "skin_cancer_history", "cancer_history",
        "has_piped_water", "has_sewage_system", "itch", "grew", "hurt",
        "bleed", "elevation", "biopsed", "changed",
    ]
    df = pd.DataFrame({c: rng.integers(0, 2, n).astype(bool) for c in bool_cats})
    df["background_father"] = rng.choice(["POMERANIA", "GERMANY"], n)
    df["background_mother"] = rng.choice(["POMERANIA", "ITALY"], n)
    df["gender"] = rng.choice(["MALE", "FEMALE"], n)
    df["region"] = rng.choice(["ARM", "FACE"], n)
    df["age"] = rng.integers(20, 80, n)
    df["diameter_1"] = rng.uniform(2, 12, n).round(1)
    df["diameter_2"] = rng.uniform(2, 12, n).round(1)
    df["diagnostic"] = np.array(["BCC", "MEL", "NEV"])[np.arange(n) % 3]
    df["img_id"] = [f"PAT_{i}.png" for i in range(n)]
    root = tmp_path / "data" / "pad_ufes_20"
    root.mkdir(parents=True)
    df.to_csv(root / "metadata.csv", index=False)
    return tmp_path, n


@pytest.mark.slow
def test_run_published_offline_chain(pad_dir, monkeypatch):
    tmp_path, n = pad_dir
    rng = np.random.default_rng(1)

    # pre-seed both modality caches (the day-one-with-network path would
    # generate them via DINOv2 / ELECTRA; cache-first contract)
    emb_root = tmp_path / "embeddings"
    img_cache = emb_root / "pad_ufes_20" / "pad_ufes_20_dinov2.npz"
    img_cache.parent.mkdir(parents=True)
    np.savez_compressed(
        img_cache, embeddings=rng.normal(size=(n, 1, 768)).astype(np.float32)
    )
    np.savez_compressed(
        emb_root / "pad_ufes_20" / "pad_ufes_20_clinical_electra.npz",
        emb=rng.normal(size=(n, 1, 768)).astype(np.float32),
    )

    import run_published

    out = run_published.main([
        "--data-root", str(tmp_path / "data"),
        "--embeddings-root", str(emb_root),
        "--ckpt", "random:0",
        "--configs", "1,2,3,4",
        "--seeds", "1",
        "--steps", "2",
        "--mgm-heads", "2",
        "--cap-heads", "2",
        "--results", str(tmp_path / "out.json"),
    ])

    names = [r["config"] for r in out["runs"]]
    assert names == [
        "1-tabular-only", "2-tabular+image", "3-tabular+text",
        "4-trimodal-8member",
    ]
    for r in out["runs"]:
        assert 0.0 <= r["auroc_mean"] <= 1.0
        assert 0.0 <= r["accuracy_mean"] <= 1.0
    saved = json.loads((tmp_path / "out.json").read_text())
    assert saved["dataset"] == "pad_ufes_20"


def test_clinical_notes_template(pad_dir):
    tmp_path, n = pad_dir
    from multimodalpfn_tpu.datasets.loaders import PADUFES20Dataset

    import run_published

    ds = PADUFES20Dataset(str(tmp_path / "data" / "pad_ufes_20"))
    notes = run_published.clinical_notes(ds.df)
    assert len(notes) == n
    assert all("Patient aged" in t for t in notes)
