"""Text embedding shim (ELECTRA-base CLS embeddings, L0).

The reference embeds text with HF ``google/electra-base-discriminator`` CLS tokens
(`mmpfn/datasets/cloth.py:57-88`, `datasets/petfinder.py:152-188`), cached to disk;
the MMPFN hot path only ever consumes the cached embeddings. This shim keeps that
contract: precomputed-embeddings-first, with a torch/transformers fallback for
one-time generation when the model is available locally (this is offline cache
generation, not the TPU compute path).
"""

from __future__ import annotations

import numpy as np

ELECTRA_MODEL = "google/electra-base-discriminator"


def embed_texts(
    texts: list[str],
    *,
    model_name: str = ELECTRA_MODEL,
    max_length: int = 512,
    batch_size: int = 16,
) -> np.ndarray:
    """Texts -> (B, 1, 768) CLS embeddings via HF transformers (offline cache
    generation). Raises a clear error when the model isn't available locally."""
    try:
        import torch
        from transformers import AutoModel, AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_name)
        model = AutoModel.from_pretrained(model_name).eval()
    except Exception as e:  # pragma: no cover - env without model weights
        raise RuntimeError(
            f"Text encoder {model_name!r} unavailable (offline?). Precompute "
            f"embeddings elsewhere and place them in the dataset's embeddings/ "
            f"cache (see datasets/*.py cache contract)."
        ) from e

    outs = []
    with torch.no_grad():
        for i in range(0, len(texts), batch_size):
            batch = [str(t) for t in texts[i : i + batch_size]]
            toks = tokenizer(
                batch,
                return_tensors="pt",
                truncation=True,
                padding=True,
                max_length=max_length,
            )
            hidden = model(**toks).last_hidden_state
            outs.append(hidden[:, 0, :].numpy())
    return np.concatenate(outs)[:, None, :].astype(np.float32)
