"""Text embedding (ELECTRA-base CLS embeddings, L0).

The reference embeds text with HF ``google/electra-base-discriminator`` CLS
tokens (`mmpfn/datasets/cloth.py:57-88`, `datasets/petfinder.py:152-188`),
cached to disk; the MMPFN hot path only ever consumes the cached embeddings.
This module keeps that contract (precomputed-embeddings-first) and, when the
HF checkpoint is available locally, runs the encoder itself through the
functional JAX ELECTRA (`modal/electra.py`) — tokenization stays on the HF
tokenizer (vocab files), the transformer forward runs on the JAX stack.
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
    """Texts -> (B, 1, 768) CLS embeddings (offline cache generation).

    Tokenizes with the HF tokenizer, converts the checkpoint once, and runs
    the JAX ELECTRA forward. Raises a clear error when the model isn't
    available locally.
    """
    try:
        from transformers import AutoModel, AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model_name)
        hf = AutoModel.from_pretrained(model_name).eval()
    except Exception as e:  # pragma: no cover - env without model weights
        raise RuntimeError(
            f"Text encoder {model_name!r} unavailable (offline?). Precompute "
            f"embeddings elsewhere and place them in the dataset's embeddings/ "
            f"cache (see datasets/*.py cache contract)."
        ) from e

    from multimodalpfn_tpu.modal.electra import (
        ElectraConfig,
        cls_embeddings,
        convert_hf_state_dict,
    )

    hc = hf.config
    cfg = ElectraConfig(
        vocab_size=hc.vocab_size,
        hidden=hc.hidden_size,
        layers=hc.num_hidden_layers,
        heads=hc.num_attention_heads,
        intermediate=hc.intermediate_size,
        max_position=hc.max_position_embeddings,
        type_vocab=hc.type_vocab_size,
        embedding_size=hc.embedding_size,
    )
    params = convert_hf_state_dict(hf.state_dict(), cfg)

    toks = tokenizer(
        [str(t) for t in texts],
        truncation=True,
        padding="max_length",  # one static shape -> one compiled forward
        max_length=max_length,
        return_tensors="np",
    )
    return cls_embeddings(
        params,
        cfg,
        toks["input_ids"],
        toks["attention_mask"],
        batch_size=batch_size,
    )
