"""Local embedding provider: BERT on the TPU itself.

The reference's `local-embeddings` feature runs candle BERT on CPU with
batch-of-32 (`src/embedding/candle.rs:33,110-113`); here the encoder is
jitted JAX on the same TPU as the search engine, batch-of-128 default.
`model_path` may point at a HuggingFace checkpoint dir (config.json +
model.safetensors + tokenizer files); otherwise a tiny random-weight
encoder with a hash tokenizer is used (deterministic, hermetic — for
tests and pipeline bring-up).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


class LocalEmbedding:
    def __init__(self, model_path: Optional[str] = None, batch_size: int = 128):
        from leann_tpu.models.bert import BertConfig, BertEncoder

        self.model_path = model_path
        self.batch_size = batch_size
        self.encoder = BertEncoder(
            config=None if model_path else BertConfig.tiny(),
            model_dir=model_path,
        )
        self.dimensions = self.encoder.dimensions
        self.model = model_path or "local-tiny"

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        return self.encoder.embed(list(texts), batch_size=self.batch_size)
