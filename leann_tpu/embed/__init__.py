"""Embedding providers (layer L4).

Mirrors the reference's provider surface (`src/embedding/mod.rs:17-164`):
modes openai / ollama / gemini / local plus our additions `fake`
(deterministic hash embedder for hermetic tests — the reference has no
fake embedding provider, a gap its SURVEY calls out) and `local` running
a JAX BERT on the TPU itself instead of CPU candle
(reference `src/embedding/candle.rs`).
"""

from leann_tpu.embed.provider import EmbeddingProvider
from leann_tpu.embed.registry import ModelConfig, get_model_config

__all__ = ["EmbeddingProvider", "ModelConfig", "get_model_config"]
