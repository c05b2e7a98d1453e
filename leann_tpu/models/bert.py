"""BERT-style text encoder in pure JAX (no flax dependency in the hot
path — params are a pytree dict, apply() is a jittable function).

Covers the reference's candle BERT path (`src/embedding/candle.rs:119-225`):
tokenize -> pad -> forward -> attention-masked mean-pool -> optional L2
normalize. Designed TPU-first:

  - whole forward is one jit; batch and length are bucketed so compiles
    are cached (pad-to-max like candle.rs:119-151, but per power-of-2
    bucket instead of per-batch max, so shapes stay static)
  - bf16 matmuls with f32 accumulation on the MXU (the encoder is
    compute-bound; bf16 doubles MXU throughput and embedding quality is
    unaffected at these scales)
  - weights loadable from a HuggingFace safetensors checkpoint
    (bert-base-style naming) or randomly initialized for tests
"""

from __future__ import annotations

import functools
import json
import math
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    normalize_output: bool = True
    # "gelu" = exact erf GELU (the HF/candle BERT default); "gelu_new" /
    # "gelu_pytorch_tanh" = tanh approximation. Real-checkpoint parity
    # requires honoring the checkpoint's own activation.
    hidden_act: str = "gelu"
    # bf16 matmuls w/ f32 accumulation is the TPU fast path; the parity
    # test runs float32 for tight numerical comparison against torch.
    compute_dtype: str = "bfloat16"

    @staticmethod
    def tiny() -> "BertConfig":
        """Small config for tests (runs on CPU in milliseconds)."""
        return BertConfig(
            vocab_size=1024, hidden_size=64, num_layers=2, num_heads=2,
            intermediate_size=128, max_position_embeddings=128,
        )

    @staticmethod
    def from_hf_config(path: str) -> "BertConfig":
        with open(path, "r", encoding="utf-8") as f:
            cfg = json.load(f)
        return BertConfig(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=cfg["num_attention_heads"],
            intermediate_size=cfg["intermediate_size"],
            max_position_embeddings=cfg.get("max_position_embeddings", 512),
            type_vocab_size=cfg.get("type_vocab_size", 2),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
            hidden_act=cfg.get("hidden_act", "gelu"),
        )


# ---------------------------------------------------------------- params


def init_params(config: BertConfig, seed: int = 0) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    h, i = config.hidden_size, config.intermediate_size

    def dense(n_in, n_out):
        scale = 1.0 / math.sqrt(n_in)
        return {
            "kernel": rng.normal(0, scale, (n_in, n_out)).astype(np.float32),
            "bias": np.zeros(n_out, np.float32),
        }

    def ln():
        return {"scale": np.ones(h, np.float32), "bias": np.zeros(h, np.float32)}

    params: Dict[str, Any] = {
        "embeddings": {
            "word": rng.normal(0, 0.02, (config.vocab_size, h)).astype(np.float32),
            "position": rng.normal(
                0, 0.02, (config.max_position_embeddings, h)
            ).astype(np.float32),
            "token_type": rng.normal(
                0, 0.02, (config.type_vocab_size, h)
            ).astype(np.float32),
            "ln": ln(),
        },
        "layers": [],
    }
    for _ in range(config.num_layers):
        params["layers"].append({
            "q": dense(h, h), "k": dense(h, h), "v": dense(h, h),
            "attn_out": dense(h, h), "attn_ln": ln(),
            "ffn_in": dense(h, i), "ffn_out": dense(i, h), "ffn_ln": ln(),
        })
    return params


def fetch_hf_checkpoint(model_name: str) -> str:
    """Resolve a HuggingFace model name to a local checkpoint directory,
    downloading it if needed (reference parity: candle.rs:44-57 pulls
    safetensors or pytorch_model.bin from the hub). Honors the standard
    HF cache; raises with a clear message when offline."""
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover - hub is baked in
        raise RuntimeError(
            f"{model_name!r} is not a local directory and huggingface_hub "
            "is unavailable; pass a local checkpoint path instead."
        ) from e
    try:
        return snapshot_download(
            model_name,
            allow_patterns=[
                "config.json", "model.safetensors", "pytorch_model.bin",
                "tokenizer.json", "tokenizer_config.json", "vocab.txt",
                "special_tokens_map.json",
            ],
        )
    except Exception as e:
        raise RuntimeError(
            f"failed to fetch {model_name!r} from the HuggingFace hub: {e}. "
            "Pass a local checkpoint directory, or pre-populate the HF "
            "cache when running offline."
        ) from e


def load_hf_params(model_dir: str, config: BertConfig) -> Dict[str, Any]:
    """Load a bert-base-style HuggingFace checkpoint (model.safetensors
    preferred, pytorch_model.bin fallback — same two formats the
    reference accepts, candle.rs:44-57)."""
    st_path = os.path.join(model_dir, "model.safetensors")
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    tensors = None
    if os.path.exists(st_path):
        try:
            from safetensors.numpy import load_file

            tensors = load_file(st_path)
        except ImportError:
            tensors = None
    if tensors is None:
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        tensors = {k: v.numpy() for k, v in sd.items()}

    def t(name):
        for prefix in ("", "bert."):
            key = prefix + name
            if key in tensors:
                return np.asarray(tensors[key], dtype=np.float32)
        raise KeyError(name)

    def dense(stem):
        return {"kernel": t(stem + ".weight").T, "bias": t(stem + ".bias")}

    def ln(stem):
        return {"scale": t(stem + ".weight"), "bias": t(stem + ".bias")}

    params: Dict[str, Any] = {
        "embeddings": {
            "word": t("embeddings.word_embeddings.weight"),
            "position": t("embeddings.position_embeddings.weight"),
            "token_type": t("embeddings.token_type_embeddings.weight"),
            "ln": ln("embeddings.LayerNorm"),
        },
        "layers": [],
    }
    for layer in range(config.num_layers):
        stem = f"encoder.layer.{layer}"
        params["layers"].append({
            "q": dense(f"{stem}.attention.self.query"),
            "k": dense(f"{stem}.attention.self.key"),
            "v": dense(f"{stem}.attention.self.value"),
            "attn_out": dense(f"{stem}.attention.output.dense"),
            "attn_ln": ln(f"{stem}.attention.output.LayerNorm"),
            "ffn_in": dense(f"{stem}.intermediate.dense"),
            "ffn_out": dense(f"{stem}.output.dense"),
            "ffn_ln": ln(f"{stem}.output.LayerNorm"),
        })
    return params


# ---------------------------------------------------------------- forward


def _layer_norm(x, p, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dense(x, p, dtype=jnp.bfloat16):
    # bf16 matmul, f32 accumulate: the MXU fast path
    return (
        jnp.dot(x.astype(dtype), p["kernel"].astype(dtype),
                preferred_element_type=jnp.float32)
        + p["bias"]
    )


def bert_forward(
    params: Dict[str, Any],
    token_ids: jnp.ndarray,     # [B, T] int32
    attention_mask: jnp.ndarray,  # [B, T] f32/bool (1 = real token)
    config: BertConfig,
) -> jnp.ndarray:
    """Returns pooled sentence embeddings [B, H] (masked mean pooling +
    optional L2 norm, matching candle.rs:191-225)."""
    b, tlen = token_ids.shape
    h = config.hidden_size
    heads = config.num_heads
    head_dim = h // heads
    mask = attention_mask.astype(jnp.float32)
    cdt = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    gelu_approx = config.hidden_act in ("gelu_new", "gelu_pytorch_tanh")

    emb = params["embeddings"]
    x = (
        emb["word"][token_ids]
        + emb["position"][jnp.arange(tlen)][None, :, :]
        + emb["token_type"][jnp.zeros_like(token_ids)]
    )
    x = _layer_norm(x, emb["ln"], config.layer_norm_eps)

    # additive attention bias: -inf on padding keys
    att_bias = (1.0 - mask)[:, None, None, :] * -1e9

    for layer in params["layers"]:
        q = _dense(x, layer["q"], cdt).reshape(b, tlen, heads, head_dim)
        k = _dense(x, layer["k"], cdt).reshape(b, tlen, heads, head_dim)
        v = _dense(x, layer["v"], cdt).reshape(b, tlen, heads, head_dim)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(head_dim)
        probs = jax.nn.softmax(scores + att_bias, axis=-1)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", probs.astype(cdt),
            v.astype(cdt), preferred_element_type=jnp.float32,
        ).reshape(b, tlen, h)
        x = _layer_norm(
            x + _dense(ctx, layer["attn_out"], cdt), layer["attn_ln"],
            config.layer_norm_eps,
        )
        y = jax.nn.gelu(
            _dense(x, layer["ffn_in"], cdt), approximate=gelu_approx
        )
        x = _layer_norm(
            x + _dense(y, layer["ffn_out"], cdt), layer["ffn_ln"],
            config.layer_norm_eps,
        )

    # masked mean pool
    denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
    pooled = (x * mask[:, :, None]).sum(axis=1) / denom
    if config.normalize_output:
        pooled = pooled / (
            jnp.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-12
        )
    return pooled


# ---------------------------------------------------------------- tokenizers


class HashTokenizer:
    """Deterministic fallback tokenizer: whitespace words hashed into a
    fixed vocab. Hermetic (no downloads); used for tests and when no HF
    tokenizer files are available."""

    def __init__(self, vocab_size: int = 1024, max_length: int = 128):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.cls_id = 1
        self.sep_id = 2

    def encode_batch(self, texts) -> Tuple[np.ndarray, np.ndarray]:
        import hashlib

        rows = []
        for text in texts:
            ids = [self.cls_id]
            for word in text.lower().split()[: self.max_length - 2]:
                digest = hashlib.md5(word.encode("utf-8")).digest()
                ids.append(
                    3 + int.from_bytes(digest[:4], "little") % (self.vocab_size - 3)
                )
            ids.append(self.sep_id)
            rows.append(ids)
        t = max(len(r) for r in rows)
        out = np.zeros((len(rows), t), dtype=np.int32)
        mask = np.zeros((len(rows), t), dtype=np.int32)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return out, mask


class HfTokenizer:
    """transformers tokenizer from a local directory (no network)."""

    def __init__(self, model_dir: str, max_length: int = 256):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(model_dir)
        self.max_length = max_length

    def encode_batch(self, texts) -> Tuple[np.ndarray, np.ndarray]:
        enc = self.tok(
            list(texts), padding=True, truncation=True,
            max_length=self.max_length, return_tensors="np",
        )
        return (
            enc["input_ids"].astype(np.int32),
            enc["attention_mask"].astype(np.int32),
        )


# ---------------------------------------------------------------- encoder


def _bucket_len(t: int, floor: int = 16, cap: int = 512) -> int:
    size = floor
    while size < t and size < cap:
        size *= 2
    return min(size, cap)


def _bucket_batch(b: int, floor: int = 8) -> int:
    size = floor
    while size < b:
        size *= 2
    return size


class BertEncoder:
    """Host-facing encoder: tokenize, bucket, jitted forward."""

    def __init__(
        self,
        config: Optional[BertConfig] = None,
        model_dir: Optional[str] = None,
        max_length: int = 256,
        seed: int = 0,
        compute_dtype: Optional[str] = None,
    ):
        if model_dir:
            if not os.path.isdir(model_dir):
                # HF-hub name, not a local path: fetch the checkpoint like
                # the reference does (candle.rs:44-57 pulls safetensors /
                # pytorch_model.bin from the hub).
                model_dir = fetch_hf_checkpoint(model_dir)
            hf_cfg = os.path.join(model_dir, "config.json")
            self.config = (
                BertConfig.from_hf_config(hf_cfg)
                if os.path.exists(hf_cfg)
                else (config or BertConfig())
            )
            # A real checkpoint dir that fails to load must hard-fail:
            # silently falling back to random weights would make a pruned
            # index quietly return garbage embeddings.
            try:
                self.params = load_hf_params(model_dir, self.config)
            except Exception as e:
                raise RuntimeError(
                    f"failed to load model weights from {model_dir!r}: {e}. "
                    "Expected model.safetensors or pytorch_model.bin with "
                    "BERT-style parameter names."
                ) from e
            try:
                self.tokenizer = HfTokenizer(model_dir, max_length)
            except Exception as e:
                # never pair real weights with the hash tokenizer
                raise RuntimeError(
                    f"failed to load tokenizer from {model_dir!r}: {e}. "
                    "A tokenizer.json / vocab.txt matching the checkpoint "
                    "is required when real weights are used."
                ) from e
        else:
            self.config = config or BertConfig.tiny()
            self.params = init_params(self.config, seed)
            self.tokenizer = HashTokenizer(self.config.vocab_size, max_length)
        if compute_dtype is not None:
            import dataclasses

            self.config = dataclasses.replace(
                self.config, compute_dtype=compute_dtype)
        self.max_length = min(max_length, self.config.max_position_embeddings)
        self.params = jax.device_put(self.params)
        self._fwd = jax.jit(
            functools.partial(bert_forward, config=self.config)
        )

    @property
    def dimensions(self) -> int:
        return self.config.hidden_size

    def encode_tokens(
        self, token_ids: np.ndarray, attention_mask: np.ndarray
    ) -> np.ndarray:
        return np.asarray(
            self._fwd(self.params, jnp.asarray(token_ids), jnp.asarray(attention_mask))
        )

    def embed(self, texts, batch_size: int = 128) -> np.ndarray:
        out = []
        for i in range(0, len(texts), batch_size):
            chunk = texts[i : i + batch_size]
            ids, mask = self.tokenizer.encode_batch(chunk)
            # bucket shapes so jit caches stay warm
            b, t = ids.shape
            tb = _bucket_len(t, cap=self.max_length)
            bb = _bucket_batch(b)
            ids2 = np.zeros((bb, tb), np.int32)
            mask2 = np.zeros((bb, tb), np.int32)
            ids2[:b, : min(t, tb)] = ids[:, :tb]
            mask2[:b, : min(t, tb)] = mask[:, :tb]
            out.append(self.encode_tokens(ids2, mask2)[:b])
        return np.concatenate(out, axis=0) if out else np.zeros((0, self.dimensions), np.float32)

    def tokenize_corpus(
        self, texts, max_length: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Fixed-width token matrix for the on-device token store
        (pruned-index recompute)."""
        t = max_length or self.max_length
        ids_list, mask_list = self.tokenizer.encode_batch(texts)
        n, cur = ids_list.shape
        out = np.zeros((n, t), np.int32)
        mask = np.zeros((n, t), np.int32)
        w = min(cur, t)
        out[:, :w] = ids_list[:, :w]
        mask[:, :w] = mask_list[:, :w]
        return out, mask
