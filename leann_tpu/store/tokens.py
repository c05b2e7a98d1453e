"""Token store for pruned-index recompute: fixed-width token matrix.

LEANN's pruned mode deletes stored embeddings; re-embedding needs the
passage *text* back through the model. Instead of re-tokenizing host-side
per search (what the reference's HTTP recompute implies,
`src/index/recompute.rs:86-93`), passages are tokenized once at build
time into an int32 [N, T] matrix that uploads to HBM. Attention masks
are contiguous prefixes, so only per-row *lengths* are stored (mask is
rebuilt on device as iota < length). Cost: 4*(T+1) bytes/passage vs
4*D for f32 embeddings — T=128 tokens vs 768 dims ~= 6x smaller.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def tokens_path(base: str) -> str:
    return base + ".tokens.npz"


def save_tokens(base: str, token_ids: np.ndarray, attn_mask: np.ndarray) -> None:
    lengths = np.asarray(attn_mask, dtype=np.int32).sum(axis=1).astype(np.int32)
    np.savez_compressed(
        tokens_path(base),
        token_ids=token_ids.astype(np.int32),
        lengths=lengths,
    )


def load_tokens(base: str) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (token_ids [N, T], attn_mask [N, T]) — the mask is
    rebuilt from stored lengths."""
    with np.load(tokens_path(base), allow_pickle=False) as z:
        token_ids = z["token_ids"]
        lengths = z["lengths"]
    t = token_ids.shape[1]
    attn_mask = (np.arange(t)[None, :] < lengths[:, None]).astype(np.int32)
    return token_ids, attn_mask


def tokens_exist(base: str) -> bool:
    import os

    return os.path.exists(tokens_path(base))
