"""Token store for pruned-index recompute: fixed-width token matrix.

LEANN's pruned mode deletes stored embeddings; re-embedding needs the
passage *text* back through the model. Instead of re-tokenizing host-side
per search (what the reference's HTTP recompute implies,
`src/index/recompute.rs:86-93`), passages are tokenized once at build
time into an int32 [N, T] matrix that uploads to HBM — 4*T bytes/passage
vs 4*D for f32 embeddings (T=128 tokens vs 768 dims = 6x smaller), and
traversal can gather token rows on device.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def tokens_path(base: str) -> str:
    return base + ".tokens.npz"


def save_tokens(base: str, token_ids: np.ndarray, attn_mask: np.ndarray) -> None:
    np.savez_compressed(
        tokens_path(base),
        token_ids=token_ids.astype(np.int32),
        attn_mask=attn_mask.astype(np.int32),
    )


def load_tokens(base: str) -> Tuple[np.ndarray, np.ndarray]:
    with np.load(tokens_path(base), allow_pickle=False) as z:
        return z["token_ids"], z["attn_mask"]


def tokens_exist(base: str) -> bool:
    import os

    return os.path.exists(tokens_path(base))
