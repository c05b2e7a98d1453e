"""Foreign-index detection.

Mirrors the reference's compat sniffing (`src/backend/compat.rs:15-38`):
a `.index` file produced by Python LEANN (FAISS) or leann-rs (usearch)
cannot be loaded by this engine — detect the magic bytes and emit
rebuild instructions instead of a cryptic parse failure.
"""

from __future__ import annotations

import os
from typing import Optional

_FAISS_MAGICS = (b"IxFI", b"IxF2", b"IxFl", b"IwFl", b"CSR\x00", b"HNSW")


def sniff_foreign_index(index_dir: str, base_name: str = "documents.leann") -> Optional[str]:
    """Returns a human-readable diagnosis if the dir holds a foreign
    binary index, else None."""
    path = os.path.join(index_dir, base_name + ".index")
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            head = f.read(8)
    except OSError:
        return None
    if any(head.startswith(m) for m in _FAISS_MAGICS) or head[:2] == b"Ix":
        kind = "FAISS (Python LEANN)"
    else:
        from leann_tpu.backend.usearch_import import looks_like_usearch

        if looks_like_usearch(path):
            return (
                f"Found a usearch (leann-rs) binary index at {path}. "
                "Its embedded vectors can be imported directly — no "
                "re-embedding needed:\n"
                "  leann-tpu reindex <name>\n"
                "(backend/usearch_import.py parses the usearch v2 "
                "format; falls back to `build --force` if parsing fails)"
            )
        kind = "usearch (leann-rs)"
    return (
        f"Found a {kind} binary index at {path}. This TPU engine uses its "
        "own graph/ivf formats; the passages/ids/meta files are compatible, "
        "so rebuild the ANN structure with:\n"
        "  leann-tpu build <name> --docs <dir> --force"
    )
