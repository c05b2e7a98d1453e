"""Optional C++ native host runtime.

The reference's performance-critical host code lives in native crates
(usearch C++, SIMD distances). Our device work is all TPU, but two host
paths are hot at 1M-chunk scale and get C++ implementations with ctypes
bindings and pure-Python fallbacks:

  - BM25 corpus tokenization + postings build (index/bm25.py calls
    bm25_build_native)
  - JSONL offset scanning for the passage store

The shared library is built lazily from native/ at repo root (see
native/build.sh); absence is never an error.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

_LIB = None
_LIB_CHECKED = False


def _load_lib():
    global _LIB, _LIB_CHECKED
    if _LIB_CHECKED:
        return _LIB
    _LIB_CHECKED = True
    import ctypes
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    candidates = [
        os.path.join(here, "libleann_native.so"),
        os.path.join(repo, "native", "libleann_native.so"),
    ]
    if not any(os.path.exists(p) for p in candidates):
        _try_compile(repo)
    for path in candidates:
        if os.path.exists(path):
            try:
                _LIB = ctypes.CDLL(path)
                break
            except OSError:
                continue
    return _LIB


def _try_compile(repo: str) -> None:
    """One-shot lazy build of the shared lib (g++ is in the image)."""
    import os
    import shutil
    import subprocess

    src = os.path.join(repo, "native", "leann_native.cpp")
    if not os.path.exists(src) or shutil.which("g++") is None:
        return
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "libleann_native.so")
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", out, src],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        pass


def bm25_build_native(
    documents: Sequence[str],
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Build BM25 postings in C++. Returns the Bm25Scorer constructor args
    (vocab, offsets, post_docs, post_tfs, doc_lengths) or None when the
    native library is unavailable."""
    lib = _load_lib()
    if lib is None:
        return None
    from leann_tpu.native.bm25_bridge import build_postings

    return build_postings(lib, documents)
