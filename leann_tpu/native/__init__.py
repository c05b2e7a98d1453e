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

    path = _compiled_lib_path()
    if path is not None:
        try:
            _LIB = ctypes.CDLL(path)
        except OSError:
            _LIB = None
    return _LIB


def _compiled_lib_path():
    """Compile the shared lib into a cache dir keyed on the source hash,
    so a stale or foreign binary can never shadow the checked-in C++
    (no prebuilt .so ships in the repo)."""
    import hashlib
    import os
    import shutil
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    src = os.path.join(repo, "native", "leann_native.cpp")
    if not os.path.exists(src) or shutil.which("g++") is None:
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get(
        "LEANN_NATIVE_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")),
            "leann_tpu",
        ),
    )
    out = os.path.join(cache, f"libleann_native-{digest}.so")
    if os.path.exists(out):
        return out
    try:
        os.makedirs(cache, exist_ok=True)
        tmp = out + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", tmp, src],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, out)  # atomic under concurrent builders
        return out
    except Exception:
        return None


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
