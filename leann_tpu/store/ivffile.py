"""IVF index persistence: k-means centers + assignment.

The packed bucket tables are derived (cheaply, one argsort) at load
time, so the on-disk artifact stays small: K x D centroids + N int32
assignments.
"""

from __future__ import annotations

import numpy as np


def ivf_path(base: str) -> str:
    return base + ".ivf.npz"


class IvfFile:
    def __init__(self, centers: np.ndarray, assign: np.ndarray, metric: str = "ip"):
        self.centers = np.asarray(centers, dtype=np.float32)
        self.assign = np.asarray(assign, dtype=np.int32)
        self.metric = metric

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            centers=self.centers,
            assign=self.assign,
            metric=np.array(self.metric),
        )

    @staticmethod
    def load(path: str) -> "IvfFile":
        with np.load(path, allow_pickle=False) as z:
            return IvfFile(z["centers"], z["assign"], str(z["metric"]))

    @staticmethod
    def exists(base: str) -> bool:
        import os

        return os.path.exists(ivf_path(base))
