"""Tracing: hierarchical timed spans + env-filtered logging.

The reference uses the `tracing` crate with an EnvFilter defaulting to
`leann=info,warn` (`src/main.rs:24-30`) and ad-hoc per-batch timing in
build (`src/cli/build.rs:289-326`). This module goes further: `span`
is a context manager that records wall time into the metrics registry
and logs at debug level, giving every hot path (embed batch, ANN build,
search, hydration) consistent, queryable timings.

Log filtering via LEANN_LOG (e.g. LEANN_LOG=debug), mirroring RUST_LOG.
"""

from __future__ import annotations

import logging
import os
import time
from contextlib import contextmanager

logger = logging.getLogger("leann_tpu")


def configure_logging(verbose: bool = False, quiet: bool = False) -> None:
    env = os.environ.get("LEANN_LOG", "").lower()
    if env in ("debug", "trace"):
        level = logging.DEBUG
    elif env == "info":
        level = logging.INFO
    elif env in ("warn", "warning"):
        level = logging.WARNING
    elif env == "error":
        level = logging.ERROR
    elif verbose:
        level = logging.DEBUG
    elif quiet:
        level = logging.ERROR
    else:
        level = logging.WARNING
    logging.basicConfig(
        level=level, format="%(asctime)s %(levelname)s %(name)s: %(message)s"
    )
    logger.setLevel(level)


def trace_log(msg: str, *args) -> None:
    logger.debug(msg, *args)


@contextmanager
def span(name: str, **attrs):
    """Timed span: records a histogram sample `span.<name>` and emits a
    debug log line with attributes."""
    from leann_tpu.utils.metrics import METRICS

    t0 = time.perf_counter()
    try:
        yield
    finally:
        elapsed = time.perf_counter() - t0
        METRICS.observe(f"span.{name}.seconds", elapsed)
        if logger.isEnabledFor(logging.DEBUG):
            extra = " ".join(f"{k}={v}" for k, v in attrs.items())
            logger.debug("span %s took %.3fs %s", name, elapsed, extra)
