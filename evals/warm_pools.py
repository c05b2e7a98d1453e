"""Pre-generate the shared corpus pools on the host while the chip is
busy elsewhere (1 host core: generation timeshares with chip steps'
host phases, so the queue waits only on the sentinel it needs).

get_pool's np.save is not atomic — a concurrent reader polling for the
cache file could mmap a half-written one. The queue therefore waits on
the `<pool>.ready` sentinel this script touches AFTER np.save returns,
never on the pool file itself.

Usage: python evals/warm_pools.py "1000000:128" "10000000:96"
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from corpus_cache import ART_DIR, get_pool  # noqa: E402


def main() -> None:
    for spec in sys.argv[1:]:
        n, d = (int(x) for x in spec.split(":"))
        path = os.path.join(ART_DIR, f"pool_n{n}_d{d}_c1024_s0.npy")
        sentinel = path + ".ready"
        if os.path.exists(sentinel):
            print(f"pool {spec} already ready", file=sys.stderr, flush=True)
            continue
        t0 = time.time()
        print(f"generating pool {spec} ...", file=sys.stderr, flush=True)
        pool = get_pool(n, d)
        del pool
        with open(sentinel, "w") as f:
            f.write("ok\n")
        print(f"pool {spec} ready in {time.time() - t0:.0f}s",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
