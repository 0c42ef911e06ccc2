"""Machine parallel-scaling ceiling probe.

Measures the raw-CPU speedup this box delivers going from `small` to
`big` concurrent worker processes doing pure hashing — zero
coordination, zero I/O, zero shared state. On ideal hardware the
printed efficiency is 1.0; on oversubscribed / hypervisor-throttled
vCPUs it is lower, and it upper-bounds the scaling efficiency ANY job
(including ours) can exhibit between those two parallelism levels.

Run standalone:  python tools/cpu_ceiling.py [small] [big]
Prints one JSON line: {"small": n, "big": n, "t_small": s, "t_big": s,
                       "efficiency": e}
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time


def _burn(n: int) -> int:
    h = b"x" * 64
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return 1


def _run(ctx, workers: int, tasks: int, iters: int) -> float:
    t0 = time.time()
    with ctx.Pool(workers) as p:
        p.map(_burn, [iters] * tasks, chunksize=1)
    return time.time() - t0


def measure(small: int, big: int, repeats: int = 2) -> dict:
    ctx = mp.get_context("fork")
    tasks = max(big * 8, 64)  # enough tasks that stragglers average out
    t_small = min(_run(ctx, small, tasks, 200_000) for _ in range(repeats))
    t_big = min(_run(ctx, big, tasks, 200_000) for _ in range(repeats))
    return {
        "small": small,
        "big": big,
        "t_small": round(t_small, 3),
        "t_big": round(t_big, 3),
        "efficiency": round((t_small / t_big) / (big / small), 3),
    }


if __name__ == "__main__":
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print(json.dumps(measure(s, b)))
