"""Hardware scaling-ceiling probes for the N→4N efficiency analysis
(BENCH.md): what the BOX can deliver from 1 to 4 processes, independent of
Spark or the engine.

Two workloads bracket the engine's kernels:
  cpu — register-resident float loop (no memory traffic): measures
        frequency/scheduler penalties only.
  mem — repeated sweeps over a 160 MB numpy array per process: measures
        the shared-memory-bus ceiling (the access pattern of the Arrow
        tokenize / varint block-encode / parquet-zstd kernels).

Usage: python scripts/probe_scaling_ceiling.py [seconds_per_run]
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time


def _burn_cpu(q, seconds: float) -> None:
    t_end = time.monotonic() + seconds
    x, iters = 1.0, 0
    while time.monotonic() < t_end:
        for _ in range(10_000):
            x = x * 1.0000001 + 0.5
        iters += 10_000
    q.put(iters)


def _burn_mem(q, seconds: float) -> None:
    import numpy as np

    a = np.random.default_rng(0).standard_normal(20_000_000)  # 160 MB
    t_end = time.monotonic() + seconds
    iters = 0
    while time.monotonic() < t_end:
        a = a * 1.0000001 + 0.5
        iters += 1
    q.put(iters)


def _run(target, n: int, seconds: float) -> int:
    q = mp.Queue()
    ps = [mp.Process(target=target, args=(q, seconds)) for _ in range(n)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(q.get() for _ in range(n))


def main() -> None:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    for name, fn in (("cpu", _burn_cpu), ("mem", _burn_mem)):
        for rep in range(2):
            one = _run(fn, 1, seconds)
            four = _run(fn, 4, seconds)
            print(f"{name} rep{rep}: 1proc={one} 4proc={four} "
                  f"eff={four / (4 * one):.3f}")


if __name__ == "__main__":
    main()
