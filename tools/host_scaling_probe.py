"""Host CPU-scaling probe (no Spark). Runs an embarrassingly parallel
pure-Python+numpy workload — the same mix the ER kernels use (regex,
hashing, small-array numpy) — at N pinned processes for N in (8, 32),
reporting the host's achievable parallel speedup. This calibrates the
north_rule scaling measurement: a single Firecracker VM caps memory
bandwidth and fault throughput well below 32x one core, so the
pipeline's local[8]->local[32] ratio must be read against the host's
own ceiling, not against an ideal 4.0x.

Usage: python tools/host_scaling_probe.py
Prints one JSON line {"n8": sec, "n32": sec, "host_speedup": x,
"host_efficiency": x}.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import re
import time

import numpy as np

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
          "theta", "iota", "kappa"]
_RX = re.compile(r"[a-z]+[0-9]{2}")


def _unit_work(seed: int) -> int:
    """~10ms of kernel-shaped work: string building, regex scan, md5
    hashing, sorted numpy accumulation."""
    rng = np.random.default_rng(seed)
    acc = 0
    for _ in range(40):
        toks = [_WORDS[i % 10] + f"{i:02d}" for i in
                rng.integers(0, 1000, size=120)]
        text = " ".join(toks)
        acc += len(_RX.findall(text))
        hs = np.sort(np.array(
            [int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
             for t in set(toks)], dtype=np.int64))
        vals = rng.random(len(hs))
        acc += int((vals * vals).sum() * 0) + len(hs)
    return acc


def _worker(args) -> float:
    idx, units = args
    t0 = time.monotonic()
    for u in range(units):
        _unit_work(idx * 10_000 + u)
    return time.monotonic() - t0


def run(nproc: int, total_units: int) -> float:
    t0 = time.monotonic()
    with mp.get_context("spawn").Pool(nproc) as pool:
        pool.map(_worker, [(i, total_units // nproc)
                           for i in range(nproc)])
    return time.monotonic() - t0


def main() -> None:
    import sys
    lo, hi = (int(a) for a in (sys.argv[1:3] or ["8", "32"]))
    total = int(os.environ.get("WEBR_PROBE_UNITS", "2560"))
    run(lo, 256)  # warm up imports / page cache
    t_lo = run(lo, total)
    t_hi = run(hi, total)
    speedup = t_lo / t_hi
    print(json.dumps({
        "total_units": total,
        f"n{lo}_sec": round(t_lo, 2),
        f"n{hi}_sec": round(t_hi, 2),
        f"host_speedup_{lo}_to_{hi}": round(speedup, 3),
        "host_efficiency": round(speedup / (hi / lo), 3),
    }))


if __name__ == "__main__":
    main()
