"""Stage timing / metrics collection.

TPU-native equivalent of the reference's timers
(Common::PerformanceTimer, reference SfM/common.h:48-132;
TimerGPU/TimerCPU, CudaSift/cudautils.h:61-107) and its unconditional
per-stage printfs.  Here: a context-manager stopwatch that forces
device synchronization (via a throwaway D2H read — `block_until_ready`
does not reliably synchronize through remote-dispatch backends) and a
structured metrics dict instead of stdout noise.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


def sync(x=None):
    """Force completion of outstanding device work.

    A scalar device->host read is the only reliable barrier on relay
    backends where jax.block_until_ready can return early (measured in
    r1: async illusion of 0.1 ms for 1.1 s of work).
    """
    import jax
    import jax.numpy as jnp

    if x is not None:
        for leaf in jax.tree_util.tree_leaves(x):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()
        leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "sum")]
        if leaves:
            float(jnp.sum(leaves[0].ravel()[:1]))
    else:
        float(jnp.zeros(()) + 0.0)
    return x


def measure_rtt(n: int = 5) -> float:
    """Measured relay round-trip latency in MILLISECONDS.

    The project measurement convention (CLAUDE.md): amortized timings
    chain N dispatches, sync once, and subtract this RTT.  One warm-up
    dispatch, then the min over `n` trivial dispatch+D2H round trips.
    """
    import time as _time

    import jax.numpy as jnp

    one = jnp.float32(1.0) + 0.0
    _ = float(one)
    rtt = float("inf")
    for i in range(n):
        t0 = _time.time()
        _ = float(one + jnp.float32(i))
        rtt = min(rtt, (_time.time() - t0) * 1000.0)
    return rtt


class StageTimer:
    """Accumulating per-stage wall-clock timer with device sync."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name, result_getter=None):
        t0 = time.perf_counter()
        yield
        sync()
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def record(self, name, seconds):
        self.totals[name] += seconds
        self.counts[name] += 1

    def summary(self):
        return {
            name: {
                "total_ms": round(self.totals[name] * 1e3, 3),
                "count": self.counts[name],
                "mean_ms": round(self.totals[name] / max(self.counts[name], 1) * 1e3, 3),
            }
            for name in self.totals
        }

    def report(self):
        return json.dumps(self.summary(), indent=2)
