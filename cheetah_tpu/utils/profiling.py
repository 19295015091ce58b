"""Profiling helpers (aux subsystem; the reference has none, SURVEY §5.1).

Thin conveniences over ``jax.profiler`` plus an honest wall-clock timer that
works around asynchronous dispatch (and, on tunneled backends, unreliable
``block_until_ready`` — see ``.claude/skills/verify/SKILL.md``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable with TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(
    fn: Callable, *args, iters: int = 10, force_fetch: bool = True
) -> dict[str, float]:
    """Time a jitted function.

    :param force_fetch: Fetch a scalar reduction of the output every
        iteration, forcing the full host round trip (required on remote
        backends where ``block_until_ready`` returns early). When ``False``,
        uses pipelined dispatch with a single sync at the end (a throughput
        upper bound).
    :return: Dict with ``mean_ms``, ``min_ms`` and per-iteration timings.
    """
    import jax.numpy as jnp

    def run_once():
        out = fn(*args)
        if force_fetch:
            leaves = jax.tree_util.tree_leaves(out)
            return float(np.asarray(jnp.sum(leaves[0].ravel()[:64])))
        return out

    run_once()  # Compile

    timings = []
    if force_fetch:
        for _ in range(iters):
            start = time.perf_counter()
            run_once()
            timings.append((time.perf_counter() - start) * 1e3)
    else:
        start = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs)
        timings = [(time.perf_counter() - start) / iters * 1e3] * iters

    return {
        "mean_ms": float(np.mean(timings)),
        "min_ms": float(np.min(timings)),
        "timings_ms": timings,
    }


def compiled_stats(fn: Callable, *args) -> dict[str, float]:
    """FLOP and memory estimates from the compiled executable's cost
    analysis."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return {
        "flops": float(analysis.get("flops", float("nan"))),
        "bytes_accessed": float(analysis.get("bytes accessed", float("nan"))),
    }
