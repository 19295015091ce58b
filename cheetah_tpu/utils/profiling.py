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


def timeit_slope(
    fn: Callable,
    *args,
    iters: int = 20,
    repeats: int = 5,
    min_delta: float | None = None,
    max_iters: int = 200_000,
) -> float:
    """Honest per-step device time, robust to tunneled backends.

    ``block_until_ready`` is unreliable through remote tunnels (see
    ``.claude/skills/verify/SKILL.md``), so completion is observed by
    *fetching* a scalar. To keep the tunnel round-trip (~30-50 ms) out of the
    per-step figure, the step is repeated ``n`` times inside one jitted
    ``lax.fori_loop`` (dynamic trip count -> single compile), and the cost of
    one step is the slope between ``n=1`` and ``n=iters``. The loop carry
    perturbs the first input leaf by ~1e-30 so XLA cannot hoist the
    loop-invariant body out of the loop.

    :param min_delta: When > 0, grow the loop span (x10) until
        ``t_n - t_1 >= min_delta`` seconds, so sub-microsecond workloads are
        not drowned by fetch jitter (the failure mode behind an earlier bogus
        5e-9 ms record in ``bench_details.json``). ``None`` (default) picks
        0.15 s on the (tunneled) TPU backend, where fetch jitter is ~15 ms,
        and 0 elsewhere.
    :return: Seconds per step.
    """
    import jax.numpy as jnp

    if min_delta is None:
        min_delta = 0.15 if jax.default_backend() == "tpu" else 0.0

    leaves, treedef = jax.tree.flatten(args)
    # The perturbation leaf must be floating point: on an integer/bool leaf
    # the 1e-30 nudge rounds to zero, the loop body becomes loop-invariant,
    # XLA hoists it, and the reported time is silently bogus.
    try:
        pert_idx = next(
            i
            for i, leaf in enumerate(leaves)
            if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.inexact)
        )
    except StopIteration:
        raise TypeError(
            "timeit_slope needs at least one floating-point leaf in `args` to "
            "carry the anti-hoisting perturbation; got only integer/bool "
            "leaves."
        ) from None
    dtype = jnp.asarray(leaves[pert_idx]).dtype
    # The carry chain runs in at least f32: in f16/bf16 the 1e-30 nudge AND
    # the 1e-12 damping both underflow to compile-time zeros, XLA folds the
    # body to a constant, and the loop hoists (the hazard above, re-created
    # for narrow floats). The f32 carry's downcast into the leaf dtype is
    # data-dependent, so XLA cannot prove the body invariant even when the
    # runtime value rounds to zero.
    acc_dtype = jnp.promote_types(dtype, jnp.float32)
    nudge = jnp.asarray(1e-30, acc_dtype)

    @jax.jit
    def many(n, *flat):
        def body(_, carry):
            pert = list(flat)
            pert[pert_idx] = flat[pert_idx] + (carry * nudge).astype(dtype)
            out = fn(*jax.tree.unflatten(treedef, pert))
            first = jax.tree.leaves(out)[0]
            return jnp.sum(first).astype(acc_dtype) * jnp.asarray(
                1e-12, acc_dtype
            )

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), acc_dtype))

    def fetch_time(n):
        float(np.asarray(many(n, *leaves)))  # Warm/compile.
        best = np.inf
        for _ in range(repeats):
            start = time.perf_counter()
            float(np.asarray(many(n, *leaves)))
            best = min(best, time.perf_counter() - start)
        return best

    t_1 = fetch_time(1)
    n = iters
    t_n = fetch_time(n)
    while min_delta > 0 and (t_n - t_1) < min_delta and n * 10 <= max_iters:
        n *= 10
        t_n = fetch_time(n)
    return max(t_n - t_1, 1e-9) / (n - 1)


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
