"""Device-accurate timing on tunneled TPUs.

The reference times kernels with CUDA events around a Python loop
(reference: scripts/benchmark_kernel.py:88-112, scripts/benchmark_llm.py:50-59).
On an axon-tunneled TPU, `block_until_ready` does not actually block and
host transfers are expensive, so the equivalent here chains N iterations
inside ONE jitted `lax.fori_loop` (each iteration's output feeds the next
input — a true data dependency XLA cannot elide) and syncs once on a scalar.
Per-iteration time is the difference quotient between two chain lengths,
which cancels dispatch, compile-cache lookup, and sync overhead exactly.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _sync_scalar(x) -> float:
    """Force one host sync by pulling a single f32 scalar."""
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.ravel(leaf)[0].astype(jnp.float32))


def _clock(f, args) -> float:
    t0 = time.perf_counter()
    _sync_scalar(f(*args))
    return time.perf_counter() - t0


def time_chained(
    make_chain: Callable[[int], Callable],
    args: Sequence,
    n1: int = 4,
    n2: int = 20,
    repeats: int = 3,
    min_delta_s: float = 0.030,
    max_n2: int = 2000,
) -> float:
    """Seconds/iteration of `make_chain(n)(*args)`.

    `make_chain(n)` must return a jitted callable running n chained
    iterations of the op under test and returning (at least) one array.
    Inputs are passed as jit arguments, not embedded constants (constants
    blow past the remote-compile request size limit on tunneled TPUs).

    The long chain grows geometrically until the (t2 - t1) delta clears
    `min_delta_s` — tunnel round-trip jitter is on the order of
    milliseconds, so fast kernels need hundreds of chained iterations to
    resolve (the CUDA-events analog would be raising --iter,
    reference: scripts/benchmark_kernel.py:88-96).
    """
    f1 = make_chain(n1)
    _sync_scalar(f1(*args))  # compile + warmup
    t1 = min(_clock(f1, args) for _ in range(repeats))

    while True:
        f2 = make_chain(n2)
        _sync_scalar(f2(*args))
        t2 = min(_clock(f2, args) for _ in range(repeats))
        if t2 - t1 >= min_delta_s or n2 >= max_n2:
            return max((t2 - t1) / (n2 - n1), 1e-9)
        n2 = min(n2 * 4, max_n2)


def chain_attention(attn_fn, n: int, out_dtype):
    """Chain builder for attention-shaped fns (q, k, v) -> o with o ~ q."""

    @jax.jit
    def f(q, k, v):
        def body(i, q_):
            # Output feeds the next query: bounded values (convex
            # combinations of V rows), true data dependency.
            return attn_fn(q_, k, v).astype(out_dtype)

        out = jax.lax.fori_loop(0, n, body, q)
        return out[(0,) * out.ndim].astype(jnp.float32)

    return f


def time_fn(f, args, iters: int = 10, warmup: int = 2) -> float:
    """Plain wall-clock seconds/call (one sync per call).

    Adequate for whole-model steps whose runtime dwarfs dispatch overhead;
    use `time_chained` for microsecond-scale kernels.
    """
    for _ in range(warmup):
        _sync_scalar(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync_scalar(f(*args))
    return (time.perf_counter() - t0) / iters
