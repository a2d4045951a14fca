"""Profiling / FLOPs accounting.

Replaces the reference's fvcore hooks (``mamba_sys.py:30-163, 832-851``:
einsum-path selective-scan FLOP handler + model GFLOPs) and thop usage with
XLA's compiled cost analysis, plus a jax.profiler trace helper and a robust
wall-clock timer (host-transfer sync — block_until_ready is unreliable
through the axon tunnel).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def selective_scan_flops(B: int, L: int, D: int, N: int, with_D: bool = True,
                         with_z: bool = False, with_group: bool = True) -> int:
    """Analytical scan FLOPs, matching flops_selective_scan_ref
    (mamba_sys.py:30-146): 9*B*L*D*N for the einsum core (grouped B/C) plus
    the optional D-skip and z-gate terms."""
    flops = 9 * B * L * D * N
    if with_D:
        flops += B * D * L
    if with_z:
        flops += B * D * L
    return flops


def compiled_cost(fn: Callable, *args) -> Dict[str, float]:
    """XLA cost analysis of ``jit(fn)(*args)``: flops / bytes accessed."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", -1.0)),
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
    }


def model_flops(model, *inputs, **apply_kwargs) -> Dict[str, float]:
    """Forward-pass FLOPs of a flax model (the VSSM.flops equivalent)."""
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), *inputs, **apply_kwargs)
    )
    variables = jax.jit(model.init)(jax.random.key(0), *inputs)
    return compiled_cost(lambda v, *x: model.apply(v, *x), variables, *inputs)


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> float:
    """Median-free mean ms/iter with a forced host sync per batch of iters."""

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(jnp.ravel(leaf)[:4]))

    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def parameter_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
