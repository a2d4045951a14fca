"""Is XLA's depthwise 3x3 conv lowering a hidden cost in SS2D?

Times the SS2D depthwise conv (feature_group_count=C) at the four stage
shapes, fwd and fwd+bwd, against a hand-rolled shift-and-add formulation
(9 shifted FMAs — pure elementwise, fuses freely). If shift-add wins,
SS2D should use it on TPU.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/dwconv_bench.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][..., -1:].astype(
        jnp.float32)))


def timeit(f, *args, iters=20):
    y = f(*args)
    sync(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(*args)
    sync(y)
    return (time.perf_counter() - t0) / iters * 1e3


def dw_conv(x, w, b):
    """x (B,H,W,C), w (3,3,C), b (C): XLA grouped convolution."""
    return jax.lax.conv_general_dilated(
        x, w[:, :, None, :],
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    ) + b


def dw_shift_add(x, w, b):
    """Same conv as 9 shifted elementwise FMAs (zero 'SAME' padding)."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.broadcast_to(b, x.shape).astype(x.dtype)
    for i in range(3):
        for j in range(3):
            out = out + xp[:, i:i + H, j:j + W, :] * w[i, j]
    return out


def main():
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    B = 24
    for H, C in ((56, 192), (28, 384), (14, 768), (7, 1536)):
        x = jnp.asarray(rng.normal(size=(B, H, H, C)), jnp.bfloat16)
        w = jnp.asarray(0.1 * rng.normal(size=(3, 3, C)), jnp.bfloat16)
        b = jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.bfloat16)
        g = jnp.asarray(rng.normal(size=(B, H, H, C)), jnp.bfloat16)

        fc = jax.jit(dw_conv)
        fs = jax.jit(dw_shift_add)
        err = float(jnp.abs(fc(x, w, b).astype(jnp.float32)
                            - fs(x, w, b).astype(jnp.float32)).max())

        def loss_c(x_, w_, b_, g_):
            return jnp.sum(dw_conv(x_, w_, b_).astype(jnp.float32)
                           * g_.astype(jnp.float32))

        def loss_s(x_, w_, b_, g_):
            return jnp.sum(dw_shift_add(x_, w_, b_).astype(jnp.float32)
                           * g_.astype(jnp.float32))

        gc = jax.jit(jax.grad(loss_c, argnums=(0, 1, 2)))
        gs = jax.jit(jax.grad(loss_s, argnums=(0, 1, 2)))
        print(f"H={H:3d} C={C:5d}  conv fwd {timeit(fc, x, w, b):6.2f}"
              f"  shift fwd {timeit(fs, x, w, b):6.2f}"
              f"  conv grad {timeit(gc, x, w, b, g):6.2f}"
              f"  shift grad {timeit(gs, x, w, b, g):6.2f}"
              f"  err {err:.1e}", flush=True)


if __name__ == "__main__":
    main()
