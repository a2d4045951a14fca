"""SS2D block-level compare: bidir vs folded scan paths at stage shapes.

Isolates the glue cost (stream transposes, projection einsum layouts,
cross-merge) that sits between the bare kernel win (benchmarks/folded_proto
--grad) and the end-to-end step number.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/folded_block.py [stage]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mamba_unet_tpu.nn.ss2d import SS2D  # noqa: E402

ITERS = 20


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:4].astype(jnp.float32)))


def timeit(fn, *args, iters=ITERS, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    stage = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    dims = {0: (96, 56), 1: (192, 28), 2: (384, 14), 3: (768, 7)}
    d_model, hw = dims[stage]
    bsz = 24
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(bsz, hw, hw, d_model)) * 0.5,
                    jnp.bfloat16)

    for impl, layout in (("bidir", "bhwc"), ("folded", "bhwc"),
                         ("auto", "hwbc")):
        m = SS2D(d_model=d_model, d_state=16, scan_impl=impl, layout=layout,
                 dtype=jnp.bfloat16)
        xi = x.transpose(1, 2, 0, 3) if layout == "hwbc" else x
        v = m.init(jax.random.key(0), xi[:, :, :1] if layout == "hwbc"
                   else xi[:1])
        fwd = jax.jit(lambda v, x: m.apply(v, x))

        def loss(v, x):
            return jnp.sum(m.apply(v, x).astype(jnp.float32) ** 2)

        vjp = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t_f = timeit(fwd, v, xi)
        t_g = timeit(vjp, v, xi)
        print(f"stage{stage} SS2D[{impl}/{layout}]: fwd {t_f:.2f} ms | "
              f"fwd+bwd {t_g:.2f} ms")


if __name__ == "__main__":
    main()
