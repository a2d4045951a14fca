"""Does a pallas pass's cost scale with GRID CELLS or with BYTES?

Runs the cheap passes from pass_micro (softplus_only: I/O-space only;
copy: one n-expanded slab write) across (btile, Lc) combinations that vary
the cell count 12x at constant I/O bytes, plus an XLA-fused softplus over
the same arrays as the streaming baseline. Discriminates the three
hypotheses for the ~3.4 ms/pass cost (per-cell fixed vs HBM DMA efficiency
vs VPU issue).

Usage: python benchmarks/pass_scaling.py
"""

from __future__ import annotations

import functools

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from benchmarks.dec_scan_proto import timeit  # noqa: E402
from benchmarks.pass_micro import run  # noqa: E402


def main():
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    BATCH, K, n = 24, 4, 16
    L, dg = 3136, 192

    d = jnp.asarray(0.1 * rng.normal(size=(BATCH, K, L, dg)), jnp.bfloat16)
    Bm = jnp.asarray(rng.normal(size=(BATCH, K, L, n)), jnp.bfloat16)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(K * dg, n)), jnp.float32) * 0.5)
    A_t = A.reshape(K, dg, n).transpose(0, 2, 1)

    # XLA baselines: pure read->write streaming of the same I/O space
    xla_sp = jax.jit(lambda x: jax.nn.softplus(
        x.astype(jnp.float32)).astype(jnp.bfloat16))
    xla_sp(d).block_until_ready()
    print(f"  XLA softplus (read+write 2x115MB)  {timeit(xla_sp, d):7.2f} ms")

    for which in ("softplus_only", "copy"):
        print(f"=== {which} ===")
        for btile in (8, 24):
            for Lc in (16, 32, 64, 112, 196):
                if L % Lc or BATCH % btile:
                    continue
                cells = (BATCH // btile) * K * (L // Lc)
                try:
                    f = jax.jit(functools.partial(
                        run, which, btile=btile, Lc=Lc))
                    f(d, Bm, A_t)
                    ms = timeit(f, d, Bm, A_t)
                    print(f"  bt={btile:2d} Lc={Lc:3d} cells={cells:5d}"
                          f"  {ms:7.2f} ms", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"  bt={btile:2d} Lc={Lc:3d} cells={cells:5d}"
                          f"  FAILED {type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
