"""Selective-scan implementation shootout: Pallas kernel vs chunked XLA.

Prints fwd and fwd+bwd ms at the SS2D stage shapes of the 224² ACDC config.
"""

from __future__ import annotations

import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mamba_unet_tpu.ops import selective_scan_xla
    from mamba_unet_tpu.ops.selective_scan_pallas import selective_scan_pallas
    from mamba_unet_tpu.utils.profiling import time_fn

    rng = np.random.default_rng(0)
    shapes = [  # (B, D=4*d_inner, L, N, G) per VSSM stage at bs24/224²
        (24, 4 * 192, 3136, 16, 4),
        (24, 4 * 384, 784, 16, 4),
        (24, 4 * 768, 196, 16, 4),
        (24, 4 * 1536, 49, 16, 4),
    ]
    for bsz, d, L, n, G in shapes:
        u = jnp.asarray(rng.normal(size=(bsz, d, L)), jnp.float32)
        delta = jnp.asarray(0.2 * rng.normal(size=(bsz, d, L)), jnp.float32)
        A = -jnp.exp(jnp.asarray(rng.normal(size=(d, n)), jnp.float32) * 0.3)
        B = jnp.asarray(rng.normal(size=(bsz, G, n, L)), jnp.float32)
        C = jnp.asarray(rng.normal(size=(bsz, G, n, L)), jnp.float32)
        D = jnp.ones((d,), jnp.float32)
        db = jnp.zeros((d,), jnp.float32)

        fns = {
            "pallas": jax.jit(lambda *a: selective_scan_pallas(
                *a, delta_softplus=True)),
            "xla": jax.jit(lambda *a: selective_scan_xla(
                *a, delta_softplus=True)),
        }
        for name, f in fns.items():
            fwd_ms = time_fn(f, u, delta, A, B, C, D, None, db, iters=5)
            g = jax.jit(jax.grad(
                lambda u, delta: jnp.sum(f(u, delta, A, B, C, D, None, db)),
                argnums=(0, 1),
            ))
            bwd_ms = time_fn(g, u, delta, iters=5)
            print(f"B{bsz} D{d} L{L}: {name:6s} fwd {fwd_ms:8.1f} ms   "
                  f"fwd+bwd {bwd_ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
