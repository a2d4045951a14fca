"""Sweep (btile, Lc) of the PRODUCTION kernel via MAMBA_SCAN_FORCE_TILES.

Measures fwd and fwd+grad of selective_scan_pallas_tm at the four VSS stage
shapes with the round-3 chunked epilogue, to pick per-shape tiles (grid-cell
overhead ~0.9 us/cell vs VMEM slab budget).
"""

from __future__ import annotations

import functools
import os

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from benchmarks.dec_scan_proto import timeit  # noqa: E402


def main():
    from mamba_unet_tpu.ops import selective_scan_ref
    from mamba_unet_tpu.ops import selective_scan_pallas as ssp

    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    BATCH, K, n = 24, 4, 16

    for L, dg in ((3136, 192), (784, 384), (196, 768), (49, 1536)):
        print(f"\n=== L={L} dg={dg} ===", flush=True)
        u = jnp.asarray(rng.normal(size=(BATCH, K, L, dg)), jnp.bfloat16)
        dl = jnp.asarray(0.1 * rng.normal(size=(BATCH, K, L, dg)), jnp.bfloat16)
        A = -jnp.exp(jnp.asarray(rng.normal(size=(K * dg, n)), jnp.float32) * 0.5)
        Bm = jnp.asarray(rng.normal(size=(BATCH, K, L, n)), jnp.bfloat16)
        Cm = jnp.asarray(rng.normal(size=(BATCH, K, L, n)), jnp.bfloat16)

        want = selective_scan_ref(
            u.astype(jnp.float32).reshape(BATCH, K, L, dg).transpose(0, 1, 3, 2)
            .reshape(BATCH, K * dg, L),
            dl.astype(jnp.float32).reshape(BATCH, K, L, dg).transpose(0, 1, 3, 2)
            .reshape(BATCH, K * dg, L),
            A,
            Bm.astype(jnp.float32).transpose(0, 1, 3, 2),
            Cm.astype(jnp.float32).transpose(0, 1, 3, 2),
            None, None, None, True,
        ).reshape(BATCH, K, dg, L).transpose(0, 1, 3, 2)

        gy = jnp.asarray(rng.normal(size=(BATCH, K, L, dg)), jnp.bfloat16)

        def fwd(u_, dl_, A_, B_, C_):
            return ssp.selective_scan_pallas_tm(u_, dl_, A_, B_, C_,
                                                delta_softplus=True)

        def loss(u_, dl_, A_, B_, C_, gy_):
            return jnp.sum(fwd(u_, dl_, A_, B_, C_).astype(jnp.float32)
                           * gy_.astype(jnp.float32))

        configs = [None]
        for bt in (8,):
            for Lc in (16, 32, 48, 64, 96):
                if BATCH % bt == 0:
                    configs.append((dg, bt, Lc))
        for cfg in configs:
            if cfg is None:
                os.environ.pop("MAMBA_SCAN_FORCE_TILES", None)
                tag = "auto          "
            else:
                os.environ["MAMBA_SCAN_FORCE_TILES"] = ",".join(map(str, cfg))
                tag = f"dgt={cfg[0]} bt={cfg[1]:2d} Lc={cfg[2]:3d}"
            try:
                f = jax.jit(fwd)
                g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
                got = f(u, dl, A, Bm, Cm)
                err = float(jnp.abs(got.astype(jnp.float32) - want).max())
                ms_f = timeit(f, u, dl, A, Bm, Cm, iters=20)
                _ = g(u, dl, A, Bm, Cm, gy)
                ms_g = timeit(g, u, dl, A, Bm, Cm, gy, iters=10)
                ok = "OK " if err < 0.5 else "ERR"
                print(f"  {tag}  fwd {ms_f:7.2f}  grad {ms_g:7.2f}  {ok} "
                      f"(err {err:.1e})", flush=True)
            except Exception as e:
                print(f"  {tag}  FAILED {type(e).__name__}: {str(e)[:80]}",
                      flush=True)
        os.environ.pop("MAMBA_SCAN_FORCE_TILES", None)


if __name__ == "__main__":
    main()
