"""Microbenchmark the individual vectorized passes of the scan kernel.

Ground truth for where base_noloop's ~6.7 ms (stage0) goes: each kernel
does ONE pass over the same (B, K, L, dg)->(bt, Lc, N, dgt) slab space the
production prologue/epilogue walks, isolating: plain copy, mul, exp, exp2,
the b-build broadcast pattern, and the y contraction.
"""

from __future__ import annotations

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from benchmarks.dec_scan_proto import timeit  # noqa: E402


def make_kernel(which):
    def kernel(A_ref, d_ref, B_ref, y_ref, yd_ref, scratch, *, Lc):
        A = A_ref[0]                                    # (N, dgt)
        dlt = d_ref[:, 0].astype(jnp.float32)           # (bt, Lc, dgt)
        if which == "copy":
            scratch[:] = jnp.broadcast_to(
                dlt[:, :, None, :], scratch.shape).astype(scratch.dtype)
        elif which == "mul":
            scratch[:] = (dlt[:, :, None, :] * A[None, None]).astype(
                scratch.dtype)
        elif which == "exp":
            scratch[:] = jnp.exp(dlt[:, :, None, :] * A[None, None]).astype(
                scratch.dtype)
        elif which == "exp2":
            scratch[:] = jnp.exp2(dlt[:, :, None, :] * A[None, None]).astype(
                scratch.dtype)
        elif which == "softplus_only":
            yd_ref[:, 0] = jax.nn.softplus(dlt).astype(yd_ref.dtype)
            return
        elif which == "bbuild":
            Bc = B_ref[:, 0].astype(jnp.float32)        # (bt, Lc, N)
            scratch[:] = (Bc[..., None] * dlt[:, :, None, :]).astype(
                scratch.dtype)
        elif which == "ycontract":
            Cc = B_ref[:, 0].astype(jnp.float32)
            y = jnp.sum(Cc[..., None] * scratch[:].astype(jnp.float32), axis=2)
            yd_ref[:, 0] = y.astype(yd_ref.dtype)
            return
        elif which == "exp_read":  # exp + later reread (2-pass combo)
            scratch[:] = jnp.exp(dlt[:, :, None, :] * A[None, None]).astype(
                scratch.dtype)
            yd_ref[:, 0] = jnp.sum(scratch[:].astype(jnp.float32),
                                   axis=2).astype(yd_ref.dtype)
            return
        yd_ref[:, 0] = scratch[:, :, 0].astype(yd_ref.dtype)

    return kernel


def run(which, d, Bm, A_t, *, btile, Lc, interpret=False):
    bsz, G, L, dg = d.shape
    n = A_t.shape[1]
    grid = (bsz // btile, G, 1, L // Lc)
    io = d.dtype
    kernel = functools.partial(make_kernel(which), Lc=Lc)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, dg), lambda b, g, dt, ck: (g, 0, dt)),
            pl.BlockSpec((btile, 1, Lc, dg), lambda b, g, dt, ck: (b, g, ck, dt)),
            pl.BlockSpec((btile, 1, Lc, n), lambda b, g, dt, ck: (b, g, ck, 0)),
        ],
        out_specs=[
            pl.BlockSpec((btile, 1, Lc, dg),
                         lambda b, g, dt, ck: (b, g, ck, dt)),
            pl.BlockSpec((btile, 1, Lc, dg),
                         lambda b, g, dt, ck: (b, g, ck, dt)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, G, L, dg), io),
            jax.ShapeDtypeStruct((bsz, G, L, dg), io),
        ],
        scratch_shapes=[pltpu.VMEM((btile, Lc, n, dg), io)],
        interpret=interpret,
    )(A_t, d, Bm)
    return out[1]


def main():
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    BATCH, K, n = 24, 4, 16

    for L, dg in ((3136, 192),):
        print(f"\n=== L={L} dg={dg} (the stage0 slab space) ===")
        d = jnp.asarray(0.1 * rng.normal(size=(BATCH, K, L, dg)), jnp.bfloat16)
        Bm = jnp.asarray(rng.normal(size=(BATCH, K, L, n)), jnp.bfloat16)
        A = -jnp.exp(jnp.asarray(rng.normal(size=(K * dg, n)), jnp.float32) * 0.5)
        A_t = A.reshape(K, dg, n).transpose(0, 2, 1)

        for which in ("copy", "mul", "exp", "exp2", "bbuild", "ycontract",
                      "exp_read", "softplus_only"):
            try:
                f = jax.jit(functools.partial(run, which, btile=8, Lc=16))
                f(d, Bm, A_t)
                ms = timeit(f, d, Bm, A_t)
                print(f"  {which:13s} {ms:7.2f} ms", flush=True)
            except Exception as e:
                print(f"  {which:13s} FAILED {type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
