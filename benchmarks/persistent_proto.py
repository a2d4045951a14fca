"""Persistent-kernel forward prototype for the selective scan.

Round-3 profiling (docs/PROFILE.md "Decimated kernel experiments") showed
the production kernels are bound by per-grid-cell fixed cost (~1.3 us x
2352 cells at stage0) plus slab traffic — NOT by the serial recurrence.
This prototype restructures the forward so the L-chunk axis moves from the
grid into the kernel: grid (B-tiles, G, dg-tiles) = 12 cells at stage0,
each looping over all L-chunks with double-buffered manual DMA
(pltpu.make_async_copy) between HBM and VMEM. The scan state then carries
in a register-resident value instead of a cross-cell scratch.

Usage:
  JAX_PLATFORMS=cpu python benchmarks/persistent_proto.py        # parity
  python benchmarks/persistent_proto.py --tpu                    # timing
"""

from __future__ import annotations

import functools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _fwd_kernel(
    A_ref, db_ref, Dsk_ref,       # VMEM (small, whole)
    u_hbm, d_hbm, B_hbm, C_hbm,   # ANY (HBM residents)
    y_hbm,                        # ANY output
    ubuf, dbuf, Bbuf, Cbuf, ybuf,  # double-buffered VMEM slabs
    a_s, xs_s,                    # per-chunk gate/state slabs
    in_sems, out_sems,
    *, nck, Lc, unroll,
):
    b, g, dt = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    bt = ubuf.shape[1]
    n = A_ref.shape[1]
    dgt = ubuf.shape[-1]
    A = A_ref[0]                                      # (n, dgt)

    def in_dma(ck, slot):
        sl = pl.ds(ck * Lc, Lc)
        return [
            pltpu.make_async_copy(
                src.at[pl.ds(b * bt, bt), g, sl], dst.at[slot],
                in_sems.at[slot, i])
            for i, (src, dst) in enumerate(
                ((u_hbm, ubuf), (d_hbm, dbuf), (B_hbm, Bbuf), (C_hbm, Cbuf)))
        ]

    def out_dma(ck, slot):
        return pltpu.make_async_copy(
            ybuf.at[slot], y_hbm.at[pl.ds(b * bt, bt), g, pl.ds(ck * Lc, Lc)],
            out_sems.at[slot])

    for d in in_dma(0, 0):
        d.start()

    def chunk_body(ck, carry):
        slot = jax.lax.rem(ck, 2)
        nxt = 1 - slot

        @pl.when(ck + 1 < nck)
        def _():
            for d in in_dma(ck + 1, nxt):
                d.start()

        for d in in_dma(ck, slot):
            d.wait()

        u = ubuf[slot].astype(jnp.float32)            # (bt, Lc, dgt)
        raw = dbuf[slot].astype(jnp.float32) + db_ref[0][None]
        dlt = jax.nn.softplus(raw)
        du = dlt * u
        a_s[:] = jnp.exp(dlt[:, :, None, :] * A[None, None]).astype(a_s.dtype)
        Bc = Bbuf[slot].astype(jnp.float32)           # (bt, Lc, n)
        xs_s[:] = (Bc[..., None] * du[:, :, None, :]).astype(xs_s.dtype)

        def step(i, x):
            for j in range(unroll):
                t = i * unroll + j
                x = a_s[:, t].astype(jnp.float32) * x + \
                    xs_s[:, t].astype(jnp.float32)
                xs_s[:, t] = x.astype(xs_s.dtype)
            return x

        carry = jax.lax.fori_loop(0, Lc // unroll, step, carry)

        # wait for the PREVIOUS output DMA on this slot before overwriting
        @pl.when(ck >= 2)
        def _():
            out_dma(ck - 2, slot).wait()

        Cc = Cbuf[slot].astype(jnp.float32)
        y = jnp.sum(Cc[..., None] * xs_s[:].astype(jnp.float32), axis=2)
        ybuf[slot] = (y + Dsk_ref[0][None] * u).astype(ybuf.dtype)
        out_dma(ck, slot).start()
        return carry

    carry0 = jnp.zeros((bt, n, dgt), jnp.float32)
    jax.lax.fori_loop(0, nck, chunk_body, carry0)
    out_dma(nck - 2, jax.lax.rem(nck, 2)).wait()
    out_dma(nck - 1, jax.lax.rem(nck - 1, 2)).wait()


def persistent_fwd(u, delta, A_t, Bm, Cm, Dsk, db, *, btile, Lc, unroll=4,
                   interpret=False):
    bsz, G, L, dg = u.shape
    n = A_t.shape[1]
    assert L % Lc == 0
    nck = L // Lc
    io = u.dtype
    grid = (bsz // btile, G, 1)
    kernel = functools.partial(_fwd_kernel, nck=nck, Lc=Lc, unroll=unroll)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, dg), lambda b, g, dt: (g, 0, dt)),
            pl.BlockSpec((1, 1, dg), lambda b, g, dt: (g, 0, dt)),
            pl.BlockSpec((1, 1, dg), lambda b, g, dt: (g, 0, dt)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, G, L, dg), io),
        scratch_shapes=[
            pltpu.VMEM((2, btile, Lc, dg), io),   # u
            pltpu.VMEM((2, btile, Lc, dg), io),   # delta
            pltpu.VMEM((2, btile, Lc, n), io),    # B
            pltpu.VMEM((2, btile, Lc, n), io),    # C
            pltpu.VMEM((2, btile, Lc, dg), io),   # y
            pltpu.VMEM((btile, Lc, n, dg), io),   # a
            pltpu.VMEM((btile, Lc, n, dg), io),   # xs
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(A_t, db, Dsk, u, delta, Bm, Cm)
    return y


def sync(x):
    return float(jnp.sum(x[..., -1, :].astype(jnp.float32)))


def timeit(f, *args, iters=10):
    y = f(*args)
    sync(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(*args)
    sync(y)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from mamba_unet_tpu.ops import selective_scan_ref
    on_tpu = "--tpu" in sys.argv
    interpret = not on_tpu
    print(f"backend={jax.default_backend()} interpret={interpret}")
    rng = np.random.default_rng(0)

    shapes = ((24, 4, 3136, 192, 16), (24, 4, 784, 384, 16)) if on_tpu \
        else ((2, 2, 64, 8, 4),)
    for BATCH, K, L, dg, n in shapes:
        dt = jnp.bfloat16 if on_tpu else jnp.float32
        u = jnp.asarray(rng.normal(size=(BATCH, K, L, dg)), dt)
        dl = jnp.asarray(0.1 * rng.normal(size=(BATCH, K, L, dg)), dt)
        A = -jnp.exp(jnp.asarray(rng.normal(size=(K * dg, n)), jnp.float32)
                     * 0.5)
        Bm = jnp.asarray(rng.normal(size=(BATCH, K, L, n)), dt)
        Cm = jnp.asarray(rng.normal(size=(BATCH, K, L, n)), dt)
        A_t = A.reshape(K, dg, n).transpose(0, 2, 1)
        Dsk = jnp.zeros((K, 1, dg), jnp.float32)
        db = jnp.zeros((K, 1, dg), jnp.float32)

        def to_ref(x):
            return (x.astype(jnp.float32).transpose(0, 1, 3, 2)
                    .reshape(BATCH, K * x.shape[-1], L))

        want = selective_scan_ref(
            to_ref(u), to_ref(dl), A,
            Bm.astype(jnp.float32).transpose(0, 1, 3, 2),
            Cm.astype(jnp.float32).transpose(0, 1, 3, 2),
            None, None, None, True,
        ).reshape(BATCH, K, dg, L).transpose(0, 1, 3, 2)

        print(f"=== B{BATCH} K{K} L{L} dg{dg} ===")
        for btile, Lc in ((8, 16), (8, 32), (8, 64)) if on_tpu \
                else ((2, 16),):
            if L % Lc:
                continue
            try:
                f = jax.jit(functools.partial(
                    persistent_fwd, btile=btile, Lc=Lc, interpret=interpret))
                got = f(u, dl, A_t, Bm, Cm, Dsk, db)
                err = float(jnp.abs(got.astype(jnp.float32) - want).max())
                line = f"  persistent bt={btile} Lc={Lc}  err {err:.1e}"
                if on_tpu:
                    line += f"  {timeit(f, u, dl, A_t, Bm, Cm, Dsk, db):7.2f} ms"
                print(line, flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  persistent bt={btile} Lc={Lc}  FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}")

        if on_tpu:
            from mamba_unet_tpu.ops import selective_scan_pallas as ssp
            f0 = jax.jit(lambda *a: ssp.selective_scan_pallas_tm(
                *a, delta_softplus=True))
            got = f0(u, dl, A, Bm, Cm)
            err = float(jnp.abs(got.astype(jnp.float32) - want).max())
            print(f"  production           err {err:.1e}"
                  f"  {timeit(f0, u, dl, A, Bm, Cm):7.2f} ms")


if __name__ == "__main__":
    main()
