"""Prototype: Mosaic-legal FUSED selective-scan forward.

Round-2's fused kernels (no (Lc, N, dgt) slabs; gate recomputed in-register
per step) were rejected by Mosaic because per-step rows indexed the SUBLANE
dim of rank-3 (Lc, dgt) slabs. Decomposition (dec_scan_proto2) showed the
production kernel is dominated by its vectorized slab passes (base_noloop =
6.7 of 8.5 ms), i.e. VMEM slab traffic — exactly what fusion removes.

Fix: re-lay every per-step small slab with a singleton sublane dim —
(bt, Lc, 1, dgt) — so the step index t lands on an UNTILED dim. Variants:

  * fuseda — a-slab kept (bf16), b built in-loop, y contracted in-loop
             (traffic: a W+R only)
  * fusedx — NO big slabs at all: a recomputed in-loop via exp(dlt*A)
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

from benchmarks.dec_scan_proto import sync, timeit  # noqa: E402


def fused_fwd_kernel(
    A_ref,      # (1, N, dgt)
    db_ref,     # (1, 1, dgt)
    Dsk_ref,    # (1, 1, dgt)
    u_ref,      # (bt, 1, Lc, dgt)
    d_ref,      # (bt, 1, Lc, dgt)
    B_ref,      # (bt, 1, Lc, N)
    C_ref,      # (bt, 1, Lc, N)
    y_ref,      # (bt, 1, Lc, dgt) out
    state_ref,  # scratch (bt, N, dgt) fp32
    dlt_ref,    # scratch (bt, Lc, 1, dgt) io — softplus'd delta rows
    du_ref,     # scratch (bt, Lc, 1, dgt) io — delta*u rows
    bc_ref,     # scratch (bt, Lc, 2, N) fp32 — B/C rows
    yl_ref,     # scratch (bt, Lc, 1, dgt) io — per-step y (pre D*u)
    a_ref,      # scratch (bt, Lc, N, dgt) io — gates (fuseda only; (1,1) else)
    *,
    Lc: int,
    unroll: int,
    keep_a: bool,
):
    ck = pl.program_id(3)

    @pl.when(ck == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    A = A_ref[0]                                     # (N, dgt)
    bt = u_ref.shape[0]
    dgt = u_ref.shape[3]
    n = A.shape[0]
    u = u_ref[:, 0].astype(jnp.float32)              # (bt, Lc, dgt)
    raw = d_ref[:, 0].astype(jnp.float32) + db_ref[0][None]
    dlt = jax.nn.softplus(raw)
    if keep_a:
        a_ref[:] = jnp.exp(dlt[:, :, None, :] * A[None, None]).astype(
            a_ref.dtype)
    else:
        dlt_ref[:] = dlt.reshape(bt, Lc, 1, dgt).astype(dlt_ref.dtype)
    du_ref[:] = (dlt * u).reshape(bt, Lc, 1, dgt).astype(du_ref.dtype)
    bc_ref[:, :, 0] = B_ref[:, 0].astype(bc_ref.dtype)
    bc_ref[:, :, 1] = C_ref[:, 0].astype(bc_ref.dtype)

    def body(i, x):
        for j in range(unroll):
            t = i * unroll + j
            if keep_a:
                a_t = a_ref[:, t].astype(jnp.float32)            # (bt, N, dgt)
            else:
                dlt_t = dlt_ref[:, t, 0].astype(jnp.float32)     # (bt, dgt)
                a_t = jnp.exp(dlt_t[:, None, :] * A[None])
            du_t = du_ref[:, t, 0].astype(jnp.float32)           # (bt, dgt)
            B_t = bc_ref[:, t, 0]                                # (bt, N)
            C_t = bc_ref[:, t, 1]
            x = a_t * x + B_t[:, :, None] * du_t[:, None, :]
            yl_ref[:, t, 0] = jnp.sum(
                C_t[:, :, None] * x, axis=1).astype(yl_ref.dtype)
        return x

    state_ref[:] = jax.lax.fori_loop(0, Lc // unroll, body, state_ref[:])

    y = yl_ref[:].reshape(bt, Lc, dgt).astype(jnp.float32)
    y_ref[:, 0] = (y + Dsk_ref[0][None] * u).astype(y_ref.dtype)


def run_fused(u, delta, A_t, Bm, Cm, Dsk, db, *, btile, Lc, unroll=4,
              keep_a=False, interpret=False):
    bsz, G, L, dg = u.shape
    n = A_t.shape[1]
    Lp = -(-L // Lc) * Lc

    def padL(x):
        pad = Lp - x.shape[2]
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0))) if pad else x

    u, delta, Bm, Cm = padL(u), padL(delta), padL(Bm), padL(Cm)
    grid = (bsz // btile, G, 1, Lp // Lc)
    io = u.dtype
    kernel = functools.partial(fused_fwd_kernel, Lc=Lc, unroll=unroll,
                               keep_a=keep_a)
    scratch = [
        pltpu.VMEM((btile, n, dg), jnp.float32),
        pltpu.VMEM((btile, Lc, 1, dg), io),
        pltpu.VMEM((btile, Lc, 1, dg), io),
        pltpu.VMEM((btile, Lc, 2, n), jnp.float32),
        pltpu.VMEM((btile, Lc, 1, dg), io),
        pltpu.VMEM((btile, Lc, n, dg) if keep_a else (1, 1),
                   io if keep_a else jnp.float32),
    ]
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, dg), lambda b, g, dt, ck: (g, 0, dt)),
            pl.BlockSpec((1, 1, dg), lambda b, g, dt, ck: (g, 0, dt)),
            pl.BlockSpec((1, 1, dg), lambda b, g, dt, ck: (g, 0, dt)),
            pl.BlockSpec((btile, 1, Lc, dg), lambda b, g, dt, ck: (b, g, ck, dt)),
            pl.BlockSpec((btile, 1, Lc, dg), lambda b, g, dt, ck: (b, g, ck, dt)),
            pl.BlockSpec((btile, 1, Lc, n), lambda b, g, dt, ck: (b, g, ck, 0)),
            pl.BlockSpec((btile, 1, Lc, n), lambda b, g, dt, ck: (b, g, ck, 0)),
        ],
        out_specs=pl.BlockSpec((btile, 1, Lc, dg),
                               lambda b, g, dt, ck: (b, g, ck, dt)),
        out_shape=jax.ShapeDtypeStruct((bsz, G, Lp, dg), u.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(A_t, db, Dsk, u, delta, Bm, Cm)
    return y[:, :, :L]


def main():
    from mamba_unet_tpu.ops import selective_scan_ref
    from mamba_unet_tpu.ops import selective_scan_pallas as ssp

    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    BATCH, K, n = 24, 4, 16

    for L, dg in ((3136, 192), (784, 384), (196, 768), (49, 1536)):
        print(f"\n=== L={L} dg={dg} ===")
        u = jnp.asarray(rng.normal(size=(BATCH, K, L, dg)), jnp.bfloat16)
        dl = jnp.asarray(0.1 * rng.normal(size=(BATCH, K, L, dg)), jnp.bfloat16)
        A = -jnp.exp(jnp.asarray(rng.normal(size=(K * dg, n)), jnp.float32) * 0.5)
        Bm = jnp.asarray(rng.normal(size=(BATCH, K, L, n)), jnp.bfloat16)
        Cm = jnp.asarray(rng.normal(size=(BATCH, K, L, n)), jnp.bfloat16)
        A_t = A.reshape(K, dg, n).transpose(0, 2, 1)
        Dsk = jnp.zeros((K, 1, dg), jnp.float32)
        db = jnp.zeros((K, 1, dg), jnp.float32)

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

        f0 = jax.jit(lambda *a: ssp.selective_scan_pallas_tm(
            *a, delta_softplus=True))
        ms = timeit(f0, u, dl, A, Bm, Cm)
        print(f"  production                      {ms:7.2f} ms")

        for keep_a in (False, True):
            tag = "fuseda" if keep_a else "fusedx"
            for btile, Lc in ((8, 64), (8, 128), (8, 256), (16, 128),
                              (24, 64), (24, 128), (8, 16)):
                if BATCH % btile or (Lc > L and L % Lc):
                    continue
                if keep_a and btile * Lc > 512:  # a-slab VMEM cap
                    continue
                for unroll in (4, 8):
                    try:
                        f = jax.jit(functools.partial(
                            run_fused, btile=btile, Lc=Lc, unroll=unroll,
                            keep_a=keep_a))
                        got = f(u, dl, A_t, Bm, Cm, Dsk, db)
                        err = float(jnp.abs(got.astype(jnp.float32) - want).max())
                        ms = timeit(f, u, dl, A_t, Bm, Cm, Dsk, db)
                        ok = "OK " if err < 0.5 else "ERR"
                        print(f"  {tag} bt={btile:2d} Lc={Lc:3d} u={unroll}"
                              f"  {ms:7.2f} ms  {ok} (err {err:.1e})",
                              flush=True)
                    except Exception as e:
                        print(f"  {tag} bt={btile:2d} Lc={Lc:3d} u={unroll}"
                              f"  FAILED {type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
