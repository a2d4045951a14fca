"""Experimental sweep of selective-scan forward-kernel variants on real TPU.

Variants, all same math as ops/selective_scan_pallas._fwd_kernel:
  * base         — current kernel (materialize a/b, seq loop stores x_t, epilogue)
  * unroll<U>    — python-unroll the recurrence U steps per fori_loop iteration
  * fusedy       — y_t computed inside the loop (no xs store, no epilogue pass)
  * tiling sweep — (btile, Lc) combinations within the VMEM budget

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/kernel_variants.py
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

ITERS = 30


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:4].astype(jnp.float32)))


def timeit(fn, *args, iters=ITERS, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


# --------------------------------------------------------------------------
# kernel bodies
# --------------------------------------------------------------------------


def fwd_kernel_base(A_ref, db_ref, Dsk_ref, u_ref, d_ref, B_ref, C_ref,
                    y_ref, state_ref, a_ref, xs_ref, *, Lc, unroll):
    ck = pl.program_id(3)

    @pl.when(ck == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    A = A_ref[0]
    u = u_ref[:, 0].astype(jnp.float32)
    raw = d_ref[:, 0].astype(jnp.float32) + db_ref[0][None]
    dlt = jax.nn.softplus(raw)
    du = dlt * u
    a_ref[:] = jnp.exp(dlt[:, :, None, :] * A[None, None])
    Bc = B_ref[:, 0].astype(jnp.float32)
    xs_ref[:] = Bc[..., None] * du[:, :, None, :]

    def body(i, x):
        for j in range(unroll):
            t = i * unroll + j
            x = a_ref[:, t] * x + xs_ref[:, t]
            xs_ref[:, t] = x
        return x

    state_ref[:] = jax.lax.fori_loop(0, Lc // unroll, body, state_ref[:])

    Cc = C_ref[:, 0].astype(jnp.float32)
    y = jnp.sum(Cc[..., None] * xs_ref[:], axis=2)
    y_ref[:, 0] = (y + Dsk_ref[0][None] * u).astype(y_ref.dtype)


def fwd_kernel_fusedy(A_ref, db_ref, Dsk_ref, u_ref, d_ref, B_ref, C_ref,
                      y_ref, state_ref, a_ref, xs_ref, *, Lc, unroll):
    """y accumulated in the loop; xs never re-stored, no epilogue pass."""
    ck = pl.program_id(3)

    @pl.when(ck == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    A = A_ref[0]
    u = u_ref[:, 0].astype(jnp.float32)
    raw = d_ref[:, 0].astype(jnp.float32) + db_ref[0][None]
    dlt = jax.nn.softplus(raw)
    du = dlt * u
    a_ref[:] = jnp.exp(dlt[:, :, None, :] * A[None, None])
    Bc = B_ref[:, 0].astype(jnp.float32)
    xs_ref[:] = Bc[..., None] * du[:, :, None, :]
    Cc = C_ref[:, 0].astype(jnp.float32)

    def body(i, x):
        for j in range(unroll):
            t = i * unroll + j
            x = a_ref[:, t] * x + xs_ref[:, t]
            y_ref[:, 0, t] = (
                jnp.sum(Cc[:, t, :, None] * x, axis=1)
                + Dsk_ref[0, 0] * u[:, t]
            ).astype(y_ref.dtype)
        return x

    state_ref[:] = jax.lax.fori_loop(0, Lc // unroll, body, state_ref[:])


def fwd_kernel_noloop(A_ref, db_ref, Dsk_ref, u_ref, d_ref, B_ref, C_ref,
                      y_ref, state_ref, a_ref, xs_ref, *, Lc, unroll):
    """Upper bound: prologue + epilogue only (WRONG RESULTS — timing only)."""
    A = A_ref[0]
    u = u_ref[:, 0].astype(jnp.float32)
    raw = d_ref[:, 0].astype(jnp.float32) + db_ref[0][None]
    dlt = jax.nn.softplus(raw)
    du = dlt * u
    a_ref[:] = jnp.exp(dlt[:, :, None, :] * A[None, None])
    Bc = B_ref[:, 0].astype(jnp.float32)
    xs_ref[:] = Bc[..., None] * du[:, :, None, :]
    Cc = C_ref[:, 0].astype(jnp.float32)
    y = jnp.sum(Cc[..., None] * (xs_ref[:] * a_ref[:]), axis=2)
    y_ref[:, 0] = (y + Dsk_ref[0][None] * u).astype(y_ref.dtype)


def fwd_kernel_v2(A_ref, db_ref, Dsk_ref, u_ref, d_ref, B_ref, C_ref,
                  y_ref, state_ref, a_ref, du_ref, *, Lc, unroll):
    """Traffic-minimal: a/du scratch in the I/O dtype (bf16 halves VMEM
    traffic), b computed in-loop from B_t x du_t, y contraction fused into
    the loop (no x store, no epilogue pass). State stays fp32."""
    ck = pl.program_id(3)

    @pl.when(ck == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    A = A_ref[0]
    u = u_ref[:, 0].astype(jnp.float32)
    raw = d_ref[:, 0].astype(jnp.float32) + db_ref[0][None]
    dlt = jax.nn.softplus(raw)
    du = dlt * u
    du_ref[:] = du.astype(du_ref.dtype)
    a_ref[:] = jnp.exp(dlt[:, :, None, :] * A[None, None]).astype(a_ref.dtype)
    Dsk = Dsk_ref[0, 0]

    def body(i, x):
        for j in range(unroll):
            t = i * unroll + j
            a_t = a_ref[:, t].astype(jnp.float32)           # (bt, N, dg)
            du_t = du_ref[:, t].astype(jnp.float32)         # (bt, dg)
            B_t = B_ref[:, 0, t].astype(jnp.float32)        # (bt, N)
            C_t = C_ref[:, 0, t].astype(jnp.float32)        # (bt, N)
            x = a_t * x + B_t[:, :, None] * du_t[:, None, :]
            y_t = jnp.sum(C_t[:, :, None] * x, axis=1) + Dsk[None] * (
                u_ref[:, 0, t].astype(jnp.float32))
            y_ref[:, 0, t] = y_t.astype(y_ref.dtype)
        return x

    state_ref[:] = jax.lax.fori_loop(0, Lc // unroll, body, state_ref[:])


def fwd_kernel_noalias(A_ref, db_ref, Dsk_ref, u_ref, d_ref, B_ref, C_ref,
                       y_ref, state_ref, a_ref, b_ref, xs_ref, *, Lc, unroll):
    """Like base but the loop stores x_t into a slab it never reads
    (b_ref read-only, xs_ref write-only) — no load-after-store aliasing,
    so loads can software-pipeline ahead of the serial FMA chain."""
    ck = pl.program_id(3)

    @pl.when(ck == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    A = A_ref[0]
    u = u_ref[:, 0].astype(jnp.float32)
    raw = d_ref[:, 0].astype(jnp.float32) + db_ref[0][None]
    dlt = jax.nn.softplus(raw)
    du = dlt * u
    a_ref[:] = jnp.exp(dlt[:, :, None, :] * A[None, None])
    Bc = B_ref[:, 0].astype(jnp.float32)
    b_ref[:] = Bc[..., None] * du[:, :, None, :]

    def body(i, x):
        for j in range(unroll):
            t = i * unroll + j
            x = a_ref[:, t] * x + b_ref[:, t]
            xs_ref[:, t] = x
        return x

    state_ref[:] = jax.lax.fori_loop(0, Lc // unroll, body, state_ref[:])

    Cc = C_ref[:, 0].astype(jnp.float32)
    y = jnp.sum(Cc[..., None] * xs_ref[:], axis=2)
    y_ref[:, 0] = (y + Dsk_ref[0][None] * u).astype(y_ref.dtype)


def fwd_kernel_v3(A_ref, db_ref, Dsk_ref, u_ref, d_ref, B_ref, C_ref,
                  y_ref, state_ref, dlt_ref, du_ref, bc_ref, *, Lc, unroll):
    """Traffic-minimal: NO (Lc, N, dgt) slabs at all. The loop recomputes
    the gate a_t = exp(dlt_t * A) from an (Lc, dgt) delta slab (N-fold less
    VMEM traffic than a materialized gate slab), builds b_t from an SMEM-free
    (Lc, N) B slab, and accumulates y in-loop (x_t never stored). Trades
    ~3 extra vector ops per (N, dgt) register block per step for ~16x less
    slab traffic — the materialized-slab loop is VMEM-bandwidth bound."""
    ck = pl.program_id(3)

    @pl.when(ck == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    A = A_ref[0]                                     # (N, dgt)
    u = u_ref[:, 0].astype(jnp.float32)              # (bt, Lc, dgt)
    raw = d_ref[:, 0].astype(jnp.float32) + db_ref[0][None]
    dlt = jax.nn.softplus(raw)
    dlt_ref[:] = dlt.astype(dlt_ref.dtype)           # (bt, Lc, dgt)
    du_ref[:] = (dlt * u).astype(du_ref.dtype)
    # B and C interleaved in one (bt, Lc, 2, N) slab (tiny)
    bc_ref[:, :, 0] = B_ref[:, 0]
    bc_ref[:, :, 1] = C_ref[:, 0]
    Dsk = Dsk_ref[0, 0]

    def body(i, x):
        for j in range(unroll):
            t = i * unroll + j
            dlt_t = dlt_ref[:, t].astype(jnp.float32)    # (bt, dgt)
            a_t = jnp.exp(dlt_t[:, None, :] * A[None])   # (bt, N, dgt)
            du_t = du_ref[:, t].astype(jnp.float32)      # (bt, dgt)
            B_t = bc_ref[:, t, 0].astype(jnp.float32)    # (bt, N)
            C_t = bc_ref[:, t, 1].astype(jnp.float32)
            x = a_t * x + B_t[:, :, None] * du_t[:, None, :]
            y_t = jnp.sum(C_t[:, :, None] * x, axis=1)
            y_ref[:, 0, t] = (
                y_t + Dsk[None] * u_ref[:, 0, t].astype(jnp.float32)
            ).astype(y_ref.dtype)
        return x

    state_ref[:] = jax.lax.fori_loop(0, Lc // unroll, body, state_ref[:])


KERNELS = {
    "base": fwd_kernel_base,
    "fusedy": fwd_kernel_fusedy,
    "noloop": fwd_kernel_noloop,
    "v2": fwd_kernel_v2,
    "v3": fwd_kernel_v3,
    "noalias": fwd_kernel_noalias,
}


def run_variant(kernel_name, u, delta, A_t, Bm, Cm, Dsk, db, *, btile, Lc,
                unroll=1, interpret=False):
    bsz, G, L, dg = u.shape
    n = A_t.shape[1]
    Lp = -(-L // Lc) * Lc

    def padL(x):
        pad = Lp - x.shape[2]
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0))) if pad else x

    u, delta, Bm, Cm = padL(u), padL(delta), padL(Bm), padL(Cm)
    grid = (bsz // btile, G, 1, Lp // Lc)
    kernel = functools.partial(KERNELS[kernel_name], Lc=Lc, unroll=unroll)
    if kernel_name == "v2":
        io = u.dtype
        scratch = [
            pltpu.VMEM((btile, n, dg), jnp.float32),
            pltpu.VMEM((btile, Lc, n, dg), io),
            pltpu.VMEM((btile, Lc, dg), io),
        ]
    elif kernel_name == "v3":
        io = u.dtype
        scratch = [
            pltpu.VMEM((btile, n, dg), jnp.float32),
            pltpu.VMEM((btile, Lc, dg), io),      # dlt
            pltpu.VMEM((btile, Lc, dg), io),      # du
            pltpu.VMEM((btile, Lc, 2, n), jnp.float32),  # B/C interleaved
        ]
    elif kernel_name == "noalias":
        scratch = [
            pltpu.VMEM((btile, n, dg), jnp.float32),
            pltpu.VMEM((btile, Lc, n, dg), jnp.float32),
            pltpu.VMEM((btile, Lc, n, dg), jnp.float32),
            pltpu.VMEM((btile, Lc, n, dg), jnp.float32),
        ]
    else:
        scratch = [
            pltpu.VMEM((btile, n, dg), jnp.float32),
            pltpu.VMEM((btile, Lc, n, dg), jnp.float32),
            pltpu.VMEM((btile, Lc, n, dg), jnp.float32),
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

    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    BATCH, K, n = 24, 4, 16

    for L, dg in ((3136, 192), (784, 384)):
        print(f"\n=== stage shape L={L} dg={dg} (B={BATCH}, K={K}, N={n}) ===")
        u = jnp.asarray(rng.normal(size=(BATCH, K, L, dg)), jnp.bfloat16)
        dl = jnp.asarray(0.1 * rng.normal(size=(BATCH, K, L, dg)), jnp.bfloat16)
        A = -jnp.exp(jnp.asarray(rng.normal(size=(K * dg, n)), jnp.float32) * 0.5)
        Bm = jnp.asarray(rng.normal(size=(BATCH, K, L, n)), jnp.bfloat16)
        Cm = jnp.asarray(rng.normal(size=(BATCH, K, L, n)), jnp.bfloat16)
        A_t = A.reshape(K, dg, n).transpose(0, 2, 1)
        Dsk = jnp.zeros((K, 1, dg), jnp.float32)
        db = jnp.zeros((K, 1, dg), jnp.float32)

        # reference output for correctness
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

        # current production path for baseline
        from mamba_unet_tpu.ops import selective_scan_pallas as ssp

        f0 = jax.jit(lambda *a: ssp.selective_scan_pallas_tm(
            *a, delta_softplus=True))
        ms = timeit(f0, u, dl, A, Bm, Cm)
        print(f"  production kernel                    {ms:7.2f} ms")

        budget = 12 * 1024 * 1024
        dgp = -(-dg // 128) * 128
        for name in ("v3", "base"):
            for btile in (8, 4, 2):
                if BATCH % btile:
                    continue
                if name in ("v2", "v3"):
                    per_step = btile * (n + 1) * dgp * 2
                else:
                    per_step = 3 * btile * n * dgp * 4
                maxlc = (budget // per_step // 16) * 16
                for Lc in sorted({16, 32, 64, 128, 256} & set(
                        range(16, maxlc + 1, 16))):
                    if L % Lc and Lc > L:
                        continue
                    for unroll in ((1, 4) if name != "noloop" else (1,)):
                        if Lc % unroll:
                            continue
                        try:
                            f = jax.jit(functools.partial(
                                run_variant, name, btile=btile, Lc=Lc,
                                unroll=unroll))
                            got = f(u, dl, A_t, Bm, Cm, Dsk, db)
                            err = float(jnp.abs(
                                got.astype(jnp.float32) - want).max())
                            ms = timeit(f, u, dl, A_t, Bm, Cm, Dsk, db)
                            ok = "OK " if err < 0.1 else "ERR"
                            print(f"  {name:7s} bt={btile} Lc={Lc:4d} u={unroll}"
                                  f"  {ms:7.2f} ms  {ok} (err {err:.1e})",
                                  flush=True)
                        except Exception as e:
                            print(f"  {name:7s} bt={btile} Lc={Lc:4d} u={unroll}"
                                  f"  FAILED {type(e).__name__}: {str(e)[:80]}")


if __name__ == "__main__":
    main()
