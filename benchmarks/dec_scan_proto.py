"""Prototype of the two-level (decimated) selective-scan forward kernel.

The production kernel's serial recurrence runs Lc sequential steps per chunk,
each a (bt, N, dgt) FMA — measured ~12% of VPU peak because the per-step
issue/load cost dominates at that slab width (docs/PROFILE.md). This
prototype restructures the chunk as S sub-blocks of R steps (Lc = S*R) laid
out rank-5 (bt, S, R, N, dgt):

  * the serial loop runs R steps, each advancing ALL S sub-blocks at once on
    a (bt, S, N, dgt) slice -> S-fold fatter vector work per serial step,
    S-fold fewer serial steps;
  * a tiny S-step combine propagates sub-block entry states E[s];
  * the entry-state contribution x_true = xs_loc + P * E[s] uses
    P[r] = exp(cumsum(delta)[r] * A) computed on the fly from a SMALL fp32
    cumsum slab (bt, S, R, dgt) — no third big slab, and fp32-accurate.

Usage: python benchmarks/dec_scan_proto.py
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


def _cumsum_r(x, R):
    """Inclusive cumsum along axis 2 (untiled r) via log2(R) shifted adds."""
    k = 1
    while k < R:
        pad = jnp.zeros_like(x[:, :, :k])
        x = x + jnp.concatenate([pad, x[:, :, : R - k]], axis=2)
        k *= 2
    return x


def dec_fwd_kernel(
    A_ref,      # (1, N, dgt)
    db_ref,     # (1, 1, dgt)
    Dsk_ref,    # (1, 1, dgt)
    u_ref,      # (bt, 1, Lc, dgt)
    d_ref,      # (bt, 1, Lc, dgt)
    B_ref,      # (bt, 1, Lc, N)
    C_ref,      # (bt, 1, Lc, N)
    y_ref,      # (bt, 1, Lc, dgt) out
    state_ref,  # scratch (bt, N, dgt) fp32
    eall_ref,   # scratch (bt, S, N, dgt) fp32 — sub-block entry states
    cd_ref,     # scratch (bt, S, R, dgt) fp32 — cumsum(delta) within sub-block
    a_ref,      # scratch (bt, S, R, N, dgt) io
    xs_ref,     # scratch (bt, S, R, N, dgt) io
    *,
    S: int,
    R: int,
    unroll: int,
):
    Lc = S * R
    ck = pl.program_id(3)

    @pl.when(ck == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    A = A_ref[0]                                     # (N, dgt)
    u = u_ref[:, 0].astype(jnp.float32)              # (bt, Lc, dgt)
    raw = d_ref[:, 0].astype(jnp.float32) + db_ref[0][None]
    dlt = jax.nn.softplus(raw)
    du = dlt * u
    bt = u.shape[0]
    dgt = u.shape[-1]
    n = A.shape[0]
    d5 = dlt.reshape(bt, S, R, dgt)
    cd_ref[:] = _cumsum_r(d5, R)
    a_ref[:] = jnp.exp(d5[:, :, :, None, :] * A[None, None, None]).astype(
        a_ref.dtype)
    Bc = B_ref[:, 0].astype(jnp.float32)             # (bt, Lc, N)
    xs_ref[:] = (
        Bc[..., None] * du[:, :, None, :]
    ).reshape(bt, S, R, n, dgt).astype(xs_ref.dtype)

    # --- local scans: all S sub-blocks advance together, zero init ---
    def body(i, x):
        for j in range(unroll):
            r = i * unroll + j
            x = a_ref[:, :, r].astype(jnp.float32) * x + xs_ref[:, :, r].astype(
                jnp.float32)                          # (bt, S, N, dgt)
            xs_ref[:, :, r] = x.astype(xs_ref.dtype)
        return x

    xtot = jax.lax.fori_loop(
        0, R // unroll, body, jnp.zeros((bt, S, n, dgt), jnp.float32))

    # --- combine: E[s] = entry state of sub-block s (S tiny serial steps) ---
    E = state_ref[:]
    for s in range(S):
        eall_ref[:, s] = E
        Ptot = jnp.exp(cd_ref[:, s, R - 1][:, None, :] * A[None])
        E = Ptot * E + xtot[:, s]
    state_ref[:] = E

    # --- fixup + y: x_true = xs_loc + exp(cd*A) * E[s], y = sum_n C x ---
    Cc = C_ref[:, 0].astype(jnp.float32).reshape(bt, S, R, n)
    P = jnp.exp(cd_ref[:][:, :, :, None, :] * A[None, None, None])
    x_true = xs_ref[:].astype(jnp.float32) + P * eall_ref[:][:, :, None]
    y = jnp.sum(Cc[..., None] * x_true, axis=3).reshape(bt, Lc, dgt)
    y_ref[:, 0] = (y + Dsk_ref[0][None] * u).astype(y_ref.dtype)


def dec_fwd_kernel_yloop(
    A_ref, db_ref, Dsk_ref, u_ref, d_ref, B_ref, C_ref,
    y_ref, state_ref, eall_ref, cd_ref, a_ref, b_ref, yl_ref,
    *, S: int, R: int, unroll: int,
):
    """Variant: y contracted inside the loop (yl slab is (bt,S,R,dgt), the
    big xs slab is never re-stored); the E-contribution to y is added in the
    fixup via sum_n C * P * E."""
    Lc = S * R
    ck = pl.program_id(3)

    @pl.when(ck == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    A = A_ref[0]
    u = u_ref[:, 0].astype(jnp.float32)
    raw = d_ref[:, 0].astype(jnp.float32) + db_ref[0][None]
    dlt = jax.nn.softplus(raw)
    du = dlt * u
    bt = u.shape[0]
    dgt = u.shape[-1]
    n = A.shape[0]
    d5 = dlt.reshape(bt, S, R, dgt)
    cd_ref[:] = _cumsum_r(d5, R)
    a_ref[:] = jnp.exp(d5[:, :, :, None, :] * A[None, None, None]).astype(
        a_ref.dtype)
    Bc = B_ref[:, 0].astype(jnp.float32)
    b_ref[:] = (
        Bc[..., None] * du[:, :, None, :]
    ).reshape(bt, S, R, n, dgt).astype(b_ref.dtype)
    Cc = C_ref[:, 0].astype(jnp.float32).reshape(bt, S, R, n)

    def body(i, x):
        for j in range(unroll):
            r = i * unroll + j
            x = a_ref[:, :, r].astype(jnp.float32) * x + b_ref[:, :, r].astype(
                jnp.float32)
            C_r = jax.lax.dynamic_index_in_dim(Cc, r, axis=2, keepdims=False)
            yl_ref[:, :, r] = jnp.sum(
                C_r[..., None] * x, axis=2).astype(yl_ref.dtype)
        return x

    xtot = jax.lax.fori_loop(
        0, R // unroll, body, jnp.zeros((bt, S, n, dgt), jnp.float32))

    E = state_ref[:]
    for s in range(S):
        eall_ref[:, s] = E
        Ptot = jnp.exp(cd_ref[:, s, R - 1][:, None, :] * A[None])
        E = Ptot * E + xtot[:, s]
    state_ref[:] = E

    P = jnp.exp(cd_ref[:][:, :, :, None, :] * A[None, None, None])
    yE = jnp.sum(Cc[..., None] * (P * eall_ref[:][:, :, None]), axis=3)
    y = (yl_ref[:].astype(jnp.float32) + yE).reshape(bt, Lc, dgt)
    y_ref[:, 0] = (y + Dsk_ref[0][None] * u).astype(y_ref.dtype)


def run_dec(u, delta, A_t, Bm, Cm, Dsk, db, *, btile, S, R, unroll=1,
            yloop=False, interpret=False):
    bsz, G, L, dg = u.shape
    n = A_t.shape[1]
    Lc = S * R
    Lp = -(-L // Lc) * Lc

    def padL(x):
        pad = Lp - x.shape[2]
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0))) if pad else x

    u, delta, Bm, Cm = padL(u), padL(delta), padL(Bm), padL(Cm)
    grid = (bsz // btile, G, 1, Lp // Lc)
    io = u.dtype
    if yloop:
        kernel = functools.partial(dec_fwd_kernel_yloop, S=S, R=R,
                                   unroll=unroll)
        scratch = [
            pltpu.VMEM((btile, n, dg), jnp.float32),
            pltpu.VMEM((btile, S, n, dg), jnp.float32),
            pltpu.VMEM((btile, S, R, dg), jnp.float32),
            pltpu.VMEM((btile, S, R, n, dg), io),
            pltpu.VMEM((btile, S, R, n, dg), io),
            pltpu.VMEM((btile, S, R, dg), jnp.float32),
        ]
    else:
        kernel = functools.partial(dec_fwd_kernel, S=S, R=R, unroll=unroll)
        scratch = [
            pltpu.VMEM((btile, n, dg), jnp.float32),
            pltpu.VMEM((btile, S, n, dg), jnp.float32),
            pltpu.VMEM((btile, S, R, dg), jnp.float32),
            pltpu.VMEM((btile, S, R, n, dg), io),
            pltpu.VMEM((btile, S, R, n, dg), io),
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
        print(f"\n=== stage shape L={L} dg={dg} (B={BATCH}, K={K}, N={n}) ===")
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
        print(f"  production kernel                        {ms:7.2f} ms")

        dgp = -(-dg // 128) * 128
        budget = 9 * 1024 * 1024
        for yloop in (False, True):
            for btile, S, R in (
                (8, 4, 4), (8, 8, 4), (8, 4, 8), (8, 2, 8),
                (4, 8, 8), (4, 8, 4), (4, 4, 8), (4, 16, 4),
                (2, 16, 8), (2, 8, 16), (2, 8, 8),
            ):
                Lc = S * R
                if Lc > L and L % Lc:
                    continue
                if (Lc % 16) and (Lc < L):
                    continue
                nslab = 2
                per = nslab * 2 * btile * Lc * n * dgp + 4 * btile * Lc * n * dgp
                if per > budget:
                    continue
                for unroll in (1, 2, 4):
                    if R % unroll:
                        continue
                    tag = "yloop" if yloop else "dec  "
                    try:
                        f = jax.jit(functools.partial(
                            run_dec, btile=btile, S=S, R=R, unroll=unroll,
                            yloop=yloop))
                        got = f(u, dl, A_t, Bm, Cm, Dsk, db)
                        err = float(jnp.abs(
                            got.astype(jnp.float32) - want).max())
                        ms = timeit(f, u, dl, A_t, Bm, Cm, Dsk, db)
                        ok = "OK " if err < 0.1 else "ERR"
                        print(f"  {tag} bt={btile} S={S:2d} R={R:2d} u={unroll}"
                              f"  {ms:7.2f} ms  {ok} (err {err:.1e})",
                              flush=True)
                    except Exception as e:
                        print(f"  {tag} bt={btile} S={S:2d} R={R:2d} u={unroll}"
                              f"  FAILED {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
