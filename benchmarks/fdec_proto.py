"""Prototype: 2-loop fused-dec forward (no big slabs).

Layout: t = s*R + r; per-step rows live in a banded rank-5 slab
(bt, R, S, NB, dgt) (bands: 0=dlt, 1=du, 2=y-out) and a B/C slab
(bt, R, S, N, 2->pad) so every per-step access indexes r on an UNTILED dim.
Loop 1 runs the zero-init sub-block recurrences for totals (gates recomputed
in-register from the dlt band); the combine propagates entry states E[s]
(Ptot via exp(sum(dlt)*A), no cumsum slab); loop 2 re-runs the recurrence
with the correct init and contracts y in-register.
"""

from __future__ import annotations

import functools

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from benchmarks.dec_scan_proto import timeit  # noqa: E402

NB = 8  # bands in the row slab


def fdec_fwd_kernel(
    A_ref,      # (1, N, dgt)
    db_ref,     # (1, 1, dgt)
    Dsk_ref,    # (1, 1, dgt)
    u_ref,      # (bt, 1, Lc, dgt)
    d_ref,      # (bt, 1, Lc, dgt)
    B_ref,      # (bt, 1, Lc, N)
    C_ref,      # (bt, 1, Lc, N)
    y_ref,      # (bt, 1, Lc, dgt) out
    state_ref,  # scratch (bt, N, dgt) fp32
    eall_ref,   # scratch (bt, S, N, dgt) fp32
    bands_ref,  # scratch (bt, R, S, NB, dgt) io — 0=dlt 1=du 2=y 3=B 4=C
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
    bt = u_ref.shape[0]
    dgt = u_ref.shape[3]
    n = A.shape[0]
    u = u_ref[:, 0].astype(jnp.float32)              # (bt, Lc, dgt)
    raw = d_ref[:, 0].astype(jnp.float32) + db_ref[0][None]
    dlt = jax.nn.softplus(raw)
    # (bt, Lc, dgt) -> (bt, R, S, dgt): t = s*R + r (swap of untiled dims)
    d5 = dlt.reshape(bt, S, R, dgt).swapaxes(1, 2)
    du5 = (dlt * u).reshape(bt, S, R, dgt).swapaxes(1, 2)
    bands_ref[:, :, :, 0] = d5.astype(bands_ref.dtype)
    bands_ref[:, :, :, 1] = du5.astype(bands_ref.dtype)
    # B/C rows live in the first N lanes of their own dgt-wide bands
    pad = jnp.zeros((bt, S, R, dgt - n), jnp.float32)
    b5 = jnp.concatenate([B_ref[:, 0].astype(jnp.float32)
                          .reshape(bt, S, R, n), pad], -1).swapaxes(1, 2)
    c5 = jnp.concatenate([C_ref[:, 0].astype(jnp.float32)
                          .reshape(bt, S, R, n), pad], -1).swapaxes(1, 2)
    bands_ref[:, :, :, 3] = b5.astype(bands_ref.dtype)
    bands_ref[:, :, :, 4] = c5.astype(bands_ref.dtype)
    cdtot = jnp.sum(d5, axis=1)                      # (bt, S, dgt)
    A3 = A[None]                                     # (1, N, dgt)

    def step(r, x):
        # rank-3 merged (bt*S, NB, dgt) loop values (rank-4/5 broadcasts and
        # sub-128-lane rank-5 slabs crash Mosaic — benchmarks/mosaic_bisect)
        rows = bands_ref[:, r].astype(jnp.float32).reshape(bt * S, NB, dgt)
        a = jnp.exp(rows[:, 0:1] * jnp.broadcast_to(A3, (bt * S, n, dgt)))
        B_t = rows[:, 3, :n]                         # (bt*S, N)
        b = B_t[:, :, None] * rows[:, 1:2]           # (bt*S, N, dgt)
        x = a * x + b
        return x, rows

    def body1(i, x):
        for j in range(unroll):
            x, _ = step(i * unroll + j, x)
        return x

    xtot = jax.lax.fori_loop(
        0, R // unroll, body1,
        jnp.zeros((bt * S, n, dgt), jnp.float32)).reshape(bt, S, n, dgt)

    # combine: E[s] entry states (S tiny serial steps)
    E = state_ref[:]
    for s in range(S):
        eall_ref[:, s] = E
        Ptot = jnp.exp(cdtot[:, s][:, None, :] * A[None])
        E = Ptot * E + xtot[:, s]
    state_ref[:] = E

    # loop 2: correct-init recurrence + in-register y contraction
    def body2(i, x):
        for j in range(unroll):
            r = i * unroll + j
            x, rows = step(r, x)
            C_t = rows[:, 4, :n]                     # (bt*S, N)
            y_r = jnp.sum(C_t[:, :, None] * x, axis=1)  # (bt*S, dgt)
            bands_ref[:, r, :, 2] = y_r.reshape(bt, S, dgt).astype(
                bands_ref.dtype)
        return x

    jax.lax.fori_loop(0, R // unroll, body2,
                      eall_ref[:].reshape(bt * S, n, dgt))

    y5 = bands_ref[:, :, :, 2].astype(jnp.float32)   # (bt, R, S, dgt)
    y = y5.swapaxes(1, 2).reshape(bt, Lc, dgt)
    y_ref[:, 0] = (y + Dsk_ref[0][None] * u).astype(y_ref.dtype)


def run_fdec(u, delta, A_t, Bm, Cm, Dsk, db, *, btile, S, R, unroll=1,
             interpret=False):
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
    kernel = functools.partial(fdec_fwd_kernel, S=S, R=R, unroll=unroll)
    scratch = [
        pltpu.VMEM((btile, n, dg), jnp.float32),
        pltpu.VMEM((btile, S, n, dg), jnp.float32),
        pltpu.VMEM((btile, R, S, NB, dg), io),
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
        print(f"  production                    {ms:7.2f} ms")

        for btile, S, R in ((8, 16, 8), (8, 8, 8), (8, 8, 16), (4, 16, 8),
                            (4, 16, 16), (8, 16, 16), (8, 4, 4), (24, 8, 8)):
            Lc = S * R
            if BATCH % btile or (Lc > L and L % Lc):
                continue
            for unroll in (1, 4):
                if R % unroll:
                    continue
                try:
                    f = jax.jit(functools.partial(
                        run_fdec, btile=btile, S=S, R=R, unroll=unroll))
                    got = f(u, dl, A_t, Bm, Cm, Dsk, db)
                    err = float(jnp.abs(got.astype(jnp.float32) - want).max())
                    ms = timeit(f, u, dl, A_t, Bm, Cm, Dsk, db)
                    ok = "OK " if err < 0.5 else "ERR"
                    print(f"  fdec bt={btile:2d} S={S:2d} R={R:2d} u={unroll}"
                          f"  {ms:7.2f} ms  {ok} (err {err:.1e})", flush=True)
                except Exception as e:
                    print(f"  fdec bt={btile:2d} S={S:2d} R={R:2d} u={unroll}"
                          f"  FAILED {type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
