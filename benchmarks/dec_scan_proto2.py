"""Round 2 of dec-kernel experiments: decompose the cost.

Variants (all same outer harness as dec_scan_proto.run_dec):
  * dec        — as proto 1 (exp(cd*A) fixup)
  * dec_pslab  — P carried in the loop into a THIRD slab; fixup reads it
                 (removes the full-size exp pass)
  * dec_noloop — local scan skipped entirely (WRONG results, timing only):
                 isolates prologue + combine + fixup + y cost
  * dec_nofix  — loop + y on xs_loc only (WRONG): isolates loop cost
  * base_noloop— production-style kernel without the loop (prologue+epilogue)
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

from benchmarks.dec_scan_proto import _cumsum_r, sync, timeit  # noqa: E402


def dec_kernel(
    A_ref, db_ref, Dsk_ref, u_ref, d_ref, B_ref, C_ref,
    y_ref, state_ref, eall_ref, cd_ref, a_ref, xs_ref, p_ref,
    *, S, R, unroll, mode,
):
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
    bt, dgt = u.shape[0], u.shape[-1]
    n = A.shape[0]
    d5 = dlt.reshape(bt, S, R, dgt)
    if mode != "pslab":
        cd_ref[:] = _cumsum_r(d5, R)
    a_ref[:] = jnp.exp(d5[:, :, :, None, :] * A[None, None, None]).astype(
        a_ref.dtype)
    Bc = B_ref[:, 0].astype(jnp.float32)
    xs_ref[:] = (
        Bc[..., None] * du[:, :, None, :]
    ).reshape(bt, S, R, n, dgt).astype(xs_ref.dtype)

    if mode == "pslab":
        def body(i, carry):
            x, P = carry
            for j in range(unroll):
                r = i * unroll + j
                a_r = a_ref[:, :, r].astype(jnp.float32)
                x = a_r * x + xs_ref[:, :, r].astype(jnp.float32)
                P = a_r * P
                xs_ref[:, :, r] = x.astype(xs_ref.dtype)
                p_ref[:, :, r] = P.astype(p_ref.dtype)
            return x, P

        xtot, ptot = jax.lax.fori_loop(
            0, R // unroll, body,
            (jnp.zeros((bt, S, n, dgt), jnp.float32),
             jnp.ones((bt, S, n, dgt), jnp.float32)))
    elif mode == "noloop":
        xtot = a_ref[:, :, 0].astype(jnp.float32)
    else:
        def body(i, x):
            for j in range(unroll):
                r = i * unroll + j
                x = a_ref[:, :, r].astype(jnp.float32) * x + \
                    xs_ref[:, :, r].astype(jnp.float32)
                xs_ref[:, :, r] = x.astype(xs_ref.dtype)
            return x

        xtot = jax.lax.fori_loop(
            0, R // unroll, body, jnp.zeros((bt, S, n, dgt), jnp.float32))

    # combine
    E = state_ref[:]
    for s in range(S):
        eall_ref[:, s] = E
        if mode == "pslab":
            Ptot = ptot[:, s]
        else:
            Ptot = jnp.exp(cd_ref[:, s, R - 1][:, None, :] * A[None])
        E = Ptot * E + xtot[:, s]
    state_ref[:] = E

    Cc = C_ref[:, 0].astype(jnp.float32).reshape(bt, S, R, n)
    if mode == "nofix":
        x_true = xs_ref[:].astype(jnp.float32)
    elif mode == "pslab":
        x_true = xs_ref[:].astype(jnp.float32) + \
            p_ref[:].astype(jnp.float32) * eall_ref[:][:, :, None]
    else:
        P = jnp.exp(cd_ref[:][:, :, :, None, :] * A[None, None, None])
        x_true = xs_ref[:].astype(jnp.float32) + P * eall_ref[:][:, :, None]
    y = jnp.sum(Cc[..., None] * x_true, axis=3).reshape(bt, Lc, dgt)
    y_ref[:, 0] = (y + Dsk_ref[0][None] * u).astype(y_ref.dtype)


def base_noloop_kernel(A_ref, db_ref, Dsk_ref, u_ref, d_ref, B_ref, C_ref,
                       y_ref, state_ref, a_ref, xs_ref, *, Lc):
    A = A_ref[0]
    u = u_ref[:, 0].astype(jnp.float32)
    raw = d_ref[:, 0].astype(jnp.float32) + db_ref[0][None]
    dlt = jax.nn.softplus(raw)
    du = dlt * u
    a_ref[:] = jnp.exp(dlt[:, :, None, :] * A[None, None]).astype(a_ref.dtype)
    Bc = B_ref[:, 0].astype(jnp.float32)
    xs_ref[:] = (Bc[..., None] * du[:, :, None, :]).astype(xs_ref.dtype)
    Cc = C_ref[:, 0].astype(jnp.float32)
    y = jnp.sum(Cc[..., None] * xs_ref[:].astype(jnp.float32), axis=2)
    y_ref[:, 0] = (y + Dsk_ref[0][None] * u).astype(y_ref.dtype)


def run(kind, u, delta, A_t, Bm, Cm, Dsk, db, *, btile, S, R, unroll=4,
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
    if kind == "base_noloop":
        kernel = functools.partial(base_noloop_kernel, Lc=Lc)
        scratch = [
            pltpu.VMEM((btile, n, dg), jnp.float32),
            pltpu.VMEM((btile, Lc, n, dg), io),
            pltpu.VMEM((btile, Lc, n, dg), io),
        ]
    else:
        kernel = functools.partial(dec_kernel, S=S, R=R, unroll=unroll,
                                   mode=kind)
        scratch = [
            pltpu.VMEM((btile, n, dg), jnp.float32),
            pltpu.VMEM((btile, S, n, dg), jnp.float32),
            pltpu.VMEM((btile, S, R, dg), jnp.float32),
            pltpu.VMEM((btile, S, R, n, dg), io),
            pltpu.VMEM((btile, S, R, n, dg), io),
            pltpu.VMEM((btile, S, R, n, dg) if kind == "pslab" else (1, 1),
                       io if kind == "pslab" else jnp.float32),
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

    for L, dg in ((3136, 192), (784, 384)):
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
        print(f"  production                           {ms:7.2f} ms")

        for kind, btile, S, R in (
            ("base_noloop", 8, 4, 4),          # Lc=16, like production tiling
            ("dec_noloop_tag", 8, 8, 4),
            ("noloop", 8, 8, 4),
            ("nofix", 8, 8, 4),
            ("dec", 8, 8, 4),
            ("pslab", 8, 8, 4),
            ("pslab", 8, 4, 4),
            ("pslab", 8, 4, 8),
            ("pslab", 4, 8, 8),
            ("pslab", 4, 16, 4),
            ("pslab", 8, 16, 2),
            ("pslab", 8, 12, 4),
        ):
            if kind == "dec_noloop_tag":
                continue
            try:
                f = jax.jit(functools.partial(
                    run, kind, btile=btile, S=S, R=R))
                got = f(u, dl, A_t, Bm, Cm, Dsk, db)
                err = float(jnp.abs(got.astype(jnp.float32) - want).max())
                ms = timeit(f, u, dl, A_t, Bm, Cm, Dsk, db)
                print(f"  {kind:11s} bt={btile} S={S:2d} R={R:2d}  {ms:7.2f} ms"
                      f"  (err {err:.1e})", flush=True)
            except Exception as e:
                print(f"  {kind:11s} bt={btile} S={S:2d} R={R:2d}  FAILED "
                      f"{type(e).__name__}: {str(e)[:90]}")


if __name__ == "__main__":
    main()
