"""Bisect which fdec construct crashes the Mosaic compiler."""
import functools

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BT, Lc, S, R, N, DG = 2, 16, 4, 4, 16, 128


def try_kernel(name, kernel, scratch, nout=1):
    x = jnp.ones((BT, 1, Lc, DG), jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kernel,
            grid=(1, 1, 1, 1),
            in_specs=[pl.BlockSpec((BT, 1, Lc, DG),
                                   lambda b, g, dt, ck: (0, 0, 0, 0))],
            out_specs=pl.BlockSpec((BT, 1, Lc, DG),
                                   lambda b, g, dt, ck: (0, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BT, 1, Lc, DG), jnp.bfloat16),
            scratch_shapes=scratch,
        )(x)
        out.block_until_ready()
        print(f"{name:28s} OK {float(out.reshape(-1)[0]):.3f}")
    except Exception as e:
        print(f"{name:28s} FAIL {type(e).__name__}: {str(e)[:70]}")


def k_swap(x_ref, y_ref):
    v = x_ref[:, 0].astype(jnp.float32)              # (BT, Lc, DG)
    v5 = v.reshape(BT, S, R, DG).swapaxes(1, 2)      # (BT, R, S, DG)
    y_ref[:, 0] = v5.swapaxes(1, 2).reshape(BT, Lc, DG).astype(y_ref.dtype)


def k_bandwrite(x_ref, y_ref, bands):
    v = x_ref[:, 0].astype(jnp.float32)
    v5 = v.reshape(BT, S, R, DG).swapaxes(1, 2)
    bands[:, :, :, 0] = v5.astype(bands.dtype)
    bands[:, :, :, 1] = (v5 * 2).astype(bands.dtype)
    y_ref[:, 0] = bands[:, :, :, 0].swapaxes(1, 2).reshape(
        BT, Lc, DG).astype(y_ref.dtype)


def k_bandread_dyn(x_ref, y_ref, bands):
    v = x_ref[:, 0].astype(jnp.float32)
    v5 = v.reshape(BT, S, R, DG).swapaxes(1, 2)
    bands[:, :, :, 0] = v5.astype(bands.dtype)

    def body(r, acc):
        rows = bands[:, r].astype(jnp.float32)       # (BT, S, NB, DG)
        return acc + rows[:, :, 0]

    acc = jax.lax.fori_loop(0, R, body, jnp.zeros((BT, S, DG), jnp.float32))
    y_ref[:, 0] = jnp.broadcast_to(acc[:, :, None, :], (BT, S, R, DG)).reshape(
        BT, Lc, DG).astype(y_ref.dtype)


def k_bandstore_dyn(x_ref, y_ref, bands):
    v = x_ref[:, 0].astype(jnp.float32)
    v5 = v.reshape(BT, S, R, DG).swapaxes(1, 2)
    bands[:, :, :, 0] = v5.astype(bands.dtype)

    def body(r, acc):
        rows = bands[:, r].astype(jnp.float32)
        acc = acc + rows[:, :, 0]
        bands[:, r, :, 2] = acc.astype(bands.dtype)  # single-band store
        return acc

    jax.lax.fori_loop(0, R, body, jnp.zeros((BT, S, DG), jnp.float32))
    y_ref[:, 0] = bands[:, :, :, 2].swapaxes(1, 2).reshape(
        BT, Lc, DG).astype(y_ref.dtype)


def k_bc(x_ref, y_ref, bc):
    v = x_ref[:, 0].astype(jnp.float32)
    # fabricate (BT, Lc, N, 2) via stack, reshape to (BT, R, S, N, 2)
    bn = jnp.stack([v[..., :N], v[..., N:2 * N]], axis=-1)
    bc[:] = bn.reshape(BT, S, R, N, 2).swapaxes(1, 2).astype(bc.dtype)

    def body(r, acc):
        bcr = bc[:, r].astype(jnp.float32)           # (BT, S, N, 2)
        return acc + jnp.sum(bcr[..., 0:1] * bcr[..., 1:2], axis=2)

    acc = jax.lax.fori_loop(
        0, R, body, jnp.zeros((BT, S, DG), jnp.float32))
    y_ref[:, 0] = jnp.broadcast_to(acc[:, :, None, :], (BT, S, R, DG)).reshape(
        BT, Lc, DG).astype(y_ref.dtype)


def main():
    print(f"backend={jax.default_backend()}")
    io = jnp.bfloat16
    try_kernel("swapaxes", k_swap, [])
    try_kernel("band static write/read", k_bandwrite,
               [pltpu.VMEM((BT, R, S, 8, DG), io)])
    try_kernel("band dyn read loop", k_bandread_dyn,
               [pltpu.VMEM((BT, R, S, 8, DG), io)])
    try_kernel("band dyn store loop", k_bandstore_dyn,
               [pltpu.VMEM((BT, R, S, 8, DG), io)])
    try_kernel("bc lanes=2 slab", k_bc,
               [pltpu.VMEM((BT, R, S, N, 2), io)])


if __name__ == "__main__":
    main()


def k_bc128(x_ref, y_ref, bc):
    """B/C rows stored at lane 0 of a 128-lane slab."""
    v = x_ref[:, 0].astype(jnp.float32)
    bn = v[..., :N].reshape(BT, S, R, N).swapaxes(1, 2)  # (BT,R,S,N)
    bc[:, :, :, :, 0:1] = bn[..., None].astype(bc.dtype)

    def body(r, acc):
        B_t = bc[:, r, :, :, 0:1].astype(jnp.float32)    # (BT,S,N,1)
        return acc + jnp.sum(B_t * B_t, axis=2)          # (BT,S,1)->bcast

    acc = jax.lax.fori_loop(0, R, body, jnp.zeros((BT, S, 1), jnp.float32))
    y_ref[:, 0] = jnp.broadcast_to(
        acc[:, :, None, :], (BT, S, R, DG)).reshape(
        BT, Lc, DG).astype(y_ref.dtype)


def k_bc_lane2sub(x_ref, y_ref, bc):
    """B/C rows as bands with N on lanes; per-step lanes->sublane relayout."""
    v = x_ref[:, 0].astype(jnp.float32)
    bn = v[..., :N].reshape(BT, S, R, N).swapaxes(1, 2)
    bc[:, :, :, 0] = bn.astype(bc.dtype)
    bc[:, :, :, 1] = (bn * 2).astype(bc.dtype)

    def body(r, acc):
        rows = bc[:, r].astype(jnp.float32)              # (BT,S,8,N)
        B_t = rows[:, :, 0]                              # (BT,S,N) lanes
        return acc + jnp.sum(B_t[..., None] * B_t[..., None], axis=2)

    acc = jax.lax.fori_loop(0, R, body, jnp.zeros((BT, S, 1), jnp.float32))
    y_ref[:, 0] = jnp.broadcast_to(
        acc[:, :, None, :], (BT, S, R, DG)).reshape(
        BT, Lc, DG).astype(y_ref.dtype)


def extra():
    io = jnp.bfloat16
    try_kernel("bc 128-lane col", k_bc128, [pltpu.VMEM((BT, R, S, N, 128), io)])
    try_kernel("bc lane->sublane", k_bc_lane2sub, [pltpu.VMEM((BT, R, S, 8, N), io)])


if __name__ == "__main__" or True:
    pass


def k_rank3_outer(x_ref, y_ref, bands, bc):
    """Loop values merged to rank-3 (bt*S, ., .): outer product + FMA."""
    v = x_ref[:, 0].astype(jnp.float32)
    v5 = v.reshape(BT, S, R, DG).swapaxes(1, 2)
    bands[:, :, :, 0] = v5.astype(bands.dtype)
    bands[:, :, :, 1] = (v5 * 0.5).astype(bands.dtype)
    bn = v[..., :N].reshape(BT, S, R, N).swapaxes(1, 2)
    bc[:, :, :, 0] = bn.astype(bc.dtype)
    bc[:, :, :, 1] = (bn * 2).astype(bc.dtype)

    def body(r, x):
        rows = bands[:, r].astype(jnp.float32).reshape(BT * S, 8, DG)
        bcr = bc[:, r].astype(jnp.float32).reshape(BT * S, 8, N)
        a = jnp.exp(rows[:, 0:1] * (-0.5))           # (BT*S, 1, DG)
        B_t = bcr[:, 0]                              # (BT*S, N)
        b = B_t[:, :, None] * rows[:, 1:2]           # (BT*S, N, DG)
        x = a * x + b
        return x

    x = jax.lax.fori_loop(0, R, body, jnp.zeros((BT * S, N, DG), jnp.float32))
    acc = jnp.sum(x, axis=1).reshape(BT, S, DG)
    y_ref[:, 0] = jnp.broadcast_to(
        acc[:, :, None, :], (BT, S, R, DG)).reshape(
        BT, Lc, DG).astype(y_ref.dtype)


def k_rank3_ystore(x_ref, y_ref, bands, bc):
    """rank-3 loop + per-step y band store."""
    v = x_ref[:, 0].astype(jnp.float32)
    v5 = v.reshape(BT, S, R, DG).swapaxes(1, 2)
    bands[:, :, :, 0] = v5.astype(bands.dtype)
    bands[:, :, :, 1] = (v5 * 0.5).astype(bands.dtype)
    bn = v[..., :N].reshape(BT, S, R, N).swapaxes(1, 2)
    bc[:, :, :, 0] = bn.astype(bc.dtype)
    bc[:, :, :, 1] = (bn * 2).astype(bc.dtype)

    def body(r, x):
        rows = bands[:, r].astype(jnp.float32).reshape(BT * S, 8, DG)
        bcr = bc[:, r].astype(jnp.float32).reshape(BT * S, 8, N)
        a = jnp.exp(rows[:, 0:1] * (-0.5))
        B_t = bcr[:, 0]
        C_t = bcr[:, 1]
        x = a * x + B_t[:, :, None] * rows[:, 1:2]
        y_r = jnp.sum(C_t[:, :, None] * x, axis=1)   # (BT*S, DG)
        bands[:, r, :, 2] = y_r.reshape(BT, S, DG).astype(bands.dtype)
        return x

    jax.lax.fori_loop(0, R, body, jnp.zeros((BT * S, N, DG), jnp.float32))
    y_ref[:, 0] = bands[:, :, :, 2].swapaxes(1, 2).reshape(
        BT, Lc, DG).astype(y_ref.dtype)


def extra2():
    io = jnp.bfloat16
    try_kernel("rank3 outer loop", k_rank3_outer,
               [pltpu.VMEM((BT, R, S, 8, DG), io),
                pltpu.VMEM((BT, R, S, 8, N), io)])
    try_kernel("rank3 + y band store", k_rank3_ystore,
               [pltpu.VMEM((BT, R, S, 8, DG), io),
                pltpu.VMEM((BT, R, S, 8, N), io)])


def k_bc_in_128(x_ref, y_ref, bands):
    """B/C stored in the first N lanes of 128-lane bands (3=B, 4=C)."""
    v = x_ref[:, 0].astype(jnp.float32)
    v5 = v.reshape(BT, S, R, DG).swapaxes(1, 2)
    bands[:, :, :, 0] = v5.astype(bands.dtype)
    bands[:, :, :, 1] = (v5 * 0.5).astype(bands.dtype)
    bn = v[..., :N].reshape(BT, S, R, N).swapaxes(1, 2)   # (BT,R,S,N)
    pad = jnp.zeros((BT, R, S, DG - N), jnp.float32)
    bands[:, :, :, 3] = jnp.concatenate([bn, pad], -1).astype(bands.dtype)
    bands[:, :, :, 4] = jnp.concatenate([bn * 2, pad], -1).astype(bands.dtype)

    def body(r, x):
        rows = bands[:, r].astype(jnp.float32).reshape(BT * S, 8, DG)
        a = jnp.exp(rows[:, 0:1] * (-0.5))              # (BT*S, 1, DG)
        B_t = rows[:, 3, :N]                            # (BT*S, N)
        C_t = rows[:, 4, :N]
        x = a * x + B_t[:, :, None] * rows[:, 1:2]
        y_r = jnp.sum(C_t[:, :, None] * x, axis=1)
        bands[:, r, :, 2] = y_r.reshape(BT, S, DG).astype(bands.dtype)
        return x

    jax.lax.fori_loop(0, R, body, jnp.zeros((BT * S, N, DG), jnp.float32))
    y_ref[:, 0] = bands[:, :, :, 2].swapaxes(1, 2).reshape(
        BT, Lc, DG).astype(y_ref.dtype)


def k_no_outer(x_ref, y_ref, bands):
    """Same but WITHOUT the outer product (no lanes->sublane B_t)."""
    v = x_ref[:, 0].astype(jnp.float32)
    v5 = v.reshape(BT, S, R, DG).swapaxes(1, 2)
    bands[:, :, :, 0] = v5.astype(bands.dtype)
    bands[:, :, :, 1] = (v5 * 0.5).astype(bands.dtype)

    def body(r, x):
        rows = bands[:, r].astype(jnp.float32).reshape(BT * S, 8, DG)
        a = jnp.exp(rows[:, 0:1] * (-0.5))
        x = a * x + rows[:, 1:2]
        y_r = jnp.sum(x, axis=1)
        bands[:, r, :, 2] = y_r.reshape(BT, S, DG).astype(bands.dtype)
        return x

    jax.lax.fori_loop(0, R, body, jnp.zeros((BT * S, N, DG), jnp.float32))
    y_ref[:, 0] = bands[:, :, :, 2].swapaxes(1, 2).reshape(
        BT, Lc, DG).astype(y_ref.dtype)


def extra3():
    io = jnp.bfloat16
    try_kernel("no outer (bands only)", k_no_outer,
               [pltpu.VMEM((BT, R, S, 8, DG), io)])
    try_kernel("bc in 128-lane bands", k_bc_in_128,
               [pltpu.VMEM((BT, R, S, 8, DG), io)])
