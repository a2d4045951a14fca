"""Prototype: LOOP-FREE within-chunk scan via cumsum-ratio matmuls (folded
lane layout, time on SUBLANES).

The folded kernel's 3 serial loops cost 5.8 ms of its 22.2 ms stage0 VJP
(benchmarks/folded_ablate.py) — pure per-step issue overhead (~48 cycles per
32-sublane step). This prototype removes the forward loop entirely:

  chunk solution   x_t = exp(la_t) * (state + sum_{s<=t} b_s * exp(-la_s)),
                   la_t = cumsum(dlt)_t * A[n]   (<= 0, monotone)

  * cumsum over time = ONE constant block-lower-triangular matmul on the MXU
    (time lives on sublanes: slabs are (N, Lc, LT), per-n tiles (Lc, LT));
  * sub-blocks of R=8 inside the chunk bound exp's range (|la| < R*dlt*|A|);
    entry states propagate through an S-step slice combine (static, cheap);
  * la is clamped at -60: the ratio form mis-weights contributions only when
    one 8-step sub-block accumulates >60 of log-decay (per-step dlt*|A| >
    7.5, where the exact kernel's a_t = exp(dlt*A) < 5e-4 zeroes the state
    anyway) — outside every reference config and test distribution.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/cumsum_proto.py [--check]
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

ITERS = 20
R_SUB = 8
CLAMP = 60.0


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


def _ltri_block(Lc: int, R: int, dtype=jnp.float32):
    """Block-diagonal inclusive lower-triangular (Lc, Lc): within each R-row
    sub-block, M[t, s] = 1 for s <= t."""
    t = jax.lax.broadcasted_iota(jnp.int32, (Lc, Lc), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (Lc, Lc), 1)
    return ((s <= t) & (s // R == t // R)).astype(dtype)


def _fwd_kernel_cumsum(
    A_ref,      # (1, N, LT) fp32
    db_ref,     # (1, 1, LT) fp32
    Dsk_ref,    # (1, 1, LT) fp32
    u_ref,      # (1, Lc, LT)
    d_ref,      # (1, Lc, LT)
    B_ref,      # (1, Lc, N, Bsz)
    C_ref,      # (1, Lc, N, Bsz)
    y_ref,      # (1, Lc, LT) out
    state_ref,  # scratch (N, LT) fp32
    *,
    softplus: bool,
    Lc: int,
    dg: int,
):
    ck = pl.program_id(2)

    @pl.when(ck == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    n, LT = state_ref.shape
    Bsz = B_ref.shape[-1]
    u = u_ref[0].astype(jnp.float32)                 # (Lc, LT)
    raw = d_ref[0].astype(jnp.float32) + db_ref[0]
    dlt = jax.nn.softplus(raw) if softplus else raw
    du = dlt * u

    from mamba_unet_tpu.ops.selective_scan_folded import _bcast_mats

    E, _ = _bcast_mats(Bsz, LT, dg, pl.program_id(1), want_w=False,
                       e_dtype=B_ref.dtype)
    M = _ltri_block(Lc, R_SUB)
    dims = (((1,), (0,)), ((), ()))
    # within-sub-block inclusive cumsum of dlt (one MXU dot, shared over n)
    cd = jax.lax.dot_general(M, dlt, dims,
                             preferred_element_type=jnp.float32)
    S = Lc // R_SUB

    y_acc = jnp.zeros((Lc, LT), jnp.float32)
    new_state = []
    for ni in range(n):
        An = A_ref[0, ni][None, :]                   # (1, LT)
        la = jnp.maximum(cd * An, -CLAMP)            # (Lc, LT), <= 0
        em = jnp.exp(-la)
        ep = jnp.exp(la)
        Bb = jax.lax.dot_general(
            B_ref[0, :, ni].astype(E.dtype), E, dims,
            preferred_element_type=jnp.float32)      # (Lc, LT)
        q = Bb * du * em
        c = jax.lax.dot_general(M, q, dims,
                                preferred_element_type=jnp.float32)
        # combine sub-block entry states: E_{s+1} = Ptot_s * E_s + xloc_end
        ent = state_ref[ni]                          # (LT,)
        xs_rows = []
        for s in range(S):
            lo, hi = s * R_SUB, (s + 1) * R_SUB
            ep_s = jax.lax.slice_in_dim(ep, lo, hi, axis=0)
            c_s = jax.lax.slice_in_dim(c, lo, hi, axis=0)
            x_s = ep_s * (ent[None, :] + c_s)        # (R, LT)
            xs_rows.append(x_s)
            ent = x_s[R_SUB - 1]
        new_state.append(ent)
        x = jnp.concatenate(xs_rows, axis=0)         # (Lc, LT)
        Cb = jax.lax.dot_general(
            C_ref[0, :, ni].astype(E.dtype), E, dims,
            preferred_element_type=jnp.float32)
        y_acc += Cb * x
    state_ref[:] = jnp.stack(new_state, axis=0)
    y_ref[0] = (y_acc + Dsk_ref[0] * u).astype(y_ref.dtype)


def run_cumsum(u_f, delta_f, A_t, Bm, Cm, Dsk_f, db_f, *, LT, Lc,
               softplus=True, interpret=False):
    """u_f/delta_f: (G, L, BD); Bm/Cm: (G, L, N, Bsz); A_t: (G, N, BD)."""
    G, L, BD = delta_f.shape
    n = A_t.shape[1]
    Bsz = Bm.shape[-1]
    dg = BD // Bsz
    Lp = -(-L // Lc) * Lc

    def padL(x):
        pad = Lp - x.shape[1]
        if pad:
            cfg = [(0, 0)] * x.ndim
            cfg[1] = (0, pad)
            x = jnp.pad(x, cfg)
        return x

    u_f, delta_f, Bm, Cm = padL(u_f), padL(delta_f), padL(Bm), padL(Cm)
    grid = (G, BD // LT, Lp // Lc)
    kernel = functools.partial(_fwd_kernel_cumsum, softplus=softplus, Lc=Lc,
                               dg=dg)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, LT), lambda g, lt, ck: (g, 0, lt)),
            pl.BlockSpec((1, 1, LT), lambda g, lt, ck: (g, 0, lt)),
            pl.BlockSpec((1, 1, LT), lambda g, lt, ck: (g, 0, lt)),
            pl.BlockSpec((1, Lc, LT), lambda g, lt, ck: (g, ck, lt)),
            pl.BlockSpec((1, Lc, LT), lambda g, lt, ck: (g, ck, lt)),
            pl.BlockSpec((1, Lc, n, Bsz), lambda g, lt, ck: (g, ck, 0, 0)),
            pl.BlockSpec((1, Lc, n, Bsz), lambda g, lt, ck: (g, ck, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Lc, LT), lambda g, lt, ck: (g, ck, lt)),
        out_shape=jax.ShapeDtypeStruct((G, Lp, BD), u_f.dtype),
        scratch_shapes=[pltpu.VMEM((n, LT), jnp.float32)],
        compiler_params=None,
        interpret=interpret,
    )(A_t, db_f, Dsk_f, u_f, delta_f, Bm, Cm)
    return y[:, :L]


def main():
    check = "--check" in sys.argv
    from mamba_unet_tpu.ops import selective_scan_ref
    from mamba_unet_tpu.ops.selective_scan_folded import (
        selective_scan_folded,
    )

    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    BATCH, G, n = 24, 4, 16

    shapes = [(3136, 192), (784, 384), (196, 768)]
    if check:
        BATCH, shapes = 8, [(64, 16)]

    for L, dg in shapes:
        BD = BATCH * dg
        print(f"\n=== L={L} dg={dg} (BD={BD}) ===", flush=True)
        io = jnp.float32 if check else jnp.bfloat16
        u = jnp.asarray(rng.normal(size=(G, L, BD)), io)
        dl = jnp.asarray(0.1 * rng.normal(size=(G, L, BD)), io)
        A = -jnp.exp(
            jnp.asarray(rng.normal(size=(G * dg, n)), jnp.float32) * 0.5)
        Bm = jnp.asarray(rng.normal(size=(G, L, n, BATCH)), io)
        Cm = jnp.asarray(rng.normal(size=(G, L, n, BATCH)), io)
        A_t = jnp.tile(
            A.reshape(G, dg, n).transpose(0, 2, 1), (1, 1, BATCH))
        Dsk = jnp.zeros((G, 1, BD), jnp.float32)
        db = jnp.zeros((G, 1, BD), jnp.float32)

        if check:
            got = run_cumsum(u, dl, A_t, Bm, Cm, Dsk, db, LT=128, Lc=32,
                             interpret=True)
            want = selective_scan_folded(
                u, dl, A, Bm, Cm, None, None, delta_softplus=True,
                interpret=True)
            err = float(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32)).max())
            print(f"  interpret check: max err vs folded kernel = {err:.2e}")
            continue

        f_ref = jax.jit(lambda *a: selective_scan_folded(
            *a, delta_softplus=True))
        ms = timeit(f_ref, u, dl, A, Bm, Cm)
        print(f"  folded production fwd                   {ms:7.2f} ms")

        for LT in (768, 1536):
            if BD % LT:
                continue
            for Lc in (32, 64):
                try:
                    f = jax.jit(functools.partial(
                        run_cumsum, LT=LT, Lc=Lc))
                    got = f(u, dl, A_t, Bm, Cm, Dsk, db)
                    ms = timeit(f, u, dl, A_t, Bm, Cm, Dsk, db)
                    print(f"  cumsum LT={LT:5d} Lc={Lc:3d}"
                          f"               {ms:7.2f} ms", flush=True)
                except Exception as e:
                    print(f"  cumsum LT={LT} Lc={Lc} FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
