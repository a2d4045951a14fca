"""Prototype: batch-folded-lane selective-scan forward kernel.

The production kernel tiles lanes by dgt; at stage0 dgt=192 pads to 256
lanes, wasting 25% of every slab op (build, loop, epilogue). This prototype
folds the batch dimension INTO the lane axis: operands arrive time-major
batch-minor (G, L, B*dg), so the lane extent B*dg = 24*192 = 4608 is an
exact multiple of 128 and the lane tile LT = bf*dg is freely choosable in
whole batches. Slabs become rank-3 (Lc, N, LT) — fully dense lanes, one
contiguous (N, LT) vector op per recurrence step.

B/C are per-(b, l, n), shared across dg: inside the kernel they broadcast
lane-wise (each batch's scalar-per-n repeated dg times) via a constant 0/1
matrix on the MXU: (Lc*N, bf) @ E(bf, LT) — the "lane<->sublane crossing as
constant-matrix MXU op" from docs/PROFILE.md's co-design note. The MXU is
otherwise idle during the scan.

Usage: PYTHONPATH=/root/repo python benchmarks/folded_proto.py
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

from mamba_unet_tpu.ops import selective_scan_pallas as ssp  # noqa: E402

ITERS = 30
EPI = 16


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
# folded forward kernel
# --------------------------------------------------------------------------


def folded_fwd_kernel(
    A_ref,      # (1, N, LT)  pre-tiled over batches
    db_ref,     # (1, 1, LT)
    Dsk_ref,    # (1, 1, LT)
    u_ref,      # (1, Lc, LT)
    d_ref,      # (1, Lc, LT)
    B_ref,      # (1, Lc, N, B)  FULL batch dim (lane tiles select via E)
    C_ref,      # (1, Lc, N, B)
    y_ref,      # (1, Lc, LT) out
    state_ref,  # scratch (N, LT) fp32
    a_ref,      # scratch (Lc, N, LT) io
    xs_ref,     # scratch (Lc, N, LT) io
    *,
    Lc: int,
    dg: int,
    bf: int,
    unroll: int,
):
    ck = pl.program_id(2)

    @pl.when(ck == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    N, LT = state_ref.shape
    Bsz = B_ref.shape[-1]
    A = A_ref[0]                                     # (N, LT)
    u = u_ref[0].astype(jnp.float32)                 # (Lc, LT)
    raw = d_ref[0].astype(jnp.float32) + db_ref[0]
    dlt = jax.nn.softplus(raw)
    du = dlt * u                                     # (Lc, LT)

    # constant batch->lane broadcast matrix for THIS lane tile:
    # E[b, k] = 1 iff lane k (= (b - b0)*dg + d) belongs to batch b
    b0 = pl.program_id(1) * bf
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (Bsz, LT), 1) // dg + b0
    row_b = jax.lax.broadcasted_iota(jnp.int32, (Bsz, LT), 0)
    E = (lane_b == row_b).astype(jnp.float32)

    def bcast(ref, lo, hi):
        """(qs, N, B) slice of B/C -> (qs, N, LT) lane broadcast via MXU."""
        blk = ref[0, lo:hi].astype(jnp.float32)      # (qs, N, B)
        qs = hi - lo
        flat = blk.reshape(qs * N, Bsz)
        out = jax.lax.dot_general(
            flat, E, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out.reshape(qs, N, LT)

    sl = functools.partial(jax.lax.slice_in_dim, axis=0)
    nq = max(1, Lc // EPI)
    qs = Lc // nq
    for q in range(nq):
        lo, hi = q * qs, (q + 1) * qs
        a_ref[lo:hi] = jnp.exp(
            sl(dlt, lo, hi)[:, None, :] * A[None]).astype(a_ref.dtype)
        xs_ref[lo:hi] = (
            bcast(B_ref, lo, hi) * sl(du, lo, hi)[:, None, :]
        ).astype(xs_ref.dtype)

    def body(i, x):
        for j in range(unroll):
            t = i * unroll + j
            x = a_ref[t].astype(jnp.float32) * x + xs_ref[t].astype(
                jnp.float32)
            xs_ref[t] = x.astype(xs_ref.dtype)
        return x

    state_ref[:] = jax.lax.fori_loop(0, Lc // unroll, body, state_ref[:])

    ys = []
    for q in range(nq):
        lo, hi = q * qs, (q + 1) * qs
        y = jnp.sum(bcast(C_ref, lo, hi)
                    * xs_ref[lo:hi].astype(jnp.float32), axis=1)
        ys.append((y + Dsk_ref[0] * sl(u, lo, hi)).astype(y_ref.dtype))
    y_ref[0] = ys[0] if nq == 1 else jnp.concatenate(ys, axis=0)


def folded_fwd(u_f, d_f, A_f, B_f, C_f, Dsk_f, db_f, *, dg, LT, Lc, unroll=4):
    """u_f, d_f: (G, L, BD); B_f, C_f: (G, L, N, B); A_f: (G, N, BD);
    Dsk_f, db_f: (G, 1, BD). Returns y (G, L, BD)."""
    G, L, BD = u_f.shape
    n = A_f.shape[1]
    B = B_f.shape[-1]
    bf = LT // dg
    assert LT % dg == 0 and BD % LT == 0
    Lp = -(-L // Lc) * Lc
    if Lp != L:
        pad = ((0, 0), (0, Lp - L), (0, 0))
        u_f = jnp.pad(u_f, pad)
        d_f = jnp.pad(d_f, pad)
        B_f = jnp.pad(B_f, ((0, 0), (0, Lp - L), (0, 0), (0, 0)))
        C_f = jnp.pad(C_f, ((0, 0), (0, Lp - L), (0, 0), (0, 0)))
    nc = Lp // Lc
    grid = (G, BD // LT, nc)
    io = u_f.dtype
    kernel = functools.partial(folded_fwd_kernel, Lc=Lc, dg=dg, bf=bf,
                               unroll=unroll)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, LT), lambda g, lt, ck: (g, 0, lt)),
            pl.BlockSpec((1, 1, LT), lambda g, lt, ck: (g, 0, lt)),
            pl.BlockSpec((1, 1, LT), lambda g, lt, ck: (g, 0, lt)),
            pl.BlockSpec((1, Lc, LT), lambda g, lt, ck: (g, ck, lt)),
            pl.BlockSpec((1, Lc, LT), lambda g, lt, ck: (g, ck, lt)),
            pl.BlockSpec((1, Lc, n, B), lambda g, lt, ck: (g, ck, 0, 0)),
            pl.BlockSpec((1, Lc, n, B), lambda g, lt, ck: (g, ck, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Lc, LT), lambda g, lt, ck: (g, ck, lt)),
        out_shape=jax.ShapeDtypeStruct((G, Lp, BD), io),
        scratch_shapes=[
            pltpu.VMEM((n, LT), jnp.float32),
            pltpu.VMEM((Lc, n, LT), io),
            pltpu.VMEM((Lc, n, LT), io),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=not ssp.on_tpu(),
    )(A_f, db_f, Dsk_f, u_f, d_f, B_f, C_f)
    return y[:, :L]


def grad_compare(stage: int, shapes):
    """Full-VJP timing: production bidir kernel vs the folded production
    implementation (ops/selective_scan_folded.py) at a stage shape, honoring
    MAMBA_SCAN_FOLDED_TILES for sweeps."""
    from mamba_unet_tpu.ops import selective_scan_folded as ssf

    B, G, L, dg, n = shapes[stage]
    BD = B * dg
    io = jnp.bfloat16
    rng = np.random.default_rng(0)
    u2 = jnp.asarray(rng.normal(size=(B, 2, L, dg)) * 0.5, io)
    d4 = jnp.asarray(rng.normal(size=(B, 4, L, dg)) * 0.1, io)
    B4 = jnp.asarray(rng.normal(size=(B, 4, L, n)) * 0.5, io)
    C4 = jnp.asarray(rng.normal(size=(B, 4, L, n)) * 0.5, io)
    A = jnp.asarray(-np.exp(rng.normal(size=(4 * dg, n)) * 0.3), jnp.float32)
    D = jnp.asarray(rng.normal(size=(4 * dg,)) * 0.1, jnp.float32)
    db = jnp.asarray(rng.normal(size=(4 * dg,)) * 0.1, jnp.float32)

    def loss_prod(u2, d4, A, B4, C4, D, db):
        y = ssp.selective_scan_pallas_bidir(
            u2, d4, A, B4, C4, D=D, delta_bias=db, delta_softplus=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    u2f = jnp.transpose(u2, (1, 2, 0, 3)).reshape(2, L, BD)
    d4f = jnp.transpose(d4, (1, 2, 0, 3)).reshape(4, L, BD)
    B4f = jnp.transpose(B4, (1, 2, 3, 0))
    C4f = jnp.transpose(C4, (1, 2, 3, 0))

    def loss_fold(u2f, d4f, A, B4f, C4f, D, db):
        y = ssf.selective_scan_folded_bidir(
            u2f, d4f, A, B4f, C4f, D=D, delta_bias=db, delta_softplus=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gp = jax.jit(jax.grad(loss_prod, argnums=(0, 1, 2, 3, 4, 5, 6)))
    gf = jax.jit(jax.grad(loss_fold, argnums=(0, 1, 2, 3, 4, 5, 6)))
    tp = timeit(gp, u2, d4, A, B4, C4, D, db)
    tf = timeit(gf, u2f, d4f, A, B4f, C4f, D, db)
    import os
    tiles = os.environ.get("MAMBA_SCAN_FOLDED_TILES", "auto")
    print(f"stage{stage} full-VJP: production {tp:.2f} ms | "
          f"folded[{tiles}] {tf:.2f} ms")


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--stage", type=int, default=0)
    p.add_argument("--check", action="store_true")
    p.add_argument("--grad", action="store_true")
    args = p.parse_args()

    shapes = {
        0: (24, 4, 3136, 192, 16),
        1: (24, 4, 784, 384, 16),
        2: (24, 4, 196, 768, 16),
        3: (24, 4, 49, 1536, 16),
    }
    if args.grad:
        grad_compare(args.stage, shapes)
        return

    B, G, L, dg, n = shapes[args.stage]
    BD = B * dg
    io = jnp.bfloat16
    rng = np.random.default_rng(0)

    # standard-layout operands for the production kernel
    u = jnp.asarray(rng.normal(size=(B, G, L, dg)) * 0.5, io)
    d = jnp.asarray(rng.normal(size=(B, G, L, dg)) * 0.1, io)
    Bm = jnp.asarray(rng.normal(size=(B, G, L, n)) * 0.5, io)
    Cm = jnp.asarray(rng.normal(size=(B, G, L, n)) * 0.5, io)
    A = jnp.asarray(-np.exp(rng.normal(size=(G * dg, n)) * 0.3), jnp.float32)
    D = jnp.asarray(rng.normal(size=(G * dg,)) * 0.1, jnp.float32)
    db = jnp.asarray(rng.normal(size=(G * dg,)) * 0.1, jnp.float32)

    A_t, Dsk, dbk = ssp._prep_params(A, D, db, G, dg, n)

    base = jax.jit(functools.partial(
        ssp._scan_fwd_impl, softplus=True, chunk=256, interpret=False,
        save_cs=False))

    def run_base(u, d, Bm, Cm):
        y, _ = base(u, d, A_t, Bm, Cm, Dsk, dbk)
        return y

    # folded operands: (G, L, B*dg) and (G, L, N, B)
    u_f = jnp.transpose(u, (1, 2, 0, 3)).reshape(G, L, BD)
    d_f = jnp.transpose(d, (1, 2, 0, 3)).reshape(G, L, BD)
    B_f = jnp.transpose(Bm, (1, 2, 3, 0))  # (G, L, N, B)
    C_f = jnp.transpose(Cm, (1, 2, 3, 0))
    A_ff = jnp.tile(A_t, (1, 1, B))        # (G, N, B*dg)
    Dsk_f = jnp.tile(Dsk, (1, 1, B))
    db_f = jnp.tile(dbk, (1, 1, B))

    if args.check:
        y0 = run_base(u, d, Bm, Cm)
        yf = folded_fwd(u_f, d_f, A_ff, B_f, C_f, Dsk_f, db_f,
                        dg=dg, LT=2 * dg if BD % (2 * dg) == 0 else dg,
                        Lc=16)
        yf_std = jnp.transpose(
            yf.reshape(G, L, B, dg), (2, 0, 1, 3))
        err = float(jnp.max(jnp.abs(
            yf_std.astype(jnp.float32) - y0.astype(jnp.float32))))
        print(f"stage{args.stage} max|err| = {err:.3e}")
        return

    t_base = timeit(run_base, u, d, Bm, Cm)
    print(f"stage{args.stage} production fwd (save_cs=False): {t_base:.2f} ms")

    for LT_mult in (2, 4, 8, 12):
        LT = LT_mult * dg
        if BD % LT or LT % 128:
            continue
        for Lc in (16, 32, 64):
            for unroll in (4,):
                try:
                    fn = jax.jit(functools.partial(
                        folded_fwd, dg=dg, LT=LT, Lc=Lc, unroll=unroll))
                    t = timeit(fn, u_f, d_f, A_ff, B_f, C_f, Dsk_f, db_f)
                    print(f"  folded LT={LT} (bf={LT//dg}) Lc={Lc} "
                          f"u{unroll}: {t:.2f} ms")
                except Exception as e:  # noqa: BLE001
                    print(f"  folded LT={LT} Lc={Lc}: FAIL "
                          f"{type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
