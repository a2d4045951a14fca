"""Batch-folded-lane Pallas selective-scan (the round-3 layout co-design).

Same S6 math as ``selective_scan_pallas.py`` (the TPU replacement for
``/root/reference/mamba/csrc/selective_scan/selective_scan_fwd_kernel.cuh`` /
``selective_scan_bwd_kernel.cuh``), but with the BATCH dimension folded into
the lane axis: operands arrive time-major batch-minor ``(G, L, B*dg)``.

Why: the slab kernel's cost is VMEM slab traffic + per-strip vector issue
(docs/PROFILE.md, round-3 falsification log). With lanes tiled by dg alone,
stage0's dg=192 pads every (N, dgt) tile to 256 lanes — 25% of ALL slab
work wasted — and the lane tile is locked to divisors of dg. Folding batch
into lanes makes the lane extent ``B*dg`` an exact multiple of 128, the
lane tile freely choosable (any 128-multiple divisor), and the slabs dense
rank-3 ``(Lc, N, LT)`` — one contiguous (N, LT) vector op per recurrence
step. Measured (benchmarks/folded_proto.py): stage0 fwd 9.53 -> 5.5 ms.

B/C are per-(l, b, n), shared across dg. Lane-broadcasting a per-batch
scalar across that batch's dg lanes is a Mosaic-illegal sublane->lane
crossing as a vector op, but it is exactly a matmul by a constant 0/1
matrix — so it rides the (otherwise idle) MXU:

    Bb(l, n, lane) = sum_b  B(l, n, b) * E[b, lane],
    E[b, lane] = 1  iff  lane belongs to batch b.

The backward uses the transposed matrix W = E^T the same way to reduce
dB/dC lane-segments back to per-batch scalars, and emits dA/dD/ddb in
folded lane form, un-folded by cheap XLA reshapes outside the kernel.

The grid is ``(G, lane-tiles, L-chunks)`` with the chunk axis innermost —
the fp32 carried state lives in VMEM scratch exactly like the production
kernel; chunk ENTRY states are checkpointed for the backward. bidir
directions (g >= 2) scan the same data stream in reversed time order via
index arithmetic (no flipped copies), as in the production kernel.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mamba_unet_tpu.ops.selective_scan_pallas import (
    _EPI_QUARTER,
    _compiler_params,
    on_tpu,
)

# Per-step vector work N*LT: the folded sweep (benchmarks/folded_proto.py)
# ranks LT with N*LT ~ 24576 first at every stage shape (stage0: LT=1536
# beats 768/2304). Among feasible lane tiles, pick the one closest to the
# target, preferring the larger on ties.
_LT_TARGET = int(_os.environ.get("MAMBA_SCAN_FOLDED_LT_TARGET", "1536"))
_LC_FOLDED = int(_os.environ.get("MAMBA_SCAN_FOLDED_LC", "32"))
_VMEM_BUDGET = 56 * 1024 * 1024
_UNROLL = int(_os.environ.get("MAMBA_SCAN_UNROLL", "4"))
# dB/dC lane-reduction dot: fp32 (exact) | bf16 (1 fast pass, grads rounded
# at ~2^-9 per term) | comp (hi+lo bf16 pair)
_WDOT_MODE = _os.environ.get("MAMBA_SCAN_FOLDED_WDOT", "fp32")
# timing-only ablations (results numerically WRONG): bcast, wdot, fwdloop,
# revloop, epi
_FABL = frozenset(
    v for v in _os.environ.get("MAMBA_SCAN_FOLDED_ABLATE", "").split(",")
    if v)


def _lane_tiles(BD: int):
    """128-multiple divisors of the folded lane extent."""
    return [t for t in range(128, BD + 1, 128) if BD % t == 0]


def supported_folded(BD: int, n: int) -> bool:
    return BD % 128 == 0 and n <= 64 and n % 8 == 0


def _tiling_folded(BD: int, L: int, n: int, itemsize: int):
    """Pick (LT, Lc): lane tile closest to the measured N*LT sweet spot,
    then the largest VMEM-feasible Lc up to _LC_FOLDED (fwd/grad are flat
    in Lc past ~32; smaller Lc only inflates the grid-cell count)."""
    forced = _os.environ.get("MAMBA_SCAN_FOLDED_TILES")
    if forced:
        LT, Lc = (int(v) for v in forced.split(","))
    else:
        cands = _lane_tiles(BD)
        LT = min(cands, key=lambda t: (abs(t - _LT_TARGET), -t))
        Lc = _LC_FOLDED
        # 3 slabs (a, xs, e) of (Lc, N, LT) in the I/O dtype + fp32 temps
        while Lc > 16 and 3 * Lc * n * LT * itemsize > _VMEM_BUDGET // 2:
            Lc //= 2
        Lc = max(16, (Lc // 16) * 16)
    Lp = -(-L // Lc) * Lc
    return LT, BD // LT, Lc, Lp, Lp // Lc


def _bcast_mats(Bsz: int, LT: int, dg: int, lt, want_w: bool,
                e_dtype=jnp.float32):
    """E (Bsz, LT) lane-broadcast matrix for lane tile ``lt`` and its
    transpose W (LT, Bsz). lane b = global_lane // dg. E can live in the
    I/O dtype: every output of an E-dot is a COPY of one input value (one
    nonzero per column), so a bf16 E is exact and rides the MXU at 4x the
    fp32 rate. W stays fp32 (its dots REDUCE ~dg real values per output)."""
    lane_b = (
        jax.lax.broadcasted_iota(jnp.int32, (Bsz, LT), 1) + lt * LT
    ) // dg
    row_b = jax.lax.broadcasted_iota(jnp.int32, (Bsz, LT), 0)
    E = (lane_b == row_b).astype(e_dtype)
    if not want_w:
        return E, None
    lane_bw = (
        jax.lax.broadcasted_iota(jnp.int32, (LT, Bsz), 0) + lt * LT
    ) // dg
    col_b = jax.lax.broadcasted_iota(jnp.int32, (LT, Bsz), 1)
    W = (lane_bw == col_b).astype(jnp.float32)
    return E, W


def _wdot(x, W):
    """(rows, LT) fp32 @ W (LT, Bsz): the dB/dC per-batch lane reduction.
    Mode fp32 = one exact dot; bf16 = one fast pass (terms rounded ~2^-9,
    fp32 accumulation); comp = hi+lo bf16 pair (~17 mantissa bits/term, but
    the split costs extra full-slab VPU work — measured a net LOSS at stage
    shapes, kept for the ablation record)."""
    dims = (((1,), (0,)), ((), ()))
    if _WDOT_MODE == "fp32":
        return jax.lax.dot_general(x, W, dims,
                                   preferred_element_type=jnp.float32)
    Wb = W.astype(jnp.bfloat16)
    hi = x.astype(jnp.bfloat16)
    out = jax.lax.dot_general(hi, Wb, dims,
                              preferred_element_type=jnp.float32)
    if _WDOT_MODE == "comp":
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out += jax.lax.dot_general(lo, Wb, dims,
                                   preferred_element_type=jnp.float32)
    return out


def _bcast(ref, E, lo, hi, n):
    """(Lc, N, Bsz) ref strip [lo, hi) -> (qs, N, LT) lane broadcast on the
    MXU. Exact: each output element has exactly one nonzero product, so the
    dot runs in the I/O dtype (bf16 = 4x MXU rate) with fp32 accumulation."""
    qs = hi - lo
    if "bcast" in _FABL:  # timing ablation: skip the read + dot
        return jnp.zeros((qs, n, E.shape[1]), jnp.float32)
    blk = ref[0, lo:hi].astype(E.dtype)              # (qs, N, Bsz)
    flat = blk.reshape(qs * n, blk.shape[-1])
    out = jax.lax.dot_general(
        flat, E, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out.reshape(qs, n, E.shape[1])


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel_folded(
    A_ref,      # (1, N, LT) fp32, pre-tiled over batches
    db_ref,     # (1, 1, LT) fp32
    Dsk_ref,    # (1, 1, LT) fp32
    u_ref,      # (1, Lc, LT)
    d_ref,      # (1, Lc, LT)
    B_ref,      # (1, Lc, N, Bsz)  full batch dim; E selects/broadcasts
    C_ref,      # (1, Lc, N, Bsz)
    y_ref,      # (1, Lc, LT) out
    cs_ref,     # (1, 1, 1, N, LT) out: chunk ENTRY state
    state_ref,  # scratch (N, LT) fp32
    a_ref,      # scratch (Lc, N, LT) io
    xs_ref,     # scratch (Lc, N, LT) io
    *,
    softplus: bool,
    Lc: int,
    dg: int,
    bidir: bool,
):
    ck = pl.program_id(2)

    @pl.when(ck == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    n, LT = state_ref.shape
    Bsz = B_ref.shape[-1]
    A = A_ref[0]                                     # (N, LT)
    u = u_ref[0].astype(jnp.float32)                 # (Lc, LT)
    raw = d_ref[0].astype(jnp.float32) + db_ref[0]
    dlt = jax.nn.softplus(raw) if softplus else raw
    du = dlt * u
    E, _ = _bcast_mats(Bsz, LT, dg, pl.program_id(1), want_w=False,
                       e_dtype=xs_ref.dtype)

    sl = functools.partial(jax.lax.slice_in_dim, axis=0)
    nq = max(1, Lc // _EPI_QUARTER)
    qs = Lc // nq
    for q in range(nq):
        lo, hi = q * qs, (q + 1) * qs
        a_ref[lo:hi] = jnp.exp(
            sl(dlt, lo, hi)[:, None, :] * A[None]).astype(a_ref.dtype)
        xs_ref[lo:hi] = (
            _bcast(B_ref, E, lo, hi, n) * sl(du, lo, hi)[:, None, :]
        ).astype(xs_ref.dtype)

    cs_ref[0, 0, 0] = state_ref[:].astype(cs_ref.dtype)

    r = (pl.program_id(0) // 2) if bidir else 0

    def body(i, x):
        for j in range(_UNROLL):
            t = i * _UNROLL + j
            te = t + r * (Lc - 1 - 2 * t)            # t, or Lc-1-t reversed
            x = a_ref[te].astype(jnp.float32) * x + xs_ref[te].astype(
                jnp.float32)
            xs_ref[te] = x.astype(xs_ref.dtype)
        return x

    if "fwdloop" not in _FABL:
        state_ref[:] = jax.lax.fori_loop(0, Lc // _UNROLL, body, state_ref[:])

    if "yepi" in _FABL:
        y_ref[0] = u_ref[0]
        return
    ys = []
    for q in range(nq):
        lo, hi = q * qs, (q + 1) * qs
        y = jnp.sum(_bcast(C_ref, E, lo, hi, n)
                    * xs_ref[lo:hi].astype(jnp.float32), axis=1)
        ys.append((y + Dsk_ref[0] * sl(u, lo, hi)).astype(y_ref.dtype))
    y_ref[0] = ys[0] if nq == 1 else jnp.concatenate(ys, axis=0)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel_folded(
    A_ref,      # (1, N, LT)
    db_ref,     # (1, 1, LT)
    Dsk_ref,    # (1, 1, LT)
    u_ref,      # (1, Lc, LT)
    d_ref,      # (1, Lc, LT)
    B_ref,      # (1, Lc, N, Bsz)
    C_ref,      # (1, Lc, N, Bsz)
    cs_ref,     # (1, 1, 1, N, LT) saved entry state
    g_ref,      # (1, Lc, LT) incoming dy
    du_ref,     # out (1, Lc, LT)
    dd_ref,     # out (1, Lc, LT)
    dB_ref,     # out (1, 1, Lc, N, Bsz)   summed over lane tiles outside
    dC_ref,     # out (1, 1, Lc, N, Bsz)
    dA_ref,     # out (1, 1, N, LT)  accumulated over chunks
    dD_ref,     # out (1, 1, 1, LT)  accumulated
    ddb_ref,    # out (1, 1, 1, LT)  accumulated
    carry_ref,  # scratch (N, LT) fp32: a_0*e_0 of the later-in-scan chunk
    a_ref,      # scratch (Lc, N, LT) io
    xs_ref,     # scratch (Lc, N, LT) io
    e_ref,      # scratch (Lc, N, LT) io
    *,
    softplus: bool,
    Lc: int,
    dg: int,
    bidir: bool,
):
    ck = pl.program_id(2)  # 0 = LAST chunk in scan order (walk via index_map)

    @pl.when(ck == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)
        dA_ref[:] = jnp.zeros_like(dA_ref)
        dD_ref[:] = jnp.zeros_like(dD_ref)
        ddb_ref[:] = jnp.zeros_like(ddb_ref)

    n, LT = carry_ref.shape
    Bsz = B_ref.shape[-1]
    A = A_ref[0]
    u = u_ref[0].astype(jnp.float32)
    raw = d_ref[0].astype(jnp.float32) + db_ref[0]
    dlt = jax.nn.softplus(raw) if softplus else raw
    du_in = dlt * u
    g = g_ref[0].astype(jnp.float32)                 # (Lc, LT)
    E, W = _bcast_mats(Bsz, LT, dg, pl.program_id(1), want_w=True,
                       e_dtype=xs_ref.dtype)

    sl = functools.partial(jax.lax.slice_in_dim, axis=0)
    nq = max(1, Lc // _EPI_QUARTER)
    qs = Lc // nq
    for q in range(nq):
        lo, hi = q * qs, (q + 1) * qs
        a_ref[lo:hi] = jnp.exp(
            sl(dlt, lo, hi)[:, None, :] * A[None]).astype(a_ref.dtype)
        xs_ref[lo:hi] = (
            _bcast(B_ref, E, lo, hi, n) * sl(du_in, lo, hi)[:, None, :]
        ).astype(xs_ref.dtype)
        e_ref[lo:hi] = (
            _bcast(C_ref, E, lo, hi, n) * sl(g, lo, hi)[:, None, :]
        ).astype(e_ref.dtype)

    r = (pl.program_id(0) // 2) if bidir else 0

    # --- recompute within-chunk forward from the saved entry state ---
    def fbody(i, x):
        for j in range(_UNROLL):
            t = i * _UNROLL + j
            te = t + r * (Lc - 1 - 2 * t)
            x = a_ref[te].astype(jnp.float32) * x + xs_ref[te].astype(
                jnp.float32)
            xs_ref[te] = x.astype(xs_ref.dtype)
        return x

    if "fwdloop" not in _FABL:
        jax.lax.fori_loop(0, Lc // _UNROLL, fbody,
                          cs_ref[0, 0, 0].astype(jnp.float32))

    # --- reverse scan (in scan order): e_t = C_t g_t + a_{t+1} e_{t+1} ---
    def rbody(i, carry):
        for j in range(_UNROLL):
            t = Lc - 1 - (i * _UNROLL + j)
            te = t + r * (Lc - 1 - 2 * t)
            e = e_ref[te].astype(jnp.float32) + carry
            e_ref[te] = e.astype(e_ref.dtype)
            carry = a_ref[te].astype(jnp.float32) * e
        return carry

    if "revloop" not in _FABL:
        carry_ref[:] = jax.lax.fori_loop(0, Lc // _UNROLL, rbody,
                                         carry_ref[:])

    # --- vectorized gradient epilogue, chunked into _EPI_QUARTER strips ---
    if "epi" in _FABL:  # timing ablation: cheap writes keep outputs defined
        du_ref[0] = g_ref[0]
        dd_ref[0] = g_ref[0]
        dB_ref[0, 0] = B_ref[0].astype(dB_ref.dtype)
        dC_ref[0, 0] = C_ref[0].astype(dC_ref.dtype)
        return
    entry = cs_ref[0, 0, 0].astype(xs_ref.dtype)[None]   # (1, N, LT)
    dds, dus, dBs, dCs = [], [], [], []
    dA_acc = jnp.zeros_like(dA_ref[0, 0])
    dD_acc = jnp.zeros_like(dD_ref[0, 0, 0])
    ddb_acc = jnp.zeros_like(ddb_ref[0, 0, 0])
    for q in range(nq):
        lo, hi = q * qs, (q + 1) * qs
        e = e_ref[lo:hi].astype(jnp.float32)
        a = a_ref[lo:hi].astype(jnp.float32)
        if bidir:
            # r==0: xsp[t] = xs[t-1] (entry at t==0); r==1: xs[t+1]
            xsp_r0 = (jnp.concatenate([entry, xs_ref[:hi - 1]], axis=0)
                      if q == 0 else xs_ref[lo - 1:hi - 1])
            xsp_r1 = (jnp.concatenate([xs_ref[lo + 1:], entry], axis=0)
                      if q == nq - 1 else xs_ref[lo + 1:hi + 1])
            xsp = jnp.where(r == 0, xsp_r0, xsp_r1).astype(jnp.float32)
        else:
            xsp = (jnp.concatenate([entry, xs_ref[:hi - 1]], axis=0)
                   if q == 0 else
                   xs_ref[lo - 1:hi - 1]).astype(jnp.float32)
        xs = xs_ref[lo:hi].astype(jnp.float32)
        dlt_q = sl(dlt, lo, hi)
        u_q = sl(u, lo, hi)
        g_q = sl(g, lo, hi)

        eaxp = e * a * xsp                           # (qs, N, LT)
        dd_a = jnp.sum(eaxp * A[None], axis=1)       # (qs, LT)
        ddu = jnp.sum(e * _bcast(B_ref, E, lo, hi, n), axis=1)
        dd_total = dd_a + ddu * u_q
        if softplus:
            dd_total = dd_total * jax.nn.sigmoid(sl(raw, lo, hi))
        dds.append(dd_total.astype(dd_ref.dtype))
        dus.append((ddu * dlt_q + Dsk_ref[0] * g_q).astype(du_ref.dtype))
        # per-batch reductions over each batch's dg lanes ride the MXU (W)
        if "wdot" in _FABL:  # timing ablation: skip products + reduce dots
            dBs.append(jnp.zeros((qs, n, Bsz), dB_ref.dtype))
            dCs.append(jnp.zeros((qs, n, Bsz), dC_ref.dtype))
        elif _WDOT_MODE == "bf16" and e_ref.dtype == jnp.bfloat16:
            # the 5 ms of this path is the fp32 OPERAND slabs, not the MXU
            # dot (folded_ablate: fp32->bf16 dot alone moved 0.3 ms): build
            # the product slabs straight in bf16 (half the vector work, no
            # cast pass). dB/dC are emitted in bf16 anyway; the extra
            # per-term rounding is ~2^-9 with fp32 accumulation.
            v_b = (dlt_q * u_q).astype(jnp.bfloat16)
            g_b = g_q.astype(jnp.bfloat16)
            dB_flat = (e_ref[lo:hi] * v_b[:, None, :]).reshape(qs * n, LT)
            dC_flat = (xs_ref[lo:hi] * g_b[:, None, :]).reshape(qs * n, LT)
            dims = (((1,), (0,)), ((), ()))
            Wb = W.astype(jnp.bfloat16)
            dBs.append(jax.lax.dot_general(
                dB_flat, Wb, dims, preferred_element_type=jnp.float32
            ).reshape(qs, n, Bsz).astype(dB_ref.dtype))
            dCs.append(jax.lax.dot_general(
                dC_flat, Wb, dims, preferred_element_type=jnp.float32
            ).reshape(qs, n, Bsz).astype(dC_ref.dtype))
        else:
            dB_flat = (e * (dlt_q * u_q)[:, None, :]).reshape(qs * n, LT)
            dC_flat = (xs * g_q[:, None, :]).reshape(qs * n, LT)
            dBs.append(_wdot(dB_flat, W).reshape(qs, n, Bsz).astype(
                dB_ref.dtype))
            dCs.append(_wdot(dC_flat, W).reshape(qs, n, Bsz).astype(
                dC_ref.dtype))
        dA_acc += jnp.sum(eaxp * dlt_q[:, None, :], axis=0)
        dD_acc += jnp.sum(g_q * u_q, axis=0, keepdims=True)
        ddb_acc += jnp.sum(dd_total, axis=0, keepdims=True)

    def _cat(parts):
        return parts[0] if nq == 1 else jnp.concatenate(parts, axis=0)

    dd_ref[0] = _cat(dds)
    du_ref[0] = _cat(dus)
    dB_ref[0, 0] = _cat(dBs)
    dC_ref[0, 0] = _cat(dCs)
    dA_ref[0, 0] += dA_acc
    dD_ref[0, 0, 0] += dD_acc[0]
    ddb_ref[0, 0, 0] += ddb_acc[0]


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _pad_L_f(x, Lp):
    pad = Lp - x.shape[1]
    if pad:
        cfg = [(0, 0)] * x.ndim
        cfg[1] = (0, pad)
        x = jnp.pad(x, cfg)
    return x


def _scan_fwd_folded(u, delta, A_f, Bm, Cm, Dsk_f, db_f, softplus, chunk,
                     interpret, dg, bidir=False, save_cs=True):
    """u: (2 if bidir else G, L, BD); delta: (G, L, BD);
    Bm, Cm: (G, L, N, Bsz); A_f: (G, N, BD); Dsk_f, db_f: (G, 1, BD).
    Returns y (G, L, BD) and cs (G, nLT, nc, N, LT) chunk entry states."""
    G, L, BD = delta.shape
    n = A_f.shape[1]
    Bsz = Bm.shape[-1]
    LT, nLT, Lc, Lp, nc = _tiling_folded(BD, L, n, jnp.dtype(u.dtype).itemsize)

    u = _pad_L_f(u, Lp)
    delta = _pad_L_f(delta, Lp)
    Bm = _pad_L_f(Bm, Lp)
    Cm = _pad_L_f(Cm, Lp)

    grid = (G, nLT, nc)
    io = u.dtype
    kernel = functools.partial(_fwd_kernel_folded, softplus=softplus, Lc=Lc,
                               dg=dg, bidir=bidir)

    def cke(g, ck):
        # data chunk for scan-position ck: reversed directions walk backwards
        return ck + (g // 2) * (nc - 1 - 2 * ck) if bidir else ck

    def u_map(g, lt, ck):
        return (g % 2 if bidir else g, cke(g, ck), lt)

    y, cs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, LT), lambda g, lt, ck: (g, 0, lt)),
            pl.BlockSpec((1, 1, LT), lambda g, lt, ck: (g, 0, lt)),
            pl.BlockSpec((1, 1, LT), lambda g, lt, ck: (g, 0, lt)),
            pl.BlockSpec((1, Lc, LT), u_map),
            pl.BlockSpec((1, Lc, LT), lambda g, lt, ck: (g, cke(g, ck), lt)),
            pl.BlockSpec((1, Lc, n, Bsz),
                         lambda g, lt, ck: (g, cke(g, ck), 0, 0)),
            pl.BlockSpec((1, Lc, n, Bsz),
                         lambda g, lt, ck: (g, cke(g, ck), 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Lc, LT), lambda g, lt, ck: (g, cke(g, ck), lt)),
            pl.BlockSpec(
                (1, 1, 1, n, LT),
                (lambda g, lt, ck: (g, lt, ck, 0, 0)) if save_cs
                else (lambda g, lt, ck: (g, lt, 0, 0, 0)),
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Lp, BD), io),
            jax.ShapeDtypeStruct((G, nLT, nc if save_cs else 1, n, LT), io),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, LT), jnp.float32),
            pltpu.VMEM((Lc, n, LT), io),
            pltpu.VMEM((Lc, n, LT), io),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(A_f, db_f, Dsk_f, u, delta, Bm, Cm)
    return y[:, :L], cs


def _scan_bwd_folded(res, gy, softplus, chunk, interpret, dg, bidir=False):
    u, delta, A_f, Bm, Cm, Dsk_f, db_f, cs = res
    G, L, BD = delta.shape
    n = A_f.shape[1]
    Bsz = Bm.shape[-1]
    LT, nLT, Lc, Lp, nc = _tiling_folded(BD, L, n, jnp.dtype(u.dtype).itemsize)
    io = u.dtype

    u_p = _pad_L_f(u, Lp)
    delta_p = _pad_L_f(delta, Lp)
    Bm_p = _pad_L_f(Bm, Lp)
    Cm_p = _pad_L_f(Cm, Lp)
    gy_p = _pad_L_f(gy.astype(io), Lp)

    grid = (G, nLT, nc)

    def rev(ck):
        return nc - 1 - ck

    def cke(g, ck):
        if not bidir:
            return rev(ck)
        return rev(ck) + (g // 2) * (2 * ck - nc + 1)

    def u_map(g, lt, ck):
        return (g % 2 if bidir else g, cke(g, ck), lt)

    kernel = functools.partial(_bwd_kernel_folded, softplus=softplus, Lc=Lc,
                               dg=dg, bidir=bidir)
    du, dd, dB4, dC4, dA, dD, ddb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, LT), lambda g, lt, ck: (g, 0, lt)),
            pl.BlockSpec((1, 1, LT), lambda g, lt, ck: (g, 0, lt)),
            pl.BlockSpec((1, 1, LT), lambda g, lt, ck: (g, 0, lt)),
            pl.BlockSpec((1, Lc, LT), u_map),
            pl.BlockSpec((1, Lc, LT), lambda g, lt, ck: (g, cke(g, ck), lt)),
            pl.BlockSpec((1, Lc, n, Bsz),
                         lambda g, lt, ck: (g, cke(g, ck), 0, 0)),
            pl.BlockSpec((1, Lc, n, Bsz),
                         lambda g, lt, ck: (g, cke(g, ck), 0, 0)),
            pl.BlockSpec((1, 1, 1, n, LT),
                         lambda g, lt, ck: (g, lt, rev(ck), 0, 0)),
            pl.BlockSpec((1, Lc, LT), lambda g, lt, ck: (g, cke(g, ck), lt)),
        ],
        out_specs=[
            pl.BlockSpec((1, Lc, LT), lambda g, lt, ck: (g, cke(g, ck), lt)),
            pl.BlockSpec((1, Lc, LT), lambda g, lt, ck: (g, cke(g, ck), lt)),
            pl.BlockSpec((1, 1, Lc, n, Bsz),
                         lambda g, lt, ck: (g, lt, cke(g, ck), 0, 0)),
            pl.BlockSpec((1, 1, Lc, n, Bsz),
                         lambda g, lt, ck: (g, lt, cke(g, ck), 0, 0)),
            pl.BlockSpec((1, 1, n, LT), lambda g, lt, ck: (g, lt, 0, 0)),
            pl.BlockSpec((1, 1, 1, LT), lambda g, lt, ck: (g, lt, 0, 0)),
            pl.BlockSpec((1, 1, 1, LT), lambda g, lt, ck: (g, lt, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Lp, BD), io),
            jax.ShapeDtypeStruct((G, Lp, BD), io),
            # lane tiles cover disjoint batches, so each per-tile dB/dC value
            # is already the COMPLETE fp32 sum for its batch (others are 0):
            # casting to the I/O dtype here matches production precision
            jax.ShapeDtypeStruct((G, nLT, Lp, n, Bsz), Bm.dtype),
            jax.ShapeDtypeStruct((G, nLT, Lp, n, Bsz), Cm.dtype),
            jax.ShapeDtypeStruct((G, nLT, n, LT), jnp.float32),
            jax.ShapeDtypeStruct((G, nLT, 1, LT), jnp.float32),
            jax.ShapeDtypeStruct((G, nLT, 1, LT), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, LT), jnp.float32),
            pltpu.VMEM((Lc, n, LT), io),
            pltpu.VMEM((Lc, n, LT), io),
            pltpu.VMEM((Lc, n, LT), io),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(A_f, db_f, Dsk_f, u_p, delta_p, Bm_p, Cm_p, cs, gy_p)

    du = du[:, :L]
    dd = dd[:, :L]
    # lane tiles cover disjoint batches -> summing the per-tile dB/dC is exact
    dB = dB4.sum(1)[:, :L].astype(Bm.dtype)
    dC = dC4.sum(1)[:, :L].astype(Cm.dtype)
    # cotangents stay in FOLDED lane form, matching the core's primals
    # (A_f/Dsk_f/db_f (G, ., BD)); the per-batch reduction to (G, ., dg)
    # happens via jnp.tile's autodiff VJP in _prep_params_folded.
    dA = dA.transpose(0, 2, 1, 3).reshape(G, n, BD)
    dD = dD.transpose(0, 2, 1, 3).reshape(G, 1, BD)
    ddb = ddb.transpose(0, 2, 1, 3).reshape(G, 1, BD)
    if bidir:
        du = du[:2] + du[2:]
    return du, dd, dA, dB, dC, dD, ddb


# ---------------------------------------------------------------------------
# custom VJP + public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _scan_core_folded(u, delta, A_f, Bm, Cm, Dsk_f, db_f, softplus, chunk,
                      interpret, dg, bidir):
    y, _ = _scan_fwd_folded(u, delta, A_f, Bm, Cm, Dsk_f, db_f, softplus,
                            chunk, interpret, dg, bidir=bidir, save_cs=False)
    return y


def _scan_core_folded_fwd(u, delta, A_f, Bm, Cm, Dsk_f, db_f, softplus, chunk,
                          interpret, dg, bidir):
    y, cs = _scan_fwd_folded(u, delta, A_f, Bm, Cm, Dsk_f, db_f, softplus,
                             chunk, interpret, dg, bidir=bidir)
    return y, (u, delta, A_f, Bm, Cm, Dsk_f, db_f, cs)


def _scan_core_folded_bwd(softplus, chunk, interpret, dg, bidir, res, gy):
    return _scan_bwd_folded(res, gy, softplus, chunk, interpret, dg,
                            bidir=bidir)


_scan_core_folded.defvjp(_scan_core_folded_fwd, _scan_core_folded_bwd)


def _prep_params_folded(A, D, delta_bias, G, dg, n, Bsz):
    A_t = A.astype(jnp.float32).reshape(G, dg, n).transpose(0, 2, 1)
    A_f = jnp.tile(A_t, (1, 1, Bsz))                          # (G, N, B*dg)
    Dsk = (D.astype(jnp.float32).reshape(G, 1, dg) if D is not None
           else jnp.zeros((G, 1, dg), jnp.float32))
    db = (delta_bias.astype(jnp.float32).reshape(G, 1, dg)
          if delta_bias is not None
          else jnp.zeros((G, 1, dg), jnp.float32))
    return A_f, jnp.tile(Dsk, (1, 1, Bsz)), jnp.tile(db, (1, 1, Bsz))


def selective_scan_folded_bidir(
    u2,         # (2, L, B*dg) — the two DATA streams, batch-folded lanes
    delta4,     # (4, L, B*dg) — per-direction, DATA order
    A,          # (4*dg, N)
    B4,         # (4, L, N, B) — per-direction, DATA order
    C4,         # (4, L, N, B)
    D=None,
    delta_bias=None,
    delta_softplus: bool = False,
    chunk: int = 128,
    interpret: Optional[bool] = None,
):
    """4-direction cross-scan on batch-folded lanes. Directions are
    [row, col, row-reversed, col-reversed]; direction g reads stream g%2,
    g >= 2 scan reversed via in-kernel index arithmetic (the production
    bidir contract, selective_scan_pallas.py). Returns y (4, L, B*dg) in
    DATA order."""
    if interpret is None:
        interpret = not on_tpu()
    G, L, BD = delta4.shape
    n = A.shape[1]
    Bsz = B4.shape[-1]
    dg = BD // Bsz
    io = jnp.bfloat16 if u2.dtype == jnp.bfloat16 else jnp.float32
    A_f, Dsk_f, db_f = _prep_params_folded(A, D, delta_bias, G, dg, n, Bsz)
    return _scan_core_folded(
        u2.astype(io), delta4.astype(io), A_f, B4.astype(io), C4.astype(io),
        Dsk_f, db_f, delta_softplus, chunk, interpret, dg, True,
    )


def selective_scan_folded(
    u_f,        # (G, L, B*dg)
    delta_f,    # (G, L, B*dg)
    A,          # (G*dg, N)
    B_f,        # (G, L, N, B)
    C_f,        # (G, L, N, B)
    D=None,
    delta_bias=None,
    delta_softplus: bool = False,
    chunk: int = 128,
    interpret: Optional[bool] = None,
):
    """Unidirectional folded entry (each direction scans its own stream)."""
    if interpret is None:
        interpret = not on_tpu()
    G, L, BD = delta_f.shape
    n = A.shape[1]
    Bsz = B_f.shape[-1]
    dg = BD // Bsz
    io = jnp.bfloat16 if u_f.dtype == jnp.bfloat16 else jnp.float32
    A_f, Dsk_f, db_f = _prep_params_folded(A, D, delta_bias, G, dg, n, Bsz)
    return _scan_core_folded(
        u_f.astype(io), delta_f.astype(io), A_f, B_f.astype(io),
        C_f.astype(io), Dsk_f, db_f, delta_softplus, chunk, interpret, dg,
        False,
    )
