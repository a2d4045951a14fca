"""Pallas TPU kernel for the selective scan (S6 recurrence).

This is the TPU replacement for the reference CUDA kernels
(``/root/reference/mamba/csrc/selective_scan/selective_scan_fwd_kernel.cuh``,
``selective_scan_bwd_kernel.cuh``). Same math, TPU-shaped:

    delta = softplus(delta + delta_bias)
    x_t   = exp(delta_t*A) x_{t-1} + delta_t B_t u_t      (fp32 state)
    y_t   = <C_t, x_t> + D u_t

Layout: time-major ``(B, G, L, dg)``. The grid is
``(B-tiles, G, dg-tiles, L-chunks)`` with the L-chunk axis innermost — the
TPU executes grid cells in order, so the fp32 state lives in a VMEM scratch
carried across chunk cells exactly like the CUDA kernel's smem running
prefix (fwd_kernel.cuh:236-253). A TILE OF BATCHES shares each cell: the
recurrence step then operates on a (btile, N, dgt) slab, amortizing the
sequential loop's issue overhead across btile samples (the loop, not the
vector work, dominates at small slabs). Per chunk the gates
``a = exp(delta*A)`` and ``b = delta*B*u`` are computed VECTORIZED into
scratch, the recurrence is one fused multiply-add per step, and the output
contraction ``y = sum_n C x`` is vectorized again.

The backward (custom VJP) follows ``selective_scan_bwd_kernel.cuh``:
the forward additionally saves each chunk's ENTRY state; the backward walks
chunks in reverse, recomputes the within-chunk forward from the entry state,
runs the reverse scan  e_t = C_t g_t + a_{t+1} e_{t+1}  with the carry
``a_0 e_0`` handed to the previous chunk through scratch, and reduces all
eight gradients in vectorized epilogue phases.

bf16 inputs stream through HBM as bf16 (half the traffic); the carried
state and all accumulation stay fp32. The big per-chunk VMEM slabs (gates
``a``, b-values/states ``xs``, and the backward's ``xsp``/``e``) are stored
in the I/O dtype: the sequential recurrence is VMEM-bandwidth bound (measured
— see benchmarks/kernel_variants.py), so bf16 slabs halve the loop's memory
traffic; with bf16 inputs the gate rounding (~2^-9 relative) is far below
the input quantization already present. fp32 inputs keep fp32 slabs — the
fp32 differential tests are bit-for-bit unaffected. The z-gate and the
-exp(A_log) reparameterization stay OUTSIDE the kernel (plain XLA ops
differentiated by autodiff).
"""

from __future__ import annotations

import functools
import os as _os
import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_CHUNK = 128
# VMEM is ~16 MB/core on v5e; the backward's vectorized epilogue additionally
# materializes fp32 casts of the slabs on the Mosaic stack, so the slab budget
# must stay well under the hardware limit (12 MB OOM'd the bwd at dg=192).
_VMEM_BUDGET = 8 * 1024 * 1024
# Slab accounting for tiling: the backward holds 4 (btile, Lc, N, dgt)
# scratch buffers (a, xs, xsp, e) in the I/O dtype PLUS ~one fp32 slab of
# Mosaic stack temporaries for the vectorized epilogue (e*a*xsp). The
# forward's 2 slabs fit whenever the backward's do, and both passes MUST
# agree on the chunk grid (the saved chunk-entry states align).
_N_SLABS = 4
_TEMP_BYTES = 4
_UNROLL = int(_os.environ.get("MAMBA_SCAN_UNROLL", "4"))
# Kernel variant: "slab" materializes (Lc, N, dgt) gate/value slabs and runs
# a 1-FMA loop; "fused" (v3) materializes NO N-sized slabs — gates are
# recomputed in-loop from (Lc, dgt) delta slabs and the y-contraction /
# gradient reductions are fused into the loops. The slab loop is
# VMEM-bandwidth bound (benchmarks/kernel_variants.py), so N-fold less slab
# traffic wins when the extra in-register ops stay under the saved traffic.


def _variant() -> str:
    """Kernel variant, re-read from the environment at trace time so tests
    and benchmarks can switch it without re-importing the module. The
    custom-VJP forward and backward both read it at trace time of the same
    jit, so the chunk grids they derive always agree.

    The fused pair is currently INTERPRET-ONLY: its per-step loads index the
    sublane dim of rank-3 (Lc, dgt) slabs, which Mosaic cannot compile
    ("cannot statically prove that index in dimension 1 is a multiple of 8"
    — the slab kernels dodge this by keeping the step index on the untiled
    dim of rank-4 slabs). On a real TPU backend the flag falls back to slab
    until a Mosaic-compatible port lands (docs/PROFILE.md)."""
    v = _os.environ.get("MAMBA_SCAN_VARIANT", "slab")
    if v == "fused" and on_tpu():
        warnings.warn(
            "MAMBA_SCAN_VARIANT=fused is interpret-only for now (Mosaic "
            "rejects its dynamic sublane indexing); using 'slab' on TPU."
        )
        return "slab"
    return v


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _dg_candidates(dg: int):
    """Lane-dim tile candidates: Mosaic requires the block's last dim to be
    a multiple of 128 OR the full array dim. Ordered by preference handled
    in _tiling (fewer dg tiles first)."""
    cands = []
    if dg <= 1024:
        cands.append(dg)  # whole (any size; Mosaic pads lanes)
    for c in (512, 384, 256, 128):
        if dg % c == 0 and c < dg:
            cands.append(c)
    return cands


def _padded(n: int, dgt: int):
    """Mosaic pads the last two dims to the (8, 128) fp32 tile — VMEM cost
    accounting must use the PADDED sizes."""
    return -(-n // 8) * 8, -(-dgt // 128) * 128


def _dg_tile(dg: int) -> Optional[int]:
    cands = _dg_candidates(dg)
    return cands[0] if cands else None


def _slab_bytes_per_step(n_p: int, dgt_p: int, btile: int, itemsize: int,
                         variant: str) -> int:
    """Lc-scaled VMEM bytes per timestep of chunk scratch (+temp headroom).

    slab:  4 (Lc, N, dgt) slabs (bwd worst case) in the I/O dtype + fp32
           epilogue stack temporaries.
    fused: ONE (Lc, N, dgt) slab (the bwd's recomputed states) + two tiny
           (Lc, dgt) delta slabs; in-loop (N, dgt) temporaries don't scale
           with Lc — accounted via _fixed_bytes."""
    if variant == "fused":
        return itemsize * btile * n_p * dgt_p + 2 * itemsize * btile * dgt_p
    return (_N_SLABS * itemsize + _TEMP_BYTES) * btile * n_p * dgt_p


def _fixed_bytes(n_p: int, dgt_p: int, btile: int, variant: str) -> int:
    """Lc-independent scratch: carried state(s) + per-step register blocks."""
    per = 8 if variant == "fused" else 2  # e/a/eaxp/acc/carry... headroom
    return per * 4 * btile * n_p * dgt_p


def _cap_chunk(chunk: int, L: int, n: int, dgt: int, btile: int,
               itemsize: int, variant: str) -> int:
    """Shrink the L-chunk so the chunk scratch stays within the VMEM budget.
    Sublane-tile multiple of 16 covers bf16."""
    n_p, dgt_p = _padded(n, dgt)
    per_step = _slab_bytes_per_step(n_p, dgt_p, btile, itemsize, variant)
    budget = _VMEM_BUDGET - _fixed_bytes(n_p, dgt_p, btile, variant)
    cap = max(budget // per_step, 16)
    return max(16, (min(chunk, L, cap) // 16) * 16)


def _pick_tiles(bsz: int, n: int, dg: int, itemsize: int, variant: str):
    """Choose (dgt, btile) minimizing the total count of SEQUENTIAL loop
    steps, (B/btile) * (dg/dgt) — the loop has a fixed per-step issue cost
    (bookkeeping + load/store latency) that dominates at small slabs, so
    fewer, fatter steps win (measured: whole-dg beat the 128-lane tiling by
    1.5x at dg=384; batch tile 8 beat 2 by 25% at dg=192)."""
    n_p = _padded(n, 128)[0]
    best = None
    for dgt in _dg_candidates(dg):
        dgt_p = _padded(n, dgt)[1]
        per16 = (16 * _slab_bytes_per_step(n_p, dgt_p, 1, itemsize, variant))
        for bt in (8, 4, 2, 1):
            if bsz % bt:
                continue
            if per16 * bt + _fixed_bytes(n_p, dgt_p, bt, variant) > _VMEM_BUDGET:
                continue
            steps = (bsz // bt) * (dg // dgt)
            key = (steps, -dgt)
            if best is None or key < best[0]:
                best = (key, dgt, bt)
            break  # larger bt under this dgt is infeasible; smaller is worse
    if best is None:
        return None, None
    return best[1], best[2]


def supported(u, A, B, return_last_state) -> bool:
    if return_last_state:
        return False
    if u.ndim != 3 or A.ndim != 2:
        return False
    bsz, d, L = u.shape
    n = A.shape[1]
    G = B.shape[1] if B.ndim == 4 else 1
    if d % G:
        return False
    if n > 64:
        return False
    return _dg_tile(d // G) is not None


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    A_ref,      # (1, N, dgt)
    db_ref,     # (1, 1, dgt)
    Dsk_ref,    # (1, 1, dgt)
    u_ref,      # (bt, 1, Lc, dgt)
    d_ref,      # (bt, 1, Lc, dgt)
    B_ref,      # (bt, 1, Lc, N)
    C_ref,      # (bt, 1, Lc, N)
    y_ref,      # (bt, 1, Lc, dgt) out
    cs_ref,     # (bt, 1, 1, 1, N, dgt) out: chunk ENTRY state
    state_ref,  # scratch (bt, N, dgt)
    a_ref,      # scratch (bt, Lc, N, dgt)
    xs_ref,     # scratch (bt, Lc, N, dgt)
    *,
    softplus: bool,
    Lc: int,
    bidir: bool = False,
):
    ck = pl.program_id(3)

    @pl.when(ck == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    A = A_ref[0]                                     # (N, dgt)
    u = u_ref[:, 0].astype(jnp.float32)              # (bt, Lc, dgt)
    raw = d_ref[:, 0].astype(jnp.float32) + db_ref[0][None]
    dlt = jax.nn.softplus(raw) if softplus else raw
    du = dlt * u                                     # (bt, Lc, dgt)
    # gate / b-value slabs in the I/O dtype (bf16 halves the loop's VMEM
    # traffic — the recurrence is VMEM-bandwidth bound)
    a_ref[:] = jnp.exp(dlt[:, :, None, :] * A[None, None]).astype(a_ref.dtype)
    Bc = B_ref[:, 0].astype(jnp.float32)             # (bt, Lc, N)
    xs_ref[:] = (Bc[..., None] * du[:, :, None, :]).astype(xs_ref.dtype)

    cs_ref[:, 0, 0, 0] = state_ref[:]                # entry state of the chunk

    # bidir: odd direction pairs (g >= 2) scan the SAME data stream in
    # reversed time order — pure index arithmetic, no flipped copies.
    r = (pl.program_id(1) // 2) if bidir else 0

    def body(i, x):
        # python-unrolled: cuts the loop's fixed per-step issue overhead
        for j in range(_UNROLL):
            t = i * _UNROLL + j
            te = t + r * (Lc - 1 - 2 * t)            # t, or Lc-1-t reversed
            x = a_ref[:, te].astype(jnp.float32) * x + xs_ref[:, te].astype(
                jnp.float32)                         # (bt, N, dgt) fp32
            xs_ref[:, te] = x.astype(xs_ref.dtype)
        return x

    state_ref[:] = jax.lax.fori_loop(0, Lc // _UNROLL, body, state_ref[:])

    Cc = C_ref[:, 0].astype(jnp.float32)             # (bt, Lc, N)
    y = jnp.sum(Cc[..., None] * xs_ref[:].astype(jnp.float32), axis=2)
    y_ref[:, 0] = (y + Dsk_ref[0][None] * u).astype(y_ref.dtype)


def _fwd_kernel_fused(
    A_ref,      # (1, N, dgt)
    db_ref,     # (1, 1, dgt)
    Dsk_ref,    # (1, 1, dgt)
    u_ref,      # (bt, 1, Lc, dgt)
    d_ref,      # (bt, 1, Lc, dgt)
    B_ref,      # (bt, 1, Lc, N)
    C_ref,      # (bt, 1, Lc, N)
    y_ref,      # (bt, 1, Lc, dgt) out
    cs_ref,     # (bt, 1, 1, 1, N, dgt) out: chunk ENTRY state
    state_ref,  # scratch (bt, N, dgt)
    dlt_ref,    # scratch (bt, Lc, dgt)
    du_ref,     # scratch (bt, Lc, dgt)
    *,
    softplus: bool,
    Lc: int,
    bidir: bool = False,
):
    """Traffic-minimal forward: no (Lc, N, dgt) slabs. The gate
    a_t = exp(dlt_t * A) is recomputed in-loop from the (Lc, dgt) delta slab
    and y is contracted in-loop (x_t never stored)."""
    ck = pl.program_id(3)

    @pl.when(ck == 0)
    def _():
        state_ref[:] = jnp.zeros_like(state_ref)

    A = A_ref[0]                                     # (N, dgt)
    u = u_ref[:, 0].astype(jnp.float32)
    raw = d_ref[:, 0].astype(jnp.float32) + db_ref[0][None]
    dlt = jax.nn.softplus(raw) if softplus else raw
    dlt_ref[:] = dlt.astype(dlt_ref.dtype)
    du_ref[:] = (dlt * u).astype(du_ref.dtype)
    Dsk = Dsk_ref[0, 0]

    cs_ref[:, 0, 0, 0] = state_ref[:]

    r = (pl.program_id(1) // 2) if bidir else 0

    def body(i, x):
        for j in range(_UNROLL):
            t = i * _UNROLL + j
            te = t + r * (Lc - 1 - 2 * t)
            dlt_t = dlt_ref[:, te].astype(jnp.float32)      # (bt, dgt)
            a_t = jnp.exp(dlt_t[:, None, :] * A[None])      # (bt, N, dgt)
            du_t = du_ref[:, te].astype(jnp.float32)
            B_t = B_ref[:, 0, te].astype(jnp.float32)       # (bt, N)
            C_t = C_ref[:, 0, te].astype(jnp.float32)
            x = a_t * x + B_t[:, :, None] * du_t[:, None, :]
            y_t = jnp.sum(C_t[:, :, None] * x, axis=1)
            y_ref[:, 0, te] = (
                y_t + Dsk[None] * u_ref[:, 0, te].astype(jnp.float32)
            ).astype(y_ref.dtype)
        return x

    state_ref[:] = jax.lax.fori_loop(0, Lc // _UNROLL, body, state_ref[:])


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    A_ref,      # (1, N, dgt)
    db_ref,     # (1, 1, dgt)
    Dsk_ref,    # (1, 1, dgt)
    u_ref,      # (bt, 1, Lc, dgt)
    d_ref,      # (bt, 1, Lc, dgt)
    B_ref,      # (bt, 1, Lc, N)
    C_ref,      # (bt, 1, Lc, N)
    cs_ref,     # (bt, 1, 1, 1, N, dgt) saved entry state
    g_ref,      # (bt, 1, Lc, dgt) incoming dy
    du_ref,     # out (bt, 1, Lc, dgt)
    dd_ref,     # out (bt, 1, Lc, dgt)
    dB_ref,     # out (bt, 1, Lc, N)
    dC_ref,     # out (bt, 1, Lc, N)
    dA_ref,     # out (1, 1, N, dgt)   accumulated over chunks + batch tile
    dD_ref,     # out (1, 1, 1, dgt)   accumulated
    ddb_ref,    # out (1, 1, 1, dgt)   accumulated
    carry_ref,  # scratch (bt, N, dgt): a_0*e_0 of the later-in-scan chunk
    a_ref,      # scratch (bt, Lc, N, dgt)
    xsp_ref,    # scratch (bt, Lc, N, dgt): x_{t-1} (pre-update states)
    xs_ref,     # scratch (bt, Lc, N, dgt): x_t
    e_ref,      # scratch (bt, Lc, N, dgt): dL/dx_t
    *,
    softplus: bool,
    Lc: int,
    bidir: bool = False,
):
    ck = pl.program_id(3)  # 0 = LAST chunk in scan order (walk via index_map)

    @pl.when(ck == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)
        dA_ref[:] = jnp.zeros_like(dA_ref)
        dD_ref[:] = jnp.zeros_like(dD_ref)
        ddb_ref[:] = jnp.zeros_like(ddb_ref)

    A = A_ref[0]
    u = u_ref[:, 0].astype(jnp.float32)
    raw = d_ref[:, 0].astype(jnp.float32) + db_ref[0][None]
    dlt = jax.nn.softplus(raw) if softplus else raw
    du_in = dlt * u
    a_ref[:] = jnp.exp(dlt[:, :, None, :] * A[None, None]).astype(a_ref.dtype)
    Bc = B_ref[:, 0].astype(jnp.float32)
    Cc = C_ref[:, 0].astype(jnp.float32)
    g = g_ref[:, 0].astype(jnp.float32)              # (bt, Lc, dgt)

    # bidir: directions g >= 2 scanned the data in reversed time order
    r = (pl.program_id(1) // 2) if bidir else 0

    # --- recompute within-chunk forward from the saved entry state ---
    xs_ref[:] = (Bc[..., None] * du_in[:, :, None, :]).astype(xs_ref.dtype)

    def fbody(i, x):
        for j in range(_UNROLL):
            t = i * _UNROLL + j
            te = t + r * (Lc - 1 - 2 * t)
            x = a_ref[:, te].astype(jnp.float32) * x + xs_ref[:, te].astype(
                jnp.float32)
            xs_ref[:, te] = x.astype(xs_ref.dtype)
        return x

    jax.lax.fori_loop(0, Lc // _UNROLL, fbody, cs_ref[:, 0, 0, 0])
    # x_{t-1} = xs shifted one step back in SCAN order, entry state first —
    # a vectorized copy instead of a second per-step store in the loop
    if bidir:
        @pl.when(r == 0)
        def _():
            xsp_ref[:, 0] = cs_ref[:, 0, 0, 0].astype(xsp_ref.dtype)
            xsp_ref[:, 1:] = xs_ref[:, : Lc - 1]

        @pl.when(r == 1)
        def _():
            xsp_ref[:, Lc - 1] = cs_ref[:, 0, 0, 0].astype(xsp_ref.dtype)
            xsp_ref[:, : Lc - 1] = xs_ref[:, 1:]
    else:
        xsp_ref[:, 0] = cs_ref[:, 0, 0, 0].astype(xsp_ref.dtype)
        xsp_ref[:, 1:] = xs_ref[:, : Lc - 1]

    # --- reverse scan (in scan order): e_t = C_t g_t + a_{t+1} e_{t+1} ---
    e_ref[:] = (Cc[..., None] * g[:, :, None, :]).astype(e_ref.dtype)

    def rbody(i, carry):
        for j in range(_UNROLL):
            t = Lc - 1 - (i * _UNROLL + j)
            te = t + r * (Lc - 1 - 2 * t)
            e = e_ref[:, te].astype(jnp.float32) + carry
            e_ref[:, te] = e.astype(e_ref.dtype)
            carry = a_ref[:, te].astype(jnp.float32) * e
        return carry

    carry_ref[:] = jax.lax.fori_loop(0, Lc // _UNROLL, rbody, carry_ref[:])

    # --- vectorized gradient epilogue (fp32 accumulation) ---
    e = e_ref[:].astype(jnp.float32)
    a = a_ref[:].astype(jnp.float32)
    xsp = xsp_ref[:].astype(jnp.float32)
    xs = xs_ref[:].astype(jnp.float32)

    eaxp = e * a * xsp                               # (bt, Lc, N, dgt)
    # delta from the a-path + from the b-path
    dd_a = jnp.sum(eaxp * A[None, None], axis=2)     # (bt, Lc, dgt)
    ddu = jnp.sum(e * Bc[..., None], axis=2)         # (bt, Lc, dgt)
    dd_total = dd_a + ddu * u
    if softplus:
        dd_total = dd_total * jax.nn.sigmoid(raw)
    dd_ref[:, 0] = dd_total.astype(dd_ref.dtype)
    du_ref[:, 0] = (ddu * dlt + Dsk_ref[0][None] * g).astype(du_ref.dtype)
    dB_ref[:, 0] = jnp.sum(e * du_in[:, :, None, :], axis=3).astype(dB_ref.dtype)
    dC_ref[:, 0] = jnp.sum(xs * g[:, :, None, :], axis=3).astype(dC_ref.dtype)
    dA_ref[0, 0] += jnp.sum(eaxp * dlt[:, :, None, :], axis=(0, 1))  # (N, dgt)
    dD_ref[0, 0, 0] += jnp.sum(g * u, axis=(0, 1))
    ddb_ref[0, 0, 0] += jnp.sum(dd_total, axis=(0, 1))


def _bwd_kernel_fused(
    A_ref,      # (1, N, dgt)
    db_ref,     # (1, 1, dgt)
    Dsk_ref,    # (1, 1, dgt)
    u_ref,      # (bt, 1, Lc, dgt)
    d_ref,      # (bt, 1, Lc, dgt)
    B_ref,      # (bt, 1, Lc, N)
    C_ref,      # (bt, 1, Lc, N)
    cs_ref,     # (bt, 1, 1, 1, N, dgt) saved entry state
    g_ref,      # (bt, 1, Lc, dgt) incoming dy
    du_ref,     # out (bt, 1, Lc, dgt)
    dd_ref,     # out (bt, 1, Lc, dgt)
    dB_ref,     # out (bt, 1, Lc, N)
    dC_ref,     # out (bt, 1, Lc, N)
    dA_ref,     # out (1, 1, N, dgt)   accumulated over chunks + batch tile
    dD_ref,     # out (1, 1, 1, dgt)   accumulated
    ddb_ref,    # out (1, 1, 1, dgt)   accumulated
    carry_ref,  # scratch (bt, N, dgt): a_0*e_0 of the later-in-scan chunk
    dacc_ref,   # scratch (bt, N, dgt): per-cell dA accumulator
    dlt_ref,    # scratch (bt, Lc, dgt)
    dus_ref,    # scratch (bt, Lc, dgt)
    xs_ref,     # scratch (bt, Lc, N, dgt): x_t (the ONE big slab)
    *,
    softplus: bool,
    Lc: int,
    bidir: bool = False,
):
    """Traffic-minimal backward: one (Lc, N, dgt) slab (the recomputed
    states) instead of four. Gates are recomputed in both loops from the
    (Lc, dgt) delta slab; every per-step gradient is produced INSIDE the
    reverse loop and written straight to its output block (no e/xsp slabs,
    no multi-pass epilogue). softplus'(raw) = 1 - exp(-softplus(raw)), so
    the raw pre-activation never needs storing."""
    ck = pl.program_id(3)  # 0 = LAST chunk in scan order (walk via index_map)

    @pl.when(ck == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)
        dA_ref[:] = jnp.zeros_like(dA_ref)
        dD_ref[:] = jnp.zeros_like(dD_ref)
        ddb_ref[:] = jnp.zeros_like(ddb_ref)

    A = A_ref[0]
    u = u_ref[:, 0].astype(jnp.float32)
    raw = d_ref[:, 0].astype(jnp.float32) + db_ref[0][None]
    dlt = jax.nn.softplus(raw) if softplus else raw
    dlt_ref[:] = dlt.astype(dlt_ref.dtype)
    dus_ref[:] = (dlt * u).astype(dus_ref.dtype)
    Dsk = Dsk_ref[0, 0]

    r = (pl.program_id(1) // 2) if bidir else 0

    def te_of(t):
        return t + r * (Lc - 1 - 2 * t)

    # --- recompute within-chunk forward from the saved entry state ---
    def fbody(i, x):
        for j in range(_UNROLL):
            t = i * _UNROLL + j
            te = te_of(t)
            dlt_t = dlt_ref[:, te].astype(jnp.float32)
            a_t = jnp.exp(dlt_t[:, None, :] * A[None])
            x = a_t * x + (
                B_ref[:, 0, te].astype(jnp.float32)[:, :, None]
                * dus_ref[:, te].astype(jnp.float32)[:, None, :]
            )
            xs_ref[:, te] = x.astype(xs_ref.dtype)
        return x

    jax.lax.fori_loop(0, Lc // _UNROLL, fbody, cs_ref[:, 0, 0, 0])

    # --- reverse scan with fused per-step gradients ---
    dacc_ref[:] = jnp.zeros_like(dacc_ref)

    def rbody(i, carry):
        acc = jnp.zeros_like(dacc_ref[:])
        for j in range(_UNROLL):
            t = Lc - 1 - (i * _UNROLL + j)
            te = te_of(t)
            dlt_t = dlt_ref[:, te].astype(jnp.float32)       # (bt, dgt)
            a_t = jnp.exp(dlt_t[:, None, :] * A[None])       # (bt, N, dgt)
            g_t = g_ref[:, 0, te].astype(jnp.float32)        # (bt, dgt)
            B_t = B_ref[:, 0, te].astype(jnp.float32)        # (bt, N)
            C_t = C_ref[:, 0, te].astype(jnp.float32)
            e = C_t[:, :, None] * g_t[:, None, :] + carry    # (bt, N, dgt)
            tp = te_of(jnp.maximum(t - 1, 0))  # masked below at t == 0
            xprev = jnp.where(
                t == 0,
                cs_ref[:, 0, 0, 0],
                xs_ref[:, tp].astype(jnp.float32),
            )
            eaxp = e * a_t * xprev
            dd_a = jnp.sum(eaxp * A[None], axis=1)           # (bt, dgt)
            ddu = jnp.sum(e * B_t[:, :, None], axis=1)       # (bt, dgt)
            u_t = u_ref[:, 0, te].astype(jnp.float32)
            dd_total = dd_a + ddu * u_t
            if softplus:
                # softplus'(raw) = sigmoid(raw) = 1 - exp(-softplus(raw))
                dd_total = dd_total * (1.0 - jnp.exp(-dlt_t))
            dd_ref[:, 0, te] = dd_total.astype(dd_ref.dtype)
            du_ref[:, 0, te] = (ddu * dlt_t + Dsk[None] * g_t).astype(
                du_ref.dtype)
            dus_t = dus_ref[:, te].astype(jnp.float32)
            dB_ref[:, 0, te] = jnp.sum(
                e * dus_t[:, None, :], axis=2).astype(dB_ref.dtype)
            dC_ref[:, 0, te] = jnp.sum(
                xs_ref[:, te].astype(jnp.float32) * g_t[:, None, :], axis=2
            ).astype(dC_ref.dtype)
            acc = acc + eaxp * dlt_t[:, None, :]
            carry = a_t * e
        dacc_ref[:] += acc
        return carry

    carry_ref[:] = jax.lax.fori_loop(0, Lc // _UNROLL, rbody, carry_ref[:])

    # --- cheap vectorized accumulations (inputs already in VMEM blocks) ---
    g = g_ref[:, 0].astype(jnp.float32)
    dA_ref[0, 0] += jnp.sum(dacc_ref[:], axis=0)             # (N, dgt)
    dD_ref[0, 0, 0] += jnp.sum(g * u, axis=(0, 1))
    ddb_ref[0, 0, 0] += jnp.sum(dd_ref[:, 0].astype(jnp.float32), axis=(0, 1))


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _pad_L(x, Lp):
    pad = Lp - x.shape[2]
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _scan_core(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk, interpret):
    y, _ = _scan_fwd_impl(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk, interpret)
    return y


def _tiling(bsz, L, n, dg, chunk, dtype, variant=None):
    variant = variant or _variant()
    itemsize = jnp.dtype(dtype).itemsize
    dgt, btile = _pick_tiles(bsz, n, dg, itemsize, variant)
    if dgt is None:
        dgt = _dg_tile(dg)
        btile = 1
    Lc = _cap_chunk(chunk, L, n, dgt, btile, itemsize, variant)
    Lp = -(-L // Lc) * Lc
    return dgt, dg // dgt, btile, Lc, Lp, Lp // Lc


def _scan_fwd_impl(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk, interpret,
                   bidir=False):
    """u, delta: (B,G,L,dg); A_t: (G,N,dg); Bm,Cm: (B,G,L,N); Dsk,db: (G,1,dg).

    Returns y (B,G,L,dg) and cs (B,G,DT,nc,N,dg_tile) chunk entry states.

    bidir: u carries only the G//2 distinct DATA streams (B, G//2, L, dg);
    direction g reads stream g%2, and directions g >= G//2... (G is 4: the
    row/col streams each scanned forward and reversed). Reversal happens via
    reversed chunk index maps + in-kernel index arithmetic — no flipped
    copies in HBM. delta/B/C/y stay per-direction in DATA order.
    """
    bsz, G, L, dg = (delta.shape if bidir else u.shape)
    n = A_t.shape[1]
    dgt, DT, bt, Lc, Lp, nc = _tiling(bsz, L, n, dg, chunk, u.dtype)

    u = _pad_L(u, Lp)
    delta = _pad_L(delta, Lp)
    Bm = _pad_L(Bm, Lp)
    Cm = _pad_L(Cm, Lp)

    grid = (bsz // bt, G, DT, nc)
    io = u.dtype
    if _variant() == "fused":
        kernel = functools.partial(_fwd_kernel_fused, softplus=softplus,
                                   Lc=Lc, bidir=bidir)
        scratch = [
            pltpu.VMEM((bt, n, dgt), jnp.float32),
            pltpu.VMEM((bt, Lc, dgt), io),
            pltpu.VMEM((bt, Lc, dgt), io),
        ]
    else:
        kernel = functools.partial(_fwd_kernel, softplus=softplus, Lc=Lc,
                                   bidir=bidir)
        scratch = [
            pltpu.VMEM((bt, n, dgt), jnp.float32),
            pltpu.VMEM((bt, Lc, n, dgt), io),
            pltpu.VMEM((bt, Lc, n, dgt), io),
        ]

    def cke(g, ck):
        # data chunk for scan-position ck: reversed directions walk backwards
        return ck + (g // 2) * (nc - 1 - 2 * ck) if bidir else ck

    def u_map(b, g, dt, ck):
        return (b, g % 2 if bidir else g, cke(g, ck), dt)

    y, cs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, dgt), lambda b, g, dt, ck: (g, 0, dt)),
            pl.BlockSpec((1, 1, dgt), lambda b, g, dt, ck: (g, 0, dt)),
            pl.BlockSpec((1, 1, dgt), lambda b, g, dt, ck: (g, 0, dt)),
            pl.BlockSpec((bt, 1, Lc, dgt), u_map),
            pl.BlockSpec((bt, 1, Lc, dgt),
                         lambda b, g, dt, ck: (b, g, cke(g, ck), dt)),
            pl.BlockSpec((bt, 1, Lc, n),
                         lambda b, g, dt, ck: (b, g, cke(g, ck), 0)),
            pl.BlockSpec((bt, 1, Lc, n),
                         lambda b, g, dt, ck: (b, g, cke(g, ck), 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, 1, Lc, dgt),
                         lambda b, g, dt, ck: (b, g, cke(g, ck), dt)),
            pl.BlockSpec(
                (bt, 1, 1, 1, n, dgt), lambda b, g, dt, ck: (b, g, dt, ck, 0, 0)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, G, Lp, dg), u.dtype),
            jax.ShapeDtypeStruct((bsz, G, DT, nc, n, dgt), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(A_t, db, Dsk, u, delta, Bm, Cm)
    return y[:, :, :L], cs


def _scan_core_fwd(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk, interpret):
    y, cs = _scan_fwd_impl(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk, interpret)
    return y, (u, delta, A_t, Bm, Cm, Dsk, db, cs)


def _scan_bwd_impl(res, gy, softplus, chunk, interpret, bidir=False):
    u, delta, A_t, Bm, Cm, Dsk, db, cs = res
    bsz, G, L, dg = (delta.shape if bidir else u.shape)
    n = A_t.shape[1]
    dgt, DT, bt, Lc, Lp, nc = _tiling(bsz, L, n, dg, chunk, u.dtype)
    io = u.dtype

    u_p = _pad_L(u, Lp)
    delta_p = _pad_L(delta, Lp)
    Bm_p = _pad_L(Bm, Lp)
    Cm_p = _pad_L(Cm, Lp)
    gy_p = _pad_L(gy.astype(u.dtype), Lp)

    grid = (bsz // bt, G, DT, nc)

    def rev(ck):
        return nc - 1 - ck

    def cke(g, ck):
        # data chunk for the ck-th chunk of the SCAN-REVERSED walk: forward
        # directions walk data backwards, reversed directions walk forwards
        if not bidir:
            return rev(ck)
        return rev(ck) + (g // 2) * (2 * ck - nc + 1)

    def u_map(b, g, dt, ck):
        return (b, g % 2 if bidir else g, cke(g, ck), dt)

    if _variant() == "fused":
        kernel = functools.partial(_bwd_kernel_fused, softplus=softplus,
                                   Lc=Lc, bidir=bidir)
        scratch = [
            pltpu.VMEM((bt, n, dgt), jnp.float32),  # carry
            pltpu.VMEM((bt, n, dgt), jnp.float32),  # dacc
            pltpu.VMEM((bt, Lc, dgt), io),          # dlt
            pltpu.VMEM((bt, Lc, dgt), io),          # du (delta*u)
            pltpu.VMEM((bt, Lc, n, dgt), io),       # xs — the one big slab
        ]
    else:
        kernel = functools.partial(_bwd_kernel, softplus=softplus, Lc=Lc,
                                   bidir=bidir)
        scratch = [
            pltpu.VMEM((bt, n, dgt), jnp.float32),
            pltpu.VMEM((bt, Lc, n, dgt), io),
            pltpu.VMEM((bt, Lc, n, dgt), io),
            pltpu.VMEM((bt, Lc, n, dgt), io),
            pltpu.VMEM((bt, Lc, n, dgt), io),
        ]
    du, dd, dB, dC, dA, dD, ddb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, dgt), lambda b, g, dt, ck: (g, 0, dt)),
            pl.BlockSpec((1, 1, dgt), lambda b, g, dt, ck: (g, 0, dt)),
            pl.BlockSpec((1, 1, dgt), lambda b, g, dt, ck: (g, 0, dt)),
            pl.BlockSpec((bt, 1, Lc, dgt), u_map),
            pl.BlockSpec((bt, 1, Lc, dgt),
                         lambda b, g, dt, ck: (b, g, cke(g, ck), dt)),
            pl.BlockSpec((bt, 1, Lc, n),
                         lambda b, g, dt, ck: (b, g, cke(g, ck), 0)),
            pl.BlockSpec((bt, 1, Lc, n),
                         lambda b, g, dt, ck: (b, g, cke(g, ck), 0)),
            pl.BlockSpec(
                (bt, 1, 1, 1, n, dgt),
                lambda b, g, dt, ck: (b, g, dt, rev(ck), 0, 0),
            ),
            pl.BlockSpec((bt, 1, Lc, dgt),
                         lambda b, g, dt, ck: (b, g, cke(g, ck), dt)),
        ],
        out_specs=[
            pl.BlockSpec((bt, 1, Lc, dgt),
                         lambda b, g, dt, ck: (b, g, cke(g, ck), dt)),
            pl.BlockSpec((bt, 1, Lc, dgt),
                         lambda b, g, dt, ck: (b, g, cke(g, ck), dt)),
            pl.BlockSpec((bt, 1, Lc, n),
                         lambda b, g, dt, ck: (b, g, cke(g, ck), 0)),
            pl.BlockSpec((bt, 1, Lc, n),
                         lambda b, g, dt, ck: (b, g, cke(g, ck), 0)),
            pl.BlockSpec((1, 1, n, dgt),
                         lambda b, g, dt, ck: (b, g * DT + dt, 0, 0)),
            pl.BlockSpec((1, 1, 1, dgt),
                         lambda b, g, dt, ck: (b, g * DT + dt, 0, 0)),
            pl.BlockSpec((1, 1, 1, dgt),
                         lambda b, g, dt, ck: (b, g * DT + dt, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, G, Lp, dg), u.dtype),
            jax.ShapeDtypeStruct((bsz, G, Lp, dg), u.dtype),
            jax.ShapeDtypeStruct((bsz, G, Lp, n), Bm.dtype),
            jax.ShapeDtypeStruct((bsz, G, Lp, n), Bm.dtype),
            jax.ShapeDtypeStruct((bsz // bt, G * DT, n, dgt), jnp.float32),
            jax.ShapeDtypeStruct((bsz // bt, G * DT, 1, dgt), jnp.float32),
            jax.ShapeDtypeStruct((bsz // bt, G * DT, 1, dgt), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(A_t, db, Dsk, u_p, delta_p, Bm_p, Cm_p, cs, gy_p)

    du = du[:, :, :L]
    dd = dd[:, :, :L]
    dB = dB[:, :, :L]
    dC = dC[:, :, :L]
    # (B/bt, G*DT, n, dgt) -> (G, n, dg): sum over batch tiles, stitch dg tiles
    dA = dA.sum(0).reshape(G, DT, n, dgt).transpose(0, 2, 1, 3).reshape(G, n, dg)
    dD = dD.sum(0).reshape(G, DT, dgt).reshape(G, 1, dg)
    ddb = ddb.sum(0).reshape(G, DT, dgt).reshape(G, 1, dg)
    if bidir:
        # per-direction du (data order) -> the 2 data streams: stream m gets
        # directions m (forward) and m+2 (reversed)
        du = du[:, :2] + du[:, 2:]
    return du, dd, dA, dB, dC, dD, ddb


def _scan_core_bwd(softplus, chunk, interpret, res, gy):
    return _scan_bwd_impl(res, gy, softplus, chunk, interpret, bidir=False)


_scan_core.defvjp(_scan_core_fwd, _scan_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _scan_core_bidir(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk,
                     interpret):
    y, _ = _scan_fwd_impl(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk,
                          interpret, bidir=True)
    return y


def _scan_core_bidir_fwd(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk,
                         interpret):
    y, cs = _scan_fwd_impl(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk,
                           interpret, bidir=True)
    return y, (u, delta, A_t, Bm, Cm, Dsk, db, cs)


def _scan_core_bidir_bwd(softplus, chunk, interpret, res, gy):
    return _scan_bwd_impl(res, gy, softplus, chunk, interpret, bidir=True)


_scan_core_bidir.defvjp(_scan_core_bidir_fwd, _scan_core_bidir_bwd)


def selective_scan_pallas_bidir(
    u2,         # (B, 2, L, dg) — the two DATA streams [row-major, col-major]
    delta4,     # (B, 4, L, dg) — per-direction, in DATA order
    A,          # (4*dg, N)
    B4,         # (B, 4, L, N) — per-direction, in DATA order
    C4,         # (B, 4, L, N)
    D=None,
    delta_bias=None,
    delta_softplus: bool = False,
    chunk: int = DEFAULT_CHUNK,
    interpret: Optional[bool] = None,
):
    """4-direction cross-scan WITHOUT materialized flips: directions are
    [row, col, row-reversed, col-reversed]; direction g reads data stream
    g%2 and g>=2 scan it in reversed time order via index arithmetic inside
    the kernel (reversed chunk index maps + mirrored in-block indices) —
    the TPU replacement for the reference's flipped copies
    (mamba_sys.py:403-404 torch.flip). Returns y (B, 4, L, dg) in DATA order
    (already un-reversed), so the merge is a plain sum + transpose."""
    if interpret is None:
        interpret = not on_tpu()
    bsz, G, L, dg = delta4.shape
    n = A.shape[1]
    io = jnp.bfloat16 if u2.dtype == jnp.bfloat16 else jnp.float32
    A_t, Dsk, db = _prep_params(A, D, delta_bias, G, dg, n)
    return _scan_core_bidir(
        u2.astype(io), delta4.astype(io), A_t, B4.astype(io), C4.astype(io),
        Dsk, db, delta_softplus, chunk, interpret,
    )


def _prep_params(A, D, delta_bias, G, dg, n):
    A_t = A.astype(jnp.float32).reshape(G, dg, n).transpose(0, 2, 1)  # (G, N, dg)
    Dsk = (
        D.astype(jnp.float32).reshape(G, 1, dg)
        if D is not None
        else jnp.zeros((G, 1, dg), jnp.float32)
    )
    db = (
        delta_bias.astype(jnp.float32).reshape(G, 1, dg)
        if delta_bias is not None
        else jnp.zeros((G, 1, dg), jnp.float32)
    )
    return A_t, Dsk, db


def selective_scan_pallas_tm(
    u_tm,       # (B, G, L, dg) — already time-major
    delta_tm,   # (B, G, L, dg)
    A,          # (D, N) with D = G*dg
    B_tm,       # (B, G, L, N)
    C_tm,       # (B, G, L, N)
    D=None,
    z_tm=None,
    delta_bias=None,
    delta_softplus: bool = False,
    chunk: int = DEFAULT_CHUNK,
    interpret: Optional[bool] = None,
):
    """Time-major entry: skips the (B, D, L) <-> (B, G, L, dg) transposes —
    the fast path for SS2D, whose channels-last activations are already
    time-major for the row-scan directions. Returns y (B, G, L, dg)."""
    if interpret is None:
        interpret = not on_tpu()
    bsz, G, L, dg = u_tm.shape
    n = A.shape[1]
    io = jnp.bfloat16 if u_tm.dtype == jnp.bfloat16 else jnp.float32
    A_t, Dsk, db = _prep_params(A, D, delta_bias, G, dg, n)
    y = _scan_core(u_tm.astype(io), delta_tm.astype(io), A_t,
                   B_tm.astype(io), C_tm.astype(io), Dsk, db,
                   delta_softplus, chunk, interpret)
    if z_tm is not None:
        y = (y.astype(jnp.float32)
             * jax.nn.silu(z_tm.astype(jnp.float32))).astype(y.dtype)
    return y


def selective_scan_pallas(
    u,
    delta,
    A,
    B,
    C,
    D=None,
    z=None,
    delta_bias=None,
    delta_softplus: bool = False,
    chunk: int = DEFAULT_CHUNK,
    interpret: Optional[bool] = None,
):
    """Drop-in for ``selective_scan`` on TPU. Shapes as in selective_scan.py."""
    if interpret is None:
        interpret = not on_tpu()
    out_dtype = u.dtype
    bsz, d, L = u.shape
    if B.ndim == 3:
        B = B[:, None]
        C = C[:, None]
    G = B.shape[1]
    n = A.shape[1]
    dg = d // G

    # bf16 inputs stream through HBM as bf16 (half the scan's memory
    # traffic); the kernel casts to fp32 in VMEM. Anything else runs fp32.
    io = jnp.bfloat16 if u.dtype == jnp.bfloat16 else jnp.float32

    # (B, D, L) -> time-major grouped (B, G, L, dg)
    u_g = u.astype(io).reshape(bsz, G, dg, L).transpose(0, 1, 3, 2)
    d_g = delta.astype(io).reshape(bsz, G, dg, L).transpose(0, 1, 3, 2)
    Bm = B.astype(io).transpose(0, 1, 3, 2)  # (B, G, L, N)
    Cm = C.astype(io).transpose(0, 1, 3, 2)
    y = selective_scan_pallas_tm(
        u_g, d_g, A, Bm, Cm, D, None, delta_bias, delta_softplus, chunk,
        interpret,
    )
    y = y.transpose(0, 1, 3, 2).reshape(bsz, d, L)
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y.astype(out_dtype)
