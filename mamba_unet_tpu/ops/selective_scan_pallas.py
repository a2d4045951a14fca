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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# NB: every public `chunk` parameter below is an UPPER BOUND on the L-chunk,
# not the chunk itself: _cap_chunk takes min(chunk, L, VMEM cap, _LC_DEFAULT)
# — and _LC_DEFAULT (env MAMBA_SCAN_LC, default 16) normally binds, because
# the r3 sweep measured fwd/grad flat in Lc from 16..96 and the smallest
# legal chunk wins on VMEM and compile time. Raise MAMBA_SCAN_LC to make a
# larger `chunk` take effect.
DEFAULT_CHUNK = 128
# VMEM is ~16 MB/core on v5e. Round 3: the fwd/bwd epilogues are chunked
# into static 16-step sub-ranges (_EPI_QUARTER), capping the fp32 stack
# temporaries at a fixed size instead of scaling with Lc — that is what
# lets the budget grow past round 2's 8 MB (12 MB OOM'd then because the
# eaxp temp scaled with the slabs). Bigger budget -> bigger bt*Lc -> fewer
# grid cells (~0.9 us fixed cost each, measured benchmarks/pass_micro.py).
_VMEM_BUDGET = 56 * 1024 * 1024
_EPI_QUARTER = int(_os.environ.get("MAMBA_SCAN_EPI", "16"))
# Per-step lane-work cap: the r2/r3 sweeps consistently rank tile choices
# with btile*dgt_padded ~ 2048 first (stage winners: 192x8, 384x4, 256x8,
# 512x4) — fatter per-step slabs stall the serial loop, thinner ones waste
# issue slots. Among feasible tiles, maximize bt*dgt_p <= cap, then
# minimize sequential steps.
_LANE_WORK_CAP = int(_os.environ.get("MAMBA_SCAN_LANE_CAP", "2048"))
# L-chunk default: the r3 sweep measured fwd/grad FLAT in Lc from 16..96
# (grid-cell savings are offset by longer in-cell epilogues), so the
# smallest legal chunk wins on VMEM and compile time.
_LC_DEFAULT = int(_os.environ.get("MAMBA_SCAN_LC", "16"))
# Mosaic's default scoped-VMEM budget is 16 MiB, but v5e physically has
# 128 MiB of VMEM per core — raising the per-kernel limit is what unlocks
# bigger bt*Lc tiles (fewer ~0.9us grid cells). Kept well under the
# hardware limit to leave room for XLA's own scoped allocations.
_VMEM_LIMIT_BYTES = int(_os.environ.get("MAMBA_SCAN_VMEM_LIMIT",
                                        str(64 * 1024 * 1024)))


def _compiler_params():
    sem = _os.environ.get("MAMBA_SCAN_SEMANTICS")
    kw = {}
    if sem:
        kw["dimension_semantics"] = tuple(sem.split(","))
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES, **kw)
# Slab accounting for tiling: the backward holds 3 (btile, Lc, N, dgt)
# scratch buffers (a, xs, e) in the I/O dtype (x_{t-1} is read as shifted
# slices of xs, no dedicated slab); the chunked epilogue's fp32 temporaries
# are Lc-independent and accounted in _fixed_bytes. The forward's 2 slabs
# fit whenever the backward's do, and both passes MUST agree on the chunk
# grid (the saved chunk-entry states align).
_N_SLABS = 3
_TEMP_BYTES = 0
_UNROLL = int(_os.environ.get("MAMBA_SCAN_UNROLL", "4"))
# Profiling hook: ablate parts of the BACKWARD kernel to attribute its time
# (results are WRONG with any value set). Comma-joined subset of
# {fwdloop, revloop, epi}. benchmarks/bwd_ablate.py sweeps these.
_ABLATE = frozenset(
    v for v in _os.environ.get("MAMBA_SCAN_ABLATE", "").split(",") if v)


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


def _slab_bytes_per_step(n_p: int, dgt_p: int, btile: int,
                         itemsize: int) -> int:
    """Lc-scaled VMEM bytes per timestep of chunk scratch: 3 (Lc, N, dgt)
    slabs (bwd worst case: a/xs/e) in the I/O dtype; the epilogue's fp32
    stack temporaries are Lc-independent (chunked) — see _fixed_bytes."""
    return (_N_SLABS * itemsize + _TEMP_BYTES) * btile * n_p * dgt_p


def _fixed_bytes(n_p: int, dgt_p: int, btile: int) -> int:
    """Lc-independent scratch: carried state + per-step register blocks
    + the chunked epilogue's fp32 temporaries (~5 quarter-sized fp32
    blocks: e/a/xsp/xs casts + eaxp)."""
    per = 2  # carry + in-loop register block headroom
    epi = 5 * 4 * btile * _EPI_QUARTER * n_p * dgt_p
    return per * 4 * btile * n_p * dgt_p + epi


def _build_slab(out_ref, fn, Lc: int):
    """Fill a (bt, Lc, N, dgt) scratch slab in _EPI_QUARTER-sized strips.

    Building the whole slab in one expression materializes a full-slab fp32
    temporary on the Mosaic stack (the value before the bf16 cast); strip
    writes cap that temp at quarter size, which is what lets bt*Lc grow.
    ``fn(lo, hi)`` returns the strip value for rows [lo, hi).
    """
    nq = max(1, Lc // _EPI_QUARTER)
    qs = Lc // nq
    for q in range(nq):
        lo, hi = q * qs, (q + 1) * qs
        out_ref[:, lo:hi] = fn(lo, hi).astype(out_ref.dtype)


def _cap_chunk(chunk: int, L: int, n: int, dgt: int, btile: int,
               itemsize: int) -> int:
    """Shrink the L-chunk so the chunk scratch stays within the VMEM budget.
    Sublane-tile multiple of 16 covers bf16."""
    n_p, dgt_p = _padded(n, dgt)
    per_step = _slab_bytes_per_step(n_p, dgt_p, btile, itemsize)
    budget = _VMEM_BUDGET - _fixed_bytes(n_p, dgt_p, btile)
    cap = max(budget // per_step, 16)
    return max(16, (min(chunk, L, cap, _LC_DEFAULT) // 16) * 16)


def _pick_tiles(bsz: int, n: int, dg: int, itemsize: int):
    """Choose (dgt, btile): among VMEM-feasible tiles with per-step lane
    work btile*dgt_padded <= _LANE_WORK_CAP, minimize the total count of
    SEQUENTIAL loop steps (B/btile) * (dg/dgt) — the loop has a fixed
    per-step issue cost, so fewer steps win UP TO the lane-work cap, past
    which the fat per-step slab itself stalls the loop (measured, r2+r3
    sweeps: stage winners 192x8 / 384x4 / 256x8 / 512x4, all ~2048).
    Ties prefer the larger dgt (fewer dg tiles -> fewer grid cells)."""
    n_p = _padded(n, 128)[0]
    best = None
    for dgt in _dg_candidates(dg):
        dgt_p = _padded(n, dgt)[1]
        per16 = (16 * _slab_bytes_per_step(n_p, dgt_p, 1, itemsize))
        for bt in (8, 4, 2, 1):
            if bsz % bt:
                continue
            if bt * dgt_p > _LANE_WORK_CAP:
                continue
            if per16 * bt + _fixed_bytes(n_p, dgt_p, bt) > _VMEM_BUDGET:
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
    _sq = functools.partial(jax.lax.slice_in_dim, axis=1)
    # gate / b-value slabs in the I/O dtype (bf16 halves the loop's VMEM
    # traffic — the recurrence is VMEM-bandwidth bound), built in strips to
    # cap the pre-cast fp32 stack temporaries
    Bc = B_ref[:, 0].astype(jnp.float32)             # (bt, Lc, N)
    if "build" not in _ABLATE:
        _build_slab(a_ref, lambda lo, hi: jnp.exp(
            _sq(dlt, lo, hi)[:, :, None, :] * A[None, None]), Lc)
        _build_slab(xs_ref, lambda lo, hi: (
            _sq(Bc, lo, hi)[..., None] * _sq(du, lo, hi)[:, :, None, :]), Lc)

    cs_ref[:, 0, 0, 0] = state_ref[:].astype(cs_ref.dtype)  # chunk entry state
    # (I/O dtype: the bwd's recomputed states live in a bf16 slab anyway, and
    # fp32 entries were the single largest HBM array in the pass at Lc=16)

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

    if "fwdloop" not in _ABLATE:
        state_ref[:] = jax.lax.fori_loop(0, Lc // _UNROLL, body,
                                         state_ref[:])

    if "yepi" in _ABLATE:
        y_ref[:, 0] = u_ref[:, 0]
        return
    # y epilogue chunked like the backward's so fp32 stack temps stay small;
    # quarters are buffered and stored ONCE (sublane-sliced output writes
    # lower as unsupported gathers). Value slices MUST be lax.slice_in_dim:
    # jnp basic indexing on traced values lowers as `gather`, which Mosaic
    # rejects above rank 2.
    Cc = C_ref[:, 0].astype(jnp.float32)             # (bt, Lc, N)
    nq = max(1, Lc // _EPI_QUARTER)
    qs = Lc // nq
    ys = []
    for q in range(nq):
        lo, hi = q * qs, (q + 1) * qs
        Cc_q = jax.lax.slice_in_dim(Cc, lo, hi, axis=1)
        u_q = jax.lax.slice_in_dim(u, lo, hi, axis=1)
        y = jnp.sum(Cc_q[..., None] * xs_ref[:, lo:hi].astype(jnp.float32),
                    axis=2)
        ys.append((y + Dsk_ref[0][None] * u_q).astype(y_ref.dtype))
    y_ref[:, 0] = ys[0] if nq == 1 else jnp.concatenate(ys, axis=1)


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
    _sq = functools.partial(jax.lax.slice_in_dim, axis=1)
    Bc = B_ref[:, 0].astype(jnp.float32)
    Cc = C_ref[:, 0].astype(jnp.float32)
    g = g_ref[:, 0].astype(jnp.float32)              # (bt, Lc, dgt)
    _build_slab(a_ref, lambda lo, hi: jnp.exp(
        _sq(dlt, lo, hi)[:, :, None, :] * A[None, None]), Lc)

    # bidir: directions g >= 2 scanned the data in reversed time order
    r = (pl.program_id(1) // 2) if bidir else 0

    # --- recompute within-chunk forward from the saved entry state ---
    _build_slab(xs_ref, lambda lo, hi: (
        _sq(Bc, lo, hi)[..., None] * _sq(du_in, lo, hi)[:, :, None, :]), Lc)

    def fbody(i, x):
        for j in range(_UNROLL):
            t = i * _UNROLL + j
            te = t + r * (Lc - 1 - 2 * t)
            x = a_ref[:, te].astype(jnp.float32) * x + xs_ref[:, te].astype(
                jnp.float32)
            xs_ref[:, te] = x.astype(xs_ref.dtype)
        return x

    if "fwdloop" not in _ABLATE:
        jax.lax.fori_loop(0, Lc // _UNROLL, fbody,
                          cs_ref[:, 0, 0, 0].astype(jnp.float32))

    # --- reverse scan (in scan order): e_t = C_t g_t + a_{t+1} e_{t+1} ---
    _build_slab(e_ref, lambda lo, hi: (
        _sq(Cc, lo, hi)[..., None] * _sq(g, lo, hi)[:, :, None, :]), Lc)

    def rbody(i, carry):
        for j in range(_UNROLL):
            t = Lc - 1 - (i * _UNROLL + j)
            te = t + r * (Lc - 1 - 2 * t)
            e = e_ref[:, te].astype(jnp.float32) + carry
            e_ref[:, te] = e.astype(e_ref.dtype)
            carry = a_ref[:, te].astype(jnp.float32) * e
        return carry

    if "revloop" not in _ABLATE:
        carry_ref[:] = jax.lax.fori_loop(0, Lc // _UNROLL, rbody,
                                         carry_ref[:])

    # --- vectorized gradient epilogue (fp32 accumulation), chunked into
    # static Lc sub-ranges so the fp32 stack temporaries (eaxp etc.) stay a
    # fraction of the slab size — that cap is what lets the VMEM budget (and
    # with it bt*Lc, i.e. fewer grid cells) grow past round 2's 8 MB ---
    nq = max(1, Lc // _EPI_QUARTER)
    qs = Lc // nq
    dds, dus, dBs, dCs = [], [], [], []
    dA_acc = jnp.zeros_like(dA_ref[0, 0])
    dD_acc = jnp.zeros_like(dD_ref[0, 0, 0])
    ddb_acc = jnp.zeros_like(ddb_ref[0, 0, 0])
    _s = functools.partial(jax.lax.slice_in_dim, axis=1)  # NOT x[:, sl]:
    # jnp basic indexing on traced values lowers as Mosaic-illegal `gather`
    # x_{t-1} in SCAN order comes from shifted reads of the xs slab (entry
    # state at the scan-order start) — round 3 dropped the dedicated xsp
    # slab to fit 3 slabs instead of 4 in VMEM (bigger bt*Lc tiles win).
    entry = cs_ref[:, 0, 0, 0].astype(xs_ref.dtype)[:, None]  # (bt,1,N,dgt)
    if "epi" in _ABLATE:
        for ref in (dd_ref, du_ref):
            ref[:, 0] = jnp.zeros_like(ref[:, 0])
        for ref in (dB_ref, dC_ref):
            ref[:, 0] = jnp.zeros_like(ref[:, 0])
        return
    for q in range(nq):
        lo, hi = q * qs, (q + 1) * qs
        e = e_ref[:, lo:hi].astype(jnp.float32)
        a = a_ref[:, lo:hi].astype(jnp.float32)
        if bidir:
            # r==0: xsp[d] = xs[d-1] (entry at d==0); r==1: xs[d+1]
            # (entry at d==Lc-1). Both slices are cheap slab reads; one
            # select picks the live one for this direction.
            xsp_r0 = (jnp.concatenate([entry, xs_ref[:, :hi - 1]], axis=1)
                      if q == 0 else xs_ref[:, lo - 1:hi - 1])
            xsp_r1 = (jnp.concatenate([xs_ref[:, lo + 1:], entry], axis=1)
                      if q == nq - 1 else xs_ref[:, lo + 1:hi + 1])
            xsp = jnp.where(r == 0, xsp_r0, xsp_r1).astype(jnp.float32)
        else:
            xsp = (jnp.concatenate([entry, xs_ref[:, :hi - 1]], axis=1)
                   if q == 0 else
                   xs_ref[:, lo - 1:hi - 1]).astype(jnp.float32)
        xs = xs_ref[:, lo:hi].astype(jnp.float32)
        dlt_q = _s(dlt, lo, hi)
        u_q = _s(u, lo, hi)
        g_q = _s(g, lo, hi)
        Bc_q = _s(Bc, lo, hi)

        eaxp = e * a * xsp                           # (bt, qs, N, dgt)
        # delta from the a-path + from the b-path
        dd_a = jnp.sum(eaxp * A[None, None], axis=2)  # (bt, qs, dgt)
        ddu = jnp.sum(e * Bc_q[..., None], axis=2)    # (bt, qs, dgt)
        dd_total = dd_a + ddu * u_q
        if softplus:
            dd_total = dd_total * jax.nn.sigmoid(_s(raw, lo, hi))
        dds.append(dd_total.astype(dd_ref.dtype))
        dus.append((ddu * dlt_q + Dsk_ref[0][None] * g_q).astype(
            du_ref.dtype))
        dBs.append(jnp.sum(
            e * (dlt_q * u_q)[:, :, None, :], axis=3).astype(dB_ref.dtype))
        dCs.append(jnp.sum(
            xs * g_q[:, :, None, :], axis=3).astype(dC_ref.dtype))
        dA_acc += jnp.sum(eaxp * dlt_q[:, :, None, :], axis=(0, 1))
        dD_acc += jnp.sum(g_q * u_q, axis=(0, 1))
        ddb_acc += jnp.sum(dd_total, axis=(0, 1))

    def _cat(parts):
        return parts[0] if nq == 1 else jnp.concatenate(parts, axis=1)

    dd_ref[:, 0] = _cat(dds)
    du_ref[:, 0] = _cat(dus)
    dB_ref[:, 0] = _cat(dBs)
    dC_ref[:, 0] = _cat(dCs)
    dA_ref[0, 0] += dA_acc
    dD_ref[0, 0, 0] += dD_acc
    ddb_ref[0, 0, 0] += ddb_acc


def _pad_L(x, Lp):
    pad = Lp - x.shape[2]
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _scan_core(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk, interpret):
    y, _ = _scan_fwd_impl(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk,
                          interpret, save_cs=False)
    return y


def _tiling(bsz, L, n, dg, chunk, dtype):
    itemsize = jnp.dtype(dtype).itemsize
    forced = _os.environ.get("MAMBA_SCAN_FORCE_TILES")
    if forced:
        # "dgt,btile,Lc" — tuning hook (benchmarks/tile_sweep.py)
        dgt, btile, Lc = (int(v) for v in forced.split(","))
        Lc = max(16, min(Lc, -(-L // 16) * 16))
        Lp = -(-L // Lc) * Lc
        return dgt, dg // dgt, btile, Lc, Lp, Lp // Lc
    dgt, btile = _pick_tiles(bsz, n, dg, itemsize)
    if dgt is None:
        dgt = _dg_tile(dg)
        btile = 1
    Lc = _cap_chunk(chunk, L, n, dgt, btile, itemsize)
    Lp = -(-L // Lc) * Lc
    return dgt, dg // dgt, btile, Lc, Lp, Lp // Lc


def _scan_fwd_impl(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk, interpret,
                   bidir=False, save_cs=True):
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
    kernel = functools.partial(_fwd_kernel, softplus=softplus, Lc=Lc,
                               bidir=bidir)
    scratch = [
        pltpu.VMEM((bt, n, dgt), jnp.float32),   # carried state
        pltpu.VMEM((bt, Lc, n, dgt), io),        # a (gates)
        pltpu.VMEM((bt, Lc, n, dgt), io),        # xs (b-values -> states)
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
            # save_cs=False (the non-differentiated forward): all chunks map
            # to ONE revisited block — the checkpoint stream (the largest
            # fwd output after y) never leaves VMEM on the inference path
            pl.BlockSpec(
                (bt, 1, 1, 1, n, dgt),
                (lambda b, g, dt, ck: (b, g, dt, ck, 0, 0)) if save_cs
                else (lambda b, g, dt, ck: (b, g, dt, 0, 0, 0)),
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, G, Lp, dg), u.dtype),
            jax.ShapeDtypeStruct(
                (bsz, G, DT, nc if save_cs else 1, n, dgt), io),
        ],
        scratch_shapes=scratch,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(A_t, db, Dsk, u, delta, Bm, Cm)
    return y[:, :, :L], cs


def _scan_core_fwd(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk, interpret):
    y, cs = _scan_fwd_impl(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk, interpret)
    return y, (u, delta, A_t, Bm, Cm, Dsk, db, cs)


def _scan_bwd_impl(res, gy, softplus, chunk, interpret, bidir=False,
                   merged_gy=False):
    """merged_gy: gy is the PAIR-SUMMED cotangent (B, 2, L, dg) — directions
    g and g+2 of a data stream receive identical data-order cotangents when
    the caller consumes y as (y0+y2, y1+y3), so the kernel reads one
    half-size gy with a g%2 index map instead of a broadcast-materialized
    (B, 4, L, dg)."""
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

    kernel = functools.partial(_bwd_kernel, softplus=softplus, Lc=Lc,
                               bidir=bidir)
    scratch = [
        pltpu.VMEM((bt, n, dgt), jnp.float32),  # carry
        pltpu.VMEM((bt, Lc, n, dgt), io),       # a
        pltpu.VMEM((bt, Lc, n, dgt), io),       # xs
        pltpu.VMEM((bt, Lc, n, dgt), io),       # e
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
                         (lambda b, g, dt, ck: (b, g % 2, cke(g, ck), dt))
                         if merged_gy
                         else (lambda b, g, dt, ck: (b, g, cke(g, ck), dt))),
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
        compiler_params=_compiler_params(),
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
                          interpret, bidir=True, save_cs=False)
    return y


def _scan_core_bidir_fwd(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk,
                         interpret):
    y, cs = _scan_fwd_impl(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk,
                           interpret, bidir=True)
    return y, (u, delta, A_t, Bm, Cm, Dsk, db, cs)


def _scan_core_bidir_bwd(softplus, chunk, interpret, res, gy):
    return _scan_bwd_impl(res, gy, softplus, chunk, interpret, bidir=True)


_scan_core_bidir.defvjp(_scan_core_bidir_fwd, _scan_core_bidir_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _scan_core_bidir_merged(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk,
                            interpret):
    """Bidir scan returning the PAIR-SUMMED y (B, 2, L, dg): out[:, m] =
    y_dir_m + y_dir_{m+2} (both in data order). Semantically identical to
    summing the 4-direction output, but the VJP's cotangent is half-size:
    the broadcast back to 4 directions happens in the backward kernel's
    index maps instead of a materialized (B, 4, L, dg) HBM array."""
    y, _ = _scan_fwd_impl(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk,
                          interpret, bidir=True, save_cs=False)
    return y[:, :2] + y[:, 2:]


def _scan_core_bidir_merged_fwd(u, delta, A_t, Bm, Cm, Dsk, db, softplus,
                                chunk, interpret):
    y, cs = _scan_fwd_impl(u, delta, A_t, Bm, Cm, Dsk, db, softplus, chunk,
                           interpret, bidir=True)
    return y[:, :2] + y[:, 2:], (u, delta, A_t, Bm, Cm, Dsk, db, cs)


def _scan_core_bidir_merged_bwd(softplus, chunk, interpret, res, gy):
    return _scan_bwd_impl(res, gy, softplus, chunk, interpret, bidir=True,
                          merged_gy=True)


_scan_core_bidir_merged.defvjp(_scan_core_bidir_merged_fwd,
                               _scan_core_bidir_merged_bwd)


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
    merge_pairs: bool = False,
):
    """4-direction cross-scan WITHOUT materialized flips: directions are
    [row, col, row-reversed, col-reversed]; direction g reads data stream
    g%2 and g>=2 scan it in reversed time order via index arithmetic inside
    the kernel (reversed chunk index maps + mirrored in-block indices) —
    the TPU replacement for the reference's flipped copies
    (mamba_sys.py:403-404 torch.flip). Returns y (B, 4, L, dg) in DATA order
    (already un-reversed), so the merge is a plain sum + transpose.

    merge_pairs=True returns the pair-summed (B, 2, L, dg) —
    [row + row-rev, col + col-rev] — and halves the backward's cotangent
    materialization (direction pairs share identical data-order cotangents,
    so only the gy index map differs)."""
    if interpret is None:
        interpret = not on_tpu()
    bsz, G, L, dg = delta4.shape
    n = A.shape[1]
    io = jnp.bfloat16 if u2.dtype == jnp.bfloat16 else jnp.float32
    A_t, Dsk, db = _prep_params(A, D, delta_bias, G, dg, n)
    core = _scan_core_bidir_merged if merge_pairs else _scan_core_bidir
    return core(
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
    """Drop-in for ``selective_scan`` on TPU. Shapes as in selective_scan.py.
    ``chunk`` is an upper bound on the L-chunk (see the module-level note at
    DEFAULT_CHUNK): the tile picker caps it at min(chunk, L, VMEM budget,
    MAMBA_SCAN_LC [default 16], the measured optimum)."""
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
