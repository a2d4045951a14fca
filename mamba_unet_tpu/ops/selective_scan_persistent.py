"""Persistent-grid Pallas forward for the selective scan — inference only.

Round-4 profiling (docs/PROFILE.md "Session 4", runs/persistent_proto_r4.log)
measured the production forward kernel grid-cell bound at stage-0 shapes
(L=3136: 2352 ~1.3us cells); collapsing the L-chunk axis INTO the kernel via
``pltpu.emit_pipeline`` (grid = (B-tiles, G) = 12 cells, scan state carried
in VMEM scratch across the in-kernel pipeline steps) bought 21% at stage0
when the operands arrive 128-lane aligned ("prepad": 8.28 vs 10.42 ms).
The training pair was a wash (the backward is epilogue-bound), so this path
is FORWARD/INFERENCE ONLY — serving, the val-every-200 eval loop, and
``cli/test.py`` — selected at trace time via the :func:`inference_scan`
context; training keeps the custom-VJP slab kernel
(``selective_scan_pallas.py``).

Alignment: Mosaic requires the in-kernel DMA's lane extents to be
128-multiples, so dg and the B/C state dim are zero-padded up. The pads are
emitted AT SOURCE by the caller (SS2D pads projection-weight columns so the
einsums produce aligned lanes natively, and folds the u-pad into the stream
stack it already materializes) — in-line padding of finished operands was
measured to eat the whole win (10.83 ms, same log). Padded dg lanes carry
A=0 / u=0 / D=0 so their state and output stay exactly zero; padded B/C
lanes are never read (the kernel slices ``[..., :n]`` in VMEM).

Bidir semantics match ``_scan_fwd_impl(bidir=True)``: u carries only the
G//2 distinct data streams, direction g reads stream g%2, and directions
g>=2 run the recurrence over the SAME data blocks in reversed time order —
reversed chunk index maps + a statically-reversed in-kernel loop (under
``pl.when`` so slab addressing stays static), no flipped copies in HBM.

Reference bar: the CUDA forward is likewise persistent per (b, d) block
(``/root/reference/mamba/csrc/selective_scan/selective_scan_fwd_kernel.cuh``
:131-302 — one thread block owns the whole sequence, chunk loop inside).
"""

from __future__ import annotations

import contextlib
import functools
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mamba_unet_tpu.ops.selective_scan_pallas import on_tpu

_UNROLL = int(_os.environ.get("MAMBA_PERSISTENT_UNROLL", "4"))
# Auto-selection threshold: the win is grid-cell amortization, which needs
# many L-chunks; stage1 (L=784) measured a wash, stage0 (L=3136) -21%.
_MIN_L = int(_os.environ.get("MAMBA_PERSISTENT_MIN_L", "1024"))
_VMEM_LIMIT_BYTES = int(_os.environ.get("MAMBA_PERSISTENT_VMEM_LIMIT",
                                        str(100 * 1024 * 1024)))

_ACTIVE = [_os.environ.get("MAMBA_PERSISTENT_INFER", "") == "1"]


@contextlib.contextmanager
def inference_scan(enable: bool = True):
    """Trace-time switch: inside this context, SS2D's bidir branch routes
    eligible shapes through the persistent forward. Wrap the TRACE (the
    first call of a jitted predict fn), not just the execution."""
    prev = _ACTIVE[0]
    _ACTIVE[0] = enable
    try:
        yield
    finally:
        _ACTIVE[0] = prev


def inference_active() -> bool:
    return _ACTIVE[0]


def round_up(x: int, to: int) -> int:
    return -(-x // to) * to


def _ensure_interpret_tpu_info() -> None:
    """``emit_pipeline``'s tiling math calls ``get_tpu_info()`` even under
    ``interpret=True``; on the CPU backend the device kind "cpu" is unknown
    and raises. jax exposes ``tpu_info.registry`` as the extension hook —
    register a v4-like entry so interpret-mode parity tests run without
    hardware (the values only feed tiling heuristics, not numerics)."""
    try:
        from jax._src.pallas.mosaic import tpu_info as _ti

        if "cpu" in _ti.registry:
            return
        _ti.registry["cpu"] = lambda: _ti.TpuInfo(
            chip_version=_ti.ChipVersion.TPU_V4,
            generation=4,
            num_cores=1,
            num_lanes=128,
            num_sublanes=8,
            mxu_column_size=128,
            vmem_capacity_bytes=16 * 1024 * 1024,
            cmem_capacity_bytes=67_000_000,
            smem_capacity_bytes=1024 * 1024,
            hbm_capacity_bytes=17_200_000_000,
            mem_bw_bytes_per_second=int(6.15e11),
            bf16_ops_per_second=int(1.37e14),
            int8_ops_per_second=0,
            fp8_ops_per_second=0,
            int4_ops_per_second=0,
        )
    except Exception:  # pragma: no cover - internals moved; interpret-only
        pass


def config_for(bsz, L, dg, n, dtype=None) -> Optional[dict]:
    """(btile, Lc) if the persistent forward supports/wins at this shape,
    else None (caller falls back to the slab kernel). Symbolic dims
    (jax.export) are rejected — the grid needs concrete sizes."""
    if not isinstance(bsz, int) or not isinstance(L, int):
        return None
    if n > 32 or L < _MIN_L:
        return None
    Lc = next((c for c in (64, 32, 16) if L % c == 0), None)
    if Lc is None:
        return None
    btile = next((b for b in (8, 4, 2, 1) if bsz % b == 0), None)
    if _os.environ.get("MAMBA_PERSISTENT_DEBUG"):
        print(f"[persistent] eligible: bsz={bsz} L={L} dg={dg} n={n} "
              f"btile={btile} Lc={Lc}", flush=True)
    return {"btile": btile, "Lc": Lc}


def _bidir_kernel(
    A_ref,        # VMEM (1, n, dgp)   — per-direction, fp32
    db_ref,       # VMEM (1, 1, dgp)
    Dsk_ref,      # VMEM (1, 1, dgp)
    u_hbm,        # ANY (B, S, L, dgp) — S data streams
    d_hbm,        # ANY (B, G, L, dgp)
    bc_hbm,       # ANY (B, G, L, bcp) — B at [..., :n], C at [..., n:2n]
    y_hbm,        # ANY (B, S, L, dgp) in/out, DATA order, PAIR-summed
    xcarry,       # VMEM (bt, n, dgp) fp32 scratch — the carried state
    a_s,          # VMEM (bt, Lc, n, dgp) io scratch — gates
    xs_s,         # VMEM (bt, Lc, n, dgp) io scratch — b-values -> states
    *, nck, Lc, unroll, n_real, softplus,
):
    b, g = pl.program_id(0), pl.program_id(1)
    m = jax.lax.rem(g, 2)       # data stream == output pair slot
    r = jax.lax.div(g, 2)       # 0 = forward, 1 = time-reversed
    bt = a_s.shape[0]
    n = n_real
    A = A_ref[0]                                      # (n, dgp)
    xcarry[:] = jnp.zeros_like(xcarry)

    def body(u_ref, d_ref, bc_ref, reverse: bool):
        """Slab build + recurrence + y epilogue; returns the chunk's y.

        The loop direction is STATIC per pipeline (dynamic sublane
        addressing costs ~the production kernel's te select per step — the
        persistent win was measured with static indices)."""
        u = u_ref[:, 0].astype(jnp.float32)           # (bt, Lc, dgp)
        raw = d_ref[:, 0].astype(jnp.float32) + db_ref[0][None]
        dlt = jax.nn.softplus(raw) if softplus else raw
        du = dlt * u
        a_s[:] = jnp.exp(dlt[:, :, None, :] * A[None, None]).astype(a_s.dtype)
        Bc = bc_ref[:, 0, :, :n].astype(jnp.float32)  # (bt, Lc, n)
        xs_s[:] = (Bc[..., None] * du[:, :, None, :]).astype(xs_s.dtype)

        def step(i, x):
            for j in range(unroll):
                t = i * unroll + j
                t = Lc - 1 - t if reverse else t
                x = a_s[:, t].astype(jnp.float32) * x + \
                    xs_s[:, t].astype(jnp.float32)
                xs_s[:, t] = x.astype(xs_s.dtype)
            return x

        xcarry[:] = jax.lax.fori_loop(0, Lc // unroll, step, xcarry[:])
        # epilogue in DATA order (the slab holds states at their data
        # positions regardless of visit order)
        Cc = bc_ref[:, 0, :, n:2 * n].astype(jnp.float32)
        y = jnp.sum(Cc[..., None] * xs_s[:].astype(jnp.float32), axis=2)
        return y + Dsk_ref[0][None] * u

    # Direction pairs share an output slot (pair m): the forward direction
    # (r==0, earlier grid visit) overwrites, the reversed one (r==1)
    # accumulates onto the block it reads back through the pipeline — the
    # pair merge never leaves the kernel: no (B, 4, L, dgp) HBM array, no
    # separate merge pass, and no wasted y read on the r==0 visits (the
    # two pipelines live under pl.when so only r==1 has the y input).
    def inner_fwd(u_ref, d_ref, bc_ref, y_ref):
        y_ref[:, 0] = body(u_ref, d_ref, bc_ref, False).astype(y_ref.dtype)

    def inner_rev(u_ref, d_ref, bc_ref, yin_ref, y_ref):
        y = body(u_ref, d_ref, bc_ref, True)
        y_ref[:, 0] = (y + yin_ref[:, 0].astype(jnp.float32)).astype(
            y_ref.dtype)

    def cke(ck):
        # reversed directions walk the data chunks backwards
        return ck + r * (nck - 1 - 2 * ck)

    dgp = a_s.shape[-1]
    bcp = bc_hbm.shape[-1]
    spec_u = pl.BlockSpec((bt, 1, Lc, dgp), lambda ck: (b, m, cke(ck), 0))
    spec_d = pl.BlockSpec((bt, 1, Lc, dgp), lambda ck: (b, g, cke(ck), 0))
    spec_bc = pl.BlockSpec((bt, 1, Lc, bcp), lambda ck: (b, g, cke(ck), 0))

    @pl.when(r == 0)
    def _():
        pltpu.emit_pipeline(
            inner_fwd,
            grid=(nck,),
            in_specs=[spec_u, spec_d, spec_bc],
            out_specs=[spec_u],
        )(u_hbm, d_hbm, bc_hbm, y_hbm)

    @pl.when(r == 1)
    def _():
        pltpu.emit_pipeline(
            inner_rev,
            grid=(nck,),
            in_specs=[spec_u, spec_d, spec_bc, spec_u],
            out_specs=[spec_u],
        )(u_hbm, d_hbm, bc_hbm, y_hbm, y_hbm)


def persistent_scan_bidir(
    u2,        # (B, S, L, dgp) — the S=G//2 data streams, lanes pre-padded
    delta4,    # (B, G, L, dgp) — per-direction, DATA order
    A_t,       # (G, n, dgp) fp32 (zero-padded lanes)
    BC4,       # (B, G, L, bcp) — PACKED: B at [..., :n], C at [..., n:2n],
               #                  bcp = 2n padded to 128 (one array, one DMA
               #                  stream instead of two 128-lane pads)
    Dsk,       # (G, 1, dgp) fp32
    db,        # (G, 1, dgp) fp32
    *,
    n_real: int,
    softplus: bool = True,
    btile: int = 8,
    Lc: int = 64,
    unroll: int = _UNROLL,
    interpret: Optional[bool] = None,
):
    """y (B, S, L, dgp): PAIR-SUMMED data-order outputs, slot m =
    y_dir_m + y_dir_{m+2} (the `merge_pairs=True` contract of the slab
    kernel) — merged in-kernel via output-block accumulation.

    All lane dims must already be 128-aligned on TPU (see module docstring —
    callers emit the pads at source so they fuse into producers)."""
    if interpret is None:
        interpret = not on_tpu()
    if interpret:
        _ensure_interpret_tpu_info()
    bsz, G, L, dgp = delta4.shape
    assert G == 4 and u2.shape[1] == 2, "bidir pair merge needs G=4, S=2"
    assert L % Lc == 0 and bsz % btile == 0
    assert BC4.shape[-1] >= 2 * n_real
    while Lc % unroll:
        unroll -= 1
    nck = L // Lc
    io = jnp.bfloat16 if u2.dtype == jnp.bfloat16 else jnp.float32
    n = n_real
    kernel = functools.partial(_bidir_kernel, nck=nck, Lc=Lc, unroll=unroll,
                               n_real=n, softplus=softplus)
    return pl.pallas_call(
        kernel,
        grid=(bsz // btile, G),
        in_specs=[
            pl.BlockSpec((1, n, dgp), lambda b, g: (g, 0, 0)),
            pl.BlockSpec((1, 1, dgp), lambda b, g: (g, 0, 0)),
            pl.BlockSpec((1, 1, dgp), lambda b, g: (g, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, 2, L, dgp), io),
        scratch_shapes=[
            pltpu.VMEM((btile, n, dgp), jnp.float32),
            pltpu.VMEM((btile, Lc, n, dgp), io),
            pltpu.VMEM((btile, Lc, n, dgp), io),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
        interpret=interpret,
    )(A_t.astype(jnp.float32), db.astype(jnp.float32),
      Dsk.astype(jnp.float32), u2.astype(io), delta4.astype(io),
      BC4.astype(io))
