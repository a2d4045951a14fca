"""Tensor-parallel (channel-sharded) selective scan: split d_inner across a
mesh axis.

The S6 recurrence is independent across channels — each device can scan its
own dg block with the per-direction B/C projections replicated (they are
N-sized, tiny) and the channel-indexed parameters (A rows, D, delta_bias)
sharded alongside. Unlike Megatron-style attention TP there are ZERO
collectives inside the op: the channel axis is embarrassingly parallel, and
the surrounding projections (in_proj column-parallel, out_proj row-parallel)
get their collectives from GSPMD propagation around the shard_map region.

This is the TPU-native tensor-parallel story for the reference's Mamba ops
(which are single-GPU only — ``selective_scan_interface.py`` has no
distributed path): shard ``d_inner`` over the "model" mesh axis, keep B/C
replicated, and let the kernel run unchanged on each shard's block.

Channel layout: the scan's D axis is G direction-groups x dg channels; a
flat split of D would cut across direction groups, so the wrapper views
inputs as (B, G, dg, L) and shards the dg axis — every shard keeps all G
groups (matching its replicated per-group B/C) and a contiguous dg block.

Composes with data parallelism: pass ``batch_axis`` to also split B over a
second mesh axis (a (data, model) 2-D mesh), which is how the full dp x tp
training step in ``__graft_entry__.dryrun_multichip`` runs.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_TP_CTX = None


class channel_sharding:
    """Context manager enabling tensor-parallel scans inside models:

        with channel_sharding(mesh, "model", batch_axis="data"):
            y = model.apply(params, x)   # SS2D(scan_impl="tp_sharded")

    (flax modules can't take a Mesh as a hashable field, so the mesh rides
    a context variable — same pattern as parallel.seq_scan.)"""

    def __init__(self, mesh: Mesh, axis: str = "model",
                 batch_axis: Optional[str] = None):
        self.ctx = (mesh, axis, batch_axis)

    def __enter__(self):
        global _TP_CTX
        self._prev = _TP_CTX
        _TP_CTX = self.ctx
        return self

    def __exit__(self, *exc):
        global _TP_CTX
        _TP_CTX = self._prev
        return False


def current_channel_sharding():
    return _TP_CTX


def selective_scan_tp_sharded(
    u, delta, A, B, C,
    D=None, z=None, delta_bias=None, delta_softplus: bool = False,
    *, mesh: Mesh, axis: str = "model", batch_axis: Optional[str] = None,
    chunk: int = 256,
):
    """Selective scan with the CHANNEL axis sharded over ``mesh[axis]``.

    u/delta/z: (B, D, L) with D = G*dg; A: (D, N); B/C: (B, G, N, L);
    D_skip/delta_bias: (D,). dg must divide by the axis size (and B by the
    batch axis size when given). Returns y (B, D, L) sharded on D (and B).
    """
    from jax import shard_map

    from mamba_unet_tpu.ops.selective_scan import selective_scan

    bsz, d, L = u.shape
    G = B.shape[1] if B.ndim == 4 else 1
    if B.ndim == 3:
        B = B[:, None]
        C = C[:, None]
    dg = d // G
    s = mesh.shape[axis]
    assert dg % s == 0, f"d_inner per group {dg} not divisible by {axis}={s}"
    if batch_axis is not None:
        sb = mesh.shape[batch_axis]
        assert bsz % sb == 0, f"batch {bsz} not divisible by {batch_axis}={sb}"

    # (B, D, L) -> (B, G, dg, L): shard dg, keep direction groups whole
    u4 = u.reshape(bsz, G, dg, L)
    d4 = delta.reshape(bsz, G, dg, L)
    z4 = z.reshape(bsz, G, dg, L) if z is not None else None
    A3 = A.reshape(G, dg, -1)
    Dg = D.reshape(G, dg) if D is not None else None
    db = delta_bias.reshape(G, dg) if delta_bias is not None else None

    ch = P(batch_axis, None, axis, None)     # (B, G, dg, L) activations
    rep = P(batch_axis, None, None, None)    # (B, G, N, L) projections
    pc = P(None, axis, None)                 # (G, dg, N) A rows
    pv = P(None, axis)                       # (G, dg) D / delta_bias

    args = [u4, d4, A3, B, C]
    specs = [ch, ch, pc, rep, rep]
    opt_idx = {}
    for name, val, spec in (("D", Dg, pv), ("z", z4, ch), ("db", db, pv)):
        if val is not None:
            opt_idx[name] = len(args)
            args.append(val)
            specs.append(spec)

    def local(*inner):
        u_, d_, A_, B_, C_ = inner[:5]
        Dg_ = inner[opt_idx["D"]] if "D" in opt_idx else None
        z_ = inner[opt_idx["z"]] if "z" in opt_idx else None
        db_ = inner[opt_idx["db"]] if "db" in opt_idx else None
        b_l, _, dg_l, _ = u_.shape
        y = selective_scan(
            u_.reshape(b_l, G * dg_l, L),
            d_.reshape(b_l, G * dg_l, L),
            A_.reshape(G * dg_l, -1),
            B_, C_,
            D=None if Dg_ is None else Dg_.reshape(-1),
            z=None if z_ is None else z_.reshape(b_l, G * dg_l, L),
            delta_bias=None if db_ is None else db_.reshape(-1),
            delta_softplus=delta_softplus, chunk=chunk,
        )
        return y.reshape(b_l, G, dg_l, L)

    y4 = shard_map(
        local, mesh=mesh, in_specs=tuple(specs), out_specs=ch, check_vma=False
    )(*args)
    return y4.reshape(bsz, d, L)
