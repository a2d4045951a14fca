"""Sequence-sharded selective scan: split L across a mesh axis.

The one long-context feature the reference lacks (SURVEY §5.7): the CUDA
kernel's chunked carried-prefix scan generalizes across DEVICES — each shard
computes its local scan, the (a_prod, state) prefix pair is combined across
the mesh's sequence axis over ICI, and a second local pass applies the
incoming carry. Because a_t = exp(delta_t * A), each shard's decay aggregate
is simply exp(cumsum of delta) — no extra scan needed:

    a_prod_shard = exp(A * sum_t delta_t)          (per B, D, N)
    state_shard  = local scan's final state with x0 = 0
    carry_in_i   = combine_{j<i} (a_prod_j, state_j)   [exclusive prefix]
    y_i          = local scan with x_init = carry_in_i

The cross-device exclusive prefix runs on (B, D, N)-sized aggregates via
all_gather over the sequence axis (tiny vs. the activations; n_shards <= 8
within one ICI ring), then each shard folds its own prefix locally.

Usage: under ``shard_map`` (see :func:`selective_scan_seq_sharded`) with
inputs sharded on the L axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mamba_unet_tpu.ops.selective_scan import _prep, _finalize, selective_scan_xla


_SEQ_CTX = None


@functools.wraps(lambda: None)
def _noop():  # pragma: no cover
    pass


class sequence_sharding:
    """Context manager enabling sequence-parallel scans inside models:

        with sequence_sharding(mesh, "seq"):
            y = model.apply(params, x)   # SS2D(scan_impl="seq_sharded")

    (flax modules can't take a Mesh as a hashable field, so the mesh rides
    a context variable.)"""

    def __init__(self, mesh: Mesh, axis: str = "seq"):
        self.ctx = (mesh, axis)

    def __enter__(self):
        global _SEQ_CTX
        self._prev = _SEQ_CTX
        _SEQ_CTX = self.ctx
        return self

    def __exit__(self, *exc):
        global _SEQ_CTX
        _SEQ_CTX = self._prev
        return False


def current_sequence_sharding():
    return _SEQ_CTX


def _local_shard_scan(u, delta, A, B, C, D, z, delta_bias, delta_softplus,
                      axis: str, chunk: int):
    """Runs inside shard_map: inputs carry the LOCAL L shard."""
    # fp32 views for the aggregate math (delta bias/softplus must match the
    # scan's internal preparation exactly)
    u_f, delta_f, A_f, B_f, C_f = _prep(u, delta, A, B, C, delta_bias,
                                        delta_softplus)
    bsz, d, _ = u_f.shape
    n = A_f.shape[1]

    # local decay aggregate and final state (x0 = 0)
    delta_sum = jnp.sum(delta_f, axis=-1)                      # (B, D)
    a_prod = jnp.exp(delta_sum[..., None] * A_f[None])         # (B, D, N)
    _, state = selective_scan_xla(
        u, delta, A, B, C, None, None, delta_bias, delta_softplus,
        return_last_state=True, chunk=chunk,
    )

    # exclusive prefix across the sequence axis: gather tiny aggregates
    idx = jax.lax.axis_index(axis)
    n_shards = jax.lax.axis_size(axis)
    all_a = jax.lax.all_gather(a_prod, axis)                   # (S, B, D, N)
    all_b = jax.lax.all_gather(state, axis)

    def combine(carry, elem):
        ca, cb = carry
        ea, eb = elem
        return (ca * ea, eb + ea * cb), None

    def exclusive_prefix(i):
        def body(k, carry):
            use = k < i
            ca, cb = carry
            ea, eb = all_a[k], all_b[k]
            na = jnp.where(use, ca * ea, ca)
            nb = jnp.where(use, eb + ea * cb, cb)
            return na, nb

        init = (jnp.ones_like(a_prod), jnp.zeros_like(state))
        return jax.lax.fori_loop(0, n_shards, body, init)

    _, carry_in = exclusive_prefix(idx)

    # second local pass with the incoming state
    y = selective_scan_xla(
        u, delta, A, B, C, D, z, delta_bias, delta_softplus,
        chunk=chunk, x_init=carry_in,
    )
    return y


def selective_scan_seq_sharded(
    u, delta, A, B, C,
    D=None, z=None, delta_bias=None, delta_softplus: bool = False,
    *, mesh: Mesh, axis: str = "seq", chunk: int = 256,
):
    """Selective scan with u/delta/B/C/z sharded on the L (last) axis of
    ``mesh[axis]``. Parameter arrays are replicated. Returns y sharded the
    same way as u."""
    from jax import shard_map

    lspec = P(None, None, axis)
    bc_spec = P(None, None, None, axis)
    if B.ndim == 3:
        B = B[:, None]
        C = C[:, None]

    args = [u, delta, A, B, C]
    specs = [lspec, lspec, P(), bc_spec, bc_spec]
    opt_idx = {}
    for name, val, spec in (("D", D, P()), ("z", z, lspec),
                            ("db", delta_bias, P())):
        if val is not None:
            opt_idx[name] = len(args)
            args.append(val)
            specs.append(spec)

    def fn(*inner):
        u_, delta_, A_, B_, C_ = inner[:5]
        D_ = inner[opt_idx["D"]] if "D" in opt_idx else None
        z_ = inner[opt_idx["z"]] if "z" in opt_idx else None
        db_ = inner[opt_idx["db"]] if "db" in opt_idx else None
        return _local_shard_scan(u_, delta_, A_, B_, C_, D_, z_, db_,
                                 delta_softplus, axis, chunk)

    return shard_map(
        fn, mesh=mesh, in_specs=tuple(specs), out_specs=lspec, check_vma=False
    )(*args)
