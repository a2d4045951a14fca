"""Selective scan (S6) — the Mamba state-space recurrence, TPU-native.

Semantics (matches the reference CUDA op, see
``/root/reference/mamba/mamba_ssm/ops/selective_scan_interface.py:86-152`` and
``/root/reference/mamba/csrc/selective_scan/selective_scan_fwd_kernel.cuh``):

    delta = softplus(delta + delta_bias)            (both optional)
    x_t   = exp(delta_t * A) * x_{t-1} + delta_t * B_t * u_t     (x_0 = 0)
    y_t   = <C_t, x_t> + D * u_t
    out   = y * silu(z)                             (if z is given)

The recurrence state is carried in float32 regardless of the input dtype, as in
the reference kernel. The recurrence is *associative*: writing an element as the
pair ``(a_t, b_t) = (exp(delta_t*A), delta_t*B_t*u_t)`` with composition

    (a1, b1) (+) (a2, b2) = (a1*a2, a2*b1 + b2)

(the op in ``selective_scan_common.h``) lets the whole sequence be evaluated as
a parallel prefix scan — the TPU-idiomatic formulation. Instead of translating
the CUDA block-scan, we express it as:

  * ``selective_scan_ref``  — a plain ``lax.scan`` over L. Ground truth for the
    differential tests (the role of ``selective_scan_ref`` in the reference).
  * ``selective_scan_xla``  — L is split into chunks; a ``lax.scan`` carries the
    fp32 state across chunks (exactly the carried-prefix trick of the CUDA
    kernel, fwd_kernel.cuh:236-253) while each chunk runs a vectorized
    ``lax.associative_scan``. The chunk body is rematerialized under autodiff so
    the (L, N)-sized intermediates are never stored for backward.
  * ``selective_scan`` — the public entry point. Dispatches to the Pallas TPU
    kernel (``selective_scan_pallas``) when available, else the XLA path.

Shapes (grouped-B/C layout, as used by the 4-direction vision scan where the
four directions are folded into D and share B/C per group):

    u, delta : (B, D, L)
    A        : (D, N)          — typically A = -exp(A_log), N = 16
    B, C     : (B, G, N, L)    — G groups, D % G == 0;  (B, N, L) means G = 1
    D_skip   : (D,) or None
    z        : (B, D, L) or None
    delta_bias : (D,) or None
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _canon_bc(x: jnp.ndarray) -> jnp.ndarray:
    """(B, N, L) -> (B, 1, N, L); (B, G, N, L) passes through."""
    if x.ndim == 3:
        return x[:, None]
    if x.ndim != 4:
        raise ValueError(f"B/C must be rank 3 or 4, got shape {x.shape}")
    return x


def _prep(u, delta, A, B, C, delta_bias, delta_softplus):
    """Common fp32 promotion + delta bias/softplus. Returns grouped views."""
    u = u.astype(jnp.float32)
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, :, None]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    A = A.astype(jnp.float32)
    B = _canon_bc(B).astype(jnp.float32)
    C = _canon_bc(C).astype(jnp.float32)
    return u, delta, A, B, C


def _finalize(y, u_f32, D_skip, z, out_dtype):
    if D_skip is not None:
        y = y + u_f32 * D_skip.astype(jnp.float32)[None, :, None]
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# Reference implementation: sequential lax.scan over L (ground truth).
# ---------------------------------------------------------------------------


def selective_scan_ref(
    u: jnp.ndarray,
    delta: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: Optional[jnp.ndarray] = None,
    z: Optional[jnp.ndarray] = None,
    delta_bias: Optional[jnp.ndarray] = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
):
    """Sequential reference. Mirrors selective_scan_interface.py:86-152."""
    out_dtype = u.dtype
    u_f, delta_f, A_f, B_f, C_f = _prep(u, delta, A, B, C, delta_bias, delta_softplus)
    bsz, dim, L = u_f.shape
    G = B_f.shape[1]
    n = A_f.shape[1]
    dg = dim // G

    # (B, D, L) -> per-step (B, G, dg, ...) for broadcasting with grouped B/C.
    A_g = A_f.reshape(G, dg, n)
    u_g = u_f.reshape(bsz, G, dg, L)
    delta_g = delta_f.reshape(bsz, G, dg, L)

    def step(x, inputs):
        u_t, d_t, B_t, C_t = inputs  # (B,G,dg), (B,G,dg), (B,G,n), (B,G,n)
        dA = jnp.exp(d_t[..., None] * A_g)                       # (B,G,dg,n)
        dBu = d_t[..., None] * B_t[:, :, None, :] * u_t[..., None]
        x = dA * x + dBu                                         # (B,G,dg,n)
        y = jnp.einsum("bgdn,bgn->bgd", x, C_t)
        return x, y

    x0 = jnp.zeros((bsz, G, dg, n), jnp.float32)
    xs = (
        jnp.moveaxis(u_g, -1, 0),
        jnp.moveaxis(delta_g, -1, 0),
        jnp.moveaxis(B_f, -1, 0),
        jnp.moveaxis(C_f, -1, 0),
    )
    last, ys = jax.lax.scan(step, x0, xs)
    y = jnp.moveaxis(ys, 0, -1).reshape(bsz, dim, L)
    out = _finalize(y, u_f, D, z, out_dtype)
    if return_last_state:
        return out, last.reshape(bsz, dim, n)
    return out


# ---------------------------------------------------------------------------
# XLA implementation: chunked carried-prefix scan + within-chunk parallel scan.
# ---------------------------------------------------------------------------


def _assoc_op(e1, e2):
    a1, b1 = e1
    a2, b2 = e2
    return a1 * a2, a2 * b1 + b2


def _chunk_body(x, chunk, A_g):
    """One L-chunk: parallel prefix scan with incoming fp32 state ``x``.

    x: (B, G, dg, n) carried state;  chunk arrays have a leading Lc axis:
    u_c, d_c: (Lc, B, G, dg);  B_c, C_c: (Lc, B, G, n).
    """
    u_c, d_c, B_c, C_c = chunk
    a = jnp.exp(d_c[..., None] * A_g)                              # (Lc,B,G,dg,n)
    b = d_c[..., None] * B_c[:, :, :, None, :] * u_c[..., None]    # (Lc,B,G,dg,n)
    aa, bb = jax.lax.associative_scan(_assoc_op, (a, b), axis=0)
    xs = bb + aa * x[None]                                         # states incl. carry
    y = jnp.einsum("lbgdn,lbgn->lbgd", xs, C_c)
    return xs[-1], y


def selective_scan_xla(
    u: jnp.ndarray,
    delta: jnp.ndarray,
    A: jnp.ndarray,
    B: jnp.ndarray,
    C: jnp.ndarray,
    D: Optional[jnp.ndarray] = None,
    z: Optional[jnp.ndarray] = None,
    delta_bias: Optional[jnp.ndarray] = None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
    chunk: int = 256,
    x_init: Optional[jnp.ndarray] = None,
):
    """Chunked associative scan; O(chunk·N·D) live intermediates via remat.

    ``x_init`` (B, D, N): optional incoming state — the hook that lets a
    sequence-sharded caller pass the ring carry from the previous shard
    (parallel/seq_scan.py)."""
    out_dtype = u.dtype
    u_f, delta_f, A_f, B_f, C_f = _prep(u, delta, A, B, C, delta_bias, delta_softplus)
    bsz, dim, L = u_f.shape
    G = B_f.shape[1]
    n = A_f.shape[1]
    dg = dim // G
    A_g = A_f.reshape(G, dg, n)

    Lc = min(chunk, L)
    pad = (-L) % Lc
    nc = (L + pad) // Lc

    def to_chunks(x):  # (..., L) -> (nc, Lc, ...) time-leading
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        x = jnp.moveaxis(x, -1, 0)  # (L+pad, ...)
        return x.reshape(nc, Lc, *x.shape[1:])

    xs = (
        to_chunks(u_f.reshape(bsz, G, dg, L)),
        to_chunks(delta_f.reshape(bsz, G, dg, L)),
        to_chunks(B_f),
        to_chunks(C_f),
    )
    # Padded tail has delta=0 -> a=1, b=0: the state passes through unchanged,
    # so the carry/last_state stays exact; padded y values are sliced off.
    body = jax.checkpoint(functools.partial(_chunk_body, A_g=A_g))
    if x_init is not None:
        x0 = x_init.astype(jnp.float32).reshape(bsz, G, dg, n)
    else:
        x0 = jnp.zeros((bsz, G, dg, n), jnp.float32)
    last, ys = jax.lax.scan(body, x0, xs)  # ys: (nc, Lc, B, G, dg)
    y = ys.reshape(nc * Lc, bsz, G, dg)[:L]
    y = jnp.moveaxis(y, 0, -1).reshape(bsz, dim, L)
    out = _finalize(y, u_f, D, z, out_dtype)
    if return_last_state:
        return out, last.reshape(bsz, dim, n)
    return out


# ---------------------------------------------------------------------------
# Public entry point.
# ---------------------------------------------------------------------------


def selective_scan(
    u,
    delta,
    A,
    B,
    C,
    D=None,
    z=None,
    delta_bias=None,
    delta_softplus: bool = False,
    return_last_state: bool = False,
    chunk: int = 256,
    implementation: str = "auto",
):
    """Fused selective scan. ``implementation``: auto | pallas | xla | ref.

    "auto" uses the Pallas TPU kernel when running on TPU and the op shape is
    supported, otherwise the chunked XLA path (which is also the CPU/testing
    path, playing the role of the reference's ``selective_scan_ref``+CUDA pair).
    """
    if implementation == "ref":
        return selective_scan_ref(
            u, delta, A, B, C, D, z, delta_bias, delta_softplus, return_last_state
        )
    if implementation in ("auto", "pallas"):
        from mamba_unet_tpu.ops import selective_scan_pallas as ssp

        if ssp.supported(u, A, B, return_last_state) and (
            implementation == "pallas" or ssp.on_tpu()
        ):
            return ssp.selective_scan_pallas(
                u, delta, A, B, C, D, z, delta_bias, delta_softplus
            )
        if implementation == "pallas":
            raise ValueError("pallas selective_scan does not support this shape")
    return selective_scan_xla(
        u, delta, A, B, C, D, z, delta_bias, delta_softplus, return_last_state, chunk
    )
