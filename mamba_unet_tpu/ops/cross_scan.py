"""4-direction cross-scan / cross-merge for 2-D visual Mamba (SS2D).

The reference builds K=4 1-D views of the (H, W) feature map — row-major,
column-major, and both reversed — scans each, and sums the un-permuted results
(``/root/reference/code/networks/mamba_sys.py:396-436``). On TPU these are pure
layout ops (transpose/flip/reshape) that XLA folds into the surrounding
computation; no gather kernels are needed.

Conventions: feature maps are channels-last (B, H, W, D); scan sequences use
the scan-op convention (B, K, D, L) with L = H*W.
"""

from __future__ import annotations

import jax.numpy as jnp


def cross_scan(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, D) -> (B, 4, D, L): [row, col, row-reversed, col-reversed]."""
    bsz, H, W, d = x.shape
    row = x.transpose(0, 3, 1, 2).reshape(bsz, d, H * W)   # scan W fastest
    col = x.transpose(0, 3, 2, 1).reshape(bsz, d, H * W)   # scan H fastest
    fwd = jnp.stack([row, col], axis=1)                    # (B, 2, D, L)
    return jnp.concatenate([fwd, jnp.flip(fwd, axis=-1)], axis=1)


def cross_scan_tm(x: jnp.ndarray) -> jnp.ndarray:
    """Time-major cross-scan: (B, H, W, D) -> (B, 4, L, D).

    Channels-last feature maps ARE already row-major time sequences, so
    direction 0 is a pure reshape; only the column-major direction needs a
    transpose. This is the layout the Pallas kernel consumes directly
    (selective_scan_pallas_tm), skipping two (B, 4D, L) transposes per call.
    Direction order matches :func:`cross_scan`: [row, col, row-rev, col-rev].
    """
    bsz, H, W, d = x.shape
    row = x.reshape(bsz, H * W, d)
    col = x.transpose(0, 2, 1, 3).reshape(bsz, H * W, d)
    fwd = jnp.stack([row, col], axis=1)                    # (B, 2, L, D)
    return jnp.concatenate([fwd, jnp.flip(fwd, axis=2)], axis=1)


def cross_merge_tm(ys: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Inverse of :func:`cross_scan_tm` + sum: (B, 4, L, D) -> (B, H, W, D)."""
    bsz, k, L, d = ys.shape
    assert k == 4 and L == H * W
    inv = jnp.flip(ys[:, 2:4], axis=2)
    y_row = ys[:, 0] + inv[:, 0]
    y_col = (ys[:, 1] + inv[:, 1]).reshape(bsz, W, H, d).transpose(0, 2, 1, 3)
    return y_row.reshape(bsz, H, W, d) + y_col


def cross_merge(ys: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Inverse of :func:`cross_scan` followed by a sum over the 4 directions.

    ys: (B, 4, D, L) per-direction scan outputs -> (B, H, W, D).
    """
    bsz, k, d, L = ys.shape
    assert k == 4 and L == H * W
    inv = jnp.flip(ys[:, 2:4], axis=-1)                    # undo the reversals
    y_row = ys[:, 0] + inv[:, 0]
    y_col = ys[:, 1] + inv[:, 1]
    y_col = y_col.reshape(bsz, d, W, H).transpose(0, 1, 3, 2).reshape(bsz, d, L)
    y = y_row + y_col
    return y.reshape(bsz, d, H, W).transpose(0, 2, 3, 1)
