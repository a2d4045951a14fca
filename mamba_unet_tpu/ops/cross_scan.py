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
