"""Tests for VAT, weighted BCE+IoU, and compute_sdf (reference parity).

Differential where torch can express the reference semantics directly
(weighted_loss, code/utils/losses.py:401-412), geometric goldens for the SDF
(util.py:224-255), and sanity/grad checks for the functional VAT
(losses.py:137-166).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.objectives import (
    loss_diff,
    loss_sup,
    vat_loss,
    weighted_bce_iou_loss,
)
from mamba_unet_tpu.utils import compute_sdf


def _torch_weighted_loss(pred, mask):
    """The reference weighted_loss, verbatim semantics in torch (NCHW)."""
    import torch
    import torch.nn.functional as F

    pred = torch.as_tensor(pred)[:, None]
    mask = torch.as_tensor(mask)[:, None]
    bce = torch.nn.BCELoss(reduction="none")
    weit = 1 + 5 * torch.abs(
        F.avg_pool2d(mask, kernel_size=31, stride=1, padding=15) - mask
    ).float()
    wbce = bce(pred, mask)
    wbce = (weit * wbce).sum(dim=(2, 3)) / weit.sum(dim=(2, 3))
    inter = ((pred * mask) * weit).sum(dim=(2, 3))
    union = ((pred + mask) * weit).sum(dim=(2, 3))
    wiou = 1 - (inter + 1) / (union - inter + 1)
    return float((wbce + wiou).mean())


def test_weighted_bce_iou_matches_torch(rng):
    pred = rng.uniform(0.05, 0.95, size=(2, 40, 48)).astype(np.float32)
    mask = (rng.uniform(size=(2, 40, 48)) > 0.6).astype(np.float32)
    got = float(weighted_bce_iou_loss(jnp.asarray(pred), jnp.asarray(mask)))
    want = _torch_weighted_loss(pred, mask)
    assert got == pytest.approx(want, rel=1e-4)


def test_loss_sup_and_diff(rng):
    p1 = rng.uniform(0.1, 0.9, size=(2, 32, 32)).astype(np.float32)
    p2 = rng.uniform(0.1, 0.9, size=(2, 32, 32)).astype(np.float32)
    m = (rng.uniform(size=(2, 32, 32)) > 0.5).astype(np.float32)
    s = float(loss_sup(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(m), jnp.asarray(m)))
    assert np.isfinite(s) and s > 0
    d = float(loss_diff(jnp.asarray(p1), jnp.asarray(p2)))
    assert np.isfinite(d) and d > 0
    # loss_diff carries no gradient (reference .item()s both terms)
    g = jax.grad(lambda a: loss_diff(a, jnp.asarray(p2)))(jnp.asarray(p1))
    assert float(jnp.abs(g).max()) == 0.0


def test_compute_sdf_geometry():
    mask = np.zeros((1, 17, 17), np.uint8)
    mask[0, 5:12, 5:12] = 1
    sdf = compute_sdf(mask)
    assert sdf.shape == mask.shape
    # boundary pixels (ring of the square) are exactly 0
    assert sdf[0, 5, 5] == 0.0 and sdf[0, 5, 8] == 0.0 and sdf[0, 11, 11] == 0.0
    # deep inside negative, far outside positive; normalized to [-1, 1]
    assert sdf[0, 8, 8] < 0
    assert sdf[0, 0, 0] > 0
    assert sdf.min() >= -1.0 and sdf.max() <= 1.0
    assert sdf[0, 8, 8] == pytest.approx(-1.0)
    assert sdf[0, 0, 0] == pytest.approx(1.0)
    # empty mask -> all zeros (reference skips the sample)
    assert np.all(compute_sdf(np.zeros((1, 8, 8))) == 0)


def test_vat_loss_sanity(rng):
    # tiny linear "model": logits = x @ W, channels-last (B, H, W, C)
    W = jnp.asarray(rng.normal(size=(1, 4)), jnp.float32)

    def forward(x):
        return x @ W

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 1)), jnp.float32)
    key = jax.random.key(0)
    lds = vat_loss(forward, x, key, xi=10.0, epi=6.0, ip=1)
    assert np.isfinite(float(lds)) and float(lds) >= 0
    # gradient flows to model params through the final perturbed forward
    g = jax.grad(
        lambda w: vat_loss(lambda x_: x_ @ w, x, key, xi=10.0, epi=6.0, ip=1)
    )(W)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
