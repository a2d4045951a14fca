"""SegMamba smoke test (3-D Mamba-mixed encoder + UNETR decoder)."""

import jax
import jax.numpy as jnp
import numpy as np

from mamba_unet_tpu.models import SegMamba


def test_segmamba_forward(rng):
    m = SegMamba(num_classes=2, feat_size=(8, 16, 32, 64), hidden_size=8,
                 d_state=4, depths=(1, 1, 1, 1))
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 32, 1)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 32, 32, 32, 2)
    assert np.isfinite(np.asarray(y)).all()
