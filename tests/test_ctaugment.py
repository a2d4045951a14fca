"""CTAugment tests: policy sampling, rate updates, apply, grid shuffle."""

import numpy as np
import pytest

from mamba_unet_tpu.data.ctaugment import (
    CTAugment,
    N_STRONG_OPS,
    OPS,
    cta_apply,
    get_grid_shuffle_index,
    grid_shuffle_image,
    np_to_pil,
    pil_to_np,
)


def test_ops_registry_split():
    keys = list(OPS.keys())
    assert len(keys) == 16
    assert keys[:N_STRONG_OPS] == [
        "autocontrast", "brightness", "color", "contrast", "equalize",
        "smooth", "blur", "sharpness", "cutout",
    ]
    assert "identity" in keys[N_STRONG_OPS:]


def test_policy_shapes_and_apply(rng):
    cta = CTAugment(seed=1)
    weak = cta.policy(probe=False, weak=True)
    strong = cta.policy(probe=False, weak=False)
    assert len(weak) == 2 and len(strong) == 2
    keys = list(OPS.keys())
    assert all(op.f in keys[N_STRONG_OPS:] for op in weak)
    assert all(op.f in keys[:N_STRONG_OPS] for op in strong)

    img = np_to_pil(rng.uniform(size=(32, 32)))
    out = cta_apply(img, strong)
    arr = pil_to_np(out)
    assert arr.shape == (32, 32)
    assert np.isfinite(arr).all()


def test_update_rates_moves_toward_proximity():
    cta = CTAugment(seed=2, decay=0.9)
    pol = cta.policy(probe=True, weak=False)
    name, bins = pol[0]
    before = cta.rates[name][0].copy()
    cta.update_rates([pol[0]], proximity=0.0)
    after = cta.rates[name][0]
    i = int(bins[0] * len(after) * 0.999)
    assert after[i] < before[i]
    # untouched bins unchanged
    mask = np.ones_like(before, bool)
    mask[i] = False
    np.testing.assert_array_equal(after[mask], before[mask])


def test_state_dict_roundtrip():
    a = CTAugment(seed=3)
    a.update_rates(a.policy(probe=True, weak=False), 0.3)
    b = CTAugment(seed=4)
    b.load_state_dict(a.state_dict())
    for k in a.rates:
        for ra, rb in zip(a.rates[k], b.rates[k]):
            np.testing.assert_array_equal(ra, rb)


def test_grid_shuffle_is_permutation(rng):
    img = rng.normal(size=(16, 16)).astype(np.float32)
    r = np.random.default_rng(5)
    idx, perm = get_grid_shuffle_index(r, img.shape, (4, 4))
    out = grid_shuffle_image(img, idx)
    assert out.shape == img.shape
    np.testing.assert_array_equal(np.sort(out.reshape(-1)),
                                  np.sort(img.reshape(-1)))
    # blocks move intact: each 4x4 block of out matches SOME block of img
    blocks_in = img.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 4, 4)
    blocks_out = out.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3).reshape(16, 4, 4)
    np.testing.assert_array_equal(blocks_out, blocks_in[perm])
