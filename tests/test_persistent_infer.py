"""Differential tests for the persistent-grid inference forward.

The persistent kernel (ops/selective_scan_persistent.py) must match the
4-direction flipped-reference semantics exactly like the slab bidir kernel
(tests/test_scan_bidir.py) — including the in-kernel time reversal of
directions 2/3 — and SS2D must produce identical outputs whether or not the
`inference_scan()` context routes it through the persistent path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamba_unet_tpu.ops import selective_scan_persistent as ssper
from mamba_unet_tpu.ops.selective_scan_pallas import _prep_params
from tests.test_scan_bidir import _ref_bidir


def _pad_lanes(x, to):
    pad = to - x.shape[-1]
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)]) if pad else x


@pytest.mark.parametrize("L,dg,Lc", [(64, 8, 16), (96, 16, 32)])
def test_persistent_bidir_matches_flipped_ref(rng, L, dg, Lc):
    bsz, n = 2, 4
    u2 = jnp.asarray(rng.normal(size=(bsz, 2, L, dg)), jnp.float32)
    delta4 = jnp.asarray(0.3 * rng.normal(size=(bsz, 4, L, dg)), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(4 * dg, n)), jnp.float32) * 0.5)
    B4 = jnp.asarray(rng.normal(size=(bsz, 4, L, n)), jnp.float32)
    C4 = jnp.asarray(rng.normal(size=(bsz, 4, L, n)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(4 * dg,)), jnp.float32)
    db = jnp.asarray(0.1 * rng.normal(size=(4 * dg,)), jnp.float32)

    A_t, Dsk, dbk = _prep_params(A, D, db, 4, dg, n)
    got = ssper.persistent_scan_bidir(
        u2, delta4, A_t, jnp.concatenate([B4, C4], axis=-1), Dsk, dbk,
        n_real=n, softplus=True, btile=2, Lc=Lc, interpret=True,
    )
    want = _ref_bidir(u2, delta4, A, B4, C4, D, db)
    want2 = want[:, :2] + want[:, 2:]   # the kernel pair-merges in place
    np.testing.assert_allclose(np.asarray(got), np.asarray(want2),
                               rtol=2e-4, atol=2e-4)


def test_persistent_padded_lanes_match(rng):
    """The production padding contract: dg and B/C lanes zero-padded to the
    Mosaic alignment (A/D/db pads zero) must leave the real lanes bitwise
    within tolerance and the padded state exactly zero."""
    bsz, L, dg, n = 2, 64, 8, 4
    dgp, npp = 128, 128
    u2 = jnp.asarray(rng.normal(size=(bsz, 2, L, dg)), jnp.float32)
    delta4 = jnp.asarray(0.3 * rng.normal(size=(bsz, 4, L, dg)), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(4 * dg, n)), jnp.float32) * 0.5)
    B4 = jnp.asarray(rng.normal(size=(bsz, 4, L, n)), jnp.float32)
    C4 = jnp.asarray(rng.normal(size=(bsz, 4, L, n)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(4 * dg,)), jnp.float32)
    db = jnp.asarray(0.1 * rng.normal(size=(4 * dg,)), jnp.float32)

    A_t, Dsk, dbk = _prep_params(A, D, db, 4, dg, n)
    got = ssper.persistent_scan_bidir(
        _pad_lanes(u2, dgp), _pad_lanes(delta4, dgp), _pad_lanes(A_t, dgp),
        _pad_lanes(jnp.concatenate([B4, C4], axis=-1), npp),
        _pad_lanes(Dsk, dgp), _pad_lanes(dbk, dgp),
        n_real=n, softplus=True, btile=2, Lc=16, interpret=True,
    )
    want = _ref_bidir(u2, delta4, A, B4, C4, D, db)
    want2 = want[:, :2] + want[:, 2:]
    np.testing.assert_allclose(np.asarray(got[..., :dg]), np.asarray(want2),
                               rtol=2e-4, atol=2e-4)
    assert float(jnp.abs(got[..., dg:]).max()) == 0.0


def test_ss2d_inference_context_parity(rng, monkeypatch):
    """SS2D under `inference_scan()` (persistent path, source-level pads)
    must equal the normal bidir slab path."""
    from mamba_unet_tpu.nn.ss2d import SS2D

    monkeypatch.setattr(ssper, "_MIN_L", 32)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    model = SS2D(d_model=16, d_state=4, scan_impl="bidir")
    variables = model.init(jax.random.key(0), x)

    base = model.apply(variables, x)
    with ssper.inference_scan():
        assert ssper.inference_active()
        per = model.apply(variables, x)
    assert not ssper.inference_active()
    np.testing.assert_allclose(np.asarray(per), np.asarray(base),
                               rtol=3e-4, atol=3e-4)


def test_config_for_gates():
    assert ssper.config_for(24, 3136, 192, 16) == {"btile": 8, "Lc": 64}
    assert ssper.config_for(24, 784, 384, 16) is None      # below _MIN_L
    assert ssper.config_for(24, 1584, 768, 16) == {"btile": 8, "Lc": 16}
    assert ssper.config_for(24, 1100, 192, 16) is None     # no legal Lc
    assert ssper.config_for(24, 3136, 192, 64) is None     # n too large
    # symbolic batch (jax.export) must fall back
    class _Sym:  # stand-in for a symbolic dim (not an int)
        pass
    assert ssper.config_for(_Sym(), 3136, 192, 16) is None


def test_mamba_unet_inference_context_parity(rng, monkeypatch):
    """Model-level: MambaUnet forward identical with the context enabled
    (tiny image → every stage routes or falls back cleanly)."""
    from mamba_unet_tpu.models.vssm import MambaUnet

    monkeypatch.setattr(ssper, "_MIN_L", 32)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)), jnp.float32)
    model = MambaUnet(img_size=32, num_classes=4, depths=(2, 2),
                      dims=(16, 32), scan_impl="bidir")
    variables = model.init(jax.random.key(0), x)
    base = model.apply(variables, x)
    with ssper.inference_scan():
        per = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(per), np.asarray(base),
                               rtol=5e-4, atol=5e-4)
