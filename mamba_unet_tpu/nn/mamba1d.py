"""1-D Mamba block (sequence model) with optional bidirectional "bimamba v2".

Rebuild of ``/root/reference/mamba/mamba_ssm/modules/mamba_simple.py:34-299``:
in_proj -> (x, z); depthwise causal conv1d + SiLU; x_proj -> (dt, B, C);
dt_proj; selective scan with fused z-gate; out_proj. ``bimamba_type="v2"``
adds a mirrored parameter set (A_b_log, conv1d_b, x_proj_b, dt_proj_b, D_b)
and sums the forward scan with the flipped scan of the flipped sequence
(:180-210). The reference's fused ``mamba_inner_fn`` fast path is simply the
jitted composition here — XLA does the fusing.

``step`` is the single-token decode path (:153-234): rolling conv state +
one SSM state update (the Triton ``selective_state_update`` equivalent).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_unet_tpu.nn.layers import uniform_scaled_init
from mamba_unet_tpu.nn.ss2d import _a_log_init, _dt_bias_init
from mamba_unet_tpu.ops import causal_conv1d, causal_conv1d_update, selective_scan
from mamba_unet_tpu.ops.state_update import selective_state_update


class Mamba(nn.Module):
    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Optional[int] = None
    conv_bias: bool = True
    bias: bool = False
    bimamba_type: str = "none"  # "none" | "v2"
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4
    scan_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @property
    def _d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def _dt_rank(self) -> int:
        return self.dt_rank or math.ceil(self.d_model / 16)

    def setup(self):
        din, rank, n = self._d_inner, self._dt_rank, self.d_state
        self.in_proj = nn.Dense(2 * din, use_bias=self.bias, dtype=self.dtype)
        self.out_proj = nn.Dense(self.d_model, use_bias=self.bias, dtype=self.dtype)

        def direction(tag: str):
            conv_w = self.param(
                f"conv1d{tag}_weight",
                uniform_scaled_init(1.0 / math.sqrt(self.d_conv)),
                (din, self.d_conv),
            )
            conv_b = (
                self.param(
                    f"conv1d{tag}_bias",
                    uniform_scaled_init(1.0 / math.sqrt(self.d_conv)),
                    (din,),
                )
                if self.conv_bias
                else None
            )
            x_proj_w = self.param(
                f"x_proj{tag}_weight",
                uniform_scaled_init(1.0 / math.sqrt(din)),
                (rank + 2 * n, din),
            )
            dt_w = self.param(
                f"dt_proj{tag}_weight",
                uniform_scaled_init(rank**-0.5 * self.dt_scale),
                (din, rank),
            )
            dt_b = self.param(
                f"dt_proj{tag}_bias",
                _dt_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
                (din,),
            )
            a_log = self.param(f"A{tag}_log", _a_log_init(din, n), (din, n))
            d_skip = self.param(f"D{tag}", nn.initializers.ones, (din,))
            return conv_w, conv_b, x_proj_w, dt_w, dt_b, a_log, d_skip

        self._fwd = direction("")
        if self.bimamba_type == "v2":
            self._bwd = direction("_b")

    def _scan_direction(self, x, z, params):
        """x, z: (B, d_inner, L) -> y (B, d_inner, L)."""
        conv_w, conv_b, x_proj_w, dt_w, dt_b, a_log, d_skip = params
        rank, n = self._dt_rank, self.d_state
        x = causal_conv1d(x, conv_w, conv_b, activation="silu")
        x_dbl = jnp.einsum("bdl,cd->bcl", x, x_proj_w.astype(x.dtype))
        dt, Bm, Cm = jnp.split(x_dbl, [rank, rank + n], axis=1)
        dt = jnp.einsum("brl,dr->bdl", dt, dt_w.astype(dt.dtype))
        A = -jnp.exp(a_log.astype(jnp.float32))
        return selective_scan(
            x, dt, A,
            Bm[:, None],  # (B, 1, N, L): G=1
            Cm[:, None],
            D=d_skip.astype(jnp.float32),
            z=z,
            delta_bias=dt_b.astype(jnp.float32),
            delta_softplus=True,
            implementation=self.scan_impl,
        )

    def __call__(self, hidden_states: jnp.ndarray, deterministic: bool = True):
        """hidden_states: (B, L, d_model) -> (B, L, d_model)."""
        xz = self.in_proj(hidden_states)            # (B, L, 2*din)
        xz = xz.transpose(0, 2, 1)                  # (B, 2*din, L)
        x, z = jnp.split(xz, 2, axis=1)
        y = self._scan_direction(x, z, self._fwd)
        if self.bimamba_type == "v2":
            y_b = self._scan_direction(
                jnp.flip(x, -1), jnp.flip(z, -1), self._bwd
            )
            y = y + jnp.flip(y_b, -1)
        return self.out_proj(y.transpose(0, 2, 1))

    def forward_with_cache(self, hidden_states: jnp.ndarray):
        """Prefill: full forward that also returns the decode cache
        (conv_state = last d_conv inputs, ssm_state = final scan state).
        Forward direction only. Mirrors the inference_params prefill path
        (mamba_simple.py:230-234 conv_state copy + return_last_state)."""
        conv_w, conv_b, x_proj_w, dt_w, dt_b, a_log, d_skip = self._fwd
        rank, n = self._dt_rank, self.d_state
        xz = self.in_proj(hidden_states).transpose(0, 2, 1)
        x, z = jnp.split(xz, 2, axis=1)
        L = x.shape[-1]
        pad = max(self.d_conv - L, 0)
        xp = jnp.pad(x, ((0, 0), (0, 0), (pad, 0))) if pad else x
        conv_state = xp[:, :, -self.d_conv :].astype(jnp.float32)

        xc = causal_conv1d(x, conv_w, conv_b, activation="silu")
        x_dbl = jnp.einsum("bdl,cd->bcl", xc, x_proj_w.astype(xc.dtype))
        dt, Bm, Cm = jnp.split(x_dbl, [rank, rank + n], axis=1)
        dt = jnp.einsum("brl,dr->bdl", dt, dt_w.astype(dt.dtype))
        A = -jnp.exp(a_log.astype(jnp.float32))
        y, ssm_state = selective_scan(
            xc, dt, A, Bm[:, None], Cm[:, None],
            D=d_skip.astype(jnp.float32), z=z,
            delta_bias=dt_b.astype(jnp.float32), delta_softplus=True,
            return_last_state=True, implementation="xla",
        )
        out = self.out_proj(y.transpose(0, 2, 1))
        return out, conv_state, ssm_state

    # --- decode ---------------------------------------------------------
    def init_cache(self, batch: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(conv_state (B, din, d_conv), ssm_state (B, din, N)) zeros."""
        din = self._d_inner
        return (
            jnp.zeros((batch, din, self.d_conv), jnp.float32),
            jnp.zeros((batch, din, self.d_state), jnp.float32),
        )

    def step(self, hidden_states, conv_state, ssm_state):
        """One token (B, 1, d_model) -> (out (B, 1, d_model), new states).
        Mirrors Mamba.step (mamba_simple.py:153-199); forward direction only
        (decode caching is not defined for bidirectional scans)."""
        conv_w, conv_b, x_proj_w, dt_w, dt_b, a_log, d_skip = self._fwd
        rank, n = self._dt_rank, self.d_state
        xz = self.in_proj(hidden_states[:, 0])      # (B, 2*din)
        x, z = jnp.split(xz, 2, axis=-1)
        x, conv_state = causal_conv1d_update(x, conv_state, conv_w, conv_b, "silu")
        x_dbl = jnp.einsum("bd,cd->bc", x, x_proj_w.astype(x.dtype))
        dt, Bm, Cm = jnp.split(x_dbl, [rank, rank + n], axis=-1)
        dt = jnp.einsum("br,dr->bd", dt, dt_w.astype(dt.dtype))
        A = -jnp.exp(a_log.astype(jnp.float32))
        y, ssm_state = selective_state_update(
            ssm_state, x, dt, A, Bm, Cm,
            D=d_skip.astype(jnp.float32), z=z,
            delta_bias=dt_b.astype(jnp.float32), delta_softplus=True,
        )
        return self.out_proj(y)[:, None], conv_state, ssm_state


class MambaBlock(nn.Module):
    """Pre-norm residual wrapper: x + Mamba(Norm(x)) (mamba_simple.py:243-299).
    RMSNorm option mirrors the reference's fused Triton RMSNorm path."""

    d_model: int
    d_state: int = 16
    bimamba_type: str = "none"
    rms_norm: bool = False
    norm_epsilon: float = 1e-5
    scan_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        norm_cls = nn.RMSNorm if self.rms_norm else nn.LayerNorm
        self.norm = norm_cls(epsilon=self.norm_epsilon, dtype=self.dtype)
        self.mixer = Mamba(
            d_model=self.d_model, d_state=self.d_state,
            bimamba_type=self.bimamba_type, scan_impl=self.scan_impl,
            dtype=self.dtype,
        )

    def __call__(self, x, deterministic: bool = True):
        return x + self.mixer(self.norm(x), deterministic)

    def step(self, x, conv_state, ssm_state):
        y, conv_state, ssm_state = self.mixer.step(self.norm(x), conv_state,
                                                   ssm_state)
        return x + y, conv_state, ssm_state

    def forward_with_cache(self, x):
        y, conv_state, ssm_state = self.mixer.forward_with_cache(self.norm(x))
        return x + y, conv_state, ssm_state
