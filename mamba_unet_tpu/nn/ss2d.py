"""SS2D — the 2-D selective-scan (visual Mamba) token mixer.

TPU-native rebuild of the reference SS2D
(``/root/reference/code/networks/mamba_sys.py:267-540``):

  in_proj D -> 2*d_inner, split (x, z)
  depthwise 3x3 conv + SiLU on x
  4-direction cross-scan -> shared per-direction projections -> ONE batched
    selective scan with the 4 directions folded into the channel axis
    (the reference's K-fold trick, mamba_sys.py:411-426 — also the right TPU
    layout: one big (B, 4*d_inner) lane dimension)
  cross-merge (sum of un-permuted outputs) -> LayerNorm -> * silu(z) -> out_proj

The scan itself always runs in float32 (reference forces .float() at
mamba_sys.py:411-418); everything else follows ``dtype``.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mamba_unet_tpu.nn.layers import trunc_normal_init, uniform_scaled_init
from mamba_unet_tpu.ops import cross_merge, cross_scan, selective_scan


class DepthwiseConv2DHWBC(nn.Module):
    """Depthwise conv over the LEADING spatial dims of an (H, W, B, C) array.

    Parameter-compatible with ``nn.Conv(features, kernel, feature_group_count=
    features)`` (kernel (kh, kw, 1, C) + bias (C,)), so checkpoints convert
    1:1 between layouts. Used by the hwbc (time-major batch-minor) layout of
    SS2D, where keeping batch on axis 2 makes the batch-folded scan's stream
    setup a free reshape.
    """

    features: int
    kernel_size: tuple = (3, 3)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, 1, self.features),
        )
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("HWNC", "HWIO", "HWNC")
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=dn,
            feature_group_count=self.features,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            y = y + bias.astype(self.dtype)
        return y


def _dt_bias_init(dt_min: float, dt_max: float, dt_init_floor: float):
    """Softplus-inverse of a log-uniform sample in [dt_min, dt_max].

    Mirrors SS2D.dt_init (mamba_sys.py:353-361): softplus(bias) ~ LogUniform.
    """

    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, jnp.float32)
        dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.maximum(dt, dt_init_floor)
        # inverse softplus: x = dt + log(1 - exp(-dt))
        inv = dt + jnp.log(-jnp.expm1(-dt))
        return inv.astype(dtype)

    return init


def _a_log_init(n_rows: int, d_state: int):
    """S4D-real init: A_log[d, n] = log(n+1), A = -exp(A_log) (mamba_sys.py:367-382)."""

    def init(key, shape, dtype=jnp.float32):
        del key
        assert shape == (n_rows, d_state)
        a = jnp.tile(jnp.log(jnp.arange(1, d_state + 1, dtype=jnp.float32)), (n_rows, 1))
        return a.astype(dtype)

    return init


class SS2D(nn.Module):
    d_model: int
    d_state: int = 16
    d_conv: int = 3
    expand: int = 2
    dt_rank: Optional[int] = None  # default ceil(d_model / 16)
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4
    dropout: float = 0.0
    conv_bias: bool = True
    bias: bool = False
    scan_impl: str = "auto"
    scan_chunk: int = 256
    layout: str = "bhwc"  # "bhwc" (reference order) | "hwbc" (time-major)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: (B, H, W, d_model) — or (H, W, B, d_model) with layout="hwbc"
        — -> same shape/layout."""
        d_inner = self.expand * self.d_model
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)
        n = self.d_state
        K = 4
        hwbc = self.layout == "hwbc"

        xz = nn.Dense(
            2 * d_inner,
            use_bias=self.bias,
            kernel_init=trunc_normal_init(),
            dtype=self.dtype,
            name="in_proj",
        )(x)
        xx, z = jnp.split(xz, 2, axis=-1)

        if hwbc:
            xx = DepthwiseConv2DHWBC(
                features=d_inner,
                kernel_size=(self.d_conv, self.d_conv),
                use_bias=self.conv_bias,
                dtype=self.dtype,
                name="conv2d",
            )(xx)
        else:
            xx = nn.Conv(
                d_inner,
                kernel_size=(self.d_conv, self.d_conv),
                feature_group_count=d_inner,
                use_bias=self.conv_bias,
                padding="SAME",
                dtype=self.dtype,
                name="conv2d",
            )(xx)
        xx = nn.silu(xx)

        # --- the 4-direction scan core (forward_corev0, mamba_sys.py:396-436) ---
        if hwbc:
            H, W, bsz, _ = xx.shape
        else:
            bsz, H, W, _ = xx.shape
        L = H * W
        # Per-direction input projections share one stacked weight.
        x_proj_weight = self.param(
            "x_proj_weight",
            uniform_scaled_init(1.0 / math.sqrt(d_inner)),
            (K, dt_rank + 2 * n, d_inner),
        )
        dt_projs_weight = self.param(
            "dt_projs_weight",
            uniform_scaled_init(dt_rank**-0.5 * self.dt_scale),
            (K, d_inner, dt_rank),
        )
        dt_projs_bias = self.param(
            "dt_projs_bias",
            _dt_bias_init(self.dt_min, self.dt_max, self.dt_init_floor),
            (K, d_inner),
        )
        A_logs = self.param("A_logs", _a_log_init(K * d_inner, n), (K * d_inner, n))
        Ds = self.param("Ds", nn.initializers.ones, (K * d_inner,))

        A = -jnp.exp(A_logs.astype(jnp.float32))  # (K*d_inner, n)
        from mamba_unet_tpu.ops import selective_scan_pallas as ssp
        from mamba_unet_tpu.ops.cross_scan import cross_merge_tm, cross_scan_tm

        # batch-folded lanes (opt-in via scan_impl="folded"): wins on the
        # bare kernel (stage0 full-VJP 21.45 vs 24.21 ms,
        # benchmarks/folded_proto.py --grad) but the stream-transpose glue
        # still eats the win at block level (benchmarks/folded_block.py), so
        # "auto" keeps the bidir slab kernel until the folded path wins
        # end-to-end.
        foldable = (bsz * d_inner) % 128 == 0
        # hwbc layout exists FOR the folded kernel (stream setup is a free
        # reshape there). "auto" in hwbc picks folded where it measured
        # ahead: stages whose dg is NOT 128-aligned (the folded layout's
        # lane-padding win, e.g. stage0's dg=192 -> 256 lanes, 25% waste);
        # 128-aligned stages keep the bidir kernel via the transpose
        # fallback (folded_ablate/folded_block: the folded backward loses
        # there). "folded"/"hwbc_folded" forces folded at every stage.
        use_folded = foldable and (
            self.scan_impl in ("folded", "hwbc_folded")
            or (hwbc and self.scan_impl == "auto" and d_inner % 128 != 0)
        )
        if (self.scan_impl in ("folded", "hwbc_folded") and not foldable
                and not self.is_initializing()):
            # trace-time heads-up, not an error — but NOT during `init`:
            # init at batch 1 always traces unfoldable shapes, and warning
            # there would make this routine startup noise. The signal is for
            # a MEASUREMENT/train trace that silently fell through to the
            # bidir/XLA path and would time the wrong kernel.
            import warnings

            warnings.warn(
                f"scan_impl={self.scan_impl!r} requested but batch*d_inner="
                f"{bsz}*{d_inner}={bsz * d_inner} is not 128-aligned; this "
                "trace falls back to the bidir/XLA scan path",
                stacklevel=2,
            )
        use_bidir = not use_folded and (
            self.scan_impl in ("auto", "bidir", "hwbc_folded")
        ) and (self.scan_impl == "bidir" or ssp.on_tpu())
        use_tm = self.scan_impl in ("pallas", "tm")
        if hwbc and not use_folded:
            # correctness fallback: run the bhwc core on transposed data
            xx = xx.transpose(2, 0, 1, 3)
        if self.scan_impl == "seq_sharded":
            # sequence parallelism: L sharded over the mesh axis provided by
            # parallel.seq_scan.sequence_sharding(...)
            from mamba_unet_tpu.parallel.seq_scan import (
                current_sequence_sharding,
                selective_scan_seq_sharded,
            )

            ctx = current_sequence_sharding()
            assert ctx is not None, (
                "scan_impl='seq_sharded' requires a sequence_sharding(mesh) "
                "context"
            )
            mesh, axis = ctx
            xs = cross_scan(xx)
            x_dbl = jnp.einsum(
                "bkdl,kcd->bkcl", xs, x_proj_weight.astype(xs.dtype)
            )
            dts, Bs, Cs = jnp.split(x_dbl, [dt_rank, dt_rank + n], axis=2)
            dts = jnp.einsum(
                "bkrl,kdr->bkdl", dts, dt_projs_weight.astype(dts.dtype)
            )
            out = selective_scan_seq_sharded(
                xs.reshape(bsz, K * d_inner, L).astype(jnp.float32),
                dts.reshape(bsz, K * d_inner, L).astype(jnp.float32),
                A, Bs.astype(jnp.float32), Cs.astype(jnp.float32),
                D=Ds.astype(jnp.float32),
                delta_bias=dt_projs_bias.reshape(-1).astype(jnp.float32),
                delta_softplus=True, mesh=mesh, axis=axis,
                chunk=self.scan_chunk,
            )
            y = cross_merge(out.reshape(bsz, K, d_inner, L), H, W)
        elif self.scan_impl == "tp_sharded":
            # tensor parallelism: d_inner sharded over the mesh axis provided
            # by parallel.tp_scan.channel_sharding(...) — the scan is
            # channel-independent, so each device runs the kernel on its own
            # dg block with the tiny per-direction B/C replicated
            from mamba_unet_tpu.parallel.tp_scan import (
                current_channel_sharding,
                selective_scan_tp_sharded,
            )

            ctx = current_channel_sharding()
            assert ctx is not None, (
                "scan_impl='tp_sharded' requires a channel_sharding(mesh) "
                "context"
            )
            mesh, axis, batch_axis = ctx
            xs = cross_scan(xx)
            x_dbl = jnp.einsum(
                "bkdl,kcd->bkcl", xs, x_proj_weight.astype(xs.dtype)
            )
            dts, Bs, Cs = jnp.split(x_dbl, [dt_rank, dt_rank + n], axis=2)
            dts = jnp.einsum(
                "bkrl,kdr->bkdl", dts, dt_projs_weight.astype(dts.dtype)
            )
            out = selective_scan_tp_sharded(
                xs.reshape(bsz, K * d_inner, L).astype(jnp.float32),
                dts.reshape(bsz, K * d_inner, L).astype(jnp.float32),
                A, Bs.astype(jnp.float32), Cs.astype(jnp.float32),
                D=Ds.astype(jnp.float32),
                delta_bias=dt_projs_bias.reshape(-1).astype(jnp.float32),
                delta_softplus=True, mesh=mesh, axis=axis,
                batch_axis=batch_axis, chunk=self.scan_chunk,
            )
            y = cross_merge(out.reshape(bsz, K, d_inner, L), H, W)
        elif use_folded:
            # batch-folded lanes: operands go time-major batch-minor
            # (L, B, dg) so the kernel lane extent B*dg is an exact multiple
            # of 128 — stage0's dg=192 otherwise pads every slab tile to 256
            # lanes (25% waste). Direction order and reversal semantics match
            # the bidir path; per-direction projections are emitted directly
            # in folded order by the einsums (no extra transposes beyond the
            # row/col stream setup).
            from mamba_unet_tpu.ops import selective_scan_folded as ssf

            if hwbc:
                # (H, W, B, d): the row stream is a FREE reshape; only the
                # col stream pays the H<->W transpose (same as bidir's).
                row = xx.reshape(L, bsz, d_inner)
                col = xx.transpose(1, 0, 2, 3).reshape(L, bsz, d_inner)
            else:
                row = xx.transpose(1, 2, 0, 3).reshape(L, bsz, d_inner)
                col = xx.transpose(2, 1, 0, 3).reshape(L, bsz, d_inner)
            xs2 = jnp.stack([row, col], axis=0)          # (2, L, B, dg)
            # Separate DENSE projections instead of one x_dbl+split: the
            # combined (c, B)-trailing x_dbl layout pads its lane dim 24->128
            # (5x write waste at bs24). The two dt projections collapse into
            # one (d, d) matrix (more FLOPs, one dense bf16 matmul).
            Wg = x_proj_weight.astype(jnp.float32).reshape(
                2, 2, dt_rank + 2 * n, d_inner
            )
            Wdt4 = dt_projs_weight.astype(jnp.float32).reshape(
                2, 2, d_inner, dt_rank
            )
            M_dt = jnp.einsum(
                "jmdr,jmre->jmde", Wdt4, Wg[:, :, :dt_rank]
            ).astype(xs2.dtype)
            W_B = Wg[:, :, dt_rank : dt_rank + n].astype(xs2.dtype)
            W_C = Wg[:, :, dt_rank + n :].astype(xs2.dtype)
            dts = jnp.einsum("mlbe,jmde->jmlbd", xs2, M_dt).reshape(
                4, L, bsz * d_inner
            )
            Bs = jnp.einsum("mlbd,jmnd->jmlnb", xs2, W_B).reshape(
                4, L, n, bsz
            )
            Cs = jnp.einsum("mlbd,jmnd->jmlnb", xs2, W_C).reshape(
                4, L, n, bsz
            )
            ys = ssf.selective_scan_folded_bidir(
                xs2.reshape(2, L, bsz * d_inner),
                dts,
                A, Bs, Cs,
                D=Ds.astype(jnp.float32),
                delta_bias=dt_projs_bias.reshape(-1).astype(jnp.float32),
                delta_softplus=True,
                chunk=self.scan_chunk,
            ).astype(jnp.float32)                        # (4, L, B*dg)
            ys = ys.reshape(4, L, bsz, d_inner)
            if hwbc:
                y = (ys[0] + ys[2]).reshape(H, W, bsz, d_inner) + (
                    ys[1] + ys[3]
                ).reshape(W, H, bsz, d_inner).transpose(1, 0, 2, 3)
            else:
                y = (ys[0] + ys[2]).transpose(1, 0, 2).reshape(
                    bsz, H, W, d_inner
                ) + (ys[1] + ys[3]).reshape(W, H, bsz, d_inner).transpose(
                    2, 1, 0, 3
                )
        elif use_bidir:
            # bidirectional fast path: only the 2 DATA streams (row-major,
            # col-major) are materialized; the 2 reversed directions run
            # inside the kernel via reversed index maps — no flipped copies
            # (replaces the reference's torch.flip, mamba_sys.py:403-404).
            # Direction order [row, col, row-rev, col-rev]: k = 2*j + m with
            # m = stream, j = reversal, so W[k] regroups as (j, m, c, d).
            #
            # Inference (no grad) additionally routes eligible shapes
            # through the persistent-grid forward (ops/
            # selective_scan_persistent.py — measured -21% at stage0). Its
            # Mosaic alignment pads are emitted AT SOURCE here: the u-pad
            # folds into the stream stack (already a copy), delta arrives
            # padded natively via zero-padded dt_projs weight columns, and
            # B/C pads ride the x_dbl split — in-line padding of finished
            # operands was measured to eat the win (PROFILE.md Session 4).
            per_cfg = None
            if not self.is_initializing():
                from mamba_unet_tpu.ops import (
                    selective_scan_persistent as ssper,
                )

                if ssper.inference_active():
                    per_cfg = ssper.config_for(bsz, L, d_inner, n)
            if per_cfg is not None:
                dgp = ssper.round_up(d_inner, 128)
                npp = ssper.round_up(2 * n, 128)
                pad_d = dgp - d_inner
                # Streams and x_dbl are built EXACTLY like the slab path —
                # measured hazard (docs/PROFILE.md Session 5): padding
                # row/col before the stack let layout assignment propagate
                # a {3,0,2,1} layout back into the depthwise conv, whose
                # emitter then ran 9.1 ms instead of ~1 (fusion.49). The
                # kernel's u-pad is applied AFTER the stack, behind an
                # optimization_barrier, so the conv/stack fusions and
                # layouts stay byte-identical to the slab path.
                row = xx.reshape(bsz, L, d_inner)
                col = xx.transpose(0, 2, 1, 3).reshape(bsz, L, d_inner)
                xs2 = jnp.stack([row, col], axis=1)      # (B, 2, L, dg)
                Wg = x_proj_weight.astype(xs2.dtype).reshape(
                    2, 2, dt_rank + 2 * n, d_inner
                )
                x_dbl = jnp.einsum("bmld,jmcd->bjmlc", xs2, Wg).reshape(
                    bsz, 4, L, dt_rank + 2 * n
                )
                xs2 = jnp.pad(
                    jax.lax.optimization_barrier(xs2),
                    ((0, 0), (0, 0), (0, 0), (0, pad_d)),
                )                                        # (B, 2, L, dgp)
                dts = x_dbl[..., :dt_rank]
                # B|C packed contiguously as x_dbl already lays them out:
                # one (B, 4, L, 2n->128) array, one pad pass, one DMA
                # stream into the kernel (which slices [:n] / [n:2n] in
                # VMEM) — instead of two full 128-lane padded arrays.
                bc = jnp.pad(
                    x_dbl[..., dt_rank:],
                    ((0, 0), (0, 0), (0, 0), (0, npp - 2 * n)),
                )
                dtw = jnp.pad(
                    dt_projs_weight.astype(dts.dtype),
                    ((0, 0), (0, pad_d), (0, 0)),
                )
                dts = jnp.einsum("bklr,kdr->bkld", dts, dtw)  # (B,4,L,dgp)
                A_t, Dsk, db = ssp._prep_params(
                    A, Ds.astype(jnp.float32),
                    dt_projs_bias.reshape(-1).astype(jnp.float32),
                    4, d_inner, n,
                )
                g_pad = ((0, 0), (0, 0), (0, pad_d))
                ys = ssper.persistent_scan_bidir(
                    xs2, dts,
                    jnp.pad(A_t, g_pad), bc,
                    jnp.pad(Dsk, g_pad), jnp.pad(db, g_pad),
                    n_real=n, softplus=True, **per_cfg,
                ).astype(jnp.float32)  # (B, 2, L, dgp) pair-summed
                y = ys[:, 0, :, :d_inner].reshape(
                    bsz, H, W, d_inner
                ) + ys[:, 1, :, :d_inner].reshape(
                    bsz, W, H, d_inner
                ).transpose(0, 2, 1, 3)
            else:
                row = xx.reshape(bsz, L, d_inner)
                col = xx.transpose(0, 2, 1, 3).reshape(bsz, L, d_inner)
                xs2 = jnp.stack([row, col], axis=1)      # (B, 2, L, dg)
                # NOTE (measured, round 3): splitting x_dbl into separate
                # dense projections with a combined (d, d) dt matrix
                # REGRESSES the full step 202.8 -> 209.8 ms — the combined
                # dt matmul is d_inner^2 FLOPs vs d_inner*dt_rank (16x more
                # at stage3) and XLA fuses the x_dbl+split form well.
                Wg = x_proj_weight.astype(xs2.dtype).reshape(
                    2, 2, dt_rank + 2 * n, d_inner
                )
                x_dbl = jnp.einsum("bmld,jmcd->bjmlc", xs2, Wg).reshape(
                    bsz, 4, L, dt_rank + 2 * n
                )
                dts, Bs, Cs = jnp.split(
                    x_dbl, [dt_rank, dt_rank + n], axis=3
                )
                dts = jnp.einsum(
                    "bklr,kdr->bkld", dts, dt_projs_weight.astype(dts.dtype)
                )
                ys = ssp.selective_scan_pallas_bidir(
                    xs2, dts, A, Bs, Cs,
                    D=Ds.astype(jnp.float32),
                    delta_bias=dt_projs_bias.reshape(-1).astype(jnp.float32),
                    delta_softplus=True,
                    chunk=self.scan_chunk,
                    merge_pairs=True,
                ).astype(jnp.float32)  # (B, 2, L, dg): [row+rr, col+cr]
                y = ys[:, 0].reshape(bsz, H, W, d_inner) + ys[:, 1].reshape(
                    bsz, W, H, d_inner
                ).transpose(0, 2, 1, 3)
        elif use_tm:
            # time-major fast path: channels-last maps feed the Pallas kernel
            # without any (B, 4D, L) transposes
            xs = cross_scan_tm(xx)  # (B, K, L, d_inner)
            x_dbl = jnp.einsum(
                "bkld,kcd->bklc", xs, x_proj_weight.astype(xs.dtype)
            )
            dts, Bs, Cs = jnp.split(x_dbl, [dt_rank, dt_rank + n], axis=3)
            dts = jnp.einsum(
                "bklr,kdr->bkld", dts, dt_projs_weight.astype(dts.dtype)
            )
            ys = ssp.selective_scan_pallas_tm(
                xs, dts, A, Bs, Cs,
                D=Ds.astype(jnp.float32),
                delta_bias=dt_projs_bias.reshape(-1).astype(jnp.float32),
                delta_softplus=True,
                chunk=self.scan_chunk,
            )  # (B, K, L, d_inner)
            y = cross_merge_tm(ys.astype(jnp.float32), H, W)
        else:
            xs = cross_scan(xx)  # (B, K, d_inner, L)
            x_dbl = jnp.einsum(
                "bkdl,kcd->bkcl", xs, x_proj_weight.astype(xs.dtype)
            )
            dts, Bs, Cs = jnp.split(x_dbl, [dt_rank, dt_rank + n], axis=2)
            dts = jnp.einsum(
                "bkrl,kdr->bkdl", dts, dt_projs_weight.astype(dts.dtype)
            )
            out = selective_scan(
                xs.reshape(bsz, K * d_inner, L),
                dts.reshape(bsz, K * d_inner, L),
                A,
                Bs,  # (B, K, n, L): K plays the group axis G
                Cs,
                D=Ds.astype(jnp.float32),
                z=None,
                delta_bias=dt_projs_bias.reshape(-1).astype(jnp.float32),
                delta_softplus=True,
                chunk=self.scan_chunk,
                implementation=self.scan_impl,
            )  # (B, K*d_inner, L) — promoted to fp32 internally
            y = cross_merge(out.reshape(bsz, K, d_inner, L), H, W)
        if hwbc and not use_folded:
            y = y.transpose(1, 2, 0, 3)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="out_norm")(y.astype(self.dtype))

        y = y * nn.silu(z)
        out = nn.Dense(
            self.d_model,
            use_bias=self.bias,
            kernel_init=trunc_normal_init(),
            dtype=self.dtype,
            name="out_proj",
        )(y)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out
