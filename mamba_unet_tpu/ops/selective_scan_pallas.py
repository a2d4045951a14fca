"""Pallas TPU kernel for the selective scan (placeholder dispatch hooks).

The fused kernel (chunked carried-prefix scan in VMEM, custom VJP with
recompute + reverse scan, mirroring the design of
``/root/reference/mamba/csrc/selective_scan/selective_scan_fwd_kernel.cuh``)
is implemented incrementally; until it lands, ``supported`` returns False and
the public ``ops.selective_scan`` uses the chunked XLA path.
"""

from __future__ import annotations

import jax


def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def supported(u, A, B, return_last_state) -> bool:
    return False


def selective_scan_pallas(u, delta, A, B, C, D, z, delta_bias, delta_softplus):
    raise NotImplementedError
