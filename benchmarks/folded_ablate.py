"""Attribute the FOLDED kernel's time: sweep MAMBA_SCAN_FOLDED_ABLATE /
WDOT modes on the bare bidir folded VJP at stage shapes (results numerically
WRONG for ablations; timing only). Companion to bwd_ablate.py/fwd_ablate.py.

Usage: python benchmarks/folded_ablate.py [n_shapes]
"""
from __future__ import annotations

import os
import subprocess
import sys

CASES = [
    ("", "fp32"),
    ("", "bf16"),
    ("", "comp"),
    ("wdot", "fp32"),
    ("bcast", "fp32"),
    ("fwdloop,revloop", "fp32"),
    ("epi", "fp32"),
    ("bcast,wdot,fwdloop,revloop,epi", "fp32"),
]

CHILD = r'''
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
import numpy as np
from mamba_unet_tpu.ops.selective_scan_folded import (
    selective_scan_folded_bidir)

rng = np.random.default_rng(0)
B, n = 24, 16
L, dg = int(os.environ["ABL_L"]), int(os.environ["ABL_DG"])
BD = B * dg
u2 = jnp.asarray(rng.normal(size=(2, L, BD)), jnp.bfloat16)
d4 = jnp.asarray(0.1 * rng.normal(size=(4, L, BD)), jnp.bfloat16)
A = -jnp.exp(jnp.asarray(rng.normal(size=(4 * dg, n)), jnp.float32) * 0.5)
B4 = jnp.asarray(rng.normal(size=(4, L, n, B)), jnp.bfloat16)
C4 = jnp.asarray(rng.normal(size=(4, L, n, B)), jnp.bfloat16)
gy = jnp.asarray(rng.normal(size=(4, L, BD)), jnp.bfloat16)

def loss(u_, d_, A_, B_, C_):
    y = selective_scan_folded_bidir(u_, d_, A_, B_, C_, delta_softplus=True)
    return jnp.sum(y.astype(jnp.float32) * gy.astype(jnp.float32))

gfn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
out = gfn(u2, d4, A, B4, C4)
s = float(sum(jnp.sum(jnp.abs(o[:1].astype(jnp.float32))) for o in out))
t0 = time.perf_counter()
N_IT = 20
for _ in range(N_IT):
    out = gfn(u2, d4, A, B4, C4)
s = float(jnp.sum(out[0][:1].astype(jnp.float32)))
dt = (time.perf_counter() - t0) / N_IT * 1000
print(f"GRADMS {dt:.2f}", flush=True)
'''


def main():
    shapes = [(3136, 192), (784, 384)]
    if len(sys.argv) > 1:
        shapes = shapes[: int(sys.argv[1])]
    for L, dg in shapes:
        print(f"=== L={L} dg={dg} ===", flush=True)
        for abl, wdot in CASES:
            env = dict(os.environ, MAMBA_SCAN_FOLDED_ABLATE=abl,
                       MAMBA_SCAN_FOLDED_WDOT=wdot,
                       ABL_L=str(L), ABL_DG=str(dg),
                       PYTHONPATH="/root/repo:/root/.axon_site")
            r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                               capture_output=True, text=True, timeout=900)
            ms = [l for l in r.stdout.splitlines() if l.startswith("GRADMS")]
            label = (abl or "full") + f" wdot={wdot}"
            print(f"  {label:44s} {ms[0].split()[1] if ms else 'FAIL'}",
                  flush=True)
            if not ms:
                print("   ", (r.stderr.strip().splitlines() or ["?"])[-1])


if __name__ == "__main__":
    main()
