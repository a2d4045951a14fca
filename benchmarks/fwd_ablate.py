"""Attribute the FORWARD kernel's time: sweep MAMBA_SCAN_ABLATE subsets at
stage shapes (results numerically WRONG by design; timing only). Companion
to bwd_ablate.py."""
from __future__ import annotations

import os
import subprocess
import sys

CASES = ["", "yepi", "fwdloop", "build", "fwdloop,yepi", "build,fwdloop,yepi"]

CHILD = r'''
import os, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp
import numpy as np
from mamba_unet_tpu.ops.selective_scan_pallas import selective_scan_pallas_tm

rng = np.random.default_rng(0)
B, K, n = 24, 4, 16
L, dg = int(os.environ["ABL_L"]), int(os.environ["ABL_DG"])
u = jnp.asarray(rng.normal(size=(B, K, L, dg)), jnp.bfloat16)
dl = jnp.asarray(0.1 * rng.normal(size=(B, K, L, dg)), jnp.bfloat16)
A = -jnp.exp(jnp.asarray(rng.normal(size=(K * dg, n)), jnp.float32) * 0.5)
Bm = jnp.asarray(rng.normal(size=(B, K, L, n)), jnp.bfloat16)
Cm = jnp.asarray(rng.normal(size=(B, K, L, n)), jnp.bfloat16)

fn = jax.jit(lambda *a: selective_scan_pallas_tm(*a, delta_softplus=True))
out = fn(u, dl, A, Bm, Cm)
s = float(jnp.sum(out[:1].astype(jnp.float32)))
t0 = time.perf_counter()
N_IT = 20
for _ in range(N_IT):
    out = fn(u, dl, A, Bm, Cm)
s = float(jnp.sum(out[:1].astype(jnp.float32)))
dt = (time.perf_counter() - t0) / N_IT * 1000
print(f"FWDMS {dt:.2f}", flush=True)
'''

def main():
    shapes = [(3136, 192), (784, 384)]
    if len(sys.argv) > 1:
        shapes = shapes[: int(sys.argv[1])]
    for L, dg in shapes:
        print(f"=== L={L} dg={dg} ===", flush=True)
        for case in CASES:
            env = dict(os.environ, MAMBA_SCAN_ABLATE=case,
                       ABL_L=str(L), ABL_DG=str(dg),
                       PYTHONPATH="/root/repo:/root/.axon_site")
            r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                               capture_output=True, text=True, timeout=600)
            ms = [l for l in r.stdout.splitlines() if l.startswith("FWDMS")]
            label = case or "full"
            print(f"  {label:24s} {ms[0].split()[1] if ms else 'FAIL'}",
                  flush=True)
            if not ms:
                print("   ", (r.stderr.strip().splitlines() or ["?"])[-1])

if __name__ == "__main__":
    main()
