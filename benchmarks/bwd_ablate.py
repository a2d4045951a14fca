"""Attribute the backward kernel's time: sweep MAMBA_SCAN_ABLATE subsets at
the four VSS stage shapes (results are numerically WRONG by design; timing
only). Each subset runs in a subprocess so the trace-time env is fresh.
"""
from __future__ import annotations

import os
import subprocess
import sys

CASES = ["", "epi", "revloop", "fwdloop", "fwdloop,revloop",
         "fwdloop,revloop,epi"]

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
gy = jnp.asarray(rng.normal(size=(B, K, L, dg)), jnp.bfloat16)

def loss(u_, dl_, A_, B_, C_, gy_):
    y = selective_scan_pallas_tm(u_, dl_, A_, B_, C_, delta_softplus=True)
    return jnp.sum(y.astype(jnp.float32) * gy_.astype(jnp.float32))

gfn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
out = gfn(u, dl, A, Bm, Cm, gy)
s = float(sum(jnp.sum(jnp.abs(o[:1].astype(jnp.float32))) for o in out))
t0 = time.perf_counter()
N_IT = 20
for _ in range(N_IT):
    out = gfn(u, dl, A, Bm, Cm, gy)
s = float(jnp.sum(out[0][:1].astype(jnp.float32)))
dt = (time.perf_counter() - t0) / N_IT * 1000
print(f"GRADMS {dt:.2f}", flush=True)
'''

def main():
    shapes = [(3136, 192), (784, 384)]
    for L, dg in shapes:
        print(f"=== L={L} dg={dg} ===", flush=True)
        for case in CASES:
            env = dict(os.environ, MAMBA_SCAN_ABLATE=case,
                       ABL_L=str(L), ABL_DG=str(dg),
                       PYTHONPATH="/root/repo:/root/.axon_site")
            r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                               capture_output=True, text=True, timeout=600)
            ms = [l for l in r.stdout.splitlines() if l.startswith("GRADMS")]
            label = case or "full"
            print(f"  {label:24s} {ms[0].split()[1] if ms else 'FAIL'}",
                  flush=True)
            if not ms:
                print("   ", (r.stderr.strip().splitlines() or ["?"])[-1])

if __name__ == "__main__":
    main()
