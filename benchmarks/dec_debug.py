"""Isolate the dec-kernel hardware-vs-interpret mismatch."""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np

from benchmarks.dec_scan_proto import run_dec
from mamba_unet_tpu.ops import selective_scan_ref


def build(io, B=4, K=2, L=64, dg=128, n=16, seed=0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(B, K, L, dg)), io)
    dl = jnp.asarray(0.1 * rng.normal(size=(B, K, L, dg)), io)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(K * dg, n)), jnp.float32) * 0.5)
    Bm = jnp.asarray(rng.normal(size=(B, K, L, n)), io)
    Cm = jnp.asarray(rng.normal(size=(B, K, L, n)), io)
    A_t = A.reshape(K, dg, n).transpose(0, 2, 1)
    Dsk = jnp.zeros((K, 1, dg), jnp.float32)
    db = jnp.zeros((K, 1, dg), jnp.float32)
    want = selective_scan_ref(
        u.astype(jnp.float32).reshape(B, K, L, dg).transpose(0, 1, 3, 2)
        .reshape(B, K * dg, L),
        dl.astype(jnp.float32).reshape(B, K, L, dg).transpose(0, 1, 3, 2)
        .reshape(B, K * dg, L),
        A,
        Bm.astype(jnp.float32).transpose(0, 1, 3, 2),
        Cm.astype(jnp.float32).transpose(0, 1, 3, 2),
        None, None, None, True,
    ).reshape(B, K, dg, L).transpose(0, 1, 3, 2)
    return u, dl, A_t, Bm, Cm, Dsk, db, want


def main():
    print(f"backend={jax.default_backend()}")
    for io_name, io in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        u, dl, A_t, Bm, Cm, Dsk, db, want = build(io)
        for S, R in ((2, 8), (4, 8), (4, 4)):
            got = run_dec(u, dl, A_t, Bm, Cm, Dsk, db, btile=2, S=S, R=R,
                          interpret=False)
            err = float(jnp.abs(got.astype(jnp.float32) - want).max())
            # where is the error? per-position max over everything else
            e_pos = np.abs(np.asarray(got, np.float32) - np.asarray(want)
                           ).max(axis=(0, 1, 3))
            worst = np.argsort(e_pos)[-5:]
            print(f"  {io_name} S={S} R={R}: err {err:.2e}; worst L-positions "
                  f"{worst.tolist()} (errs {[round(float(e_pos[w]), 4) for w in worst]})")


if __name__ == "__main__":
    main()
