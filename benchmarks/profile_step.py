"""Per-component profile of the Mamba-UNet train step on real TPU.

Decomposes the flagship train step (bs24@224², bf16 compute / fp32 scan
state) into jitted sub-timings so the optimization targets are explicit:

  * full train step (fwd+bwd+SGD, donated state)
  * fwd+bwd only / forward loss only / inference forward
  * per-stage VSSLayer fwd and fwd+bwd at the stage's true (B, H, W, C)
  * the bare Pallas scan at each stage's folded (B, K=4, L, d_inner) shape
  * patch-embed/head and the CE+Dice loss epilogue

Timing protocol per the verify skill: chain iterations on donated/jitted
calls and force ONE host transfer at the end (block_until_ready is
unreliable through the axon tunnel; per-call RTT ~28 ms must be amortized).

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/profile_step.py
"""

from __future__ import annotations

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BATCH = 24
PATCH = 224
ITERS = 20


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:4].astype(jnp.float32)))


def timeit(fn, *args, iters=ITERS, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def timeit_chain(step, state, batch, iters=ITERS, warmup=2):
    """For donated-state steps: state chains through, one final sync."""
    for _ in range(warmup):
        state, logs = step(state, batch)
    sync(logs)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, logs = step(state, batch)
    sync(logs)
    return (time.perf_counter() - t0) / iters * 1000.0, state


def main():
    from mamba_unet_tpu.models import MambaUnet
    from mamba_unet_tpu.nn.vss import VSSLayer
    from mamba_unet_tpu.objectives import supervised_ce_dice
    from mamba_unet_tpu.ops import selective_scan_pallas as ssp
    from mamba_unet_tpu.train import TrainConfig, Trainer

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    rows = []

    def row(name, ms, note=""):
        rows.append((name, ms, note))
        print(f"  {name:<44s} {ms:8.2f} ms  {note}", flush=True)

    # ---------------- full step & coarse splits ----------------
    cfg = TrainConfig(
        base_lr=0.01, max_iterations=10_000, batch_size=BATCH,
        patch_size=(PATCH, PATCH), num_classes=4, seed=1337,
        log_every=10_000, eval_every=10_000,
    )
    model = MambaUnet(num_classes=4, drop_path_rate=0.2, dtype=jnp.bfloat16,
                      use_remat=False)
    trainer = Trainer(model, cfg)
    rng = np.random.default_rng(0)
    batch = {
        "image": jax.device_put(
            rng.normal(size=(BATCH, PATCH, PATCH, 1)).astype(np.float32),
            trainer._bsh),
        "label": jax.device_put(
            rng.integers(0, 4, size=(BATCH, PATCH, PATCH)), trainer._bsh),
    }
    ms, state = timeit_chain(trainer._step, trainer.state, batch)
    row("train_step (fwd+bwd+sgd, donated)", ms,
        f"= {BATCH / ms * 1000:.1f} slices/s")

    variables = state.variables(state.params)

    def loss_fwd(params, batch):
        v = state.variables(params)
        logits = model.apply(v, batch["image"], deterministic=False,
                             rngs={"dropout": jax.random.key(0)})
        return supervised_ce_dice(logits, batch["label"])

    g = jax.jit(jax.value_and_grad(loss_fwd))
    row("fwd+bwd (no optimizer)", timeit(g, state.params, batch))
    row("forward loss only", timeit(jax.jit(loss_fwd), state.params, batch))
    fwd_inf = jax.jit(lambda v, x: model.apply(v, x))
    row("inference forward (deterministic)", timeit(fwd_inf, variables,
                                                    batch["image"]))

    # loss epilogue alone
    logits = fwd_inf(variables, batch["image"])
    loss_fn = jax.jit(supervised_ce_dice)
    row("CE+Dice loss epilogue", timeit(loss_fn, logits, batch["label"]))

    # ---------------- per-stage VSSLayer ----------------
    dims = (96, 192, 384, 768)
    hw = (PATCH // 4, PATCH // 8, PATCH // 16, PATCH // 32)
    for i, (dim, s) in enumerate(zip(dims, hw)):
        layer = VSSLayer(dim=dim, depth=2, drop_path=(0.0, 0.0),
                         d_state=16, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.normal(size=(BATCH, s, s, dim)), jnp.bfloat16)
        v = jax.jit(layer.init)(jax.random.key(0), x)
        f = jax.jit(lambda v, x, layer=layer: layer.apply(v, x))
        ms_f = timeit(f, v, x)

        def lb(v, x, layer=layer):
            return jnp.sum(layer.apply(v, x).astype(jnp.float32))

        fb = jax.jit(jax.grad(lb))
        ms_fb = timeit(fb, v, x)
        row(f"VSSLayer stage{i} (depth2, {s}x{s}x{dim}) fwd", ms_f)
        row(f"VSSLayer stage{i} fwd+bwd", ms_fb)

    # ---------------- bare Pallas scan per stage ----------------
    for i, (dim, s) in enumerate(zip(dims, hw)):
        d_inner, L, n, K = 2 * dim, s * s, 16, 4
        u = jnp.asarray(rng.normal(size=(BATCH, K, L, d_inner)), jnp.bfloat16)
        dl = jnp.asarray(0.1 * rng.normal(size=(BATCH, K, L, d_inner)),
                         jnp.bfloat16)
        A = -jnp.exp(jnp.asarray(rng.normal(size=(K * d_inner, n)),
                                 jnp.float32) * 0.5)
        Bm = jnp.asarray(rng.normal(size=(BATCH, K, L, n)), jnp.bfloat16)
        Cm = jnp.asarray(rng.normal(size=(BATCH, K, L, n)), jnp.bfloat16)

        f = jax.jit(lambda *a: ssp.selective_scan_pallas_tm(
            *a, delta_softplus=True))
        ms_f = timeit(f, u, dl, A, Bm, Cm)

        def lb(*a):
            return jnp.sum(ssp.selective_scan_pallas_tm(
                *a, delta_softplus=True).astype(jnp.float32))

        fb = jax.jit(jax.grad(lb, argnums=(0, 1, 2, 3, 4)))
        ms_fb = timeit(fb, u, dl, A, Bm, Cm)
        row(f"pallas scan stage{i} (L={L}, dg={d_inner}) fwd", ms_f)
        row(f"pallas scan stage{i} fwd+bwd", ms_fb)

    # ---------------- summary ----------------
    print("\n| component | ms |")
    print("|---|---|")
    for name, ms, note in rows:
        print(f"| {name} | {ms:.2f} | {note}")


if __name__ == "__main__":
    main()
