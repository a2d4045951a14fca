"""Train-step throughput for the OTHER two headline models of the reference
(BASELINE.md Table: UNet @256² bs24, Swin-UNet @224² bs24) — both MXU-heavy,
so they show the framework ceiling when the workload maps to matmuls/convs,
against the same 33.33 slices/s A100 anchor used by bench.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/zoo_step.py [unet|swinunet]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

CONFIGS = {
    "unet": dict(model="unet", patch=256),
    "swinunet": dict(model="ViT_seg", patch=224),
}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "unet"
    cfg = CONFIGS[which]
    batch_size, patch = 24, cfg["patch"]

    from mamba_unet_tpu.models.registry import net_factory
    from mamba_unet_tpu.train import TrainConfig, Trainer

    tc = TrainConfig(
        base_lr=0.01, max_iterations=10_000, batch_size=batch_size,
        patch_size=(patch, patch), num_classes=4, seed=1337,
        log_every=10_000, eval_every=10_000,
    )
    model = net_factory(cfg["model"], num_classes=4, dtype=jnp.bfloat16)
    trainer = Trainer(model, tc)

    rng = np.random.default_rng(0)
    batch = {
        "image": jax.device_put(
            rng.normal(size=(batch_size, patch, patch, 1)).astype(np.float32),
            trainer._bsh),
        "label": jax.device_put(
            rng.integers(0, 4, size=(batch_size, patch, patch)).astype(np.uint8),
            trainer._bsh),
    }
    state, logs = trainer._step(trainer.state, batch)
    trainer.state = state
    loss0 = float(logs["loss_total"])

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        trainer.state, logs = trainer._step(trainer.state, batch)
    loss1 = float(logs["loss_total"])
    dt = (time.perf_counter() - t0) / n_steps * 1000
    sps = batch_size / dt * 1000
    print(f"{which} bs{batch_size}@{patch}²: step {dt:.1f} ms = {sps:.1f} "
          f"slices/s = {sps / 33.33:.2f}x A100 anchor  "
          f"loss {loss0:.4f}->{loss1:.4f}", flush=True)


if __name__ == "__main__":
    main()
