"""Full-train-step A/B for the activation layout / scan-kernel policy:

  a) bhwc + auto (bidir kernel everywhere)        — production default
  b) hwbc + folded at EVERY stage
  c) hwbc + auto (folded only where dg % 128 != 0; bidir fallback elsewhere)

One process, one config at a time, donated chained steps (the bench.py
protocol). Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/layout_step.py [a|b|c]
"""

from __future__ import annotations

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

CONFIGS = {
    "a": dict(layout="bhwc", scan_impl="auto"),
    "b": dict(layout="hwbc", scan_impl="hwbc_folded"),
    "c": dict(layout="hwbc", scan_impl="auto"),
}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "a"
    cfgkw = CONFIGS[which]

    from mamba_unet_tpu.models import MambaUnet
    from mamba_unet_tpu.train import TrainConfig, Trainer

    batch_size, patch = 24, 224
    cfg = TrainConfig(
        base_lr=0.01, max_iterations=10_000, batch_size=batch_size,
        patch_size=(patch, patch), num_classes=4, seed=1337,
        log_every=10_000, eval_every=10_000,
    )
    model = MambaUnet(num_classes=4, drop_path_rate=0.2, dtype=jnp.bfloat16,
                      use_remat=False, **cfgkw)
    trainer = Trainer(model, cfg)

    rng = np.random.default_rng(0)
    batch = {
        "image": jax.device_put(
            rng.normal(size=(batch_size, patch, patch, 1)).astype(np.float32),
            trainer._bsh),
        "label": jax.device_put(
            rng.integers(0, 4, size=(batch_size, patch, patch)),
            trainer._bsh),
    }
    state, logs = trainer._step(trainer.state, batch)
    trainer.state = state
    loss0 = float(logs["loss_total"])

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        trainer.state, logs = trainer._step(trainer.state, batch)
    loss1 = float(logs["loss_total"])
    dt = (time.perf_counter() - t0) / n_steps * 1000
    print(f"config {which} ({cfgkw}): step {dt:.1f} ms "
          f"({batch_size / dt * 1000:.1f} slices/s)  loss {loss0:.4f}"
          f"->{loss1:.4f}", flush=True)


if __name__ == "__main__":
    main()
