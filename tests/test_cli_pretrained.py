"""CLI --pretrained_ckpt warm-start: fabricated torch ckpt -> params loaded."""

import numpy as np
import pytest


def test_cli_pretrained_warm_start(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp
    import torch

    from mamba_unet_tpu.cli.train import main
    from mamba_unet_tpu.models import MambaUnet
    from tests.test_convert import _fabricate_torch_sd

    # fabricate a ckpt matching the CLI's ViM at 32² (full dims)
    model = MambaUnet(num_classes=4)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(42), x)["params"]["vssm"]
    sd, _ = _fabricate_torch_sd(params)
    tsd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    ckpt = str(tmp_path / "vmamba.pth")
    torch.save({"model": tsd}, ckpt)

    rc = main(["--model", "ViM_seg", "--synthetic", "--max_iterations", "1",
               "--batch_size", "8", "--patch_size", "32", "32",
               "--eval_every", "1000", "--drop_path", "0.0",
               "--pretrained_ckpt", ckpt])
    assert rc == 0
