"""From-scratch trainability guard.

No shape/differential test catches a model that compiles, produces finite
losses, and still cannot learn (the background-collapse failure mode of
docs/EVIDENCE.md): this overfit miniature asserts the tiny VSSM actually
fits two phantom slices under the warmup-AdamW recipe. SGD is intentionally
not asserted — the reference's poly-SGD provably collapses from scratch
(EVIDENCE.md); it only works from the ImageNet warm start."""

import numpy as np


def test_vssm_overfits_two_phantoms_with_adamw():
    import jax
    import jax.numpy as jnp
    import optax

    from mamba_unet_tpu.data.synthetic import _phantom
    from mamba_unet_tpu.models.vssm import MambaUnet
    from mamba_unet_tpu.objectives import supervised_ce_dice

    rng = np.random.default_rng(0)
    imgs, labs = zip(*[_phantom(rng, 64) for _ in range(2)])
    x = jnp.asarray(np.stack(imgs))[..., None]
    y = jnp.asarray(np.stack(labs).astype(np.int32))

    model = MambaUnet(num_classes=4, depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                      drop_path_rate=0.0, scan_impl="xla")
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]
    tx = optax.adamw(1e-3, weight_decay=0.05)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            return supervised_ce_dice(model.apply({"params": p}, x), y)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    first = None
    for it in range(200):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)

    pred = np.asarray(jnp.argmax(model.apply({"params": params}, x), -1))
    yy = np.asarray(y)
    fg_acc = float((pred[yy > 0] == yy[yy > 0]).mean())
    assert float(loss) < 0.35 * first, (float(loss), first)
    assert fg_acc > 0.5, fg_acc  # all-background collapse gives 0.0
