"""GPipe-style pipeline parallelism for the Mamba LM block stack.

The reference framework has no parallelism above one GPU (SURVEY §2.9: the
only multi-device path is ``torch.nn.DataParallel`` replication), so this is
part of the beyond-reference TPU scaling story, alongside data parallelism
(``parallel/mesh.py``), the sequence-sharded ring scan (``seq_scan.py``) and
the channel-sharded tensor-parallel scan (``tp_scan.py``).

The natural pipeline target is ``MambaLMHeadModel`` (``models/mamba_lm.py``,
rebuilt from ``mamba/mamba_ssm/models/mixer_seq_simple.py:83-171``): its body
is ``n_layer`` IDENTICAL pre-norm residual blocks, so the stack maps onto a
``pipe`` mesh axis as ``n_layer // S`` layers per stage, with microbatch
activations handed stage-to-stage by ``jax.lax.ppermute`` — point-to-point
neighbour traffic that rides an ICI ring, never materializing cross-stage
activations in HBM on any one chip.

Schedule: plain GPipe. With M microbatches over S stages the tick loop runs
``T = M + S - 1`` steps (bubble fraction ``(S-1)/T``); every device executes
its stage every tick and the wavefront selects which activations are real.
The BACKWARD pipeline needs no code: differentiating through the tick loop
transposes ``ppermute`` into the reverse-ring permute, so autodiff yields the
mirror-image backward schedule automatically (same reason the reference's
chunk-carry generalizes to the ring scan in ``seq_scan.py``).

Two layers of API:

* :func:`pipeline_blocks` — the core: run a stacked-parameter block pytree
  (leading axis = layer, sharded over ``pipe``) over microbatched
  activations. Takes any flax block module; parameters may live sharded.
* :func:`pipeline_lm_apply` / :func:`pipeline_lm_loss` — convenience wrappers
  for ``MambaLMHeadModel``: embedding and tied head stay replicated (they are
  a tiny fraction of LM FLOPs); the per-layer parameter stack is built from
  the ordinary ``variables`` pytree with ``jnp.stack`` INSIDE the jitted
  computation, so gradients flow back to the ordinary per-layer tree and the
  usual optax/orbax machinery applies unchanged. For models too big to
  replicate, :func:`prestack_lm_params` builds the production layout once
  outside jit — the layer stack device-sharded ``P("pipe")`` so each stage
  holds only its own layers — and both wrappers consume it via ``stacked=``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def stack_layer_params(params: dict, n_layer: int, prefix: str = "layers_"):
    """Stack the per-layer subtrees ``params[f'{prefix}{i}']`` into one pytree
    whose leaves carry a leading layer axis. Differentiable (``jnp.stack``),
    so gradients flow back to the per-layer tree it was built from."""
    layers = [params[f"{prefix}{i}"] for i in range(n_layer)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def prestack_lm_params(variables, n_layer: int, mesh: Mesh,
                       axis: str = "pipe", prefix: str = "layers_"):
    """Production parameter layout for :func:`pipeline_lm_apply`: split an LM
    ``variables`` tree into ``(nonlayer_variables, stacked)`` ONCE outside
    jit, with ``stacked`` carrying every per-layer subtree on a leading layer
    axis and device-sharded ``P(axis)`` over the mesh — each pipeline stage
    holds only its own ``n_layer // S`` layers in HBM (the small
    embedding/norm/head stay replicated in ``nonlayer_variables``). This
    replaces the replicate-then-``jnp.stack``-in-jit convenience path for
    models too big to replicate.

    Train steps keep the tree sharded end-to-end: gradients from
    :func:`pipeline_lm_loss` inherit the ``P(axis)`` sharding (the autodiff
    transpose of the ``shard_map`` in :func:`pipeline_blocks`), and optax
    updates are elementwise, so the optimizer state and updated params stay
    ``P(axis)`` without further annotation."""
    params = variables["params"]
    layer_keys = {f"{prefix}{i}" for i in range(n_layer)}
    missing = layer_keys - set(params)
    if missing:
        raise ValueError(f"variables missing layer subtrees: {sorted(missing)}")
    stacked = stack_layer_params(params, n_layer, prefix)
    sharding = jax.sharding.NamedSharding(mesh, P(axis))
    stacked = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), stacked)
    nonlayer_variables = dict(variables)
    nonlayer_variables["params"] = {
        k: v for k, v in params.items() if k not in layer_keys
    }
    return nonlayer_variables, stacked


def pipeline_blocks(
    block_apply,
    stacked_params,
    x_mb: jnp.ndarray,
    mesh: Mesh,
    axis: str = "pipe",
):
    """Run microbatches through a pipelined stack of identical blocks.

    Args:
      block_apply: ``f(layer_params, h) -> h`` applying ONE block (e.g.
        ``lambda p, h: block.apply({'params': p}, h)``).
      stacked_params: pytree with leading layer axis ``n_layer`` on every
        leaf; sharded ``P(axis)`` over the mesh (``n_layer % S == 0``).
      x_mb: ``(M, mb, ...)`` microbatched activations (replicated — they are
        consumed on stage 0 and produced on stage S-1; see module docstring).
      mesh: mesh with a pipeline axis named ``axis`` of size S.

    Returns ``(M, mb, ...)`` outputs of the full stack, replicated.
    """
    S = mesh.shape[axis]
    n_layer = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layer % S:
        raise ValueError(f"n_layer={n_layer} not divisible by S={S}")
    M = x_mb.shape[0]
    T = M + S - 1
    perm = [(i, (i + 1) % S) for i in range(S)]

    def local_fn(local_stack, x_all):
        idx = jax.lax.axis_index(axis)

        def run_stage(h):
            def body(h, layer_params):
                return block_apply(layer_params, h), None

            h, _ = jax.lax.scan(body, h, local_stack)
            return h

        def tick(carry, t):
            h_recv, y_out = carry
            mb_in = jnp.clip(t, 0, M - 1)
            x0 = jax.lax.dynamic_index_in_dim(x_all, mb_in, 0,
                                              keepdims=False)
            h = jnp.where(idx == 0, x0, h_recv)
            # Dead-lane hygiene: stage `idx` holds a REAL activation at tick
            # t only for 0 <= t - idx < M (warm-up ticks and the t >= M
            # re-injected microbatch are wavefront filler). Dead lanes still
            # run the real params, and a non-finite intermediate there (e.g.
            # exp/softplus overflow on stale activations under bf16) would
            # leak NaN into parameter grads through the 0*inf VJP of the
            # where-masked path even though the forward output is correct —
            # so dead inputs are pinned to zeros, a known-safe value.
            live = (t >= idx) & (t - idx < M)
            h = jnp.where(live, h, jnp.zeros_like(h))
            y = run_stage(h)
            # stage S-1's output at tick t is microbatch t-(S-1)'s result
            out_t = t - (S - 1)
            slot = jnp.clip(out_t, 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(y_out, slot, 0,
                                               keepdims=False)
            upd = jnp.where((idx == S - 1) & (out_t >= 0), y, cur)
            y_out = jax.lax.dynamic_update_index_in_dim(y_out, upd, slot, 0)
            h_next = jax.lax.ppermute(y, axis, perm)
            return (h_next, y_out), None

        init = (
            jnp.zeros(x_all.shape[1:], x_all.dtype),
            jnp.zeros_like(x_all),
        )
        (_, y_out), _ = jax.lax.scan(tick, init, jnp.arange(T))
        # only stage S-1 holds real outputs; everyone else contributes exact
        # zeros, so the psum is a broadcast of the last stage's buffer
        return jax.lax.psum(jnp.where(idx == S - 1, y_out,
                                      jnp.zeros_like(y_out)), axis)

    in_specs = (
        jax.tree_util.tree_map(lambda _: P(axis), stacked_params),
        P(),
    )
    return shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=P(),
        check_vma=False,
    )(stacked_params, x_mb)


def _microbatch(x: jnp.ndarray, n_micro: int) -> jnp.ndarray:
    B = x.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")
    return x.reshape((n_micro, B // n_micro) + x.shape[1:])


def pipeline_lm_apply(
    model,
    variables,
    input_ids: jnp.ndarray,
    mesh: Mesh,
    axis: str = "pipe",
    n_micro: int = 4,
    deterministic: bool = True,
    stacked=None,
):
    """``MambaLMHeadModel.__call__`` with the block stack pipelined over
    ``axis``. Semantically identical to ``model.apply(variables, input_ids)``
    (same per-layer math, microbatching only re-batches the row dimension);
    returns fp32 logits ``(B, L, padded_vocab)``.

    ``stacked``: pass the pipe-sharded layer stack from
    :func:`prestack_lm_params` (with its ``nonlayer_variables`` as
    ``variables``) to run the production layout — no per-layer subtrees are
    read from ``variables`` and no in-jit ``jnp.stack`` happens; each stage
    touches only its own layers. Omit it (default) for the convenience path
    that stacks the replicated per-layer tree inside the computation.

    ``deterministic`` must stay True: the pipelined blocks always run
    without dropout (threading per-tick RNG through the wavefront is not
    implemented), so silently accepting False would hand callers
    deterministic behavior they didn't ask for."""
    if not deterministic:
        raise ValueError(
            "pipeline_lm_apply only supports deterministic=True — the "
            "pipelined block stack runs without dropout"
        )
    from mamba_unet_tpu.nn.mamba1d import MambaBlock

    block = MambaBlock(
        d_model=model.d_model, d_state=model.d_state,
        rms_norm=model.rms_norm, norm_epsilon=model.norm_epsilon,
        bimamba_type=model.bimamba_type, scan_impl=model.scan_impl,
        dtype=model.dtype,
    )
    h = model.apply(variables, input_ids,
                    method=lambda m, ids: m.embedding(ids))
    if stacked is None:
        stacked = stack_layer_params(variables["params"], model.n_layer)
    y_mb = pipeline_blocks(
        lambda p, hh: block.apply({"params": p}, hh),
        stacked, _microbatch(h, n_micro), mesh, axis,
    )
    hidden = y_mb.reshape((-1,) + y_mb.shape[2:])
    return model.apply(variables, hidden,
                       method=lambda m, hh: m._head(m.norm_f(hh)))


def pipeline_lm_loss(
    model,
    variables,
    input_ids: jnp.ndarray,
    targets: jnp.ndarray,
    mesh: Mesh,
    axis: str = "pipe",
    n_micro: int = 4,
    stacked=None,
) -> jnp.ndarray:
    """Mean next-token cross-entropy through the pipelined forward —
    differentiable wrt ``variables`` (and wrt ``stacked`` when the
    pre-sharded production layout is passed; the backward pipeline is the
    autodiff transpose of the tick loop — see module docstring)."""
    logits = pipeline_lm_apply(model, variables, input_ids, mesh, axis,
                               n_micro, stacked=stacked)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    return jnp.mean(nll)
