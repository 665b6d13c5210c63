"""Training loop: optax step with data-parallel sharding over a mesh.

Design (SURVEY.md §5.8): parameters are KB-scale and replicate; only the
frame batch shards, along a 1D ``('data',)`` mesh. The train step is jitted
with explicit shardings (model/opt-state replicated, batch sharded) and XLA
inserts the gradient all-reduce over ICI. Non-trainable leaves (e.g. the
alignment reference buffer ``ref_x``) are frozen via ``optax.masked`` —
mirroring the reference where ``ref_x`` is a registered *buffer*, not a
parameter (reference molann/ann.py:137).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import optax

from ..parallel.mesh import DATA_AXIS, batch_sharding, replicated_sharding

__all__ = [
    "trainable_mask",
    "masked_optimizer",
    "make_train_step",
    "make_fused_train_step",
    "fit",
    "TrainResult",
]


def trainable_mask(model, predicate: Callable | None = None):
    """Boolean pytree marking trainable leaves.

    Default policy: leaves reached through an ``ann_layers`` or ``params``
    attribute are trainable (MLP weights); everything else (alignment
    ``ref_x`` buffers) is frozen.
    """
    if predicate is None:
        def predicate(path, leaf):
            names = {
                k.name for k in path if isinstance(k, jax.tree_util.GetAttrKey)
            }
            return bool(names & {"ann_layers", "params"})

    flat, treedef = jax.tree_util.tree_flatten_with_path(model)
    return jax.tree_util.tree_unflatten(
        treedef, [bool(predicate(path, leaf)) for path, leaf in flat]
    )


def masked_optimizer(optimizer, mask):
    """Apply ``optimizer`` to leaves marked True in ``mask``; FREEZE the
    rest (zero updates — note ``optax.masked`` alone would pass raw
    gradients through to unmasked leaves)."""
    labels = jax.tree_util.tree_map(
        lambda b: "train" if b else "freeze", mask
    )
    # NB: pass labels via a closure — model pytrees are callable objects and
    # optax.multi_transform would otherwise invoke them as a label function.
    return optax.multi_transform(
        {"train": optimizer, "freeze": optax.set_to_zero()}, lambda _: labels
    )


def make_train_step(loss_fn, optimizer, mesh=None, *, donate=False):
    """Build a jitted ``step(model, opt_state, batch) -> (model, opt_state,
    loss)``.

    loss_fn: ``(model, batch) -> scalar``.
    optimizer: an optax GradientTransformation (wrap with ``optax.masked``
    yourself, or use :func:`fit` which does it for you).
    mesh: optional ``('data',)`` mesh — when given, the batch is expected
    sharded on its leading dim and the model/opt-state replicated; XLA
    reduces gradients over ICI automatically.
    donate: donate model/opt-state buffers (in-place update; the passed-in
    model object becomes invalid — production loops only).
    """

    def step(model, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(model, batch)
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    donate_argnums = (0, 1) if donate else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate_argnums)

    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, repl, bsh),
        out_shardings=(repl, repl, repl),
        donate_argnums=donate_argnums,
    )


def make_fused_train_step(optimizer, mesh=None, *, tile=None,
                          transposed_input=False, interpret=False,
                          mode="auto", precision="auto", train_ref=False,
                          donate=False):
    """Build a jitted MSE training step on the single-kernel fused path.

    Like :func:`make_train_step` with ``loss_fn=mse_loss``, but loss AND
    parameter gradients come from ONE Pallas kernel
    (:func:`molann_tpu.ops.fused.fused_train_grads`) — no separate
    forward/backward kernels and no coordinate-gradient compute/write,
    roughly tripling training throughput on TPU. Batch = ``(x, y)``; with
    ``transposed_input``, ``x [3n, l]`` and ``y [d, l]`` (the fast
    layouts). With ``mesh``, the batch shards over the data axis and XLA
    reduces the gradients over ICI exactly as in :func:`make_train_step`.

    precision defaults to ``"auto"`` = tf32 on this training path (the
    shipped policy — see
    :func:`molann_tpu.ops.fused.resolve_precision`).
    """
    from ..ops.fused import fused_train_grads

    def local_grads(model, batch):
        x, y = batch
        return fused_train_grads(
            model, x, y, tile=tile, interpret=interpret,
            transposed_input=transposed_input, mode=mode,
            precision=precision, train_ref=train_ref,
        )

    donate_argnums = (0, 1) if donate else ()
    if mesh is None:
        def step(model, opt_state, batch):
            loss, grads = local_grads(model, batch)
            updates, opt_state = optimizer.update(grads, opt_state, model)
            model = optax.apply_updates(model, updates)
            return model, opt_state, loss

        return jax.jit(step, donate_argnums=donate_argnums)

    # A pallas_call is opaque to GSPMD, so the multi-chip path is explicit
    # SPMD: shard_map runs the fused kernel on each device's frame shard
    # and pmean-reduces loss + gradients over ICI before the (replicated)
    # optimizer update.
    from jax.sharding import PartitionSpec as P

    frame_axis_spec = P(None, DATA_AXIS) if transposed_input else P(DATA_AXIS)

    def spmd_step(model, opt_state, batch):
        loss, grads = local_grads(model, batch)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, DATA_AXIS), grads
        )
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    mapped = jax.shard_map(
        spmd_step,
        mesh=mesh,
        in_specs=(P(), P(), (frame_axis_spec, frame_axis_spec)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=donate_argnums)


@dataclass
class TrainResult:
    model: Any
    losses: list


def fit(model, loss_fn, data_iter, *, optimizer=None, mesh=None,
        num_steps=None, mask=None, log_every=0,
        checkpoint_dir=None, checkpoint_every=0, resume=True):
    """Train ``model`` with ``loss_fn(model, batch)`` over ``data_iter``.

    Non-trainable leaves are frozen via a masked optimizer with
    :func:`trainable_mask` (pass ``mask`` to override). When ``mesh`` is
    given, each batch is device_put sharded over the data axis before the
    step. With ``checkpoint_dir``, training state (model + optimizer +
    step) is saved every ``checkpoint_every`` steps and, if ``resume``,
    training continues from the latest checkpoint found there.
    Returns :class:`TrainResult` with the trained model and the loss trace.
    """
    if optimizer is None:
        optimizer = optax.adam(1e-3)
    if mask is None:
        mask = trainable_mask(model)
    optimizer = masked_optimizer(optimizer, mask)
    opt_state = optimizer.init(model)
    start_step = 0

    if checkpoint_dir is not None and resume:
        from .checkpoint import latest_checkpoint, load_training_state

        latest = latest_checkpoint(checkpoint_dir)
        if latest is not None:
            model, opt_state, start_step = load_training_state(
                latest, optimizer
            )

    step = make_train_step(loss_fn, optimizer, mesh)

    if mesh is not None:
        from ..parallel.data_parallel import shard_batch
    if checkpoint_dir is not None:
        from .checkpoint import save_training_state

    it = iter(data_iter)
    if start_step:
        # Fast-forward so the resumed run continues the batch sequence
        # instead of re-training the already-seen prefix (the iterator is
        # deterministic in its seed, so skipping start_step batches lands
        # exactly where the interrupted run stopped).
        for _ in range(start_step):
            if next(it, None) is None:
                break

    losses = []
    i = start_step
    while num_steps is None or i < num_steps:
        batch = next(it, None)
        if batch is None:
            break
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        model, opt_state, loss = step(model, opt_state, batch)
        losses.append(loss)
        i += 1
        if log_every and i % log_every == 0:
            print(f"step {i}: loss={float(loss):.6g}")
        if (
            checkpoint_dir is not None
            and checkpoint_every
            and i % checkpoint_every == 0
        ):
            save_training_state(checkpoint_dir, model, opt_state, i)
    losses = [float(l) for l in losses]
    return TrainResult(model=model, losses=losses)
