"""Deep-ensemble (committee) training: K models in one compiled step.

The reference trains one CV model at a time (single-device torch,
reference molann/ann.py). On TPU the idiomatic way to get model
*uncertainty* — the quantity that drives adaptive CV discovery ("is the
committee confident here, or is this region unexplored?") — is to train a
whole committee simultaneously: ``jax.vmap`` over a stacked parameter
pytree turns K tiny MLPs into one batched computation, so K members cost
barely more than one on the MXU and stay in a single XLA program (no
Python loop over members, no K separate dispatches).

Usage::

    models  = [create_model(key=jax.random.PRNGKey(i)) for i in range(5)]
    result  = fit_ensemble(models, loss_fn, batches, num_steps=200,
                           bagging=True)
    mean, std = committee(result.models, x)   # std = disagreement

``std`` is the committee disagreement — near zero where the training data
constrained all members, large where they extrapolate differently. The
adaptive-sampling loop (examples/adaptive_cv_loop.py) can use it as an
acquisition signal.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import DATA_AXIS
from .loop import masked_optimizer, trainable_mask

__all__ = [
    "stack_models",
    "unstack_model",
    "ensemble_size",
    "ensemble_apply",
    "committee",
    "committee_calibration",
    "calibrated_committee",
    "reinitialized_members",
    "make_ensemble_train_step",
    "fit_ensemble",
    "EnsembleResult",
]


def stack_models(models):
    """Stack K structurally-identical models into one pytree whose array
    leaves gain a leading member axis ``[K, ...]``.

    Members must share the exact tree structure (same layer dims, same
    feature spec, same static fields) — they should differ only in
    parameter *values* (different init keys). Raises ``ValueError``
    otherwise.
    """
    if len(models) < 2:
        raise ValueError("an ensemble needs at least 2 members")
    ref = jax.tree_util.tree_structure(models[0])
    for i, m in enumerate(models[1:], start=1):
        if jax.tree_util.tree_structure(m) != ref:
            raise ValueError(
                f"ensemble member {i} has a different structure than member "
                "0 (members must share layer dims / feature spec / static "
                "fields and differ only in parameter values)"
            )
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *models)


def unstack_model(stacked, i: int):
    """Extract member ``i`` of a stacked ensemble as a standalone model."""
    return jax.tree_util.tree_map(lambda l: l[i], stacked)


def ensemble_size(stacked) -> int:
    """Number of members K of a stacked ensemble."""
    leaves = jax.tree_util.tree_leaves(stacked)
    if not leaves:
        raise ValueError("empty pytree is not an ensemble")
    return int(leaves[0].shape[0])


def ensemble_apply(stacked, x):
    """Apply every member to the SAME input: ``-> [K, ...]``."""
    return jax.vmap(lambda m: m(x))(stacked)


def committee(stacked, x):
    """Committee prediction ``(mean [l, d], std [l, d])`` over members.

    ``std`` (population std over the member axis) is the disagreement /
    epistemic-uncertainty signal for adaptive sampling.
    """
    ys = ensemble_apply(stacked, x)
    return jnp.mean(ys, axis=0), jnp.std(ys, axis=0)


def committee_calibration(stacked, x_ref, *, eps=1e-8):
    """Precompute the gauge-fixing transform ``(mu, sd, sign)`` of
    :func:`calibrated_committee` on the reference frames ``x_ref``, so a
    streaming consumer (e.g. the ``committee`` CLI) evaluates the
    reference set once instead of once per batch."""
    ys_ref = ensemble_apply(stacked, x_ref)              # [K, m, d]
    mu = ys_ref.mean(axis=1, keepdims=True)
    sd = ys_ref.std(axis=1, keepdims=True) + eps
    z_ref = (ys_ref - mu) / sd
    sign = jnp.sign(jnp.sum(z_ref * z_ref[:1], axis=1, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)               # [K, 1, d]
    return mu, sd, sign


def calibrated_committee(stacked, x, x_ref=None, *, eps=1e-8,
                         calibration=None):
    """Gauge-fixed committee ``(mean [l, d], std [l, d])`` for CVs that
    are only defined up to sign/scale (autoencoder bottlenecks, VAMP and
    eigenfunction modes, ...).

    Raw :func:`committee` disagreement on such models is dominated by
    each member's arbitrary parametrization (z vs -z vs 2z), not by
    epistemic uncertainty. Here every member's output is first
    standardized on the REFERENCE frames ``x_ref`` (the training
    distribution): per member and output dim, subtract the reference
    mean, divide by the reference std, and align the sign to member 0 by
    reference-set correlation. After calibration all members agree on
    ``x_ref`` by construction up to fit differences, so the std on ``x``
    measures genuine disagreement — near zero where the data constrained
    the committee, large where it extrapolates (the acquisition signal
    for adaptive sampling; see examples/committee_uncertainty.py).

    Pass either ``x_ref`` or a precomputed
    ``calibration=committee_calibration(stacked, x_ref)``.

    Sign alignment is per output dim — for multi-dimensional CVs with a
    rotational gauge freedom, compare subspaces instead (this helper is
    calibrated for the common 1-D/per-dim case).
    """
    if calibration is None:
        if x_ref is None:
            raise ValueError("pass x_ref or calibration")
        calibration = committee_calibration(stacked, x_ref, eps=eps)
    mu, sd, sign = calibration
    z = sign * (ensemble_apply(stacked, x) - mu) / sd
    return jnp.mean(z, axis=0), jnp.std(z, axis=0)


def reinitialized_members(model, k: int, *, seed: int = 0):
    """K copies of ``model`` whose MLP parameters are freshly drawn from
    distinct PRNG keys (torch-``Linear``-style init, same layer dims) —
    the committee-construction step when all you have is one saved model.

    Alignment/feature metadata (including the frozen ``ref_x`` buffer) is
    shared untouched; only ``SequentialNN`` parameters re-draw. Handles a
    bare :class:`~molann_tpu.models.ann.SequentialNN`, a
    :class:`~molann_tpu.models.ann.MolANN`, and (nested) tuples of those
    (the ``(model, decoder)`` pairs the autoencoder losses train).
    """
    from ..models.ann import MolANN, SequentialNN, create_sequential_nn

    if k < 2:
        raise ValueError("an ensemble needs at least 2 members")

    def reinit(m, key):
        if isinstance(m, (tuple, list)):
            keys = jax.random.split(key, len(m))
            return tuple(reinit(p, kk) for p, kk in zip(m, keys))
        if isinstance(m, MolANN):
            return MolANN(m.preprocessing_layer, reinit(m.ann_layers, key))
        if isinstance(m, SequentialNN):
            dtype = m.params[0][0].dtype
            return create_sequential_nn(
                m.layer_dims, m.activation, key=key, dtype=dtype
            )
        raise TypeError(
            f"cannot reinitialize {type(m).__name__}: expected MolANN, "
            "SequentialNN, or a tuple of those"
        )

    base = jax.random.PRNGKey(seed)
    return [reinit(model, kk) for kk in jax.random.split(base, k)]


def _batch_length(batch) -> Any:
    return jax.tree_util.tree_leaves(batch)[0].shape[0]


def make_ensemble_train_step(loss_fn, optimizer, mesh=None, *,
                             batch_mode="shared", donate=False):
    """Build one jitted step updating ALL members at once.

    ``step(models, opt_states, batch) -> (models, opt_states, losses[K])``
    (with ``batch_mode="bagging"``, ``step(models, opt_states, batch, key)``).

    batch_mode:
      - ``"shared"``  — every member sees the same batch (members differ
        only through their init).
      - ``"member"``  — batch leaves carry a leading member axis
        ``[K, l, ...]``; each member trains on its own slice.
      - ``"bagging"`` — each member trains on a bootstrap resample (with
        replacement) of the shared batch, drawn inside the compiled step
        from ``key``; with a mesh, resampling is stratified within each
        device's shard (a valid bootstrap — no cross-device gather).

    With ``mesh``, the frame axis of the batch shards over the data axis
    (models/opt-states replicate) and per-member gradients ``pmean`` over
    ICI before the update — the ensemble analog of
    :func:`molann_tpu.train.loop.make_train_step`.
    """
    if batch_mode not in ("shared", "member", "bagging"):
        raise ValueError(f"unknown batch_mode {batch_mode!r}")

    def member_step(model, opt_state, batch, in_mesh):
        loss, grads = jax.value_and_grad(loss_fn)(model, batch)
        if in_mesh:
            loss = jax.lax.pmean(loss, DATA_AXIS)
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(g, DATA_AXIS), grads
            )
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss

    def make_core(in_mesh):
        if batch_mode == "bagging":
            def core(models, opt_states, batch, key):
                k = jax.tree_util.tree_leaves(models)[0].shape[0]
                l = _batch_length(batch)
                keys = jax.random.split(key, k)

                def member(model, opt_state, mkey):
                    idx = jax.random.randint(mkey, (l,), 0, l)
                    mb = jax.tree_util.tree_map(lambda a: a[idx], batch)
                    return member_step(model, opt_state, mb, in_mesh)

                return jax.vmap(member)(models, opt_states, keys)
        else:
            batch_axis = 0 if batch_mode == "member" else None

            def core(models, opt_states, batch):
                return jax.vmap(
                    lambda m, s, b: member_step(m, s, b, in_mesh),
                    in_axes=(0, 0, batch_axis),
                )(models, opt_states, batch)
        return core

    donate_argnums = (0, 1) if donate else ()
    if mesh is None:
        return jax.jit(make_core(False), donate_argnums=donate_argnums)

    # Explicit SPMD (shard_map): frames shard, members/params replicate,
    # per-member grads pmean over ICI inside the step.
    from jax.sharding import PartitionSpec as P

    frame_spec = P(None, DATA_AXIS) if batch_mode == "member" else P(DATA_AXIS)
    in_specs = [P(), P(), frame_spec]
    if batch_mode == "bagging":
        in_specs.append(P())
    mapped = jax.shard_map(
        make_core(True),
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=donate_argnums)


@dataclass
class EnsembleResult:
    models: Any          # stacked ensemble pytree, leaves [K, ...]
    losses: list         # per step: list of K per-member losses


def fit_ensemble(models, loss_fn, data_iter, *, optimizer=None, mesh=None,
                 num_steps=None, mask=None, log_every=0, bagging=False,
                 seed=0):
    """Train a committee of models jointly (one compiled step for all K).

    ``models``: a list of K structurally-identical models (e.g. same
    architecture, different init keys) or an already-stacked ensemble.
    Non-trainable leaves (alignment ``ref_x`` buffers) are frozen exactly
    as in :func:`molann_tpu.train.loop.fit`. With ``bagging=True`` each
    member sees an independent bootstrap resample of every batch, which
    decorrelates members beyond their init — the standard deep-ensemble
    recipe for usable disagreement estimates.

    Returns :class:`EnsembleResult` (stacked models + per-member loss
    trace). Extract members with :func:`unstack_model`; query uncertainty
    with :func:`committee`.
    """
    if isinstance(models, (list, tuple)):
        stacked = stack_models(list(models))
    else:
        stacked = models
    if optimizer is None:
        optimizer = optax.adam(1e-3)
    if mask is None:
        mask = trainable_mask(stacked)
    optimizer = masked_optimizer(optimizer, mask)
    opt_states = jax.vmap(optimizer.init)(stacked)

    step = make_ensemble_train_step(
        loss_fn, optimizer, mesh,
        batch_mode="bagging" if bagging else "shared",
    )
    key = jax.random.PRNGKey(seed)

    if mesh is not None:
        from ..parallel.data_parallel import shard_batch

    losses = []
    it = iter(data_iter)
    i = 0
    while num_steps is None or i < num_steps:
        batch = next(it, None)
        if batch is None:
            break
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        if bagging:
            key, sub = jax.random.split(key)
            stacked, opt_states, loss = step(stacked, opt_states, batch, sub)
        else:
            stacked, opt_states, loss = step(stacked, opt_states, batch)
        losses.append(loss)
        i += 1
        if log_every and i % log_every == 0:
            import numpy as np

            print(f"step {i}: loss={np.asarray(loss).mean():.6g} "
                  f"(committee mean)")
    losses = [[float(v) for v in l] for l in losses]
    return EnsembleResult(models=stacked, losses=losses)
