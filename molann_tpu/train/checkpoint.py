"""Training checkpoint/resume (SURVEY.md §5.4).

The reference has no training loop, hence no checkpoint subsystem; its only
persistence is the exported artifact. Here full training state — model,
optimizer state, step counter — saves to a single ``.npz`` and resumes
exactly. Model structure round-trips through
:mod:`molann_tpu.io.serialize`; optimizer state (an arbitrary optax pytree)
round-trips leaf-wise against a freshly ``optimizer.init``-ed template, so
any optax transformation works without bespoke serializers.

Multi-host note: training is synchronous SPMD and fails fast on worker loss
(default JAX behavior — no elasticity, by design); recovery = restart from
the last checkpoint, which this module makes one call.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from ..io.serialize import load_model, save_model

__all__ = ["save_training_state", "load_training_state", "latest_checkpoint"]


def save_training_state(directory, model, opt_state, step: int):
    """Write ``<directory>/ckpt_<step>.npz`` (+ model beside it).

    Saves are atomic: both files are written to temp names and renamed
    into place, opt-state first and the model file (the marker
    :func:`latest_checkpoint` keys on) last — a crash mid-save can never
    leave a newest checkpoint that then fails to load.
    """
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt_{step:010d}")
    leaves = jax.tree_util.tree_leaves(opt_state)
    arrays = {f"opt_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    meta = json.dumps({
        "step": int(step),
        "n_opt_leaves": len(leaves),
        # per-leaf shape/dtype record: verified on restore so a changed
        # optimizer with a coincidentally equal leaf count cannot silently
        # restore garbage
        "opt_leaf_shapes": [list(np.shape(a)) for a in arrays.values()],
        "opt_leaf_dtypes": [str(a.dtype) for a in arrays.values()],
    })
    np.savez(
        path + ".opt.npz.tmp",
        __meta__=np.frombuffer(meta.encode(), dtype=np.uint8),
        **arrays,
    )
    # np.savez appends .npz to names without it — write with .tmp suffix
    # via a file handle instead to keep the exact temp name
    save_model(path + ".model.npz.tmp.npz", model)
    os.replace(path + ".opt.npz.tmp.npz", path + ".opt.npz")
    os.replace(path + ".model.npz.tmp.npz", path + ".model.npz")
    return path


def latest_checkpoint(directory):
    """Path prefix of the newest COMPLETE checkpoint in ``directory``
    (both .model.npz and .opt.npz present), or None."""
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("ckpt_") and name.endswith(".model.npz"):
            steps.append(int(name[len("ckpt_"):-len(".model.npz")]))
    for step in sorted(steps, reverse=True):
        prefix = os.path.join(directory, f"ckpt_{step:010d}")
        if os.path.exists(prefix + ".opt.npz"):
            return prefix
    return None


def load_training_state(path_prefix, optimizer):
    """Restore ``(model, opt_state, step)`` from a checkpoint prefix.

    ``optimizer`` must be the same optax transformation used in training —
    its ``init(model)`` provides the pytree template that the saved leaves
    are poured back into.
    """
    model = load_model(path_prefix + ".model.npz")
    with np.load(path_prefix + ".opt.npz") as data:
        meta = json.loads(bytes(data["__meta__"].tobytes()).decode())
        leaves = [data[f"opt_{i}"] for i in range(meta["n_opt_leaves"])]
    template = optimizer.init(model)
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"optimizer state mismatch: checkpoint has {len(leaves)} leaves, "
            f"optimizer.init produced {len(t_leaves)} — was the optimizer "
            "configuration changed?"
        )
    # Leaf-wise shape verification: equal leaf COUNT is not enough — a
    # different optimizer can flatten to the same number of leaves and
    # would otherwise restore silently-reshaped garbage.
    for i, (l, t) in enumerate(zip(leaves, t_leaves)):
        if tuple(np.shape(l)) != tuple(np.shape(t)):
            raise ValueError(
                f"optimizer state mismatch at leaf {i}: checkpoint shape "
                f"{tuple(np.shape(l))} vs optimizer.init shape "
                f"{tuple(np.shape(t))} — was the optimizer configuration "
                "changed?"
            )
    restored = [
        np.asarray(l).astype(t.dtype) for l, t in zip(leaves, t_leaves)
    ]
    opt_state = jax.tree_util.tree_unflatten(treedef, restored)
    return model, opt_state, meta["step"]
