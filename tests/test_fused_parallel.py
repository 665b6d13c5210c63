"""Fused kernel under shard_map on the 8-device CPU mesh (interpret mode).

Validates the production multi-chip configuration structurally: the Pallas
kernel runs per-shard inside shard_map, gradients pmean-reduce over the
data axis, results match the single-device jnp path exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from molann_tpu.parallel import data_mesh, shard_batch
from molann_tpu.systems import alanine_model
from molann_tpu.train import fused_mse_loss, mse_loss


@pytest.mark.slow
def test_shard_map_fused_loss_and_grads_match():
    model, u = alanine_model()
    rng = np.random.default_rng(0)
    l = 128  # 16 frames per device
    x = jnp.asarray(
        u.atoms.positions.reshape(1, 66)
        + 0.05 * rng.normal(size=(l, 66)).astype(np.float32)
    )
    y = jnp.asarray(rng.normal(size=(l, 3)).astype(np.float32))
    mesh = data_mesh(8)

    def per_shard(m, batch):
        return fused_mse_loss(m, batch, interpret=True)

    spmd_loss = jax.jit(
        jax.shard_map(
            lambda m, b: jax.lax.pmean(per_shard(m, b), "data"),
            mesh=mesh, in_specs=(P(), P("data")), out_specs=P(),
            check_vma=False,
        )
    )
    loss_dp = float(spmd_loss(model, shard_batch((x, y), mesh)))
    loss_1d = float(mse_loss(model, (x.reshape(l, 22, 3), y)))
    assert abs(loss_dp - loss_1d) < 1e-5

    spmd_grads = jax.jit(
        jax.shard_map(
            lambda m, b: jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(g, "data"),
                jax.grad(per_shard)(m, b),
            ),
            mesh=mesh, in_specs=(P(), P("data")), out_specs=P(),
            check_vma=False,
        )
    )
    g_dp = spmd_grads(model, shard_batch((x, y), mesh))
    g_1d = jax.grad(mse_loss)(model, (x.reshape(l, 22, 3), y))
    for a, b in zip(
        jax.tree_util.tree_leaves(g_dp), jax.tree_util.tree_leaves(g_1d)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_make_fused_train_step_on_mesh_matches_single_device():
    """The single-kernel training step under shard_map (the production
    multi-chip configuration of make_fused_train_step) reproduces the
    plain single-device XLA step."""
    import optax

    from molann_tpu.train import (
        make_fused_train_step,
        make_train_step,
        masked_optimizer,
        trainable_mask,
    )

    model, u = alanine_model()
    rng = np.random.default_rng(3)
    l = 128
    x3 = jnp.asarray(
        u.atoms.positions[None]
        + 0.05 * rng.normal(size=(l, 22, 3)).astype(np.float32)
    )
    y = jnp.asarray(rng.normal(size=(l, 3)).astype(np.float32))
    opt = masked_optimizer(optax.adam(1e-2), trainable_mask(model))

    mesh = data_mesh(8)
    step_dp = make_fused_train_step(
        opt, mesh, tile=16, interpret=True, mode="unrolled"
    )
    step_1d = make_train_step(mse_loss, opt)

    m_dp, s_dp = model, opt.init(model)
    m_1d, s_1d = model, opt.init(model)
    batch = shard_batch((x3.reshape(l, 66), y), mesh)
    for _ in range(2):
        m_dp, s_dp, loss_dp = step_dp(m_dp, s_dp, batch)
        m_1d, s_1d, loss_1d = step_1d(m_1d, s_1d, (x3, y))
    assert abs(float(loss_dp) - float(loss_1d)) < 1e-5
    for a, b in zip(
        jax.tree_util.tree_leaves(m_dp), jax.tree_util.tree_leaves(m_1d)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_shard_map_chunked_coordination_cv_forces():
    """The HBM-streamed chunked-coordination kernel under data-parallel
    shard_map: per-device CV values + forces over a sharded frame batch
    reassemble to the single-device result (the condensed-phase serving
    path at pod scale)."""
    from molann_tpu.ops.fused import fused_cv_forces, model_select_mode
    from molann_tpu.ops.fused_blocked import blocked_layout
    from molann_tpu.systems import lj_fluid_model

    model, u, box = lj_fluid_model(4)  # 64 atoms, 2 x 2016 pairs
    lay = blocked_layout(
        model.preprocessing_layer.feature_layer._spec, None)
    assert lay.mc > 0 and model_select_mode(model) == "blocked"
    rng = np.random.default_rng(3)
    l = 32  # 4 frames per device
    x = jnp.asarray(
        (u.atoms.positions[None]
         + 0.2 * rng.normal(size=(l, 64, 3))).astype(np.float32)
    )
    mesh = data_mesh(8)

    def per_shard(m, xb):
        return fused_cv_forces(m, xb, tile=4, interpret=True,
                               mode="blocked")

    spmd = jax.jit(
        jax.shard_map(
            per_shard, mesh=mesh,
            in_specs=(P(), P("data")), out_specs=(P("data"), P("data")),
            check_vma=False,
        )
    )
    y_dp, g_dp = spmd(model, shard_batch(x, mesh))
    y_1d = model(x)
    g_1d = jax.grad(lambda xx: jnp.sum(model(xx)))(x)
    np.testing.assert_allclose(np.asarray(y_dp), np.asarray(y_1d),
                               rtol=1e-5, atol=1e-5)
    # thousands-of-pairs switching sums: accumulation-order spread
    scale = float(jnp.abs(g_1d).max())
    np.testing.assert_allclose(np.asarray(g_dp).reshape(g_1d.shape),
                               np.asarray(g_1d), atol=5e-4 * scale)
