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
