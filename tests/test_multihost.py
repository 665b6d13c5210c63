"""Multi-host (DCN) path validated for real: two coordinated processes.

Each subprocess gets 4 virtual CPU devices; jax.distributed forms one
8-device global runtime (collectives over Gloo — the CPU stand-in for
DCN). The REAL training step (make_train_step over the global mesh, batch
assembled with global_batch) must reproduce the single-process 8-device
result exactly. This is the executable counterpart of ROADMAP's
"multi-host DCN run" gap: same code path a TPU pod slice uses, minus the
hardware.

These tests spawn subprocesses (the conftest's in-process JAX is already
initialized single-process) — budget ~1 min.
"""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "@REPO@")

    from molann_tpu.parallel.multihost import (
        initialize_multihost, global_batch, process_local_slice)
    initialize_multihost(coordinator_address="@COORD@",
                         num_processes=2, process_id=int(sys.argv[1]))

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh
    from molann_tpu.systems import alanine_model
    from molann_tpu.train import make_train_step, mse_loss, trainable_mask

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    assert len(jax.devices()) == 8 and jax.local_device_count() == 4

    model, u = alanine_model()
    rng = np.random.default_rng(0)  # SAME global batch on every process
    xs = (u.atoms.positions[None]
          + 0.05 * rng.normal(size=(64, 22, 3))).astype(np.float32)
    ys = rng.normal(size=(64, 3)).astype(np.float32)

    opt = optax.masked(optax.adam(1e-2), trainable_mask(model))
    step = make_train_step(mse_loss, opt, mesh=mesh)
    opt_state = opt.init(model)

    lo, hi = process_local_slice(64)
    losses = []
    for _ in range(5):
        batch = global_batch((jnp.asarray(xs[lo:hi]),
                              jnp.asarray(ys[lo:hi])), mesh)
        model, opt_state, loss = step(model, opt_state, batch)
        losses.append(float(loss))

    leaves = jax.tree_util.tree_leaves(model)
    checksum = float(sum(jnp.sum(jnp.abs(l)) for l in leaves))
    print("RESULT", int(sys.argv[1]),
          " ".join(f"{v:.9e}" for v in losses), f"{checksum:.9e}",
          flush=True)
""")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("n", [2])
def test_two_process_training_matches_single_process(n):
    coord = f"127.0.0.1:{_free_port()}"
    script = WORKER.replace("@REPO@", str(REPO)).replace("@COORD@", coord)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(n)
    ]
    results = {}
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"multi-host worker {i} timed out")
        text = out.decode()
        assert p.returncode == 0, f"worker {i} failed:\n{text[-2000:]}"
        for line in text.splitlines():
            if line.startswith("RESULT"):
                parts = line.split()
                results[int(parts[1])] = [float(v) for v in parts[2:]]
    assert set(results) == set(range(n))
    # both processes observe the identical replicated result
    np.testing.assert_array_equal(results[0], results[1])

    # and it matches the single-process 8-device run of the same problem
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from molann_tpu.parallel import shard_batch
    from molann_tpu.systems import alanine_model
    from molann_tpu.train import make_train_step, mse_loss, trainable_mask

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    model, u = alanine_model()
    rng = np.random.default_rng(0)
    xs = (u.atoms.positions[None]
          + 0.05 * rng.normal(size=(64, 22, 3))).astype(np.float32)
    ys = rng.normal(size=(64, 3)).astype(np.float32)
    opt = optax.masked(optax.adam(1e-2), trainable_mask(model))
    step = make_train_step(mse_loss, opt, mesh=mesh)
    opt_state = opt.init(model)
    losses = []
    for _ in range(5):
        batch = shard_batch((jnp.asarray(xs), jnp.asarray(ys)), mesh)
        model, opt_state, loss = step(model, opt_state, batch)
        losses.append(float(loss))
    leaves = jax.tree_util.tree_leaves(model)
    checksum = float(sum(jnp.sum(jnp.abs(l)) for l in leaves))

    got = results[0]
    np.testing.assert_allclose(got[:5], losses, rtol=0, atol=1e-6)
    np.testing.assert_allclose(got[5], checksum, rtol=1e-6)


def test_global_batch_single_process_degrades_to_shard_batch():
    import jax
    import jax.numpy as jnp

    from jax.sharding import Mesh

    from molann_tpu.parallel import shard_batch
    from molann_tpu.parallel.multihost import global_batch

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    x = jnp.arange(64, dtype=jnp.float32).reshape(16, 4)
    a = global_batch(x, mesh)
    b = shard_batch(x, mesh)
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


WORKER_SERVE = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "@REPO@")

    from molann_tpu.parallel.multihost import (
        initialize_multihost, global_batch, process_local_slice)
    initialize_multihost(coordinator_address="@COORD@",
                         num_processes=2, process_id=int(sys.argv[1]))

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh
    from molann_tpu.serve import make_serving_fn
    from molann_tpu.systems import alanine_model

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    model, u = alanine_model()
    rng = np.random.default_rng(0)  # same global trajectory everywhere
    xs = (u.atoms.positions[None]
          + 0.05 * rng.normal(size=(64, 22, 3))).astype(np.float32)

    fn = make_serving_fn(model, mesh, forces=True)
    lo, hi = process_local_slice(64)
    y, g = fn(model, global_batch(jnp.asarray(xs[lo:hi]), mesh))
    y_full = multihost_utils.process_allgather(y, tiled=True)
    g_full = multihost_utils.process_allgather(g, tiled=True)

    # every process checks the reassembled global result against a plain
    # single-jit evaluation of the same model
    y_ref = np.asarray(model(jnp.asarray(xs)))
    g_ref = np.asarray(jax.grad(lambda v: jnp.sum(model(v)))(jnp.asarray(xs)))
    assert y_full.shape == y_ref.shape and g_full.shape == g_ref.shape
    assert np.allclose(y_full, y_ref, atol=5e-6), np.abs(y_full - y_ref).max()
    assert np.allclose(g_full, g_ref, atol=5e-5), np.abs(g_full - g_ref).max()
    print("RESULT", int(sys.argv[1]),
          f"{float(np.abs(y_full).sum()):.9e}",
          f"{float(np.abs(g_full).sum()):.9e}", flush=True)
""")


def test_two_process_serving_matches_single_jit():
    """The mesh SERVING path (make_serving_fn) over a 2-process DCN
    runtime: each process feeds its local frame slice, the reassembled
    global CVs + gradients match a plain single-jit evaluation."""
    coord = f"127.0.0.1:{_free_port()}"
    script = WORKER_SERVE.replace("@REPO@", str(REPO)).replace(
        "@COORD@", coord)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    results = {}
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"serving worker {i} timed out")
        text = out.decode()
        assert p.returncode == 0, f"worker {i} failed:\n{text[-2000:]}"
        for line in text.splitlines():
            if line.startswith("RESULT"):
                parts = line.split()
                results[int(parts[1])] = parts[2:]
    assert set(results) == {0, 1}
    assert results[0] == results[1]  # identical replicated checksums
