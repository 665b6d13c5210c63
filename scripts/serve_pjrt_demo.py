"""End-to-end demo of the no-Python serving container (native/serve_pjrt).

Exports a raw StableHLO artifact, writes a test trajectory, runs the C++
PJRT consumer against a PJRT plugin, and checks parity vs the in-Python
model. This is the TPU-native analogue of the reference's TorchScript
serving contract (reference README.rst:51 — engines load the .pt from
C++ with LibTorch): here the engine needs only pjrt_c_api.h + dlopen.

On a real TPU host:   python scripts/serve_pjrt_demo.py /path/to/libtpu.so
In this environment:  python scripts/serve_pjrt_demo.py
(defaults to the local tunnel plugin with its handshake options).

The binary builds with `make -C native serve`. The JAX export runs in a
child process that exits before the C++ binary starts — the tunnel
grants the device to one process at a time.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import uuid

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BINARY = os.path.join(REPO, "molann_tpu", "io", "_native", "serve_pjrt")

# this environment's tunnel plugin + its client-create handshake; a real
# TPU host needs none of this (libtpu.so with no -o options)
AXON_PLUGIN = "/opt/axon/libaxon_pjrt.so"
AXON_ENV = {
    "AXON_COMPAT_VERSION": "49",
    "AXON_LOOPBACK_RELAY": "1",
    "AXON_POOL_SVC_OVERRIDE": "127.0.0.1",
    "TPU_ACCELERATOR_TYPE": "v5litepod-4",
    "TPU_SKIP_MDS_QUERY": "1",
    "TPU_TOPOLOGY": "1x1",
    "TPU_WORKER_HOSTNAMES": "localhost",
}
AXON_OPTS = [
    "remote_compile=1", "local_only=0", "priority=0",
    "topology=v5e:1x1x1", "n_slices=1", "rank=4294967295",
]

EXPORT_CHILD = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")  # lowering is host-side; the
# fused export cross-lowers for platforms=('tpu',) with no device at all
import numpy as np
sys.path.insert(0, {repo!r})
from molann_tpu.io import export_stablehlo
from molann_tpu.systems import alanine_model
import jax.numpy as jnp
model, u = alanine_model()
rng = np.random.default_rng(5)
frames = (u.atoms.positions[None]
          + 0.05 * rng.normal(size=(600, 22, 3))).astype(np.float32)
export_stablehlo(model, 22, path={art!r}, batch_size={batch},
                 raw_mlir=True, with_gradient=True, platforms=("tpu",))
export_stablehlo(model, 22, path={fart!r}, batch_size={batch},
                 raw_mlir=True, with_gradient=True, fused=True)
np.save({traj!r}, frames)
xj = jnp.asarray(frames)
np.save({ref!r}, np.asarray(model(xj)))
np.save({gref!r}, np.asarray(
    jax.grad(lambda v: jnp.sum(model(v)))(xj)))
print("exported", {art!r}, "and fused", {fart!r})
"""


def main():
    plugin = sys.argv[1] if len(sys.argv) > 1 else AXON_PLUGIN
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    if not os.path.exists(BINARY):
        sys.exit(f"{BINARY} missing — run: make -C native serve")

    with tempfile.TemporaryDirectory() as d:
        art = os.path.join(d, "model.mlir.bc")
        fart = os.path.join(d, "fused.mlir.bc")
        traj = os.path.join(d, "traj.npy")
        ref_p = os.path.join(d, "ref.npy")
        gref_p = os.path.join(d, "gref.npy")

        # phase 1 (CPU child — no device involvement): export + refs
        subprocess.run(
            [sys.executable, "-c",
             EXPORT_CHILD.format(repo=REPO, art=art, fart=fart, traj=traj,
                                 ref=ref_p, gref=gref_p, batch=batch)],
            check=True,
        )

        env = dict(os.environ)
        extra = []
        if plugin == AXON_PLUGIN:
            env.update(AXON_ENV)
            extra = sum((["-o", o] for o in AXON_OPTS), [])

        ref = np.load(ref_p)
        gref = np.load(gref_p)

        # phase 2: serve BOTH artifacts (XLA-lowered and fused-kernel)
        # from the no-Python consumer; tolerances are cross-platform f32
        # (refs computed on CPU, execution on TPU)
        for label, a in (("xla", art), ("fused-kernel", fart)):
            out = os.path.join(d, f"out_{label.split('-')[0]}.npy")
            cmd = [BINARY, plugin, a, traj, out, str(batch)] + extra
            if plugin == AXON_PLUGIN:
                cmd += ["-o", f"session_id=serve-demo-{uuid.uuid4()}"]
            print("+", " ".join(cmd))
            subprocess.run(cmd, check=True, env=env)
            got = np.load(out)
            err = np.abs(got - ref).max()
            g = np.load(out[: -len(".npy")] + ".grad.npy").reshape(
                -1, 22, 3)
            gerr = np.abs(g - gref).max() / np.abs(gref).max()
            print(f"[{label}] CV maxerr {err:.3g}, grad rel {gerr:.3g}")
            assert got.shape == ref.shape and err < 1e-4, (label, err)
            assert g.shape == gref.shape and gerr < 5e-4, (label, gerr)
        print("SERVE_PJRT DEMO OK")


if __name__ == "__main__":
    main()
