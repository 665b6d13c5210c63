"""Engine-consumable compiled artifacts: StableHLO via ``jax.export``.

The TPU-native analogue of the reference's TorchScript export (reference
README.rst:51: downstream MD/enhanced-sampling engines load the ``.pt``
from C++ with LibTorch, no Python needed). Here :func:`export_stablehlo`
serializes the model's forward (optionally with coordinate gradients — the
biasing-force evaluation) as a batch-polymorphic StableHLO module that any
PJRT runtime can load and run without this package, MDAnalysis, or the
topology front-end; parameters and the ``ref_x`` buffer are baked into the
module as constants, exactly like TorchScript bakes its buffers.
"""

from __future__ import annotations

import struct

import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = ["export_stablehlo", "export_bundle", "read_bundle",
           "load_stablehlo"]

#: Bundle container magic (native/serve_pjrt.cpp load_artifacts):
#: 8-byte magic, u32 LE count, then per entry u64 LE batch, u64 LE
#: nbytes, module bytes.
BUNDLE_MAGIC = b"MOLANNB1"

#: Optional trailing chunk-matrix section of a bundle: 8-byte magic,
#: u64 LE rows, u64 LE cols, rows*cols*2 bytes of bf16 row-major data.
#: Present iff the bundle's modules take ``(x, c_mat)`` — the
#: jit-boundary operand route that keeps condensed-phase pair tables
#: out of the compiled modules. Readers that predate it stop after the
#: entry list, so the section is backward-compatible.
CMAT_MAGIC = b"MOLANNCM"


def export_stablehlo(model, n_atoms, path=None, *, with_gradient=False,
                     batch_size=None, platforms=None, raw_mlir=False,
                     fused=False, tile=None, c_mat="auto"):
    """Serialize ``model``'s forward as a StableHLO artifact.

    :param model: any callable layer (MolANN, PreprocessingANN, ...)
    :param n_atoms: input atom count (the artifact's input is
        ``[l, n_atoms, 3]`` float32)
    :param path: optional file path; when given, bytes are written there
    :param with_gradient: also return ``∂(Σ out)/∂x`` (force evaluation) —
        the artifact then yields ``(out, grad)``
    :param batch_size: fix the frame-batch size; default is a symbolic
        dimension (batch-polymorphic artifact)
    :param platforms: lowering platforms (e.g. ``['tpu', 'cpu']``);
        default is the current backend (``fused=True``: ``('tpu',)``)
    :param raw_mlir: emit bare StableHLO module bytecode (directly
        compilable by any PJRT C-API runtime — see native/serve_pjrt.cpp)
        instead of the jax.export framing; requires ``batch_size``
    :param fused: bake the fused Pallas serving kernel into the artifact
        (the Mosaic kernel rides along as a serialized custom call) —
        full kernel speed from any TPU PJRT runtime, no Python. TPU-only
        artifact (it will not load on CPU); requires ``batch_size``.
        With ``with_gradient`` the outputs are the single-kernel
        ``fused_cv_forces`` pair (CVs, coordinate gradients). Lowering
        is host-side: exporting works from a CPU-only process.
    :param tile: fused-kernel frame tile (default 2048)
    :param c_mat: chunked-coordination handling for ``fused=True``.
        ``"auto"`` (default): when the model's blocked layout chunks a
        coordination pair table
        (:func:`molann_tpu.ops.fused.model_chunk_matrix`), the exported
        module takes TWO inputs ``(x [l, n, 3] f32, c_mat [mc, cc]
        bf16)`` instead of baking the (potentially multi-GB) table in
        as an HLO constant; callers then feed the matrix as the second
        argument (the bundle format carries it — see
        :func:`export_bundle`). Pass ``None`` to force single-input
        (inlined-constant) modules, or an explicit bf16 array.
        ``export_stablehlo`` returns only the module bytes; use
        :func:`molann_tpu.ops.fused.model_chunk_matrix` for the array.
    :returns: the serialized bytes
    """
    cmat_arr = None
    if fused:
        if batch_size is None:
            raise ValueError("fused=True requires a fixed batch_size")
        if platforms is None:
            platforms = ("tpu",)
        from ..ops.fused import (
            _extract_model,
            fused_cv_forces,
            fused_model_forward,
            model_chunk_matrix,
            select_mode,
        )

        spec_, _, _, _, _ = _extract_model(model, jnp.float32)
        blocked = select_mode(spec_, spec_.n_input_atoms) == "blocked"
        if blocked:
            # blocked kernels auto-size their (much smaller) tiles from
            # the VMEM model — forcing the unrolled default would OOM
            ftile = tile
            if isinstance(c_mat, str) and c_mat == "auto":
                cmat_arr = model_chunk_matrix(model)
            elif c_mat is not None:
                cmat_arr = jnp.asarray(c_mat, jnp.bfloat16)
        elif tile is None:
            # don't pad small serving batches up to the full default tile
            ftile = max(1024, min(2048, -(-batch_size // 1024) * 1024))
        else:
            ftile = tile

        if cmat_arr is not None:
            def fn(x, c):
                if with_gradient:
                    return fused_cv_forces(model, x, tile=ftile, c_mat=c)
                return fused_model_forward(model, x, tile=ftile, c_mat=c)
        else:
            def fn(x):
                if with_gradient:
                    return fused_cv_forces(model, x, tile=ftile)
                return fused_model_forward(model, x, tile=ftile)
    else:
        def fn(x):
            if with_gradient:
                out, grad = jax.value_and_grad(
                    lambda v: jnp.sum(model(v)))(x)
                return model(x), grad
            return model(x)

    if batch_size is None:
        (l,) = jax_export.symbolic_shape("l")
    else:
        l = batch_size
    x_spec = jax.ShapeDtypeStruct((l, n_atoms, 3), jnp.float32)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    if cmat_arr is not None:
        c_spec = jax.ShapeDtypeStruct(cmat_arr.shape, jnp.bfloat16)
        exported = jax_export.export(jax.jit(fn), **kwargs)(x_spec, c_spec)
    else:
        exported = jax_export.export(jax.jit(fn), **kwargs)(x_spec)
    if raw_mlir:
        # the bare StableHLO module bytecode — what PJRT_Client_Compile
        # (format "mlir") consumes directly, with no jax.export framing.
        # Engines pair this with native/serve_pjrt.cpp. Requires a fixed
        # batch_size: shape-polymorphic modules need a refinement pass no
        # bare PJRT runtime runs.
        if batch_size is None:
            raise ValueError(
                "raw_mlir requires a fixed batch_size (shape-polymorphic "
                "modules cannot be compiled by a bare PJRT runtime)"
            )
        blob = exported.mlir_module_serialized
    else:
        blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as fh:
            fh.write(blob)
    return blob


def export_bundle(model, n_atoms, path=None, *, batch_sizes=(4096, 1024),
                  with_gradient=False, platforms=None, fused=False,
                  tile=None):
    """Serialize a MULTI-BUCKET artifact: one fixed-batch raw StableHLO
    module per entry of ``batch_sizes``, in one file the C++ serving
    container consumes directly (native/serve_pjrt.cpp).

    A bare PJRT runtime cannot refine shape-polymorphic modules, so
    fixed batches are the price of no-Python serving; bundling several
    lets the container run the largest bucket that fits the remaining
    frames and pad only the final sub-smallest-bucket tail — arbitrary
    trajectory lengths at kernel speed (VERDICT r2 next #1 /
    ROADMAP #3).

    Format: ``b"MOLANNB1"``, u32 LE count, then per entry u64 LE batch,
    u64 LE byte count, module bytes. When ``fused=True`` and the model
    chunks a coordination pair table, every module takes ``(x, c_mat)``
    and the matrix rides a trailing ``b"MOLANNCM"`` section (u64 rows,
    u64 cols, bf16 row-major data) that the C++ container feeds back as
    the second execute argument — the table is uploaded to each device
    ONCE instead of being baked into every bucket's module. Returns the
    serialized bytes.
    """
    sizes = sorted({int(b) for b in batch_sizes}, reverse=True)
    if not sizes or sizes[-1] <= 0:
        raise ValueError(f"batch_sizes must be positive, got {batch_sizes}")
    cmat_arr = None
    if fused:
        from ..ops.fused import model_chunk_matrix, model_select_mode

        if model_select_mode(model) == "blocked":
            cmat_arr = model_chunk_matrix(model)
    entries = []
    for b in sizes:
        blob = export_stablehlo(
            model, n_atoms, with_gradient=with_gradient, batch_size=b,
            platforms=platforms, raw_mlir=True, fused=fused, tile=tile,
            c_mat=cmat_arr,
        )
        entries.append((b, blob))
    out = bytearray(BUNDLE_MAGIC)
    out += struct.pack("<I", len(entries))
    for b, blob in entries:
        out += struct.pack("<QQ", b, len(blob))
        out += blob
    if cmat_arr is not None:
        import numpy as np

        rows, cols = cmat_arr.shape
        out += CMAT_MAGIC
        out += struct.pack("<QQ", rows, cols)
        out += np.asarray(cmat_arr).view(np.uint16).astype("<u2").tobytes()
    out = bytes(out)
    if path is not None:
        with open(path, "wb") as fh:
            fh.write(out)
    return out


def read_bundle(path_or_bytes, *, with_cmat=False):
    """Parse a bundle: returns ``[(batch_size, module_bytes), ...]``
    (largest batch first) — the python-side mirror of the container's
    loader, used by tests and tooling. With ``with_cmat=True`` returns
    ``(entries, c_mat)`` where ``c_mat`` is the trailing chunk-matrix
    section as a bf16 numpy array (None when absent)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        raw = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as fh:
            raw = fh.read()
    if raw[:8] != BUNDLE_MAGIC:
        raise ValueError("not a molann_tpu artifact bundle")
    (count,) = struct.unpack_from("<I", raw, 8)
    off = 12
    out = []
    for _ in range(count):
        if off + 16 > len(raw):  # entry header itself cut off
            raise ValueError("truncated artifact bundle")
        b, n = struct.unpack_from("<QQ", raw, off)
        off += 16
        if off + n > len(raw):
            raise ValueError("truncated artifact bundle")
        out.append((int(b), raw[off:off + n]))
        off += n
    cmat = None
    if raw[off:off + 8] == CMAT_MAGIC:
        if off + 24 > len(raw):
            raise ValueError("truncated chunk-matrix section")
        rows, cols = struct.unpack_from("<QQ", raw, off + 8)
        off += 24
        n = rows * cols * 2
        if off + n > len(raw):
            raise ValueError("truncated chunk-matrix section")
        import numpy as np

        cmat = (np.frombuffer(raw, dtype="<u2", count=rows * cols,
                              offset=off)
                .reshape(rows, cols)
                .view(jnp.bfloat16))
    out = sorted(out, key=lambda e: -e[0])
    return (out, cmat) if with_cmat else out


def load_stablehlo(path_or_bytes):
    """Load a serialized artifact; returns a callable ``fn(x)``.

    (Engines without Python would instead hand the same bytes to any PJRT
    runtime; this helper is the in-Python convenience wrapper.)
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as fh:
            blob = fh.read()
    exported = jax_export.deserialize(blob)
    return exported.call
