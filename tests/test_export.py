"""Export round-trip tests (SURVEY.md §4d): checkpoint + StableHLO."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molann_tpu.io import (
    export_stablehlo,
    load_model,
    load_stablehlo,
    save_model,
)
from molann_tpu.systems import alanine_model


@pytest.fixture(scope="module")
def model_and_frames():
    model, u = alanine_model()
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        u.atoms.positions[None]
        + 0.05 * rng.normal(size=(8, 22, 3)).astype(np.float32)
    )
    return model, x


def test_checkpoint_roundtrip(tmp_path, model_and_frames):
    model, x = model_and_frames
    path = save_model(tmp_path / "model.npz", model)
    loaded = load_model(path)
    np.testing.assert_allclose(
        np.asarray(loaded(x)), np.asarray(model(x)), atol=1e-7
    )
    # API survives the round trip
    assert loaded.get_preprocessing_layer().output_dimension() == 38
    flayer = loaded.preprocessing_layer.feature_layer
    assert [f.get_name() for f in flayer.feature_list] == [
        "p1", "d1", "d2", "b1", "b2", "a1", "a2",
    ]
    np.testing.assert_array_equal(
        flayer.get_feature(1).get_atom_indices(), [5, 7, 9, 15]
    )
    df = flayer.get_feature_info()
    assert len(df) == 7


def test_checkpoint_no_topology_needed(tmp_path, model_and_frames):
    """Loading must not need a Universe/PDB (TorchScript parity property)."""
    model, x = model_and_frames
    path = save_model(tmp_path / "model.npz", model)
    loaded = load_model(path)
    # grads still flow through the loaded model
    g = jax.grad(lambda v: jnp.sum(loaded(v)))(x)
    assert bool(jnp.isfinite(g).all())
    # and it is still a pytree usable under jit
    y = jax.jit(lambda m, v: m(v))(loaded, x)
    assert y.shape == (8, 3)


def test_checkpoint_sublayers(tmp_path, model_and_frames):
    model, x = model_and_frames
    # FeatureLayer and PreprocessingANN are independently saveable
    pp = model.get_preprocessing_layer()
    path = save_model(tmp_path / "pp.npz", pp)
    loaded = load_model(path)
    np.testing.assert_allclose(
        np.asarray(loaded(x)), np.asarray(pp(x)), atol=1e-7
    )


def test_stablehlo_roundtrip(tmp_path, model_and_frames):
    model, x = model_and_frames
    blob = export_stablehlo(model, 22, tmp_path / "model.stablehlo")
    fn = load_stablehlo(tmp_path / "model.stablehlo")
    np.testing.assert_allclose(
        np.asarray(fn(np.asarray(x))), np.asarray(model(x)), atol=1e-6
    )
    # batch-polymorphic: a different batch size works on the same artifact
    x2 = np.asarray(x)[:3]
    assert np.asarray(fn(x2)).shape == (3, 3)


def test_stablehlo_with_gradient(tmp_path, model_and_frames):
    model, x = model_and_frames
    blob = export_stablehlo(model, 22, with_gradient=True)
    fn = load_stablehlo(blob)
    out, grad = fn(np.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(model(x)), atol=1e-6
    )
    g_ref = jax.grad(lambda v: jnp.sum(model(v)))(x)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g_ref), atol=1e-5)


def test_stablehlo_raw_mlir(tmp_path, model_and_frames):
    """raw_mlir emits bare StableHLO bytecode (PJRT-compilable, see
    native/serve_pjrt.cpp); requires a fixed batch size."""
    import pytest

    model, x = model_and_frames
    blob = export_stablehlo(model, 22, tmp_path / "m.mlir.bc",
                            batch_size=16, raw_mlir=True)
    assert blob[:4] == b"ML\xefR"  # MLIR bytecode magic — no jax framing
    assert (tmp_path / "m.mlir.bc").read_bytes() == blob
    with pytest.raises(ValueError, match="batch_size"):
        export_stablehlo(model, 22, raw_mlir=True)


def test_stablehlo_fused_kernel_artifact(tmp_path, model_and_frames):
    """fused=True bakes the Mosaic serving kernel into the artifact
    (cross-lowered for TPU from this CPU process — lowering is host-side).
    The artifact is TPU-only; here we check its structure."""
    model, _ = model_and_frames
    blob = export_stablehlo(model, 22, tmp_path / "f.mlir.bc",
                            batch_size=512, raw_mlir=True,
                            with_gradient=True, fused=True)
    assert blob[:4] == b"ML\xefR"
    assert b"tpu_custom_call" in blob  # the embedded Mosaic kernel


def test_stablehlo_fused_blocked_artifact(tmp_path):
    """fused=True on a 300-atom system exports the BLOCKED Mosaic kernel
    (auto-sized tiles; a forced unrolled-size tile would overflow VMEM)."""
    from molann_tpu.systems import peptide_model

    model, u = peptide_model(60)
    blob = export_stablehlo(model, len(u.atoms), batch_size=512,
                            raw_mlir=True, with_gradient=True, fused=True)
    assert blob[:4] == b"ML\xefR"
    assert b"tpu_custom_call" in blob


def test_stablehlo_fused_chunked_artifact(tmp_path):
    """fused=True on a condensed-phase model (chunked coordination: the
    HBM-streamed DMA kernel) cross-lowers from this CPU process; verified
    executing on real hardware by scripts/tpu_validation.py evidence and
    the r03 probe (artifact parity 2.4e-4/4.0e-4 vs the in-Python model
    at the standardization-amplified bound)."""
    from molann_tpu.ops.fused_blocked import blocked_layout
    from molann_tpu.systems import lj_fluid_model

    model, u, _ = lj_fluid_model(3)
    lay = blocked_layout(
        model.preprocessing_layer.feature_layer._spec, None)
    # force the chunked path even at this small test size
    import molann_tpu.ops.fused_blocked as fb

    old = fb._COORD_RESIDENT_MAX
    fb._COORD_RESIDENT_MAX = 64
    fb.blocked_layout.cache_clear()
    try:
        lay = blocked_layout(
            model.preprocessing_layer.feature_layer._spec, None)
        assert lay.mc > 0
        blob = export_stablehlo(model, len(u.atoms), batch_size=256,
                                raw_mlir=True, with_gradient=True,
                                fused=True)
        assert blob[:4] == b"ML\xefR"
        assert b"tpu_custom_call" in blob
    finally:
        fb._COORD_RESIDENT_MAX = old
        fb.blocked_layout.cache_clear()


def test_read_bundle_truncated_entry_header():
    """A bundle cut off inside an entry header raises the module's own
    truncation ValueError, not a raw struct.error (mirrors the bounds
    check in native/serve_pjrt.cpp's load_artifacts)."""
    import struct

    from molann_tpu.io.export import BUNDLE_MAGIC, read_bundle

    raw = BUNDLE_MAGIC + struct.pack("<I", 1) + b"\x01\x02"
    with pytest.raises(ValueError, match="truncated artifact bundle"):
        read_bundle(raw)
