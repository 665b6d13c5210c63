"""DCD trajectory support: native reader, pure-python fallback, batch
iterator integration, and the `convert` CLI (round-1 ROADMAP #4)."""

import numpy as np
import pytest

from molann_tpu.io.dcd import read_dcd, write_dcd


@pytest.fixture()
def frames(rng):
    return (10.0 * rng.normal(size=(17, 9, 3))).astype(np.float32)


def test_python_roundtrip(tmp_path, frames):
    path = tmp_path / "t.dcd"
    write_dcd(path, frames)
    back, cell = read_dcd(path)
    np.testing.assert_array_equal(back, frames)
    assert cell is None


def test_python_roundtrip_with_cell(tmp_path, frames, rng):
    cell = np.abs(rng.normal(size=(17, 6)))
    path = tmp_path / "t.dcd"
    write_dcd(path, frames, cell=cell)
    back, cell2 = read_dcd(path)
    np.testing.assert_array_equal(back, frames)
    np.testing.assert_allclose(cell2, cell)


def _native_loader(path):
    from molann_tpu.io import native_loader

    if not native_loader.available():
        pytest.skip("native loader unavailable (no compiler)")
    return native_loader.NativeTrajLoader(path)


@pytest.mark.parametrize("with_cell", [False, True])
def test_native_reads_dcd(tmp_path, frames, rng, with_cell):
    path = tmp_path / "t.dcd"
    cell = np.abs(rng.normal(size=(17, 6))) if with_cell else None
    write_dcd(path, frames, cell=cell)
    ldr = _native_loader(path)
    assert ldr.n_frames == 17 and ldr.n_atoms == 9
    idx = np.asarray([0, 3, 16, 7])
    out = ldr.read_batch(idx)
    expected = frames[idx].reshape(len(idx), 27)
    np.testing.assert_array_equal(out, expected)
    np.testing.assert_array_equal(
        ldr.read_range(5, 4), frames[5:9].reshape(4, 27)
    )
    ldr.prefetch(np.asarray([1, 2, 10_000]))  # out-of-range must be ignored


def test_native_rejects_fixed_atoms(tmp_path, frames):
    import struct

    path = tmp_path / "bad.dcd"
    write_dcd(path, frames)
    raw = bytearray(path.read_bytes())
    # icntrl[8] (NAMNF) lives at record payload offset 4 + 8*4 = 36,
    # i.e. file offset 4 (marker) + 36
    struct.pack_into("<i", raw, 4 + 36, 3)
    path.write_bytes(bytes(raw))
    from molann_tpu.io import native_loader

    if not native_loader.available():
        pytest.skip("native loader unavailable")
    with pytest.raises(OSError, match="fixed atoms"):
        native_loader.NativeTrajLoader(path)


def test_packed_iterator_over_dcd(tmp_path, frames):
    from molann_tpu.train.data import packed_batch_iterator

    path = tmp_path / "t.dcd"
    write_dcd(path, frames)
    for backend in ("auto", "numpy"):
        batches = list(packed_batch_iterator(
            path, 8, shuffle=False, epochs=1, drop_remainder=False,
            backend=backend,
        ))
        got = np.concatenate(batches)
        np.testing.assert_array_equal(got, frames.reshape(17, 27))


def test_convert_cli_dcd_to_npy(tmp_path, frames):
    from molann_tpu.cli import main

    src = tmp_path / "t.dcd"
    write_dcd(src, frames)
    out = tmp_path / "t.npy"
    assert main(["convert", str(src), str(out)]) == 0
    np.testing.assert_array_equal(np.load(out), frames)
    out_p = tmp_path / "tp.npy"
    assert main(["convert", str(src), str(out_p), "--packed"]) == 0
    np.testing.assert_array_equal(np.load(out_p), frames.reshape(17, 27))


def test_convert_cli_npy_to_dcd(tmp_path, frames):
    from molann_tpu.cli import main

    src = tmp_path / "t.npy"
    np.save(src, frames)
    out = tmp_path / "t.dcd"
    assert main(["convert", str(src), str(out)]) == 0
    back, _ = read_dcd(out)
    np.testing.assert_array_equal(back, frames)


def test_evaluate_cli_on_dcd(tmp_path, rng):
    """End-to-end: build a model, evaluate straight from a DCD file."""
    from molann_tpu.cli import main
    from molann_tpu.io import save_model
    from molann_tpu.systems import alanine_model, alanine_universe

    model, u = alanine_model()
    save_model(str(tmp_path / "m.npz"), model)
    frames = (
        u.atoms.positions[None]
        + 0.05 * rng.normal(size=(12, 22, 3))
    ).astype(np.float32)
    write_dcd(tmp_path / "t.dcd", frames)
    rc = main([
        "evaluate", str(tmp_path / "m.npz"), str(tmp_path / "t.dcd"),
        "--out", str(tmp_path / "y.npy"), "--batch-size", "8",
    ])
    assert rc == 0
    y = np.load(tmp_path / "y.npy")
    assert y.shape == (12, 3)
    import jax.numpy as jnp

    np.testing.assert_allclose(
        y, np.asarray(model(jnp.asarray(frames))), atol=1e-5
    )


def test_writer_zero_chunks_is_valid(tmp_path):
    """A DCDWriter closed before any append still writes the mandatory
    NATOM record (0 atoms, 0 frames) — structurally valid, readable."""
    from molann_tpu.io.dcd import DCDWriter

    path = tmp_path / "empty.dcd"
    with DCDWriter(path):
        pass
    back, cell = read_dcd(path)
    assert back.shape == (0, 0, 3)
    assert cell is None
