"""Amber NetCDF trajectory codec: round-trips, scipy cross-validation
(an INDEPENDENT NetCDF-3 implementation — reader and writer cannot
share a correlated misreading of the format), reader/CLI integration,
and corrupt-input hardening. The reference has no trajectory IO at all
(SURVEY.md §2.3); .nc support exists because Amber users' frames arrive
this way."""

import numpy as np
import pytest

from molann_tpu.io.netcdf import (NetCDFReader, NetCDFWriter, read_netcdf,
                                  scan_netcdf_boxes, write_netcdf)

scipy_io = pytest.importorskip("scipy.io")


@pytest.fixture()
def frames(rng):
    return (10.0 * rng.normal(size=(11, 7, 3))).astype(np.float32)


@pytest.fixture()
def boxes(rng):
    # per-frame orthorhombic boxes (NPT-style fluctuating cell)
    diags = 20.0 + rng.uniform(size=(11, 3)).astype(np.float64)
    out = np.zeros((11, 3, 3), np.float32)
    out[:, 0, 0], out[:, 1, 1], out[:, 2, 2] = diags.T
    return out


def test_roundtrip(tmp_path, frames):
    path = tmp_path / "t.nc"
    write_netcdf(path, frames)
    back, times, box = read_netcdf(path)
    np.testing.assert_array_equal(back, frames)
    np.testing.assert_allclose(times, np.arange(11.0))
    assert box is None


def test_roundtrip_with_boxes(tmp_path, frames, boxes):
    path = tmp_path / "t.nc"
    write_netcdf(path, frames, box=boxes)
    back, _, box2 = read_netcdf(path)
    np.testing.assert_array_equal(back, frames)
    np.testing.assert_allclose(box2, boxes, atol=1e-5)
    np.testing.assert_allclose(scan_netcdf_boxes(path), boxes, atol=1e-5)


def test_triclinic_box_roundtrip(tmp_path, frames):
    # lower-triangular GROMACS-style triclinic box -> lengths/angles ->
    # back; dcd_cell_to_box/box_to_dcd_cell are exact inverses here
    box = np.asarray([[20.0, 0, 0], [5.0, 21.0, 0], [3.0, 4.0, 22.0]],
                     np.float32)
    path = tmp_path / "t.nc"
    write_netcdf(path, frames, box=box)
    _, _, box2 = read_netcdf(path)
    np.testing.assert_allclose(box2, np.broadcast_to(box, (11, 3, 3)),
                               atol=1e-4)


def test_incremental_writer_matches_oneshot(tmp_path, frames, boxes):
    a, b = tmp_path / "a.nc", tmp_path / "b.nc"
    write_netcdf(a, frames, box=boxes)
    with NetCDFWriter(b, with_box=True) as w:
        w.append(frames[:4], box=boxes[:4])
        w.append(frames[4:5], box=boxes[4:5])
        w.append(frames[5:], box=boxes[5:])
    assert a.read_bytes() == b.read_bytes()


def test_scipy_reads_our_files(tmp_path, frames, boxes):
    """Cross-implementation: scipy's independent NetCDF-3 reader decodes
    our writer's bytes to the same values + AMBER convention metadata."""
    path = tmp_path / "t.nc"
    write_netcdf(path, frames, box=boxes)
    nc = scipy_io.netcdf_file(str(path), "r", mmap=False)
    try:
        assert nc.Conventions == b"AMBER"
        assert nc.ConventionVersion == b"1.0"
        assert nc.dimensions["atom"] == 7
        assert nc.dimensions["frame"] is None  # unlimited
        v = nc.variables["coordinates"]
        assert v.units == b"angstrom"
        np.testing.assert_array_equal(v[:], frames)
        np.testing.assert_allclose(nc.variables["cell_lengths"][:],
                                   np.diagonal(boxes, axis1=1, axis2=2))
        np.testing.assert_allclose(nc.variables["cell_angles"][:], 90.0)
        np.testing.assert_allclose(nc.variables["time"][:],
                                   np.arange(11.0, dtype=np.float32))
    finally:
        nc.close()


def test_we_read_scipy_files(tmp_path, frames):
    """Cross-implementation the other way: bytes produced by scipy's
    writer (which we never touch) decode to the original values."""
    path = str(tmp_path / "s.nc")
    nc = scipy_io.netcdf_file(path, "w")
    nc.Conventions = "AMBER"
    nc.ConventionVersion = "1.0"
    nc.createDimension("frame", None)
    nc.createDimension("spatial", 3)
    nc.createDimension("atom", 7)
    v = nc.createVariable("coordinates", "f", ("frame", "atom", "spatial"))
    v[:] = frames
    v.units = "angstrom"
    t = nc.createVariable("time", "f", ("frame",))
    t[:] = 0.5 * np.arange(11.0, dtype=np.float32)
    nc.close()
    back, times, box = read_netcdf(path)
    np.testing.assert_array_equal(back, frames)
    np.testing.assert_allclose(times, 0.5 * np.arange(11.0))
    assert box is None


def test_scale_factor_applied(tmp_path, frames):
    """MDAnalysis semantics: a scale_factor attribute on coordinates is
    applied on read (e.g. files written in nm with scale 10)."""
    path = str(tmp_path / "s.nc")
    nc = scipy_io.netcdf_file(path, "w")
    nc.createDimension("frame", None)
    nc.createDimension("spatial", 3)
    nc.createDimension("atom", 7)
    v = nc.createVariable("coordinates", "f", ("frame", "atom", "spatial"))
    v[:] = frames
    v.scale_factor = 10.0
    nc.close()
    back, _, _ = read_netcdf(path)
    np.testing.assert_allclose(back, 10.0 * frames, rtol=1e-6)


def test_scale_factor_on_time_and_angles(tmp_path, frames):
    """scale_factor applies to ANY variable carrying it (MDAnalysis
    NCDF semantics) — time and cell_angles, not just coordinates."""
    path = str(tmp_path / "s.nc")
    nc = scipy_io.netcdf_file(path, "w")
    nc.createDimension("frame", None)
    nc.createDimension("spatial", 3)
    nc.createDimension("atom", 7)
    nc.createDimension("cell_spatial", 3)
    nc.createDimension("cell_angular", 3)
    v = nc.createVariable("coordinates", "f", ("frame", "atom", "spatial"))
    v[:] = frames
    t = nc.createVariable("time", "f", ("frame",))
    t[:] = np.arange(11.0, dtype=np.float32)
    t.scale_factor = 2.0
    ln = nc.createVariable("cell_lengths", "d", ("frame", "cell_spatial"))
    ln[:] = np.full((11, 3), 20.0)
    an = nc.createVariable("cell_angles", "d", ("frame", "cell_angular"))
    an[:] = np.full((11, 3), 45.0)  # stored at half scale
    an.scale_factor = 2.0
    nc.close()
    with NetCDFReader(path) as r:
        np.testing.assert_allclose(r.times(), 2.0 * np.arange(11.0))
        box = r.boxes()
    # 2.0 * 45 deg = 90 deg -> orthorhombic 20-Angstrom box
    np.testing.assert_allclose(
        box, np.broadcast_to(20.0 * np.eye(3), (11, 3, 3)), atol=1e-4)


def test_all_zero_nc_cells_count_as_none(tmp_path, frames):
    """read_traj_boxes normalizes all-zero .nc cell records to None,
    matching the XTC convention, so convert does not emit meaningless
    cell records."""
    from molann_tpu.io.reader import read_traj_boxes

    path = tmp_path / "z.nc"
    write_netcdf(path, frames, box=np.zeros((11, 3, 3), np.float32))
    assert read_traj_boxes(str(path)) is None


def test_frames_at_gather(tmp_path, frames):
    path = tmp_path / "t.nc"
    write_netcdf(path, frames)
    with NetCDFReader(path) as r:
        idx = np.array([0, 3, 4, 5, 9, 10])
        np.testing.assert_array_equal(r.frames_at(idx), frames[idx])


def test_reader_close_hook(tmp_path, frames):
    """open_frame_reader exposes read.close() on every branch; for .nc
    it deterministically releases the fd/mmap."""
    from molann_tpu.io.reader import open_frame_reader

    path = tmp_path / "t.nc"
    write_netcdf(path, frames)
    read, _, _ = open_frame_reader(str(path), backend="numpy")
    np.testing.assert_array_equal(read(0, 2), frames[:2])
    read.close()
    with pytest.raises(Exception):
        read(0, 2)  # mmap is closed
    # in-memory branch: close is a no-op but present
    read2, _, _ = open_frame_reader(frames)
    read2.close()
    np.testing.assert_array_equal(read2(0, 2), frames[:2])


def test_packed_iterator_nc_is_lazy(tmp_path, frames):
    """The .nc fallback iterator reads batches on demand through the
    mmap-backed reader (bounded memory), and yields the same packed
    batches as an eager in-memory pass."""
    from molann_tpu.train.data import packed_batch_iterator

    path = str(tmp_path / "t.nc")
    write_netcdf(path, frames)
    got = list(packed_batch_iterator(path, 4, shuffle=False, epochs=1,
                                     backend="numpy"))
    want = frames.reshape(11, -1)
    assert len(got) == 2
    np.testing.assert_array_equal(np.concatenate(got), want[:8])


def test_open_frame_reader_dispatch(tmp_path, frames):
    from molann_tpu.io.reader import open_frame_reader, read_traj_boxes

    path = tmp_path / "t.nc"
    write_netcdf(path, frames)
    read, n_frames, n_atoms = open_frame_reader(str(path))
    assert (n_frames, n_atoms) == (11, 7)
    np.testing.assert_array_equal(read(3, 5), frames[3:8])
    assert read_traj_boxes(str(path)) is None


def test_convert_cli_nc_roundtrip(tmp_path, frames, boxes):
    """convert .nc -> .dcd -> .nc preserves coordinates AND cells."""
    from molann_tpu.cli import main

    src, mid, out = (str(tmp_path / n) for n in ("a.nc", "b.dcd", "c.nc"))
    write_netcdf(src, frames, box=boxes)
    assert main(["convert", src, mid, "--chunk", "4"]) == 0
    assert main(["convert", mid, out, "--chunk", "4"]) == 0
    back, _, box2 = read_netcdf(out)
    np.testing.assert_allclose(back, frames, atol=1e-5)
    np.testing.assert_allclose(box2, boxes, atol=1e-4)


def test_reader_rejects_corruption(tmp_path, frames):
    path = tmp_path / "t.nc"
    write_netcdf(path, frames)
    raw = path.read_bytes()

    trunc = tmp_path / "trunc.nc"
    trunc.write_bytes(raw[:-20])
    with pytest.raises(ValueError, match="truncated"):
        read_netcdf(trunc)

    bad = tmp_path / "bad.nc"
    bad.write_bytes(b"NOPE" + raw[4:])
    with pytest.raises(ValueError, match="magic"):
        read_netcdf(bad)

    hdf5 = tmp_path / "h5.nc"
    hdf5.write_bytes(b"\x89HDF\r\n\x1a\n" + raw)
    with pytest.raises(ValueError, match="magic|NetCDF"):
        read_netcdf(hdf5)

    empty = tmp_path / "empty.nc"
    empty.write_bytes(b"")
    with pytest.raises(ValueError):
        read_netcdf(empty)


def test_reader_bounds_and_zero_frames(tmp_path, frames):
    path = tmp_path / "t.nc"
    write_netcdf(path, frames)
    with NetCDFReader(path) as r:
        with pytest.raises(ValueError, match="range"):
            r.read(8, 4)
        with pytest.raises(ValueError, match="range"):
            r.read(-1, 2)
    zero = tmp_path / "z.nc"
    with NetCDFWriter(zero):
        pass  # zero appends: still a valid, empty file
    fr, _, _ = read_netcdf(zero)
    assert fr.shape[0] == 0


def test_streaming_numrecs_sentinel(tmp_path, frames):
    """numrecs = 0xFFFFFFFF (the classic-format STREAMING sentinel)
    means 'count the records from the file size'."""
    path = tmp_path / "t.nc"
    write_netcdf(path, frames)
    raw = bytearray(path.read_bytes())
    raw[4:8] = b"\xff\xff\xff\xff"
    path.write_bytes(bytes(raw))
    back, _, _ = read_netcdf(path)
    np.testing.assert_array_equal(back, frames)


def test_evaluate_cli_on_nc(tmp_path, rng):
    """End-to-end: build a model, evaluate straight from a .nc file."""
    from molann_tpu.cli import main
    from molann_tpu.io import save_model
    from molann_tpu.systems import alanine_model

    model, u = alanine_model()
    save_model(str(tmp_path / "m.npz"), model)
    frames = (
        u.atoms.positions[None] + 0.05 * rng.normal(size=(12, 22, 3))
    ).astype(np.float32)
    traj = str(tmp_path / "t.nc")
    write_netcdf(traj, frames)
    rc = main([
        "evaluate", str(tmp_path / "m.npz"), traj,
        "--out", str(tmp_path / "y.npy"), "--batch-size", "8",
    ])
    assert rc == 0
    y = np.load(tmp_path / "y.npy")
    assert y.shape == (12, 3)
    import jax.numpy as jnp

    np.testing.assert_allclose(
        y, np.asarray(model(jnp.asarray(frames))), atol=1e-5
    )
