"""CLI tests: build → info → evaluate → forces → export, in-process."""

import numpy as np
import pytest

from molann_tpu.cli import main
from molann_tpu.systems import alanine_pdb_text, alanine_universe


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    (d / "system.pdb").write_text(alanine_pdb_text())
    (d / "features.txt").write_text(
        "[Output]\n"
        "d1, dihedral, bynum 5, bynum 7, bynum 9, bynum 15\n"
        "b1, bond, bynum 2 5\n"
        "[End]\n"
    )
    u = alanine_universe()
    rng = np.random.default_rng(0)
    frames = (
        u.atoms.positions[None]
        + 0.03 * rng.normal(size=(700, 22, 3))
    ).astype(np.float32)
    np.save(d / "traj.npy", frames)
    return d


def test_build_and_info(workdir, capsys):
    rc = main([
        "build", str(workdir / "system.pdb"), str(workdir / "features.txt"),
        "--section", "Output", "--align", "bynum 1 2 5",
        "--mlp", "5", "2", "--out", str(workdir / "model.npz"),
    ])
    assert rc == 0
    rc = main(["info", str(workdir / "model.npz")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "MolANN" in out and "d1" in out and "alignment: 3 atoms" in out


def test_evaluate_covers_all_frames(workdir):
    rc = main([
        "evaluate", str(workdir / "model.npz"), str(workdir / "traj.npy"),
        "--out", str(workdir / "cvs.npy"), "--batch-size", "256",
    ])
    assert rc == 0
    cvs = np.load(workdir / "cvs.npy")
    assert cvs.shape == (700, 2)  # 2 full batches + remainder

    # values must match a direct model evaluation
    from molann_tpu.io import load_model
    import jax.numpy as jnp

    model = load_model(workdir / "model.npz")
    frames = np.load(workdir / "traj.npy")
    expected = np.asarray(model(jnp.asarray(frames)))
    np.testing.assert_allclose(cvs, expected, atol=1e-5)


def test_forces_sign_convention(workdir):
    rc = main([
        "forces", str(workdir / "model.npz"), str(workdir / "traj.npy"),
        "--component", "0",
        "--out", str(workdir / "cv0.npy"),
        "--forces-out", str(workdir / "f.npy"),
        "--batch-size", "512",
    ])
    assert rc == 0
    forces = np.load(workdir / "f.npy")
    assert forces.shape == (700, 66)

    import jax
    import jax.numpy as jnp

    from molann_tpu.io import load_model

    model = load_model(workdir / "model.npz")
    frames = np.load(workdir / "traj.npy")
    g = jax.grad(lambda v: jnp.sum(model(v)[:, 0]))(jnp.asarray(frames))
    np.testing.assert_allclose(
        forces, -np.asarray(g).reshape(700, 66), atol=1e-5
    )


def test_export_cmd(workdir):
    rc = main([
        "export", str(workdir / "model.npz"), "--n-atoms", "22",
        "--out", str(workdir / "model.stablehlo"),
    ])
    assert rc == 0
    from molann_tpu.io import load_stablehlo

    fn = load_stablehlo(str(workdir / "model.stablehlo"))
    out = fn(np.zeros((2, 22, 3), np.float32))
    assert np.asarray(out).shape == (2, 2)


def test_build_missing_section(workdir, capsys):
    rc = main([
        "build", str(workdir / "system.pdb"), str(workdir / "features.txt"),
        "--section", "NoSuch", "--out", str(workdir / "x.npz"),
    ])
    assert rc == 1
    assert "no features" in capsys.readouterr().err
