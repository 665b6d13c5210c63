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


def test_forces_compact_path_sparse_system(tmp_path):
    """On a large system with a small CV set the forces command uses
    compact gradients (active atoms only cross the device boundary);
    output is still full-width with exact zeros on untouched atoms."""
    import jax
    import jax.numpy as jnp

    from molann_tpu.feature import Feature
    from molann_tpu.io import save_model
    from molann_tpu.models.ann import (
        FeatureLayer,
        MolANN,
        PreprocessingANN,
        create_sequential_nn,
    )
    from molann_tpu.ops.fused import active_atom_indices, model_select_mode
    from molann_tpu.systems import synthetic_peptide

    u = synthetic_peptide(40)  # 200 atoms -> blocked mode
    n = len(u.atoms)
    sel = lambda nm, r: u.select_atoms(f"name {nm} and resid {r}")
    feats = [
        Feature("b", "bond", sel("CA", 3) + sel("CA", 30)),
        Feature("d", "dihedral",
                sel("C", 10) + sel("N", 11) + sel("CA", 11) + sel("C", 11)),
    ]
    pp = PreprocessingANN(None, FeatureLayer(feats, u.atoms))
    model = MolANN(pp, create_sequential_nn(
        [pp.output_dimension(), 6, 2], key=jax.random.PRNGKey(1)))
    assert model_select_mode(model) == "blocked"
    active = active_atom_indices(model)
    assert active is not None and len(active) == 6

    save_model(str(tmp_path / "m.npz"), model)
    rng = np.random.default_rng(2)
    frames = (u.atoms.positions[None]
              + 0.05 * rng.normal(size=(24, n, 3))).astype(np.float32)
    np.save(tmp_path / "traj.npy", frames)
    rc = main([
        "forces", str(tmp_path / "m.npz"), str(tmp_path / "traj.npy"),
        "--out", str(tmp_path / "y.npy"),
        "--forces-out", str(tmp_path / "f.npy"),
        "--interpret", "--batch-size", "12",
    ])
    assert rc == 0
    f = np.load(tmp_path / "f.npy").reshape(24, n, 3)
    g_ref = jax.grad(lambda v: jnp.sum(model(v)))(jnp.asarray(frames))
    np.testing.assert_allclose(f, -np.asarray(g_ref), atol=1e-5)
    inactive = np.setdiff1d(np.arange(n), active)
    assert np.all(f[:, inactive, :] == 0.0)
    y = np.load(tmp_path / "y.npy")
    np.testing.assert_allclose(
        y, np.asarray(model(jnp.asarray(frames))), atol=1e-5
    )


def test_forces_cull_condensed_system(tmp_path, capsys):
    """VERDICT r4 #5: the CLI round-trip on a condensed-phase system —
    'forces --cull' culls the coordination pair tables at the reference
    frame (CullReport printed), routes the chunk matrix as a
    jit-boundary operand automatically, and the culled forces match the
    all-pairs XLA model within the cull's documented tolerance."""
    import jax
    import jax.numpy as jnp

    from molann_tpu.io import save_model
    from molann_tpu.ops.fused import model_chunk_matrix, model_select_mode
    from molann_tpu.systems import lj_fluid_model

    model, u, _ = lj_fluid_model(4)  # 64 atoms, all-pairs coordination
    n = len(u.atoms)
    assert model_select_mode(model) == "blocked"
    assert model_chunk_matrix(model) is not None  # chunked -> c_mat route
    save_model(str(tmp_path / "lj.npz"), model)
    rng = np.random.default_rng(5)
    frames = (u.atoms.positions[None]
              + 0.02 * rng.normal(size=(8, n, 3))).astype(np.float32)
    np.save(tmp_path / "traj.npy", frames)
    rc = main([
        "forces", str(tmp_path / "lj.npz"), str(tmp_path / "traj.npy"),
        "--out", str(tmp_path / "y.npy"),
        "--forces-out", str(tmp_path / "f.npy"),
        "--interpret", "--batch-size", "8", "--tile", "128",
        "--cull", "--skin", "1.0",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "CullReport[" in out  # the report reached the user
    y = np.load(tmp_path / "y.npy")
    f = np.load(tmp_path / "f.npy").reshape(8, n, 3)
    y_ref = np.asarray(model(jnp.asarray(frames)))  # all-pairs XLA
    g_ref = np.asarray(
        jax.grad(lambda v: jnp.sum(model(v)))(jnp.asarray(frames)))
    assert np.abs(y - y_ref).max() / max(np.abs(y_ref).max(), 1e-9) < 5e-4
    assert (np.abs(f + g_ref).max() / max(np.abs(g_ref).max(), 1e-9)
            < 2e-3)


def test_sample_cli_opes_adaptive(workdir):
    """--opes-adaptive reaches opes_langevin(adaptive=True): bounded
    kernel list with bandwidth shrink + merge compression."""
    if not (workdir / "model.npz").exists():  # self-contained under -k
        assert main([
            "build", str(workdir / "system.pdb"),
            str(workdir / "features.txt"),
            "--section", "Output", "--align", "bynum 1 2 5",
            "--mlp", "5", "2", "--out", str(workdir / "model.npz"),
        ]) == 0
    out = workdir / "opes_ad.npy"
    bias_out = workdir / "opes_ad_kernels.npz"
    rc = main(["sample", str(workdir / "model.npz"),
               str(workdir / "system.pdb"),
               "--bias", "opes", "--opes-adaptive",
               "--opes-max-kernels", "16",
               "--steps", "1000", "--walkers", "2",
               "--bias-barrier", "8", "--out", str(out),
               "--bias-out", str(bias_out)])
    assert rc == 0
    frames = np.load(out)
    assert frames.shape[1:] == (22, 3) and np.isfinite(frames).all()
    dep = np.load(bias_out)
    # the adaptive run keeps at most max_kernels slots (vs 40 deposits
    # in the non-adaptive run at these settings)
    assert "opes" in dep and dep["centers"].shape[0] <= 16


def test_export_bundle_cli(workdir):
    from molann_tpu.io.export import read_bundle

    out = workdir / "model.bundle"
    rc = main(["export", str(workdir / "model.npz"), "--n-atoms", "22",
               "--out", str(out), "--with-gradient",
               "--batch-sizes", "64,16"])
    assert rc == 0
    entries = read_bundle(str(out))
    assert [b for b, _ in entries] == [64, 16]


def test_sample_cli_metadynamics_escapes(workdir):
    """The closed enhanced-sampling loop from the CLI: metadynamics
    along the built model's CVs escapes the start basin (cos(phi)
    crosses the barrier) and writes trajectory + deposits."""
    out = workdir / "sampled.npy"
    bias_out = workdir / "bias.npz"
    rc = main(["sample", str(workdir / "model.npz"),
               str(workdir / "system.pdb"),
               "--bias", "metad", "--steps", "4000", "--walkers", "3",
               "--out", str(out), "--bias-out", str(bias_out)])
    assert rc == 0
    frames = np.load(out)
    assert frames.shape[1:] == (22, 3) and np.isfinite(frames).all()
    dep = np.load(bias_out)
    assert dep["centers"].shape[0] == 3 * (4000 // 50)
    # escape check via the potential's own phi
    import jax.numpy as jnp

    from molann_tpu.sampling import ToyPeptidePotential
    from molann_tpu.topology import Universe

    pot = ToyPeptidePotential(Universe(str(workdir / "system.pdb")))
    cos_phi = np.cos(np.asarray(pot.phi(jnp.asarray(frames))))
    assert cos_phi.max() > 0.0  # crossed at least to the barrier top


def test_sample_cli_path_progress(workdir, capsys):
    """'sample --path' biases the 1-D Branduardi progress coordinate
    along a mep-format path instead of the raw model CVs: deposits are
    one-dimensional and live in [0, 1]."""
    import jax.numpy as jnp

    from molann_tpu.io import load_model
    from molann_tpu.topology import Universe

    if not (workdir / "model.npz").exists():  # self-contained under -k
        assert main([
            "build", str(workdir / "system.pdb"),
            str(workdir / "features.txt"),
            "--section", "Output", "--align", "bynum 1 2 5",
            "--mlp", "5", "2", "--out", str(workdir / "model.npz"),
        ]) == 0
    model = load_model(workdir / "model.npz")
    x0 = Universe(str(workdir / "system.pdb")).atoms.positions
    cv0 = np.asarray(model(jnp.asarray(x0[None])))[0]  # start-point CV
    # mep output format: [m, d+1] images + free-energy column
    t = np.linspace(0.0, 1.0, 7)[:, None]
    images = cv0[None, :] * (1.0 - t) + (cv0 + 1.0)[None, :] * t
    mep = np.concatenate([images, np.zeros((7, 1))], axis=1)
    np.save(workdir / "path.npy", mep.astype(np.float32))

    out = workdir / "path_sampled.npy"
    bias_out = workdir / "path_bias.npz"
    rc = main(["sample", str(workdir / "model.npz"),
               str(workdir / "system.pdb"),
               "--bias", "metad", "--path", str(workdir / "path.npy"),
               "--tube-k", "5.0", "--tube-max", "0.1",
               "--steps", "1000", "--walkers", "2", "--sigma", "0.1",
               "--out", str(out), "--bias-out", str(bias_out)])
    assert rc == 0
    frames = np.load(out)
    assert frames.shape[1:] == (22, 3) and np.isfinite(frames).all()
    dep = np.load(bias_out)
    c = dep["centers"]
    assert c.shape == (2 * (1000 // 50), 1)  # 1-D progress deposits
    assert c.min() >= 0.0 and c.max() <= 1.0


def test_sample_cli_unbiased_stays(workdir):
    out = workdir / "unbiased.xtc"
    rc = main(["sample", str(workdir / "model.npz"),
               str(workdir / "system.pdb"),
               "--bias", "none", "--steps", "2000", "--walkers", "2",
               "--out", str(out)])
    assert rc == 0
    from molann_tpu.io.xdr import read_xtc

    frames, _, _ = read_xtc(str(out))
    assert frames.shape[1:] == (22, 3)


def test_sample_cli_baoab(workdir):
    out = workdir / "baoab.npy"
    rc = main(["sample", str(workdir / "model.npz"),
               str(workdir / "system.pdb"),
               "--bias", "none", "--integrator", "baoab", "--gamma", "5.0",
               "--steps", "500", "--walkers", "2", "--dt", "5e-3",
               "--thin", "50", "--out", str(out)])
    assert rc == 0
    frames = np.load(out)
    assert frames.shape[1:] == (22, 3)
    assert np.isfinite(frames).all()
    # baoab is unbiased-only for now: biased runs must error clearly
    rc2 = None
    try:
        main(["sample", str(workdir / "model.npz"),
              str(workdir / "system.pdb"),
              "--bias", "metad", "--integrator", "baoab",
              "--steps", "100", "--out", str(workdir / "x.npy")])
    except SystemExit as e:
        rc2 = str(e)
    assert rc2 is not None and "baoab" in rc2


def test_sample_cli_well_tempered(workdir):
    """--well-tempered-gamma switches on hill decay and the bias-out
    file carries the per-deposit weights + gamma needed to reconstruct
    the bias (without them a WT hills file would read back as
    constant-height hills)."""
    if not (workdir / "model.npz").exists():
        assert main(["build", str(workdir / "system.pdb"),
                     str(workdir / "features.txt"),
                     "--section", "Output", "--align", "bynum 1 2 5",
                     "--mlp", "5", "1",
                     "--out", str(workdir / "model.npz")]) == 0
    out = workdir / "wt.npy"
    bias_out = workdir / "wt_bias.npz"
    rc = main(["sample", str(workdir / "model.npz"),
               str(workdir / "system.pdb"),
               "--bias", "metad", "--steps", "2000", "--walkers", "2",
               "--well-tempered-gamma", "25",
               "--out", str(out), "--bias-out", str(bias_out)])
    assert rc == 0
    dep = np.load(bias_out)
    assert set(dep.keys()) >= {"centers", "height", "sigma", "weights",
                               "gamma"}
    w = dep["weights"]
    assert w.shape == dep["centers"].shape[:1]
    assert float(dep["gamma"]) == 25.0
    # hills must actually decay as basins fill
    assert w.min() < 0.9 and w.max() <= 1.0 + 1e-6
    # standard metadynamics keeps the old, weight-free format
    rc = main(["sample", str(workdir / "model.npz"),
               str(workdir / "system.pdb"),
               "--bias", "metad", "--steps", "500", "--walkers", "1",
               "--out", str(out), "--bias-out", str(bias_out)])
    assert rc == 0
    dep = np.load(bias_out)
    assert "weights" not in dep and "gamma" not in dep


def test_fes_cli(tmp_path, capsys):
    """'fes' reconstructs F(s) from a hills file: single Gaussian at 0
    -> F is h at the far edges, 0 at the center, and the WT variant is
    rescaled by gamma/(gamma-1)."""
    from molann_tpu.sampling import MetadBias

    hills = tmp_path / "hills.npz"
    MetadBias(np.zeros((1, 1), np.float32), height=0.5,
              sigma=0.2).save(hills)
    out = tmp_path / "fes.npy"
    rc = main(["fes", str(hills), "--grid=-2:2:81",
               "--out", str(out)])
    assert rc == 0
    f = np.load(out)
    assert f.shape == (81,)
    assert abs(f[40]) < 1e-6          # center of the Gaussian -> min F
    np.testing.assert_allclose(f[0], 0.5, atol=1e-4)  # far edge -> h
    assert "barrier estimate" in capsys.readouterr().out

    # well-tempered hills carry the gamma/(gamma-1) prefactor + csv out
    MetadBias(np.zeros((1, 1), np.float32), height=0.5, sigma=0.2,
              weights=np.array([0.8], np.float32),
              gamma=5.0).save(hills)
    csv = tmp_path / "fes.csv"
    rc = main(["fes", str(hills), "--grid=-2:2:81",
               "--out", str(csv)])
    assert rc == 0
    rows = csv.read_text().splitlines()
    assert rows[0] == "s0,free_energy"
    vals = np.array([float(r.split(",")[1]) for r in rows[1:]])
    np.testing.assert_allclose(vals[0], (5 / 4) * 0.8 * 0.5, atol=1e-4)

    # 2-d hills: single spec broadcasts, grid-shaped output
    MetadBias(np.zeros((1, 2), np.float32), height=0.5,
              sigma=0.2).save(hills)
    rc = main(["fes", str(hills), "--grid=-1:1:11",
               "--out", str(out)])
    assert rc == 0
    assert np.load(out).shape == (11, 11)


def test_train_cli_mse(workdir, capsys):
    """'train --loss mse' fits the saved model to per-frame targets and
    the written model reloads with a lower loss than the initial one."""
    frames = np.load(workdir / "traj.npy")
    # regress onto a simple deterministic function of the coordinates
    y = frames[:, 4, :2].astype(np.float32)
    np.save(workdir / "targets.npy", y)
    assert main([
        "build", str(workdir / "system.pdb"), str(workdir / "features.txt"),
        "--section", "Output", "--mlp", "8", "2",
        "--out", str(workdir / "m0.npz"),
    ]) == 0
    rc = main([
        "train", str(workdir / "m0.npz"), str(workdir / "traj.npy"),
        "--targets", str(workdir / "targets.npy"),
        "--steps", "60", "--batch-size", "256", "--lr", "5e-3",
        "--log-every", "0", "--out", str(workdir / "m1.npz"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "trained 60 steps" in out

    import jax.numpy as jnp

    from molann_tpu.io import load_model

    m0, m1 = load_model(str(workdir / "m0.npz")), load_model(
        str(workdir / "m1.npz"))
    x = jnp.asarray(frames)
    e0 = float(np.mean((np.asarray(m0(x)) - y) ** 2))
    e1 = float(np.mean((np.asarray(m1(x)) - y) ** 2))
    assert e1 < e0 * 0.9


def test_train_cli_eigenfunction_weighted(workdir, capsys):
    """'train --loss eigenfunction --weights' runs the importance-weighted
    variational objective and reduces it."""
    n = len(np.load(workdir / "traj.npy"))
    w = np.random.default_rng(3).uniform(0.5, 2.0, n).astype(np.float32)
    np.save(workdir / "w.npy", w)
    assert main([
        "build", str(workdir / "system.pdb"), str(workdir / "features.txt"),
        "--section", "Output", "--mlp", "8", "2",
        "--out", str(workdir / "me0.npz"),
    ]) == 0
    rc = main([
        "train", str(workdir / "me0.npz"), str(workdir / "traj.npy"),
        "--loss", "eigenfunction", "--weights", str(workdir / "w.npy"),
        "--beta", "4.0", "--steps", "80", "--batch-size", "256",
        "--lr", "5e-3", "--log-every", "0",
        "--out", str(workdir / "me1.npz"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    first, last = out.split("loss ")[1].split(";")[0].split(" -> ")
    assert float(last) < float(first)
    assert "generator eigenvalues" in out


def test_mep_cli_pmf_and_grid(workdir, capsys):
    """'mep' finds the minimum free-energy path: on a 1D pmf-style
    [2, n] file the barrier of (s^2-1)^2 is 1 at s=0; on a 2D grid with
    --grid the saddle of a quartic double-well sheet is found."""
    s = np.linspace(-1.5, 1.5, 201)
    f1 = (s**2 - 1.0) ** 2
    np.save(workdir / "pmf1d.npy", np.stack([s, f1]))
    rc = main(["mep", str(workdir / "pmf1d.npy"),
               "--start=-1.2", "--end", "1.1", "--images", "24",
               "--iterations", "1500", "--step", "2e-2",
               "--out", str(workdir / "path1.npy")])
    assert rc == 0
    out = capsys.readouterr().out
    barrier = float(out.split("barrier F = ")[1].split(" at ")[0])
    assert barrier == pytest.approx(1.0, abs=0.05)
    path = np.load(workdir / "path1.npy")
    assert path.shape == (24, 2)
    assert abs(path[0, 0] + 1.0) < 0.05 and abs(path[-1, 0] - 1.0) < 0.05

    # 2D: F = (x^2-1)^2 + 2 y^2 — saddle (0, 0) at F=1
    xs = np.linspace(-1.5, 1.5, 151)
    ys = np.linspace(-1.0, 1.0, 101)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    np.save(workdir / "fes2d.npy", (gx**2 - 1.0) ** 2 + 2.0 * gy**2)
    rc = main(["mep", str(workdir / "fes2d.npy"),
               "--grid=-1.5:1.5:151,-1:1:101",
               "--start=-1.1,0.3", "--end", "1.1,-0.2", "--images", "32",
               "--iterations", "2000", "--step", "2e-2",
               "--out", str(workdir / "path2.csv")])
    assert rc == 0
    out = capsys.readouterr().out
    barrier = float(out.split("barrier F = ")[1].split(" at ")[0])
    assert barrier == pytest.approx(1.0, abs=0.05)
    rows = (workdir / "path2.csv").read_text().strip().splitlines()
    assert rows[0] == "cv0,cv1,free_energy" and len(rows) == 33
    # missing --grid for a raw 2D file errors cleanly
    with pytest.raises(SystemExit, match="--grid"):
        main(["mep", str(workdir / "fes2d.npy"),
              "--start=-1,0", "--end", "1,0"])

    # hills .npz input: F = -V differentiates the smooth bias directly;
    # deposits concentrated in two wells leave a barrier between them
    from molann_tpu.sampling import MetadBias

    centers = np.concatenate([
        np.full((20, 1), -1.0), np.full((20, 1), 1.0)
    ]).astype(np.float32)
    MetadBias(centers, height=0.2, sigma=0.4).save(
        str(workdir / "hills1d.npz"))
    rc = main(["mep", str(workdir / "hills1d.npz"),
               "--start=-0.9", "--end", "0.9", "--images", "16",
               "--iterations", "800", "--step", "5e-2",
               "--out", str(workdir / "path3.npy")])
    assert rc == 0
    out = capsys.readouterr().out
    top = float(out.split(" at image ")[1].split("(")[1].split(")")[0])
    assert abs(top) < 0.1  # barrier sits at the midpoint between wells


def test_msm_cli(workdir, capsys):
    """'msm' on a fine-binned AR(1) CV series recovers the analytic
    relaxation time and reports a clean Chapman-Kolmogorov check."""
    rng = np.random.default_rng(11)
    a = 0.95
    z = np.empty(60_000, np.float32)
    z[0] = 0.0
    for t in range(1, len(z)):
        z[t] = a * z[t - 1] + np.float32(np.sqrt(1 - a * a)) * np.float32(
            rng.normal())
    np.save(workdir / "cv_series.npy", z)
    rc = main(["msm", str(workdir / "cv_series.npy"), "--lag", "5",
               "--grid=-3:3:12", "--out", str(workdir / "msm.npz")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Markovian at this lag" in out
    ts0 = float(out.split("implied timescales (frames): ")[1]
                .split(",")[0])
    assert ts0 == pytest.approx(-1.0 / np.log(a), rel=0.25)
    saved = np.load(workdir / "msm.npz")
    assert saved["transition"].shape == (12, 12)
    np.testing.assert_allclose(saved["pi"].sum(), 1.0, atol=1e-9)

    # interleaved walkers de-interleave into contiguous series
    z2 = np.stack([z[:30000], z[30000:]], axis=1).reshape(-1)
    np.save(workdir / "cv2.npy", z2)
    rc = main(["msm", str(workdir / "cv2.npy"), "--lag", "5",
               "--grid=-3:3:12", "--walkers", "2"])
    assert rc == 0
    out2 = capsys.readouterr().out
    ts2 = float(out2.split("implied timescales (frames): ")[1]
                .split(",")[0])
    assert ts2 == pytest.approx(ts0, rel=0.15)
    with pytest.raises(SystemExit, match="walkers"):
        main(["msm", str(workdir / "cv_series.npy"), "--walkers", "7"])


def test_train_cli_vamp(workdir, capsys):
    """'train --loss vamp --lag' fits time-lagged pairs and reports the
    learned CVs' autocorrelations/timescales. Needs a TIME-CORRELATED
    trajectory (the shared workdir traj is iid noise), so build one with
    AR(1) displacement dynamics."""
    u = alanine_universe()
    rng = np.random.default_rng(5)
    n = 700
    disp = np.zeros((n, 22, 3), np.float32)
    a = 0.9
    for t in range(1, n):  # slow AR(1) displacement field
        disp[t] = a * disp[t - 1] + np.sqrt(1 - a * a) * rng.normal(
            size=(22, 3)
        ).astype(np.float32)
    frames = (u.atoms.positions[None] + 0.03 * disp).astype(np.float32)
    np.save(workdir / "traj_ar1.npy", frames)

    assert main([
        "build", str(workdir / "system.pdb"), str(workdir / "features.txt"),
        "--section", "Output", "--mlp", "8", "1",
        "--out", str(workdir / "mv0.npz"),
    ]) == 0
    rc = main([
        "train", str(workdir / "mv0.npz"), str(workdir / "traj_ar1.npy"),
        "--loss", "vamp", "--lag", "2", "--steps", "60",
        "--batch-size", "256", "--lr", "1e-2", "--log-every", "0",
        "--out", str(workdir / "mv1.npz"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "VAMP-2 score" in out and "implied timescales" in out
    score = float(out.split("VAMP-2 score = ")[1].split(";")[0])
    # the slow AR(1) field gives the 1-output model a clearly positive
    # lag-2 score (perfect linear CV would approach a^4 ~ 0.65)
    assert score > 0.2
    # bad lag errors cleanly
    rc = main([
        "train", str(workdir / "mv0.npz"), str(workdir / "traj_ar1.npy"),
        "--loss", "vamp", "--lag", str(n), "--steps", "5",
        "--out", str(workdir / "mv2.npz"),
    ])
    assert rc == 1
    assert "--lag" in capsys.readouterr().err


def test_train_cli_errors(workdir, capsys):
    assert main([
        "build", str(workdir / "system.pdb"), str(workdir / "features.txt"),
        "--section", "Output", "--mlp", "4", "2",
        "--out", str(workdir / "merr.npz"),
    ]) == 0
    capsys.readouterr()
    assert main([
        "train", str(workdir / "merr.npz"), str(workdir / "traj.npy"),
    ]) == 1
    assert "requires --targets" in capsys.readouterr().err
    np.save(workdir / "short.npy", np.ones(3, np.float32))
    assert main([
        "train", str(workdir / "merr.npz"), str(workdir / "traj.npy"),
        "--loss", "eigenfunction", "--weights", str(workdir / "short.npy"),
    ]) == 1
    assert "weights shape" in capsys.readouterr().err


def test_train_cli_autoencoder(workdir, capsys):
    """'train --loss autoencoder' trains the saved MolANN's MLP as an
    encoder against a jointly-trained decoder; reconstruction improves
    and the decoder is saved on request."""
    assert main([
        "build", str(workdir / "system.pdb"), str(workdir / "features.txt"),
        "--section", "Output", "--mlp", "8", "1",
        "--out", str(workdir / "ae0.npz"),
    ]) == 0
    rc = main([
        "train", str(workdir / "ae0.npz"), str(workdir / "traj.npy"),
        "--loss", "autoencoder", "--decoder-hidden", "8",
        "--steps", "80", "--batch-size", "256", "--lr", "5e-3",
        "--log-every", "0", "--out", str(workdir / "ae1.npz"),
        "--decoder-out", str(workdir / "dec.npz"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    first, last = out.split("loss ")[1].split(";")[0].split(" -> ")
    assert float(last) < float(first)

    import jax.numpy as jnp

    from molann_tpu.io import load_model

    enc = load_model(str(workdir / "ae1.npz"))
    dec = load_model(str(workdir / "dec.npz"))
    x = jnp.asarray(np.load(workdir / "traj.npy")[:128])
    f = enc.preprocessing_layer(x)
    rec = dec(enc.ann_layers(f))
    err = float(np.mean(np.sum((np.asarray(rec) - np.asarray(f)) ** 2, 1)))
    assert np.isfinite(err) and err == pytest.approx(float(last), rel=0.5)


def test_train_cli_autoencoder_needs_mlp(workdir, capsys):
    """A preprocessing-only model (no MLP encoder) is rejected."""
    assert main([
        "build", str(workdir / "system.pdb"), str(workdir / "features.txt"),
        "--section", "Output", "--out", str(workdir / "pp.npz"),
    ]) == 0
    capsys.readouterr()
    assert main([
        "train", str(workdir / "pp.npz"), str(workdir / "traj.npy"),
        "--loss", "autoencoder",
    ]) == 1
    assert "needs a MolANN" in capsys.readouterr().err


def test_evaluate_and_forces_multi_device(workdir):
    """--devices N routes through the mesh serving path; outputs match
    the single-device commands exactly (same kernels, interpret mode)."""
    if not (workdir / "model.npz").exists():  # self-contained under -k
        assert main([
            "build", str(workdir / "system.pdb"),
            str(workdir / "features.txt"),
            "--section", "Output", "--align", "bynum 1 2 5",
            "--mlp", "5", "2", "--out", str(workdir / "model.npz"),
        ]) == 0
    if not (workdir / "cvs.npy").exists():
        assert main([
            "evaluate", str(workdir / "model.npz"),
            str(workdir / "traj.npy"),
            "--out", str(workdir / "cvs.npy"), "--batch-size", "256",
        ]) == 0
    if not (workdir / "f.npy").exists():
        assert main([
            "forces", str(workdir / "model.npz"), str(workdir / "traj.npy"),
            "--component", "0", "--out", str(workdir / "cv0.npy"),
            "--forces-out", str(workdir / "f.npy"),
            "--batch-size", "512",
        ]) == 0
    assert main([
        "evaluate", str(workdir / "model.npz"), str(workdir / "traj.npy"),
        "--out", str(workdir / "cvs8.npy"), "--devices", "8",
        "--interpret", "--batch-size", "256",
    ]) == 0
    ref = np.load(workdir / "cvs.npy")      # from the single-device test
    got = np.load(workdir / "cvs8.npy")
    np.testing.assert_allclose(got, ref, atol=1e-5)

    assert main([
        "forces", str(workdir / "model.npz"), str(workdir / "traj.npy"),
        "--component", "0",
        "--out", str(workdir / "cv0_8.npy"),
        "--forces-out", str(workdir / "f8.npy"),
        "--devices", "8", "--interpret", "--batch-size", "256",
    ]) == 0
    np.testing.assert_allclose(
        np.load(workdir / "f8.npy"), np.load(workdir / "f.npy"), atol=1e-5
    )


def test_train_cli_multi_device(workdir, capsys):
    """'train --devices N' shards batches over the mesh (regression:
    this path used to hit a NameError before any training started)."""
    frames = np.load(workdir / "traj.npy")
    np.save(workdir / "targets.npy", frames[:, 4, :2].astype(np.float32))
    if not (workdir / "m0.npz").exists():  # self-contained under -k
        assert main([
            "build", str(workdir / "system.pdb"),
            str(workdir / "features.txt"),
            "--section", "Output", "--mlp", "8", "2",
            "--out", str(workdir / "m0.npz"),
        ]) == 0
    rc = main([
        "train", str(workdir / "m0.npz"), str(workdir / "traj.npy"),
        "--targets", str(workdir / "targets.npy"),
        "--steps", "20", "--batch-size", "256", "--devices", "4",
        "--log-every", "0", "--out", str(workdir / "m_dp.npz"),
    ])
    assert rc == 0
    assert "trained 20 steps" in capsys.readouterr().out
    assert (workdir / "m_dp.npz").exists()


def test_sample_steered_requires_endpoints(workdir):
    """'sample --bias steered' without --s0/--s1 exits with a usage
    error instead of an AttributeError traceback."""
    if not (workdir / "model.npz").exists():  # self-contained under -k
        assert main([
            "build", str(workdir / "system.pdb"),
            str(workdir / "features.txt"),
            "--section", "Output", "--align", "bynum 1 2 5",
            "--mlp", "5", "2", "--out", str(workdir / "model.npz"),
        ]) == 0
    with pytest.raises(SystemExit, match="--s0 and --s1"):
        main([
            "sample", str(workdir / "model.npz"),
            str(workdir / "system.pdb"), "--bias", "steered",
            "--steps", "10", "--out", str(workdir / "steered.npy"),
        ])


def test_evaluate_multi_device_cpu_fallback(workdir):
    """--devices on a CPU backend works WITHOUT --interpret: the mesh
    serving path falls back to plain XLA instead of failing in Mosaic
    kernel lowering (same policy as the single-device path)."""
    if not (workdir / "model.npz").exists():  # self-contained under -k
        assert main([
            "build", str(workdir / "system.pdb"),
            str(workdir / "features.txt"),
            "--section", "Output", "--align", "bynum 1 2 5",
            "--mlp", "5", "2", "--out", str(workdir / "model.npz"),
        ]) == 0
    assert main([
        "evaluate", str(workdir / "model.npz"), str(workdir / "traj.npy"),
        "--out", str(workdir / "cvs_fb.npy"), "--devices", "4",
        "--batch-size", "256",
    ]) == 0
    from molann_tpu.io import load_model
    import jax.numpy as jnp

    model = load_model(workdir / "model.npz")
    frames = np.load(workdir / "traj.npy")
    expected = np.asarray(model(jnp.asarray(frames)))
    np.testing.assert_allclose(np.load(workdir / "cvs_fb.npy"), expected,
                               atol=1e-5)


def test_train_cli_optimizer_and_schedule(workdir, capsys):
    """'train --optimizer adamw --lr-schedule warmup-cosine --grad-clip'
    wires the optax pipeline and still reduces the loss."""
    frames = np.load(workdir / "traj.npy")
    np.save(workdir / "targets.npy", frames[:, 4, :2].astype(np.float32))
    if not (workdir / "m0.npz").exists():  # self-contained under -k
        assert main([
            "build", str(workdir / "system.pdb"),
            str(workdir / "features.txt"),
            "--section", "Output", "--mlp", "8", "2",
            "--out", str(workdir / "m0.npz"),
        ]) == 0
    rc = main([
        "train", str(workdir / "m0.npz"), str(workdir / "traj.npy"),
        "--targets", str(workdir / "targets.npy"),
        "--steps", "60", "--batch-size", "256",
        "--optimizer", "adamw", "--weight-decay", "1e-3",
        "--lr", "5e-3", "--lr-schedule", "warmup-cosine",
        "--warmup-steps", "10", "--grad-clip", "1.0",
        "--log-every", "0", "--out", str(workdir / "m_opt.npz"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "trained 60 steps" in out
    first, last = (float(v) for v in
                   out.split("loss ")[1].split(";")[0].split(" -> "))
    assert last < first


def test_train_cli_committor(workdir, capsys):
    """'train --loss committor --labels' runs the variational committor
    objective, reduces it, and reports basin diagnostics."""
    frames = np.load(workdir / "traj.npy")
    # label frames by the b1 bond length (a variable the model's feature
    # layer resolves): bottom third = reactant A, top third = product B
    coord = np.linalg.norm(frames[:, 4] - frames[:, 1], axis=1)
    lo, hi = np.quantile(coord, [1 / 3, 2 / 3])
    labels = np.where(coord < lo, 1, np.where(coord > hi, 2, 0))
    np.save(workdir / "labels.npy", labels.astype(np.int32))
    assert main([
        "build", str(workdir / "system.pdb"), str(workdir / "features.txt"),
        "--section", "Output", "--mlp", "8", "1",
        "--out", str(workdir / "mq0.npz"),
    ]) == 0
    capsys.readouterr()
    rc = main([
        "train", str(workdir / "mq0.npz"), str(workdir / "traj.npy"),
        "--loss", "committor", "--labels", str(workdir / "labels.npy"),
        # the noise-cloud geometry is tight (sigma 0.03 A), so a sharp
        # transition costs high Dirichlet energy: weight the boundary
        # conditions up accordingly
        "--alpha", "20000", "--steps", "300", "--batch-size", "700",
        "--lr", "5e-3",
        "--log-every", "0", "--out", str(workdir / "mq1.npz"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "trained 300 steps" in out
    assert "committor diagnostics" in out
    first, last = (float(v) for v in
                   out.split("loss ")[1].split(";")[0].split(" -> "))
    assert last < first
    # the trained q separates the basins
    import jax
    import jax.numpy as jnp

    from molann_tpu.io import load_model

    m = load_model(str(workdir / "mq1.npz"))
    q = np.asarray(jax.nn.sigmoid(m(jnp.asarray(frames))[:, 0]))
    assert q[labels == 1].mean() < 0.35
    assert q[labels == 2].mean() > 0.65


def test_train_cli_committor_requires_labels(workdir, capsys):
    if not (workdir / "mq0.npz").exists():  # self-contained under -k
        assert main([
            "build", str(workdir / "system.pdb"),
            str(workdir / "features.txt"),
            "--section", "Output", "--mlp", "8", "1",
            "--out", str(workdir / "mq0.npz"),
        ]) == 0
    capsys.readouterr()
    assert main([
        "train", str(workdir / "mq0.npz"), str(workdir / "traj.npy"),
        "--loss", "committor",
    ]) == 1
    assert "requires --labels" in capsys.readouterr().err


def test_train_cli_tae(workdir, capsys):
    """'train --loss tae --lag' trains the MLP encoder to predict the
    features a lag later and reports the learned CV's autocorrelation
    (needs a time-correlated trajectory, like the vamp test)."""
    u = alanine_universe()
    rng = np.random.default_rng(11)
    n = 600
    disp = np.zeros((n, 22, 3), np.float32)
    a = 0.9
    for t in range(1, n):
        disp[t] = a * disp[t - 1] + np.sqrt(1 - a * a) * rng.normal(
            size=(22, 3)
        ).astype(np.float32)
    frames = (u.atoms.positions[None] + 0.03 * disp).astype(np.float32)
    np.save(workdir / "traj_tae.npy", frames)

    assert main([
        "build", str(workdir / "system.pdb"), str(workdir / "features.txt"),
        "--section", "Output", "--mlp", "8", "1",
        "--out", str(workdir / "tae0.npz"),
    ]) == 0
    rc = main([
        "train", str(workdir / "tae0.npz"), str(workdir / "traj_tae.npy"),
        "--loss", "tae", "--lag", "2", "--steps", "60",
        "--batch-size", "256", "--lr", "1e-2", "--log-every", "0",
        "--out", str(workdir / "tae1.npz"),
        "--decoder-out", str(workdir / "taedec.npz"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    first, last = out.split("loss ")[1].split(";")[0].split(" -> ")
    assert float(last) < float(first)
    assert "TAE CV lag-2 autocorrelations" in out
    ac = float(out.split("(slowest first): ")[1].split(";")[0])
    assert ac > 0.4  # found a persistent mode of the AR(1) field
    assert (workdir / "tae1.npz").exists()
    assert (workdir / "taedec.npz").exists()


def test_sample_cli_opes_and_fes(workdir, capsys):
    """'sample --bias opes' runs the OPES bias from the CLI, writes
    kernels, and 'fes'/'mep' consume the kernels file through the
    dispatching loader (plumbing check — the escape physics is covered
    in tests/test_sampling.py)."""
    if not (workdir / "model.npz").exists():  # self-contained under -k
        assert main([
            "build", str(workdir / "system.pdb"),
            str(workdir / "features.txt"),
            "--section", "Output", "--align", "bynum 1 2 5",
            "--mlp", "5", "2", "--out", str(workdir / "model.npz"),
        ]) == 0
    out = workdir / "opes.npy"
    bias_out = workdir / "opes_kernels.npz"
    rc = main(["sample", str(workdir / "model.npz"),
               str(workdir / "system.pdb"),
               "--bias", "opes", "--steps", "1000", "--walkers", "2",
               "--bias-barrier", "8", "--out", str(out),
               "--bias-out", str(bias_out)])
    assert rc == 0
    frames = np.load(out)
    assert frames.shape[1:] == (22, 3) and np.isfinite(frames).all()
    dep = np.load(bias_out)
    assert "opes" in dep and dep["centers"].shape == (2 * (1000 // 50), 2)
    capsys.readouterr()
    fes_out = workdir / "opes_fes.npy"
    rc = main(["fes", str(bias_out), "--grid=-1.5:1.5:31",
               "--out", str(fes_out)])
    assert rc == 0
    assert "OPES (gamma=" in capsys.readouterr().out
    f = np.load(fes_out)
    assert f.shape == (31, 31) and np.isfinite(f).all() and f.min() == 0.0
    rc = main(["mep", str(bias_out), "--start=-1,0", "--end", "1,0",
               "--images", "12", "--iterations", "200"])
    assert rc == 0
    assert "barrier F" in capsys.readouterr().out


def test_reweight_cli(tmp_path, capsys):
    """'reweight' turns a saved bias + CV values into importance
    weights matching the library's frame_weights (mean 1), requires
    --kT for hills files, and uses the stored kT for OPES kernels."""
    import jax.numpy as jnp

    from molann_tpu.sampling import MetadBias, OpesBias

    rng = np.random.default_rng(3)
    cvs = rng.normal(size=(200, 2)).astype(np.float32)
    np.save(tmp_path / "cvs.npy", cvs)

    hills = tmp_path / "hills.npz"
    MetadBias(rng.normal(size=(7, 2)).astype(np.float32), height=0.4,
              sigma=0.3).save(hills)
    with pytest.raises(SystemExit, match="--kT"):
        main(["reweight", str(hills), str(tmp_path / "cvs.npy")])
    out = tmp_path / "w.npy"
    rc = main(["reweight", str(hills), str(tmp_path / "cvs.npy"),
               "--kT", "0.25", "--out", str(out)])
    assert rc == 0
    w = np.load(out)
    assert w.shape == (200,) and w.mean() == pytest.approx(1.0, abs=1e-5)
    want = np.asarray(MetadBias.load(hills).frame_weights(
        jnp.asarray(cvs), 0.25))
    np.testing.assert_allclose(w, want, rtol=1e-6)
    assert "effective sample size" in capsys.readouterr().out

    kern = tmp_path / "kernels.npz"
    OpesBias(rng.normal(size=(5, 2)).astype(np.float32),
             np.ones(5, np.float32), sigma=0.3, gamma=8.0, kT=0.25,
             barrier=4.0).save(kern)
    rc = main(["reweight", str(kern), str(tmp_path / "cvs.npy"),
               "--out", str(out)])  # no --kT: kernels carry their own
    assert rc == 0
    assert np.load(out).mean() == pytest.approx(1.0, abs=1e-5)
    # dimension mismatch errors cleanly
    np.save(tmp_path / "cv1.npy", cvs[:, 0])
    with pytest.raises(SystemExit, match="2-d CV"):
        main(["reweight", str(kern), str(tmp_path / "cv1.npy")])


def test_msm_cli_coarse_and_mfpt(workdir, capsys):
    """'msm --coarse --mfpt-to' prints PCCA+ metastable sets and
    first-passage times on a two-basin CV series, and saves the extra
    fields."""
    rng = np.random.default_rng(13)
    # two-basin series: slow sign flips, fast intra-basin noise
    sign = np.empty(40_000, np.float32)
    sign[0] = -1.0
    flips = rng.random(len(sign) - 1) < 0.001
    for t in range(1, len(sign)):
        sign[t] = -sign[t - 1] if flips[t - 1] else sign[t - 1]
    z = sign + 0.25 * rng.normal(size=len(sign)).astype(np.float32)
    np.save(workdir / "cv_twobasin.npy", z)
    rc = main(["msm", str(workdir / "cv_twobasin.npy"), "--lag", "5",
               "--grid=-2:2:8", "--coarse", "2", "--mfpt-to", "0,1,2,3",
               "--out", str(workdir / "msm2.npz")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "PCCA+ coarse-graining into 2 metastable sets" in out
    assert "MFPT to states [0, 1, 2, 3]" in out
    saved = np.load(workdir / "msm2.npz")
    assign = saved["assignments"]
    # the left bins (0-3) and right bins (4-7) form the two sets
    pop = saved["pi"] > 0
    left = assign[:4][pop[:4]]
    right = assign[4:][pop[4:]]
    assert len(set(left)) == 1 and len(set(right)) == 1
    assert left[0] != right[0]
    assert saved["coarse_transition"].shape == (2, 2)
    # MFPT from the right basin to the left ~ 1/flip-rate scale
    fp = saved["mfpt"]
    src = pop & np.isfinite(fp) & (fp > 0)
    assert src.any() and fp[src].max() > 100.0

    # --tpt on the same series: the left->right rate is the flip rate
    rc = main(["msm", str(workdir / "cv_twobasin.npy"), "--lag", "5",
               "--grid=-2:2:8", "--tpt", "1,2:5,6",
               "--out", str(workdir / "msm3.npz")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "TPT [1, 2] -> [5, 6]: rate" in out
    assert "pathway" in out and "% of the flux" in out
    saved = np.load(workdir / "msm3.npz")
    q = saved["committor"]
    assert q.shape == (8,)
    # committor rises monotonically over the populated interior bins
    assert q[1] == 0.0 and q[5] == 1.0 and q[3] <= q[4]
    assert saved["net_flux"].shape == (8, 8)
    # flips happen at rate 1e-3/frame; the MSM rate should be that scale
    assert 1e-4 < float(saved["rate"]) < 1e-2
    with pytest.raises(SystemExit, match="colon-separated"):
        main(["msm", str(workdir / "cv_twobasin.npy"), "--tpt", "1,2"])


def test_msm_cli_bootstrap(workdir, capsys):
    """'msm --bootstrap N' prints 95% CIs on timescales and populations
    and saves the resample arrays; the CI brackets the point estimate."""
    rng = np.random.default_rng(17)
    a = 0.9
    z = np.empty(30_000, np.float32)
    z[0] = 0.0
    for t in range(1, len(z)):
        z[t] = a * z[t - 1] + np.float32(np.sqrt(1 - a * a)) * np.float32(
            rng.normal())
    np.save(workdir / "cv_boot.npy", z)
    rc = main(["msm", str(workdir / "cv_boot.npy"), "--lag", "2",
               "--grid=-3:3:10", "--bootstrap", "25",
               "--out", str(workdir / "msm_boot.npz")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "bootstrap (25 resamples of" in out
    assert "95% CIs:" in out
    assert "top-state populations:" in out
    ts0 = float(out.split("implied timescales (frames): ")[1]
                .split(",")[0])
    ci = out.split("95% CIs: [")[1]
    lo = float(ci.split(",")[0])
    hi = float(ci.split(",")[1].split("]")[0])
    assert lo < ts0 < hi
    saved = np.load(workdir / "msm_boot.npz")
    assert saved["bootstrap_timescales"].shape == (25, 3)
    assert saved["bootstrap_pi"].shape == (25, 10)

def test_train_cli_ensemble_and_committee(workdir, capsys):
    """'train --ensemble K --bagging' writes K member models; the
    'committee' subcommand streams mean + disagreement that match a
    direct calibrated_committee() evaluation."""
    assert main([
        "build", str(workdir / "system.pdb"), str(workdir / "features.txt"),
        "--section", "Output", "--mlp", "6", "1",
        "--out", str(workdir / "ens0.npz"),
    ]) == 0
    rc = main([
        "train", str(workdir / "ens0.npz"), str(workdir / "traj.npy"),
        "--loss", "autoencoder", "--steps", "25", "--batch-size", "256",
        "--ensemble", "3", "--bagging", "--log-every", "0",
        "--out", str(workdir / "ens.npz"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "trained committee of 3" in out
    members = [workdir / f"ens.member{i}.npz" for i in range(3)]
    assert all(p.exists() for p in members)
    assert not (workdir / "ens.npz").exists()

    rc = main([
        "committee", *[str(p) for p in members], str(workdir / "traj.npy"),
        "--out", str(workdir / "cmean.npy"),
        "--std-out", str(workdir / "cstd.npy"),
        "--calibrate", str(workdir / "traj.npy"),
        "--batch-size", "256",
    ])
    assert rc == 0
    mean = np.load(workdir / "cmean.npy")
    std = np.load(workdir / "cstd.npy")
    assert mean.shape == std.shape == (700, 1)
    assert np.isfinite(mean).all() and (std >= 0).all()

    # matches a direct calibrated_committee evaluation
    import jax.numpy as jnp

    from molann_tpu.io import load_model
    from molann_tpu.train import calibrated_committee, stack_models

    stacked = stack_models([load_model(str(p)) for p in members])
    frames = jnp.asarray(np.load(workdir / "traj.npy"))
    n = frames.shape[0]
    sel = np.unique(np.linspace(0, n - 1, min(n, 4096)).astype(int))
    em, es = calibrated_committee(stacked, frames, frames[sel])
    np.testing.assert_allclose(mean, np.asarray(em), atol=2e-5)
    np.testing.assert_allclose(std, np.asarray(es), atol=2e-5)

    # uncalibrated path + validation errors
    rc = main([
        "committee", *[str(p) for p in members], str(workdir / "traj.npy"),
        "--out", str(workdir / "cmean2.npy"),
        "--std-out", str(workdir / "cstd2.npy"),
    ])
    assert rc == 0
    assert main([
        "committee", str(members[0]), str(workdir / "traj.npy"),
    ]) == 1  # < 2 members
    assert main([
        "train", str(workdir / "ens0.npz"), str(workdir / "traj.npy"),
        "--loss", "autoencoder", "--bagging",
        "--out", str(workdir / "x.npz"),
    ]) == 1  # --bagging without --ensemble
    capsys.readouterr()
