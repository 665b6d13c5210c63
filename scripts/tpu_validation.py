"""One-command TPU validation: every BASELINE.json config on real hardware.

Runs the full parity + throughput matrix on the attached TPU and prints
one PASS/FAIL line per check (exit code != 0 on any failure):

    python scripts/tpu_validation.py

Configs covered (BASELINE.json):
 1. alanine bond+dihedral FeatureLayer -> MLP (values + grads vs XLA path)
 2. all feature types x use_angle_value on/off (golden values)
 3. AlignmentLayer + position features -> MLP (fused parity)
 4. autodiff CV training on large frame batches (fused train step)
 5. chignolin-scale model fused end to end
plus the fused-kernel throughput benchmarks.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

FAILURES = []


def check(name, ok, detail=""):
    status = "PASS" if ok else "FAIL"
    print(f"[{status}] {name}  {detail}")
    if not ok:
        FAILURES.append(name)


def main():
    from molann_tpu.ann import (
        AlignmentLayer,
        FeatureLayer,
        MolANN,
        PreprocessingANN,
        create_sequential_nn,
    )
    from molann_tpu.feature import Feature
    from molann_tpu.ops.fused import fused_cv_forces, fused_model_forward
    from molann_tpu.systems import (
        alanine_histogram_features,
        alanine_model,
        alanine_universe,
        peptide_backbone_features,
        synthetic_peptide,
    )
    from molann_tpu.train import fused_mse_loss, make_train_step, masked_optimizer, trainable_mask

    import optax

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # -- config 2: golden feature values ---------------------------------
    u = alanine_universe()
    feats = alanine_histogram_features(u)
    x0 = jnp.asarray(u.atoms.positions[None])
    golden = {
        False: [-1.0, 0.0, -1.0, 0.0, 1.529683, 1.2300372,
                -0.33281142, -0.5423109],
        True: [3.1415927, 3.1415927, 1.529683, 1.2300372,
               1.9100797, 2.1439815],
    }
    for uav, expected in golden.items():
        out = np.asarray(FeatureLayer(feats, u.atoms, uav)(x0))[0]
        err = float(np.abs(out - np.asarray(expected, np.float32)).max())
        check(f"golden values (use_angle_value={uav})", err < 2e-6,
              f"max|err|={err:.2e}")

    # -- configs 1+3: fused parity on the flagship ------------------------
    model, _ = alanine_model()
    x = jnp.asarray(
        u.atoms.positions[None]
        + 0.05 * rng.normal(size=(4096, 22, 3)).astype(np.float32)
    )
    y_ref = jax.jit(lambda m, v: m(v))(model, x)
    y_f = jax.jit(lambda m, v: fused_model_forward(m, v))(model, x)
    err = float(jnp.abs(y_ref - y_f).max())
    check("fused forward parity (align+position+features+MLP)", err < 1e-5,
          f"max|err|={err:.2e}")

    gr = jax.jit(jax.grad(lambda v: jnp.sum(jnp.sin(model(v)))))(x)
    gf = jax.jit(
        jax.grad(lambda v: jnp.sum(jnp.sin(fused_model_forward(model, v))))
    )(x)
    err = float(jnp.abs(gr - gf).max()) / max(float(jnp.abs(gr).max()), 1e-9)
    check("fused coordinate-gradient parity", err < 1e-4, f"rel={err:.2e}")

    y_cv, g_cv = jax.jit(lambda m, v: fused_cv_forces(m, v))(model, x)
    g_ref = jax.jit(jax.grad(lambda v: jnp.sum(model(v))))(x)
    err = float(jnp.abs(g_cv - g_ref).max()) / max(
        float(jnp.abs(g_ref).max()), 1e-9
    )
    check("single-kernel CV+forces parity", err < 1e-4, f"rel={err:.2e}")

    # -- config 4: fused training step on a large batch -------------------
    opt = masked_optimizer(optax.adam(1e-3), trainable_mask(model))
    opt_state = opt.init(model)
    step = make_train_step(fused_mse_loss, opt)
    xb = jnp.asarray(
        u.atoms.positions.reshape(1, 66)
        + 0.05 * rng.normal(size=(1 << 20, 66)).astype(np.float32)
    )
    yb = jnp.asarray(rng.normal(size=(1 << 20, 3)).astype(np.float32))
    m2, opt_state, l0 = step(model, opt_state, (xb, yb))
    m2, opt_state, l1 = step(m2, opt_state, (xb, yb))
    check("fused train step on 1M-frame batch",
          np.isfinite(float(l0)) and float(l1) < float(l0),
          f"loss {float(l0):.4f} -> {float(l1):.4f}")

    # -- config 5: chignolin-scale fused ----------------------------------
    up = synthetic_peptide(10)
    pfeats = [Feature("pos", "position", up.select_atoms("name CA"))]
    pfeats += peptide_backbone_features(up)
    ppp = PreprocessingANN(
        AlignmentLayer(up.select_atoms("name CA"), up.atoms),
        FeatureLayer(pfeats, up.atoms),
    )
    pmodel = MolANN(ppp, create_sequential_nn(
        [ppp.output_dimension(), 32, 2], key=jax.random.PRNGKey(0)))
    xp = jnp.asarray(
        up.atoms.positions[None]
        + 0.02 * rng.normal(size=(2048, 50, 3)).astype(np.float32)
    )
    yp = jax.jit(lambda m, v: fused_cv_forces(m, v, tile=1024))(pmodel, xp)
    ypr = pmodel(xp)
    gpr = jax.grad(lambda v: jnp.sum(pmodel(v)))(xp)
    err_y = float(jnp.abs(yp[0] - ypr).max())
    err_g = float(jnp.abs(yp[1] - gpr).max()) / max(
        float(jnp.abs(gpr).max()), 1e-9
    )
    check("chignolin-scale fused parity", err_y < 1e-5 and err_g < 1e-4,
          f"y={err_y:.2e} g_rel={err_g:.2e}")

    # -- throughput --------------------------------------------------------
    n = 1 << 23
    xt = jnp.asarray(
        u.atoms.positions.reshape(66, 1)
        + 0.05 * rng.normal(size=(66, n)).astype(np.float32)
    )
    f = jax.jit(
        lambda m, v: fused_cv_forces(m, v, tile=1024, transposed_input=True)
    )

    def run():
        _, g = f(model, xt)
        return float(g[0, 0])

    run()
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    rate = n / min(ts)
    check("throughput >= 10M frames/s/chip target", rate >= 1e7,
          f"{rate/1e6:.0f}M frames/s")

    print()
    if FAILURES:
        print(f"{len(FAILURES)} FAILURES: {FAILURES}")
        return 1
    print("ALL CHECKS PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
