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

    # -- compiled-kernel parity across tiles / batch shapes ----------------
    # (VERDICT r01 #3: values, coordinate grads, AND parameter grads, at
    # several tiles and batch shapes, committed as a per-round artifact.)
    from molann_tpu.ops.fused import fused_train_grads
    from molann_tpu.train import mse_loss

    def grad_all(fn):
        return jax.jit(jax.grad(
            lambda m, v: jnp.sum(jnp.sin(fn(m, v))), argnums=(0, 1)
        ))

    def rel_leaf_err(tr, tf):
        # Per-leaf relative error (leaves span orders of magnitude).
        # Leaves whose REFERENCE gradient is negligible vs the global grad
        # scale are f32 noise, not signal (e.g. ref_x's gradient through
        # rotation-invariant features is mathematically zero; XLA returns
        # ~1e-7 noise while the fused kernels return exact 0) — for those,
        # require the candidate to be equally negligible instead of
        # dividing by noise.
        ra = jax.tree_util.tree_leaves(tr)
        fa = jax.tree_util.tree_leaves(tf)
        gscale = max(float(jnp.abs(a).max()) for a in ra)
        errs = []
        for a, b in zip(ra, fa):
            sa = float(jnp.abs(a).max())
            if sa < 1e-6 * gscale:
                errs.append(float(jnp.abs(b).max()) / gscale)
            else:
                errs.append(float(jnp.abs(a - b).max()) / sa)
        return max(errs)

    # fwd AND bwd tiles vary freely in 1024-multiples (the backward takes
    # vjp through the tile math only — see ops/fused.py:_check_tile)
    for tile, bwd_tile, l in ((1024, 1024, 4096), (2048, 2048, 6000),
                              (1024, 4096, 5000), (1024, 1024, 1000)):
        xs = jnp.asarray(
            u.atoms.positions[None]
            + 0.05 * rng.normal(size=(l, 22, 3)).astype(np.float32)
        )
        gm_r, gx_r = grad_all(lambda m, v: m(v))(model, xs)
        gm_f, gx_f = grad_all(
            lambda m, v, t=tile, bt=bwd_tile: fused_model_forward(
                m, v, tile=t, bwd_tile=bt)
        )(model, xs)
        ex = float(jnp.abs(gx_f - gx_r).max()) / max(
            float(jnp.abs(gx_r).max()), 1e-9)
        ep = rel_leaf_err(gm_r, gm_f)
        check(
            f"unrolled value+coord+PARAM grad parity "
            f"(tile={tile}/bwd={bwd_tile}, l={l})",
            ex < 1e-4 and ep < 1e-4, f"gx_rel={ex:.2e} gparam_rel={ep:.2e}")

    # -- blocked path: 300-atom peptide compiled parity + throughput -------
    # Parity here is judged against a float64 torch oracle: the synthetic
    # peptide's coordinates reach ~90 A, so ANY f32 implementation carries
    # a cancellation noise floor of ~|x| * 2^-24 per coordinate difference
    # (amplified through dihedral-gradient chains) — the XLA path included.
    # The contract: the blocked kernel is no further from f64 truth than
    # the XLA f32 path (within 2x + epsilon).
    from molann_tpu.systems import peptide_model

    def torch_f64_oracle(model_, spec_, x_np):
        import torch

        assert spec_.n_position_atoms == 0
        xt = torch.tensor(np.asarray(x_np, np.float64), requires_grad=True)
        cols = []
        for (a0, a1, a2) in spec_.angle_idx:
            r21 = xt[:, a0] - xt[:, a1]
            r23 = xt[:, a2] - xt[:, a1]
            cols.append(
                (r21 * r23).sum(-1)
                / (r21.norm(dim=-1) * r23.norm(dim=-1))
            )
        for (a0, a1) in spec_.bond_idx:
            cols.append((xt[:, a1] - xt[:, a0]).norm(dim=-1))
        for (a0, a1, a2, a3) in spec_.dihedral_idx:
            r12 = xt[:, a1] - xt[:, a0]
            r23 = xt[:, a2] - xt[:, a1]
            r34 = xt[:, a3] - xt[:, a2]
            n1 = torch.cross(r12, r23, dim=-1)
            n2 = torch.cross(r23, r34, dim=-1)
            cphi = (n1 * n2).sum(-1)
            sphi = (n1 * r34).sum(-1) * r23.norm(dim=-1)
            rad = torch.sqrt(cphi * cphi + sphi * sphi)
            cols.extend([cphi / rad, sphi / rad])
        feats = torch.stack(cols, dim=1)
        if spec_.perm is not None:
            feats = feats[:, list(spec_.perm)]
        h = feats
        n_l = len(model_.ann_layers.params)
        for li, (w, b) in enumerate(model_.ann_layers.params):
            h = h @ torch.tensor(np.asarray(w, np.float64)) + torch.tensor(
                np.asarray(b, np.float64))
            if li < n_l - 1:
                h = torch.tanh(h)
        (g64,) = torch.autograd.grad(h.sum(), xt)
        return h.detach().numpy(), g64.numpy()

    bmodel, bu = peptide_model(n_residues=60)
    bspec = bmodel.preprocessing_layer.feature_layer.spec
    nb_atoms = len(bu.atoms)
    for tile, l in ((256, 2048), (128, 1000)):
        x_np = (
            bu.atoms.positions[None]
            + 0.02 * rng.normal(size=(l, nb_atoms, 3))
        ).astype(np.float32)
        xs = jnp.asarray(x_np)
        y64, g64 = torch_f64_oracle(bmodel, bspec, x_np)
        y_r = np.asarray(jax.jit(lambda m, v: m(v))(bmodel, xs))
        g_r = np.asarray(jax.jit(jax.grad(lambda v: jnp.sum(bmodel(v))))(xs))
        yb, gb = jax.jit(
            lambda m, v, t=tile: fused_cv_forces(m, v, tile=t, mode="blocked")
        )(bmodel, xs)
        y_b, g_b = np.asarray(yb), np.asarray(gb)
        gscale = np.abs(g64).max()
        e_xla_y = np.abs(y_r - y64).max()
        e_blk_y = np.abs(y_b - y64).max()
        e_xla_g = np.abs(g_r - g64).max() / gscale
        e_blk_g = np.abs(g_b - g64).max() / gscale
        ok = (e_blk_y <= 2 * e_xla_y + 2e-6) and (
            e_blk_g <= 2 * e_xla_g + 1e-5)
        check(
            f"blocked peptide(60) vs f64 oracle (tile={tile}, l={l})", ok,
            f"y: blocked={e_blk_y:.2e} xla={e_xla_y:.2e} | g_rel: "
            f"blocked={e_blk_g:.2e} xla={e_xla_g:.2e}",
        )

    # param grads through the blocked backward kernel
    xs = jnp.asarray(
        bu.atoms.positions[None]
        + 0.02 * rng.normal(size=(2048, nb_atoms, 3)).astype(np.float32)
    )
    gm_r, _ = grad_all(lambda m, v: m(v))(bmodel, xs)
    gm_b, _ = grad_all(
        lambda m, v: fused_model_forward(m, v, mode="blocked")
    )(bmodel, xs)
    ep = rel_leaf_err(gm_r, gm_b)
    check("blocked peptide(60) PARAM grad parity", ep < 1e-4,
          f"gparam_rel={ep:.2e}")

    nbl = 1 << 18
    xbl = jax.jit(
        lambda: jnp.asarray(np.transpose(bu.atoms.positions, (1, 0)))[:, :, None]
        + 0.02 * jax.random.normal(
            jax.random.PRNGKey(0), (3, nb_atoms, nbl), jnp.float32)
    )()
    fb = jax.jit(lambda m, v: fused_cv_forces(m, v, mode="blocked"))

    def run_blocked():
        r = None
        for _ in range(6):
            r = fb(bmodel, xbl)
        return float(r[1][0, 0, 0])

    run_blocked()
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        run_blocked()
        ts.append(time.perf_counter() - t0)
    rate_b = 6 * nbl / min(ts)
    check("blocked peptide(60) fwd+bwd >= 10M frames/s/chip",
          rate_b >= 1e7, f"{rate_b/1e6:.1f}M frames/s (device, pipelined)")

    # -- active-atom compaction (large system, small CV set) ---------------
    from molann_tpu.feature import Feature
    from molann_tpu.models.ann import MolANN, create_sequential_nn
    from molann_tpu.ops.fused import active_atom_indices
    from molann_tpu.systems import synthetic_peptide

    su = synthetic_peptide(120)  # 600 atoms
    s_n = len(su.atoms)
    ssel = lambda nm, r: su.select_atoms(f"name {nm} and resid {r}")  # noqa: E731
    sfeats = [
        Feature("d", "dihedral",
                ssel("C", 30) + ssel("N", 31) + ssel("CA", 31) + ssel("C", 31)),
        Feature("b", "bond", ssel("CA", 10) + ssel("CA", 90)),
        Feature("a", "angle", ssel("N", 60) + ssel("CA", 60) + ssel("C", 60)),
    ]
    spp = PreprocessingANN(None, FeatureLayer(sfeats, su.atoms))
    smodel = MolANN(spp, create_sequential_nn(
        [spp.output_dimension(), 8, 2], key=jax.random.PRNGKey(9)))
    act = active_atom_indices(smodel)
    check("compaction active on sparse 600-atom system",
          act is not None and len(act) == 9, f"active={act}")
    xs_s = jnp.asarray(
        su.atoms.positions[None]
        + 0.05 * rng.normal(size=(256, s_n, 3)).astype(np.float32))
    yf, gf = jax.jit(lambda m, v: fused_cv_forces(m, v, mode="blocked"))(
        smodel, xs_s)
    yc, gc = jax.jit(lambda m, v: fused_cv_forces(
        m, v, mode="blocked", compact_grads=True))(smodel, xs_s)
    g_ref = jax.jit(jax.grad(lambda v: jnp.sum(smodel(v))))(xs_s)
    scale_s = float(jnp.abs(g_ref).max())
    e_full = float(jnp.abs(gf - g_ref).max()) / scale_s
    gfa = np.asarray(gf)
    inactive = np.setdiff1d(np.arange(s_n), np.asarray(act))
    zeros_ok = bool(np.all(gfa[:, inactive, :] == 0.0))
    g_gather = np.transpose(gfa, (2, 1, 0))[:, np.asarray(act), :]
    e_comp = float(np.abs(np.asarray(gc) - g_gather).max()) / scale_s
    check("compaction full-width grad parity + exact zeros",
          e_full < 1e-4 and zeros_ok, f"rel={e_full:.2e} zeros={zeros_ok}")
    check("compact_grads rows == gathered full grads",
          e_comp < 1e-6 and gc.shape == (3, len(act), 256),
          f"rel={e_comp:.2e} shape={gc.shape}")

    # -- single-kernel fused training grads --------------------------------
    for mode, m_, uu, tile in (("unrolled", model, u, 1024),
                               ("blocked", bmodel, bu, None)):
        na_ = len(uu.atoms)
        d_ = m_.ann_layers.output_dimension()
        xs = jnp.asarray(
            uu.atoms.positions[None]
            + 0.05 * rng.normal(size=(3000, na_, 3)).astype(np.float32)
        )
        ys = jnp.asarray(rng.normal(size=(3000, d_)).astype(np.float32))
        l_r, g_r = jax.jit(jax.value_and_grad(mse_loss))(m_, (xs, ys))
        l_f, g_f = jax.jit(
            # train_ref=True: the XLA reference differentiates ref_x too;
            # the production default (False) skips that frozen buffer.
            # precision="exact": this is the kernel-math parity check
            # (the shipped training default "auto" resolves to tf32)
            lambda mm, a, b, t=tile: fused_train_grads(
                mm, a, b, tile=t, train_ref=True, precision="exact")
        )(m_, xs, ys)
        el = abs(float(l_f) - float(l_r))
        ep = rel_leaf_err(g_r, g_f)
        check(f"fused train grads parity ({mode})", el < 1e-5 and ep < 1e-4,
              f"loss_err={el:.2e} gparam_rel={ep:.2e}")
        if mode == "blocked":
            # the shipped precision="auto" (tf32) policy: compiles and
            # stays within its documented ~5e-3-relative envelope
            l_t, g_t = jax.jit(
                lambda mm, a, b: fused_train_grads(
                    mm, a, b, train_ref=True, precision="auto")
            )(m_, xs, ys)
            et = rel_leaf_err(g_r, g_t)
            check("tf32 training policy within documented envelope",
                  abs(float(l_t) - float(l_r)) < 1e-3 and et < 2e-2,
                  f"loss_err={abs(float(l_t) - float(l_r)):.2e} "
                  f"gparam_rel={et:.2e}")

    ntr = 1 << 22
    xtr = jax.jit(
        lambda: jnp.asarray(u.atoms.positions.reshape(66, 1))
        + 0.05 * jax.random.normal(jax.random.PRNGKey(0), (66, ntr))
    )()
    ytr = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(1), (3, ntr))
    )()
    ft = jax.jit(lambda m, a, b: fused_train_grads(
        m, a, b, tile=2048, transposed_input=True))

    def run_train():
        r = None
        for _ in range(4):
            r = ft(model, xtr, ytr)
        return float(r[0])

    run_train()
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        run_train()
        ts.append(time.perf_counter() - t0)
    rate_t = 4 * ntr / min(ts)
    check("fused training grads >= 60M frames/s/chip (alanine)",
          rate_t >= 6e7, f"{rate_t/1e6:.1f}M frames/s (device, pipelined)")

    # -- closed enhanced-sampling loop (biased dynamics, TPU) -------------
    from molann_tpu.sampling import (
        ToyPeptidePotential,
        metadynamics_langevin,
    )

    pot = ToyPeptidePotential(u, barrier=6.0)
    ag = (u.select_atoms("bynum 5") + u.select_atoms("bynum 7")
          + u.select_atoms("bynum 9") + u.select_atoms("bynum 15"))
    cv_phi = PreprocessingANN(
        None, FeatureLayer([Feature("phi", "dihedral", ag)], u.atoms)
    )
    walkers = jnp.asarray(np.repeat(u.atoms.positions[None], 3, axis=0))
    run_metad = jax.jit(
        lambda x: metadynamics_langevin(
            pot.energy, cv_phi, x, n_steps=5000, dt=2e-4, kT=0.25,
            key=jax.random.PRNGKey(1), height=0.5, sigma=0.25, stride=50,
        )[:2]
    )
    traj, _ = run_metad(walkers)
    cos_phi = np.cos(np.asarray(pot.phi(traj.reshape(-1, 22, 3))))
    check("metadynamics escapes the start basin (biased MD on TPU)",
          float(cos_phi.max()) > 0.5,
          f"max cos(phi)={float(cos_phi.max()):+.2f} "
          f"(unbiased stays ~ -1)")

    # bias forces through the fused serving kernel == jnp chain rule
    xw = walkers + jnp.asarray(
        0.03 * rng.standard_normal(walkers.shape), jnp.float32
    )
    centers = jnp.asarray(rng.standard_normal((8, 2)), jnp.float32)
    from molann_tpu.sampling import MetadBias

    bias = MetadBias(centers, height=0.5, sigma=0.3)
    g_jnp = jax.grad(
        lambda x: jnp.sum(bias.energy(cv_phi(x)))
    )(xw)
    y0, g0 = fused_cv_forces(cv_phi, xw, component=0, mode="unrolled")
    _, g1 = fused_cv_forces(cv_phi, xw, component=1, mode="unrolled")
    dV_ds = jax.grad(lambda s: jnp.sum(bias.energy(s)))(y0)
    g_fused = (dV_ds[:, 0][:, None, None] * g0
               + dV_ds[:, 1][:, None, None] * g1)
    errb = float(
        jnp.abs(g_fused - g_jnp).max()
        / (jnp.abs(g_jnp).max() + 1e-12)
    )
    check("bias forces via fused kernel == jnp chain rule", errb < 1e-4,
          f"rel={errb:.2e}")

    # OPES on hardware: finite dynamics, bias depth capped at the barrier
    from molann_tpu.sampling import opes_langevin

    o_traj, _, o_bias = opes_langevin(
        pot.energy, cv_phi, walkers, n_steps=4000, dt=4e-4, kT=0.35,
        key=jax.random.PRNGKey(4), sigma=0.1, stride=50, barrier=10.0,
    )
    o_t = np.asarray(o_traj)
    o_ang = np.linspace(-np.pi, np.pi, 90)
    o_grid = jnp.asarray(
        np.stack([np.cos(o_ang), np.sin(o_ang)], 1), jnp.float32
    )
    o_v = np.asarray(o_bias.energy(o_grid))
    check("OPES biased dynamics on TPU (finite, depth-capped bias)",
          bool(np.isfinite(o_t).all())
          and o_v.min() >= -10.0 - 1e-3
          and o_v.max() - o_v.min() > 0.5,
          f"V in [{o_v.min():.2f}, {o_v.max():.2f}] (cap 10)")

    # -- eigenfunction CV objective on hardware ----------------------------
    from molann_tpu.train import eigenfunction_loss, make_eigenfunction_loss

    emodel = alanine_model()[0]
    xe = jnp.asarray(
        u.atoms.positions[None]
        + 0.05 * rng.standard_normal((512, 22, 3)),
        jnp.float32,
    )
    we = jnp.asarray(rng.uniform(0.5, 2.0, 512), jnp.float32)
    eopt = masked_optimizer(optax.adam(2e-3), trainable_mask(emodel))
    estate = eopt.init(emodel)
    estep = make_train_step(make_eigenfunction_loss(beta=4.0, alpha=20.0),
                            eopt)
    el0 = None
    for i in range(30):
        emodel, estate, el = estep(emodel, estate, (xe, we))
        if i == 0:
            el0 = float(el)
    el1 = float(el)
    check("eigenfunction objective trains on TPU (weighted)",
          np.isfinite(el1) and el1 < el0, f"loss {el0:.2f} -> {el1:.2f}")
    # importance weighting is exact on the chip: weight-2 on one frame
    # == listing the frame twice
    wa = jnp.ones(64).at[3].set(2.0)
    ea = float(eigenfunction_loss(emodel, xe[:64], weights=wa))
    eb = float(eigenfunction_loss(
        emodel, jnp.concatenate([xe[:64], xe[3:4]])
    ))
    erel = abs(ea - eb) / (abs(eb) + 1e-12)
    check("eigenfunction weighting == frame duplication on TPU",
          erel < 1e-4, f"rel={erel:.2e}")

    # -- committor methods on hardware --------------------------------------
    # variational committor objective trains on TPU; the first-passage
    # estimator (one compiled scan) brackets q=1/2 at the barrier top
    from molann_tpu.sampling import (
        ToyPeptidePotential,
        empirical_committor,
        rotate_torsion,
    )
    from molann_tpu.train import committor_loss

    free = (4, 6, 8, 14)
    pot_c = ToyPeptidePotential(u, free_torsion=free, barrier=2.0)
    phi_ref = float(pot_c.phi(jnp.asarray(u.atoms.positions[None]))[0])
    angles = np.linspace(-np.pi, np.pi, 64, endpoint=False)
    sweep = jnp.asarray(np.stack(
        [rotate_torsion(u, free, a) for a in angles]))
    dcos_sweep = np.cos(np.asarray(pot_c.phi(sweep)) - phi_ref)
    lab_c = jnp.asarray(np.where(dcos_sweep > 0.7, 1,
                                 np.where(dcos_sweep < -0.7, 2, 0)))
    from molann_tpu.ann import create_sequential_nn as _mk_nn

    qnet = _mk_nn([3 * 22, 16, 1], key=jax.random.PRNGKey(7))
    qmodel = lambda xx: qnet(xx.reshape(xx.shape[0], -1))  # noqa: E731

    def closs(m):
        return committor_loss(
            lambda xx: m(xx.reshape(xx.shape[0], -1)), sweep, lab_c,
            beta=4.0, alpha=200.0)

    cl0 = float(closs(qnet))
    copt = optax.adam(5e-3)
    cstate = copt.init(qnet)

    @jax.jit
    def cstep(m, s):
        val, g = jax.value_and_grad(closs)(m)
        upd, s = copt.update(g, s, m)
        return optax.apply_updates(m, upd), s, val

    for _ in range(60):
        qnet, cstate, cl = cstep(qnet, cstate)
    cl1 = float(cl)
    check("committor objective trains on TPU",
          np.isfinite(cl1) and cl1 < cl0, f"loss {cl0:.2f} -> {cl1:.2f}")

    q_emp, frac_emp = empirical_committor(
        pot_c.energy,
        np.stack([rotate_torsion(u, free, np.pi / 2)]),
        lambda xx: jnp.cos(pot_c.phi(xx) - phi_ref) > 0.7,
        lambda xx: jnp.cos(pot_c.phi(xx) - phi_ref) < -0.7,
        n_steps=8000, dt=1e-3, kT=0.25, key=jax.random.PRNGKey(2),
        n_replicas=64,
    )
    qv, fv = float(q_emp[0]), float(frac_emp[0])
    # 64 replicas: MC sigma ~0.07 around the true 1/2 when ~90% resolve
    check("first-passage committor ~1/2 at the barrier top (TPU scan)",
          fv > 0.75 and 0.25 < qv < 0.75, f"q={qv:.2f} resolved={fv:.2f}")

    # -- umbrella sampling + MBAR on hardware --------------------------------
    from molann_tpu.sampling import mbar, pmf_from_samples, umbrella_sampling

    cents = np.linspace(-0.9, 0.9, 11).astype(np.float32)
    x0_w = jnp.asarray(np.stack(
        [rotate_torsion(u, free, float(np.arccos(c))) for c in cents]))
    cv_fn = lambda xx: jnp.cos(pot_c.phi(xx) - phi_ref)  # noqa: E731
    cvs_w, _ = umbrella_sampling(
        pot_c.energy, cv_fn, x0_w, cents, k_spring=40.0, n_steps=12000,
        dt=1e-3, kT=0.25, key=jax.random.PRNGKey(3), thin=10, n_equil=200)
    cvs_np = np.asarray(cvs_w)
    pooled = cvs_np.reshape(-1)
    ukn = (20.0 * (pooled[None, :] - cents[:, None]) ** 2) / 0.25
    _, logw = mbar(ukn, np.full(cvs_np.shape[0], cvs_np.shape[1]))
    edges = np.linspace(-0.85, 0.85, 18)
    mids = (edges[1:] + edges[:-1]) / 2
    fe = pmf_from_samples(pooled, logw, edges, kT=0.25)
    ftrue = 2.0 * (1 - mids ** 2) + 0.125 * np.log(1 - mids ** 2)
    ftrue -= ftrue.min()
    okb = np.isfinite(fe)
    shift = np.mean(fe[okb] - ftrue[okb])
    errb = float(np.abs(fe[okb] - ftrue[okb] - shift).max())
    check("umbrella + MBAR recovers the double-well PMF on TPU",
          okb.sum() >= 15 and errb < 0.5, f"max|dF|={errb:.2f}")

    # -- BAOAB underdamped integrator on TPU --------------------------------
    # Gibbs check on a harmonic well: configurational variance = kT/k
    # exactly (BAOAB is superconvergent there), velocities equipartition
    from molann_tpu.sampling import baoab_langevin, kinetic_temperature

    bm = np.array([1.0, 4.0], np.float32)
    btraj, _, bvf = jax.jit(
        lambda x0, key: baoab_langevin(
            lambda x: 0.5 * jnp.sum(x * x, axis=(-1, -2)), x0,
            n_steps=3000, dt=0.05, kT=0.7, gamma=1.0, mass=bm, key=key,
            thin=30,
        )
    )(jnp.zeros((128, 2, 3)), jax.random.PRNGKey(11))
    bt = np.asarray(btraj)[50:]
    var_err = float(np.abs(bt.reshape(-1, 2, 3).var(axis=0) - 0.7).max())
    kt_kin = float(np.mean(np.asarray(kinetic_temperature(bvf, bm))))
    check("BAOAB samples the harmonic Gibbs measure on TPU",
          var_err < 0.08 and abs(kt_kin - 0.7) < 0.1,
          f"max|Var(x)-kT|={var_err:.3f} kT_kin={kt_kin:.3f}")

    # -- time-lagged estimators (TICA moments + VAMP score) on TPU ----------
    from molann_tpu.train import tica, vamp2_score

    a_ou = np.array([0.9, 0.5])
    z = np.empty((20000, 2))
    z[0] = 0
    g_ou = rng.normal(size=(19999, 2)) * np.sqrt(1 - a_ou**2)
    for t in range(19999):
        z[t + 1] = a_ou * z[t] + g_ou[t]
    x_ou = (z @ np.array([[1.0, 0.3], [0.2, 1.0]]).T).astype(np.float32)
    r_t = tica(x_ou[:-1], x_ou[1:])
    v_t = float(vamp2_score(jnp.asarray(x_ou[:-1]), jnp.asarray(x_ou[1:])))
    terr = float(np.abs(r_t.eigenvalues - a_ou).max())
    check("TICA/VAMP recover the AR(1) spectrum on TPU",
          terr < 0.05 and abs(v_t - float(np.sum(a_ou**2))) < 0.08,
          f"max|lam-a|={terr:.3f} vamp2={v_t:.3f}")

    # TAE on hardware: the rank-1 bottleneck selects the slow coordinate
    from molann_tpu.train import fit, timelagged_autoencoder_loss

    t_enc = create_sequential_nn([2, 1], key=jax.random.PRNGKey(0))
    t_dec = create_sequential_nn([1, 2], key=jax.random.PRNGKey(1))
    zt = jnp.asarray(z[:-1], jnp.float32)
    zt1 = jnp.asarray(z[1:], jnp.float32)

    def tae_loss(pair, batch):
        e, d = pair
        return timelagged_autoencoder_loss(
            e, d, lambda v: v, batch[0], batch[1]
        )

    def tae_batches():
        while True:
            yield (zt, zt1)

    tae_res = fit((t_enc, t_dec), tae_loss, tae_batches(), num_steps=120,
                  optimizer=optax.adam(0.05))
    t_w = np.asarray(tae_res.model[0].params[0][0]).reshape(2)
    t_cos = abs(t_w[0]) / np.linalg.norm(t_w)
    check("TAE bottleneck selects the slow AR(1) coordinate on TPU",
          tae_res.losses[-1] < tae_res.losses[0] and t_cos > 0.95,
          f"cos(enc, slow)={t_cos:.3f}")

    # -- string method finds the Mueller-Brown saddle on TPU ----------------
    from molann_tpu.sampling import linear_path, string_method

    mb_A = jnp.asarray([-200.0, -100.0, -170.0, 15.0])
    mb_a = jnp.asarray([-1.0, -1.0, -6.5, 0.7])
    mb_b = jnp.asarray([0.0, 0.0, 11.0, 0.6])
    mb_c = jnp.asarray([-10.0, -10.0, -6.5, 0.7])
    mb_x0 = jnp.asarray([1.0, 0.0, -0.5, -1.0])
    mb_y0 = jnp.asarray([0.0, 0.5, 1.5, 1.0])

    def mb(zz):
        xx, yy = zz[..., 0:1], zz[..., 1:2]
        return jnp.sum(
            mb_A * jnp.exp(mb_a * (xx - mb_x0) ** 2
                           + mb_b * (xx - mb_x0) * (yy - mb_y0)
                           + mb_c * (yy - mb_y0) ** 2), axis=-1)

    s_imgs, s_e = string_method(
        mb, linear_path([-0.51, 1.49], [0.57, -0.02], 40),
        n_iterations=6000, step=5e-5,
    )
    s_e = np.asarray(s_e)
    s_barrier = float(s_e.max())
    s_top = int(s_e.argmax())
    check("string method finds the Mueller-Brown saddle on TPU",
          abs(s_barrier - (-40.665)) < 1.5 and 0 < s_top < len(s_e) - 1,
          f"barrier={s_barrier:.2f} (want -40.665)")

    # -- TorchScript interop through the fused path ------------------------
    # migration contract on hardware: a reference-layout .pt artifact
    # imports and serves through the compiled Mosaic kernel at parity
    # with torch autograd on the artifact itself
    try:
        import tempfile

        import torch

        from molann_tpu.io.torch_export import export_torchscript
        from molann_tpu.io.torch_import import load_torchscript

        with tempfile.TemporaryDirectory() as td:
            pt = f"{td}/model.pt"
            export_torchscript(model, pt)
            imported = load_torchscript(pt)
            xb = np.asarray(
                u.atoms.positions[None]
                + 0.04 * rng.normal(size=(512, 22, 3)),
                np.float32,
            )
            yk = np.asarray(fused_model_forward(imported, jnp.asarray(xb)))
            yt = torch.jit.load(pt)(torch.tensor(xb)).detach().numpy()
            ierr = float(np.abs(yk - yt).max())
            check("torchscript import -> fused kernel parity vs torch",
                  ierr < 5e-5, f"max|err|={ierr:.2e}")
    except ImportError:
        print("[skip] torchscript interop (torch unavailable)")

    # -- coordination features (compiled Mosaic, unrolled path) ------------
    cfeats = [
        Feature("b1", "bond", u.select_atoms("bynum 2 5")),
        Feature("c1", "coordination", u.select_atoms("bynum 2 5 9"),
                group_b=u.select_atoms("bynum 15 17 19"), r0=3.0,
                pbc_box=[24.0, 24.0, 24.0]),  # compiled min-image path
        Feature("c2", "coordination", u.select_atoms("bynum 2 5 9"),
                r0=4.0, nn=4, mm=10),
    ]
    cmodel = MolANN(
        PreprocessingANN(None, FeatureLayer(cfeats, u.atoms)),
        create_sequential_nn([3, 5, 2], key=jax.random.PRNGKey(3)),
    )
    xc = jnp.asarray(
        u.atoms.positions[None]
        + 0.2 * rng.normal(size=(2048, 22, 3)), jnp.float32)
    yc = np.asarray(jax.jit(
        lambda m, v: fused_model_forward(m, v, tile=1024))(cmodel, xc))
    yj = np.asarray(jax.jit(lambda m, v: m(v))(cmodel, xc))
    cerr = float(np.abs(yc - yj).max())
    check("coordination features: compiled fused fwd == jnp", cerr < 5e-5,
          f"max|err|={cerr:.2e}")
    yv, gc = jax.jit(
        lambda m, v: fused_cv_forces(m, v, tile=1024))(cmodel, xc)
    gj = jax.jit(jax.grad(lambda v: jnp.sum(cmodel(v))))(xc)
    gj_n = np.asarray(gj)
    scale = max(float(np.abs(gj_n).max()), 1e-12)
    gerr = float(np.abs(
        np.asarray(gc).reshape(np.asarray(gj_n).shape) - gj_n).max()) / scale
    # the r^12 switching powers amplify f32 op-order differences in the
    # gradient; ~2e-4 relative is the observed compiled-vs-XLA spread
    check("coordination features: compiled fused grads == jax.grad",
          gerr < 5e-4, f"rel={gerr:.2e}")
    # blocked formulation (pair differences ride the edge matmul)
    yb, gb = jax.jit(lambda m, v: fused_cv_forces(
        m, v, tile=256, mode="blocked"))(cmodel, xc)
    berr = float(np.abs(np.asarray(yb) - yj).max())
    bgerr = float(np.abs(
        np.asarray(gb).reshape(gj_n.shape) - gj_n).max()) / scale
    check("coordination features: compiled BLOCKED fwd+grads == XLA",
          berr < 5e-5 and bgerr < 5e-4,
          f"max|err|={berr:.2e} grad rel={bgerr:.2e}")

    # -- condensed phase: LJ-fluid coordination shells at scale ------------
    from molann_tpu.ops.fused import model_select_mode
    from molann_tpu.systems import lj_fluid_model

    fm, fu, _fbox = lj_fluid_model(5)  # 125 atoms, 2 x 7750 pairs
    fspec = fm.preprocessing_layer.feature_layer._spec
    n_pairs = sum(n for _, n in fspec.coord_slices)
    assert model_select_mode(fm) == "blocked"
    xf = jnp.asarray(
        fu.atoms.positions[None]
        + 0.3 * rng.normal(size=(2048, len(fu.atoms), 3)), jnp.float32)
    t0 = time.time()
    fwd_bwd = jax.jit(lambda m, v: fused_cv_forces(m, v))  # auto tile
    yf, gf = fwd_bwd(fm, xf)
    yf_n = np.asarray(yf)
    compile_s = time.time() - t0
    yj = np.asarray(jax.jit(lambda m, v: m(v))(fm, xf))
    gj = np.asarray(jax.jit(jax.grad(lambda v: jnp.sum(fm(v))))(xf))
    assert float(np.abs(gj).max()) > 1e-3  # non-vacuous (MLP unsaturated)
    cverr = float(np.abs(yf_n - yj).max()) / max(float(np.abs(yj).max()),
                                                 1e-9)
    cgerr = float(np.abs(np.asarray(gf).reshape(gj.shape) - gj).max()) / max(
        float(np.abs(gj).max()), 1e-9)
    # rate: device-side readback only (np.asarray of the [l, n, 3]
    # gradient would pull ~100 MB through the tunnel and measure the
    # RPC, not the kernel), a few dispatches pipelined
    t0 = time.time()
    outs = [fwd_bwd(fm, xf) for _ in range(4)]
    for o in outs:
        _ = float(o[1][0, 0, 0])
    rate = 4 * xf.shape[0] / (time.time() - t0)
    # thresholds: kernels agree with XLA to ~1e-7 on the RAW feature
    # values; the standardization affine folded into W1 (systems.
    # lj_fluid_model) amplifies that by feature_scale/sigma (~400x here),
    # identically for any evaluator of the same model
    check(f"condensed phase: {n_pairs}-pair blocked coordination fwd+bwd",
          cverr < 5e-4 and cgerr < 1e-3,
          f"rel v={cverr:.2e} g={cgerr:.2e} compile={compile_s:.0f}s "
          f"{rate / 1e3:.0f}K frames/s (small-batch, tunnel-dispatch-"
          "bound; device rate: scripts/condensed_perf_probe.py)")

    # -- neighbor-culled coordination at scale (r4 ask #2) -----------------
    # 1000 atoms, 2 x 499,500 all-pairs rows vs the cell-list cull at the
    # shells' exact d_max truncation radii: identical physics (culled
    # pairs contribute exactly 0), order-of-magnitude fewer pair rows
    # (kept pairs are O(N) at fixed density; all-pairs is O(N^2)).
    # try/except: the ALL-PAIRS baseline intentionally stresses HBM
    # (its chunk matrix alone is ~10 GB at this size) — if the baseline
    # itself cannot run, that is a FAIL line, not a dead validation run.
    try:
        _culled_coordination_section(check, rng, lj_fluid_model,
                                     fused_cv_forces)
    except Exception as e:  # noqa: BLE001
        check("culled coordination section", False,
              f"{type(e).__name__}: {str(e)[:140]}")
    finally:
        jax.clear_caches()  # HBM hygiene for the next section

    try:
        _compaction_10k_section(check, rng, Feature, FeatureLayer,
                                PreprocessingANN, MolANN,
                                create_sequential_nn, synthetic_peptide,
                                fused_cv_forces)
    except Exception as e:  # noqa: BLE001
        check("10k-atom compaction section", False,
              f"{type(e).__name__}: {str(e)[:140]}")
    finally:
        jax.clear_caches()

    # -- periodic boundaries ----------------------------------------------
    from molann_tpu.pbc import guess_bonds, make_whole, unwrap_time, wrap

    box = jnp.asarray(np.diag([8.0, 8.0, 8.0]).astype(np.float32))
    bonds = guess_bonds(u)
    walk = np.cumsum(rng.normal(scale=0.8, size=(64, 1, 3)), 0)
    ptraj = np.asarray(
        u.atoms.positions[None] + walk
        + rng.normal(scale=0.03, size=(64, 22, 3)), np.float32)
    wrapped = wrap(jnp.asarray(ptraj), box)
    repaired = np.asarray(unwrap_time(
        make_whole(wrapped, box, bonds=bonds), box))

    def blmax(a):
        return float(np.linalg.norm(
            a[:, bonds[:, 0]] - a[:, bonds[:, 1]], axis=-1).max())

    drift = repaired - ptraj
    perr = float(np.abs(drift - drift[:1]).max())
    check("PBC whole+nojump on TPU recovers the wrapped rigid walk",
          blmax(np.asarray(wrapped)) > 4.0 and perr < 1e-4,
          f"broken maxbond={blmax(np.asarray(wrapped)):.1f} "
          f"path err={perr:.1e}")

    # -- throughput --------------------------------------------------------
    n = 1 << 23
    # generated on device: host->device copies of GB-scale arrays over the
    # remote tunnel take minutes and are not the thing being measured
    xt = jax.jit(
        lambda: jnp.asarray(u.atoms.positions.reshape(66, 1))
        + 0.05 * jax.random.normal(jax.random.PRNGKey(0), (66, n))
    )()
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




def _culled_coordination_section(check, rng, lj_fluid_model,
                                 fused_cv_forces):
    from molann_tpu.ops.fused import model_chunk_matrix
    from molann_tpu.ops.neighbor import cull_model, max_displacement

    # 10^3 atoms for the full-vs-culled comparison: the largest size
    # whose ALL-PAIRS chunk matrix is still a reasonable device buffer
    # (999,424 x 1024 bf16 ~ 2.0 GB; at 12^3 it would be 10.7 GB —
    # the culled 12^3 system is exercised separately below).
    ljm, lju, _ljbox = lj_fluid_model(10)
    ljref = lju.atoms.positions
    lj_n = len(lju.atoms)
    xlj = jnp.asarray(
        ljref[None] + 0.05 * rng.normal(size=(1024, lj_n, 3)), jnp.float32)
    md = max_displacement(ljref, np.asarray(xlj))
    ljc, ljrep = cull_model(ljm, ljref, skin=2 * md + 0.05)
    nb_, na_ = sum(ljrep.n_pairs_before), sum(ljrep.n_pairs_after)
    # the pair tables ride the jit boundary as REAL device buffers
    # (model_chunk_matrix + c_mat=): at these pair counts the default
    # closure capture would bake a multi-GB HLO constant into the
    # module (this environment's remote-compile service rejects the
    # upload outright, and a real host would duplicate it per
    # executable).
    c_full = jax.device_put(model_chunk_matrix(ljm))
    c_cull = jax.device_put(model_chunk_matrix(ljc))
    fwd = jax.jit(lambda m, v, c: fused_cv_forces(m, v, mode="blocked",
                                                  c_mat=c))
    fwd_full = lambda m, v: fwd(m, v, c_full)  # noqa: E731
    fwd_cull = lambda m, v: fwd(m, v, c_cull)  # noqa: E731
    t0 = time.perf_counter()
    yfull, gfull = fwd_full(ljm, xlj)
    _ = float(gfull[0, 0, 0])
    tc_full = time.perf_counter() - t0  # incl. compile
    ycull, gcull = fwd_cull(ljc, xlj)
    _ = float(gcull[0, 0, 0])
    verr = float(jnp.abs(ycull - yfull).max()) / max(
        float(jnp.abs(yfull).max()), 1e-9)
    gerr = float(jnp.abs(gcull - gfull).max()) / max(
        float(jnp.abs(gfull).max()), 1e-9)
    # gradient tolerance 2e-3: d_max culling is EXACT in real arithmetic
    # (culled pairs contribute 0), so the residual is pure float
    # accumulation contrast — the full model sums ~1M bf16-split-pass
    # pair rows per chunk walk, the culled one ~93K; measured 1.2e-3 at
    # this size (vs ~3e-4 at 125 atoms/15.5K pairs).
    check(f"culled coordination parity ({nb_} -> {na_} pairs, exact d_max)",
          verr < 5e-4 and gerr < 2e-3 and ljrep.exact == (True, True),
          f"rel v={verr:.2e} g={gerr:.2e}")

    def rate_of(fn, m, reps=6):
        _ = float(fn(m, xlj)[1][0, 0, 0])  # warm + sync
        t0 = time.perf_counter()
        acc = None
        for _ in range(reps):
            g = fn(m, xlj)[1][0, 0, 0]
            acc = g if acc is None else acc + g
        _ = float(acc)  # ONE host sync for the whole dispatch pipeline
        return reps * xlj.shape[0] / (time.perf_counter() - t0)

    r_full = rate_of(fwd_full, ljm)
    r_cull = rate_of(fwd_cull, ljc)
    # the pair table shrinks 10.7x; the kernel also carries pair-count-
    # independent work (x/gx slabs, per-group xcat setup, resident edge
    # matmuls, MLP), so the end-to-end bound sits below the pair ratio —
    # and the r5 WINDOWED stream narrowed the gap further by making the
    # all-pairs walk itself ~2x cheaper per row (measured 7.7x end-to-
    # end vs 8.6x under the full-width stream). Require >= 6x and
    # report the measured ratio.
    check("cell-list cull >= 6x speedup at equal accuracy",
          r_cull >= 6 * r_full,
          f"all-pairs {r_full:.0f} f/s -> culled {r_cull:.0f} f/s "
          f"({r_cull / max(r_full, 1e-9):.1f}x; pairs {nb_}->{na_}, "
          f"compile(all-pairs incl.)={tc_full:.0f}s)")

    # free the 2 GB all-pairs chunk matrix + this block's buffers and
    # executables before the 12^3 block (HBM hygiene: leftovers here
    # cascaded into ResourceExhausted in later sections)
    del c_full, c_cull, yfull, gfull, ycull, gcull, fwd_full, fwd_cull
    jax.clear_caches()

    # -- adaptive streaming chunk + r5 envelope ------------------------
    # r4's kernel structure (functional gx carry through the chunk walk
    # + windowed x/gx I/O) forced a 128-row chunk at this width and
    # refused the 12^3 backward outright (16.23 MB scoped vs the 16 MB
    # limit, measured). The r5 restructure — the pullback accumulates
    # IN PLACE into the gx scratch and x/gx ride as HBM operands with
    # single-buffered in-kernel DMA — restores the full 512-row chunk
    # here and ADMITS the 12^3 backward (exercised below).
    from molann_tpu.ops.fused_blocked import auto_tile, blocked_layout
    lay10 = blocked_layout(
        ljm.preprocessing_layer.feature_layer._spec, None)
    check("10^3 all-active: full 512-row chunk, bwd tile admitted",
          lay10.chunk == 512
          and auto_tile(lay10, 1, backward=True) >= 128,
          f"n_atoms={lj_n} c_cols={lay10.c_cols} chunk={lay10.chunk}")

    # -- 12^3 = 1728 atoms: cv+forces now runs FUSED (r4 VERDICT #4) --
    # The all-pairs chunk matrix at this size would be 10.7 GB, so the
    # on-HW run uses the CULLED model (the production configuration
    # for this regime). r4 refused the backward here with the XLA
    # escape; the restructured kernels run it — value AND force parity
    # against the all-pairs XLA model are checked on-chip.
    from molann_tpu.ops.fused import fused_model_forward
    m12, u12, _b12 = lj_fluid_model(12)
    ref12 = u12.atoms.positions
    x12 = jnp.asarray(
        ref12[None] + 0.05 * rng.normal(size=(256, len(u12.atoms), 3)),
        jnp.float32)
    md12 = max_displacement(ref12, np.asarray(x12))
    c12, rep12 = cull_model(m12, ref12, skin=2 * md12 + 0.05)
    lay12 = blocked_layout(
        c12.preprocessing_layer.feature_layer._spec, None)
    bwd_tile12 = auto_tile(lay12, 1, backward=True)  # raises if refused
    c12_mat = jax.device_put(model_chunk_matrix(c12))
    ffwd = jax.jit(lambda m, v, c: fused_model_forward(
        m, v, mode="blocked", c_mat=c))
    t0 = time.perf_counter()
    y12 = ffwd(c12, x12, c12_mat)
    _ = float(y12[0, 0])
    tc12 = time.perf_counter() - t0
    y_x = np.asarray(c12(x12[:16]))
    verr12 = float(jnp.abs(y12[:16] - y_x).max()) / max(
        float(np.abs(y_x).max()), 1e-9)
    check("12^3 culled blocked FORWARD == XLA (c_mat operand route)",
          verr12 < 5e-4 and rep12.exact == (True, True),
          f"rel v={verr12:.2e} chunk={lay12.chunk} "
          f"pairs={sum(rep12.n_pairs_after)} compile={tc12:.0f}s")
    del y12

    fcv12 = jax.jit(lambda m, v, c: fused_cv_forces(
        m, v, mode="blocked", c_mat=c))
    t0 = time.perf_counter()
    ycv, gcv = fcv12(c12, x12, c12_mat)
    _ = float(gcv[0, 0, 0])
    tcv12 = time.perf_counter() - t0
    g_x = np.asarray(jax.jit(jax.grad(
        lambda v: jnp.sum(c12(v))))(x12[:16]))
    vcv = float(jnp.abs(ycv[:16] - y_x).max()) / max(
        float(np.abs(y_x).max()), 1e-9)
    gcv_err = float(jnp.abs(gcv[:16] - g_x).max()) / max(
        float(np.abs(g_x).max()), 1e-9)
    t0 = time.perf_counter()
    acc = None
    for _i in range(3):
        gg = fcv12(c12, x12, c12_mat)[1][0, 0, 0]
        acc = gg if acc is None else acc + gg
    _ = float(acc)
    rcv12 = 3 * x12.shape[0] / (time.perf_counter() - t0)
    check("12^3 culled cv+FORCES fused parity (r5: bwd envelope moved)",
          vcv < 5e-4 and gcv_err < 2e-3,
          f"rel v={vcv:.2e} g={gcv_err:.2e} bwd_tile={bwd_tile12} "
          f"rate={rcv12:.0f} f/s compile={tcv12:.0f}s")
    # past the envelope the model still refuses with the XLA escape
    # (a wide head stands in for ~13^3+ widths without their
    # minutes-long all-pairs spec build)
    try:
        auto_tile(lay12, 4096, backward=True)
        refused = False
    except ValueError:
        refused = True
    check("envelope bound: auto_tile refuses past the r5 wall", refused,
          "wide-head refusal -> XLA-path escape message")
    del c12_mat, x12, ycv, gcv
    jax.clear_caches()



def _compaction_10k_section(check, rng, Feature, FeatureLayer,
                            PreprocessingANN, MolANN,
                            create_sequential_nn, synthetic_peptide,
                            fused_cv_forces):
    import time
    import jax
    import jax.numpy as jnp
    import numpy as np
    from molann_tpu.ops.fused import active_atom_indices

    # -- 10k-atom sparse system: blocked + compaction at scale (r4 #4) -----
    # Solvated-protein shape: 10,000 atoms, ~200 CV-active. The blocked
    # kernel + active-atom compaction is the serving path this regime
    # exists for; previously only exercised at 600 atoms.
    pu10 = synthetic_peptide(2000)
    p_n = len(pu10.atoms)
    psel = lambda nm, r: pu10.select_atoms(f"name {nm} and resid {r}")  # noqa: E731
    pfeats = []
    for k, r in enumerate(range(25, 1975, 48)):  # 41 dihedrals
        pfeats.append(Feature(
            f"d{k}", "dihedral",
            psel("C", r) + psel("N", r + 1) + psel("CA", r + 1)
            + psel("C", r + 1)))
    for k, (i, j) in enumerate((100 + 90 * t, 1900 - 90 * t)
                               for t in range(10)):  # 10 long-range bonds
        pfeats.append(Feature(f"b{k}", "bond", psel("CA", i) + psel("CA", j)))
    ppp = PreprocessingANN(None, FeatureLayer(pfeats, pu10.atoms))
    pmodel = MolANN(ppp, create_sequential_nn(
        [ppp.output_dimension(), 16, 2], key=jax.random.PRNGKey(11)))
    pact = active_atom_indices(pmodel)
    check("10k-atom system: compaction active, ~200 CV atoms",
          pact is not None and p_n == 10000 and 150 <= len(pact) <= 250,
          f"n_atoms={p_n} active={0 if pact is None else len(pact)}")

    # parity on a modest batch (XLA reference materializes full-width)
    xp = jnp.asarray(
        pu10.atoms.positions[None]
        + 0.05 * rng.normal(size=(64, p_n, 3)), jnp.float32)
    ypc, gpc = jax.jit(lambda m, v: fused_cv_forces(
        m, v, mode="blocked", compact_grads=True))(pmodel, xp)
    ypj = np.asarray(jax.jit(lambda m, v: m(v))(pmodel, xp))
    gpj = np.asarray(jax.jit(jax.grad(lambda v: jnp.sum(pmodel(v))))(xp))
    pverr = float(np.abs(np.asarray(ypc) - ypj).max()) / max(
        float(np.abs(ypj).max()), 1e-9)
    g_gather10 = np.transpose(gpj, (2, 1, 0))[:, np.asarray(pact), :]
    pgerr = float(np.abs(np.asarray(gpc) - g_gather10).max()) / max(
        float(np.abs(gpj).max()), 1e-9)
    inactive10 = np.setdiff1d(np.arange(p_n), np.asarray(pact))
    # full-width grads of the blocked path: zeros off the active set
    _, gpf = jax.jit(lambda m, v: fused_cv_forces(m, v, mode="blocked"))(
        pmodel, xp)
    zeros10 = bool(np.all(
        np.asarray(gpf).reshape(gpj.shape)[:, inactive10, :] == 0.0))
    check("10k-atom compaction value+grad parity, exact zeros",
          pverr < 5e-4 and pgerr < 1e-3 and zeros10,
          f"rel v={pverr:.2e} g={pgerr:.2e} zeros={zeros10}")

    # serving rate at a production batch (device-side readback). r4
    # recorded 37.6K f/s from 3 dispatches of 1024 frames — at the
    # tunnel's ~27 ms per-dispatch overhead that IS 1024/0.027: a
    # dispatch-RTT measurement, not a kernel one (r4 VERDICT weak #5).
    # Use a batch big enough to amortize dispatch and enough pipeline
    # depth to overlap it; scripts/compact10k_probe.py carries the full
    # component breakdown (front transpose+gather vs kernel).
    xp_big = jax.jit(
        lambda b: b[None]
        + 0.05 * jax.random.normal(jax.random.PRNGKey(3), (8192, p_n, 3)))(
        jnp.asarray(pu10.atoms.positions))
    fcomp = jax.jit(lambda m, v: fused_cv_forces(
        m, v, mode="blocked", compact_grads=True))
    o = fcomp(pmodel, xp_big)
    _ = float(o[1][0, 0, 0])
    t0 = time.perf_counter()
    outs = [fcomp(pmodel, xp_big) for _ in range(8)]
    for o in outs:
        _ = float(o[1][0, 0, 0])
    rate10 = 8 * 8192 / (time.perf_counter() - t0)
    check("10k-atom compact serving rate (amortized dispatch)",
          rate10 > 2e5, f"{rate10/1e6:.2f}M frames/s (auto tile, "
          f"{len(pfeats)} features, {len(pact)} active atoms, "
          f"batch 8192 x depth 8)")


if __name__ == "__main__":
    sys.exit(main())
