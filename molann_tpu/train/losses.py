"""Loss utilities for collective-variable training.

The reference ships no training loop (SURVEY.md §2.3); these are the
standard objectives its downstream CV-training codes use, expressed over
``(model, batch)`` pytrees so they plug into :mod:`molann_tpu.train.loop`.
Three CV-learning objectives from the reference's research ecosystem
(reference README.rst:51 — "adaptive learning of reaction coordinates")
are provided: the autoencoder reconstruction loss, the variational
generator-eigenfunction loss, and the variational committor loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "mse_loss",
    "fused_mse_loss",
    "autoencoder_loss",
    "timelagged_autoencoder_loss",
    "cv_coordinate_gradients",
    "eigenfunction_loss",
    "make_eigenfunction_loss",
    "committor_loss",
    "make_committor_loss",
    "registry",
]


def mse_loss(model, batch):
    """Supervised regression: batch = ``(x [l,n,3], y [l,d])``."""
    x, y = batch
    pred = model(x)
    return jnp.mean((pred - y) ** 2)


def fused_mse_loss(model, batch, *, interpret=False):
    """:func:`mse_loss` through the fused Pallas path — x may be packed
    ``[l, 3n]`` (preferred on TPU, see molann_tpu/ops/fused.py)."""
    from ..ops.fused import fused_model_forward

    x, y = batch
    pred = fused_model_forward(model, x, interpret=interpret)
    return jnp.mean((pred - y) ** 2)


def autoencoder_loss(encoder, decoder, preprocessing, x, weights=None):
    """Autoencoder CV loss in feature space.

    ``preprocessing`` maps coordinates to features ``f = pp(x)``; the
    encoder maps features to CVs ``z = enc(f)``; the decoder reconstructs
    ``f̂ = dec(z)``. Loss = (weighted) mean squared reconstruction error —
    the classic MolANN-ecosystem autoencoder CV objective.
    """
    f = preprocessing(x)
    z = encoder(f)
    rec = decoder(z)
    err = jnp.sum((rec - f) ** 2, axis=1)
    if weights is not None:
        return jnp.sum(err * weights) / jnp.sum(weights)
    return jnp.mean(err)


def timelagged_autoencoder_loss(encoder, decoder, preprocessing, x_t,
                                x_tau, weights=None):
    """Time-lagged autoencoder (TAE) CV loss in feature space.

    Like :func:`autoencoder_loss`, but the decoder reconstructs the
    features a lag time LATER: ``f_t = pp(x_t)``, ``z = enc(f_t)``,
    loss = (weighted) mean ``||dec(z) - pp(x_tau)||²`` over time-lagged
    pairs. The bottleneck ``z`` is forced to carry the predictive —
    i.e. slow — content of the dynamics (Wehmeyer & Noé, "Time-lagged
    autoencoders", J. Chem. Phys. 148, 241703 (2018)); fast modes
    decorrelate over the lag and cannot help the reconstruction. A mean
    over per-pair errors, so exact under data parallelism.

    Example:
        >>> import jax, jax.numpy as jnp
        >>> from molann_tpu.ann import create_sequential_nn
        >>> enc = create_sequential_nn([6, 1], key=jax.random.PRNGKey(0))
        >>> dec = create_sequential_nn([1, 6], key=jax.random.PRNGKey(1))
        >>> pp = lambda x: x.reshape(x.shape[0], -1)
        >>> x = jax.random.normal(jax.random.PRNGKey(2), (17, 2, 3))
        >>> float(timelagged_autoencoder_loss(
        ...     enc, dec, pp, x[:-1], x[1:])) > 0
        True
    """
    f_t = preprocessing(x_t)
    f_tau = preprocessing(x_tau)
    rec = decoder(encoder(f_t))
    err = jnp.sum((rec - f_tau) ** 2, axis=1)
    if weights is not None:
        return jnp.sum(err * weights) / jnp.sum(weights)
    return jnp.mean(err)


def cv_coordinate_gradients(model, x):
    """Per-frame coordinate gradients of every CV component at once.

    ``x [l, n, 3] -> [k, l, n, 3]`` where ``k`` is the model's output
    dimension: ``out[i, f] = ∂ model(x)[f, i] / ∂ x[f]``. Frames are
    independent, so one VJP per output component (vmapped over a basis of
    cotangents) gives all per-frame gradients in ``k`` backward passes of
    the *batched* model — no per-sample jacobians.

    Example:
        >>> import jax, jax.numpy as jnp
        >>> from molann_tpu.ann import create_sequential_nn
        >>> mlp = create_sequential_nn([6, 8, 2], key=jax.random.PRNGKey(0))
        >>> model = lambda x: mlp(x.reshape(x.shape[0], -1))
        >>> x = jax.random.normal(jax.random.PRNGKey(1), (16, 2, 3))
        >>> cv_coordinate_gradients(model, x).shape
        (2, 16, 2, 3)
    """
    f, vjp = jax.vjp(model, x)
    l, k = f.shape
    basis = jnp.eye(k, dtype=f.dtype)  # [k, k]
    cotangents = jnp.broadcast_to(basis[:, None, :], (k, l, k))
    return jax.vmap(lambda ct: vjp(ct)[0])(cotangents)


def eigenfunction_loss(model, x, *, beta=1.0, alpha=10.0,
                       eig_weights=None, weights=None, return_aux=False):
    """Variational loss for eigenfunctions of the overdamped-Langevin
    generator — the second CV-learning objective of the reference's
    research ecosystem (reference README.rst:51; the eigenfunction method
    of Zhang/Li/Schütte-style adaptive reaction-coordinate learning).

    For a model with ``k`` outputs ``f_1..f_k`` evaluated on frames ``x``
    sampled from (or reweighted to, via ``weights``) the Boltzmann measure
    at inverse temperature ``beta``:

    - Rayleigh quotients ``E_i = (1/beta)·E[|∇f_i|²]`` estimate the
      generator eigenvalues when the ``f_i`` are orthonormal in L²(μ);
    - loss = ``Σ_i ω_i E_i + alpha·Σ_{i≤j} (⟨f_i,f_j⟩ − δ_ij)²`` where
      ``⟨·,·⟩`` is the (weighted) covariance of mean-centered outputs and
      ``ω`` (``eig_weights``, default ``k, k-1, …, 1``) is strictly
      decreasing so minimization orders eigenvalues ascending: output 0
      learns the SLOWEST mode (the reaction coordinate).

    ``weights [l]`` are importance weights (e.g.
    :meth:`molann_tpu.sampling.MetadBias.frame_weights` from a biased
    trajectory); unnormalized is fine. With ``return_aux=True`` also
    returns ``{"eigenvalues": [k], "cov": [k,k]}`` where eigenvalues are
    the per-mode Rayleigh quotients normalized by the realized variances
    (exact estimates even before the orthonormality penalty converges).

    Example:
        >>> import jax, jax.numpy as jnp
        >>> from molann_tpu.ann import create_sequential_nn
        >>> mlp = create_sequential_nn([6, 8, 2], key=jax.random.PRNGKey(0))
        >>> model = lambda x: mlp(x.reshape(x.shape[0], -1))
        >>> x = jax.random.normal(jax.random.PRNGKey(1), (64, 2, 3))
        >>> loss, aux = eigenfunction_loss(model, x, beta=2.0,
        ...                                return_aux=True)
        >>> bool(jnp.isfinite(loss))
        True
        >>> aux["eigenvalues"].shape, aux["cov"].shape
        ((2,), (2, 2))
    """
    f = model(x)
    l, k = f.shape
    if weights is None:
        w = jnp.full((l,), 1.0 / l, f.dtype)
    else:
        w = jnp.asarray(weights, f.dtype)
        w = w / jnp.sum(w)
    if eig_weights is None:
        eig_weights = jnp.arange(k, 0, -1, f.dtype)
    else:
        eig_weights = jnp.asarray(eig_weights, f.dtype)

    fc = f - jnp.sum(w[:, None] * f, axis=0)
    cov = (fc * w[:, None]).T @ fc  # [k, k]

    grads = cv_coordinate_gradients(model, x)  # [k, l, n, 3]
    gsq = jnp.sum(grads * grads, axis=(2, 3))  # [k, l]
    rayleigh = jnp.sum(gsq * w[None, :], axis=1) / beta  # [k]

    delta = cov - jnp.eye(k, dtype=f.dtype)
    # i <= j once each: full Frobenius counts off-diagonals twice, so
    # halve them (upper-triangle sum, written without gathers)
    penalty = 0.5 * (jnp.sum(delta * delta) + jnp.sum(jnp.diag(delta) ** 2))

    loss = jnp.sum(eig_weights * rayleigh) + alpha * penalty
    if return_aux:
        var = jnp.clip(jnp.diag(cov), 1e-12)
        return loss, {"eigenvalues": rayleigh / var, "cov": cov}
    return loss


def committor_loss(model, x, labels, *, beta=1.0, alpha=100.0,
                   component=0, weights=None, return_aux=False):
    """Variational committor loss — the third CV-learning objective of
    the reference's research ecosystem (reference README.rst:51; the
    deep-committor formulation of Li/Lin/Ren, "Computing committor
    functions for the study of rare events using deep learning").

    The committor ``q(x)`` — the probability that overdamped dynamics
    started at ``x`` reaches product basin B before reactant basin A —
    minimizes the Dirichlet form ``E_mu[|∇q|²]/beta`` subject to ``q=0``
    on A and ``q=1`` on B. Here ``q = sigmoid(model(x)[:, component])``
    (so any MolANN output is a valid parameterization) and the boundary
    conditions enter as penalties:

        loss = E_w[|∇q|²]/beta
             + alpha·( E_w[q² | A] + E_w[(1−q)² | B] )

    ``labels [l]``: integer per-frame basin labels — 1 = A (reactant),
    2 = B (product), 0 = neither (transition region). ``weights [l]``
    reweight to the Boltzmann measure (e.g. metadynamics
    ``frame_weights``, or ``exp(-beta·V)`` for uniformly drawn samples);
    unnormalized is fine. Boundary penalties are conditional means, so
    ``alpha`` calibrates independently of the basin fractions; a batch
    missing one basin contributes zero for that penalty. All moments are
    global means, so the loss is exact under data-parallel
    ``make_train_step(mesh=...)`` (GSPMD computes them over the full
    sharded batch).

    With ``return_aux=True`` also returns ``{"dirichlet", "mean_q_a",
    "mean_q_b"}`` — trained models should show ``mean_q_a ≈ 0`` and
    ``mean_q_b ≈ 1``.

    Example:
        >>> import jax, jax.numpy as jnp
        >>> from molann_tpu.ann import create_sequential_nn
        >>> mlp = create_sequential_nn([6, 8, 1], key=jax.random.PRNGKey(0))
        >>> model = lambda x: mlp(x.reshape(x.shape[0], -1))
        >>> x = jax.random.normal(jax.random.PRNGKey(1), (32, 2, 3))
        >>> labels = jnp.asarray([1] * 10 + [0] * 12 + [2] * 10)
        >>> loss, aux = committor_loss(model, x, labels, return_aux=True)
        >>> bool(jnp.isfinite(loss)), sorted(aux)
        (True, ['dirichlet', 'mean_q_a', 'mean_q_b'])
    """

    def q_sum(xx):
        q = jax.nn.sigmoid(model(xx)[:, component])
        return jnp.sum(q), q

    # frames are independent, so the batch-summed gradient IS the
    # per-frame gradient (one backward pass for the whole batch)
    (_, q), g = jax.value_and_grad(q_sum, has_aux=True)(x)
    gsq = jnp.sum(g * g, axis=tuple(range(1, g.ndim)))  # [l]

    if weights is None:
        w = jnp.full(q.shape, 1.0 / q.shape[0], q.dtype)
    else:
        w = jnp.asarray(weights, q.dtype)
        w = w / jnp.sum(w)
    labels = jnp.asarray(labels)
    in_a = (labels == 1).astype(q.dtype)
    in_b = (labels == 2).astype(q.dtype)

    dirichlet = jnp.sum(w * gsq) / beta

    def conditional(mask, vals):
        mass = jnp.sum(w * mask)
        return jnp.where(mass > 0, jnp.sum(w * mask * vals) / jnp.where(
            mass > 0, mass, 1.0), 0.0)

    pen_a = conditional(in_a, q ** 2)
    pen_b = conditional(in_b, (1.0 - q) ** 2)
    loss = dirichlet + alpha * (pen_a + pen_b)
    if return_aux:
        return loss, {
            "dirichlet": dirichlet,
            "mean_q_a": conditional(in_a, q),
            "mean_q_b": conditional(in_b, q),
        }
    return loss


def make_committor_loss(**kwargs):
    """``(model, batch) -> scalar`` wrapper for :func:`fit` /
    :func:`make_train_step`. ``batch`` is ``(x, labels)`` or
    ``(x, labels, weights)``.

    Example:
        >>> import jax, jax.numpy as jnp
        >>> from molann_tpu.ann import create_sequential_nn
        >>> mlp = create_sequential_nn([6, 8, 1], key=jax.random.PRNGKey(0))
        >>> model = lambda x: mlp(x.reshape(x.shape[0], -1))
        >>> x = jax.random.normal(jax.random.PRNGKey(1), (16, 2, 3))
        >>> lab = jnp.asarray([1] * 6 + [0] * 4 + [2] * 6)
        >>> loss_fn = make_committor_loss(alpha=10.0)
        >>> float(loss_fn(model, (x, lab))) == float(
        ...     loss_fn(model, (x, lab, jnp.ones(16))))
        True
    """

    def loss_fn(model, batch):
        if len(batch) == 3:
            x, labels, weights = batch
        else:
            x, labels = batch
            weights = None
        return committor_loss(model, x, labels, weights=weights, **kwargs)

    return loss_fn


def make_eigenfunction_loss(**kwargs):
    """``(model, batch) -> scalar`` wrapper for :func:`fit` /
    :func:`make_train_step`. ``batch`` is ``x`` or ``(x, weights)``.

    Example:
        >>> import jax, jax.numpy as jnp
        >>> from molann_tpu.ann import create_sequential_nn
        >>> mlp = create_sequential_nn([6, 8, 2], key=jax.random.PRNGKey(0))
        >>> model = lambda x: mlp(x.reshape(x.shape[0], -1))
        >>> x = jax.random.normal(jax.random.PRNGKey(1), (32, 2, 3))
        >>> loss_fn = make_eigenfunction_loss(alpha=5.0)
        >>> float(loss_fn(model, x)) == float(loss_fn(model,
        ...                                           (x, jnp.ones(32))))
        True
    """

    def loss_fn(model, batch):
        if isinstance(batch, (tuple, list)):
            x, weights = batch
        else:
            x, weights = batch, None
        return eigenfunction_loss(model, x, weights=weights, **kwargs)

    return loss_fn


def _vamp_default(model, batch):
    from .timelagged import make_vamp_loss

    return make_vamp_loss()(model, batch)


registry = {
    "mse": mse_loss,
    "fused_mse": fused_mse_loss,
    "eigenfunction": make_eigenfunction_loss(),
    "committor": make_committor_loss(),
    "vamp": _vamp_default,
}
