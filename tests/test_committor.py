"""Variational committor loss: analytic 1D oracle, reweighting
exactness, DP-exactness, and the train-CLI integration.

The strongest check: in one dimension the committor has a closed form
q(u) = ∫_a^u exp(βV) / ∫_a^b exp(βV) (the unique harmonic function of
the overdamped generator with q(a)=0, q(b)=1), so a network trained on
deterministic quadrature samples of a double well must reproduce it
pointwise."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from molann_tpu.train import committor_loss, make_committor_loss


BETA = 2.0
H = 1.5  # barrier height scale: V(u) = H (u² − 1)²
EDGE = 1.1  # basin boundaries: A = u < -EDGE, B = u > EDGE


def _v(u):
    return H * (u ** 2 - 1.0) ** 2


def _analytic_q(u, a=-EDGE, b=EDGE, n=20001):
    """q(u) = ∫_a^u e^{βV} / ∫_a^b e^{βV} by dense trapezoid quadrature."""
    grid = np.linspace(a, b, n)
    w = np.exp(BETA * _v(grid))
    cum = np.concatenate([[0.0], np.cumsum((w[1:] + w[:-1]) / 2)])
    cum /= cum[-1]
    return np.interp(u, grid, cum)


def _samples(l=2048, span=1.8):
    """Deterministic quadrature samples: uniform u grid, Boltzmann
    importance weights — expectations become exact integrals."""
    u = np.linspace(-span, span, l).astype(np.float32)
    x = np.zeros((l, 1, 3), np.float32)
    x[:, 0, 0] = u
    weights = np.exp(-BETA * _v(u)).astype(np.float32)
    labels = np.where(u < -EDGE, 1, np.where(u > EDGE, 2, 0)).astype(
        np.int32)
    return jnp.asarray(x), jnp.asarray(labels), jnp.asarray(weights), u


def _apply(opt, model, state, grads):
    import optax

    updates, state = opt.update(grads, state, model)
    return optax.apply_updates(model, updates), state


@pytest.mark.slow
def test_committor_matches_analytic_double_well():
    """Train on double-well quadrature samples; the learned q must match
    the closed-form committor pointwise through the transition region."""
    import optax

    from molann_tpu.ann import create_sequential_nn

    x, labels, weights, u = _samples()
    mlp = create_sequential_nn([3, 32, 1], key=jax.random.PRNGKey(0))

    def loss_fn(m):
        return committor_loss(
            lambda xx: m(xx.reshape(xx.shape[0], -1)), x, labels,
            beta=BETA, alpha=200.0, weights=weights,
        )

    steps = 4000
    opt = optax.adam(optax.warmup_cosine_decay_schedule(
        0.0, 1e-2, 100, steps, end_value=1e-4))
    state = opt.init(mlp)
    step = jax.jit(
        lambda m, s: (lambda l_, g: (l_, *_apply(opt, m, s, g)))(
            *jax.value_and_grad(loss_fn)(m)
        )
    )
    losses = []
    for _ in range(steps):
        loss, mlp, state = step(mlp, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    q = np.asarray(jax.nn.sigmoid(mlp(np.asarray(x).reshape(-1, 3))[:, 0]))
    mid = (u > -1.0) & (u < 1.0)
    err = np.abs(q[mid] - _analytic_q(u[mid])).max()
    # measured ~0.05 across seeds; the penalized optimum itself matches
    # the hard-BC committor to 2e-8 (finite-difference check)
    assert err < 0.08, f"max |q - analytic| = {err:.3f}"
    # boundary conditions honored on the basins
    assert q[labels == 1].max() < 0.1
    assert q[np.asarray(labels) == 2].min() > 0.9
    # symmetric well: q(0) = 1/2
    assert abs(q[np.abs(u).argmin()] - 0.5) < 0.06


def test_committor_weights_equal_duplication(rng):
    """Importance weighting is exact: weight-2 on a frame == listing the
    frame twice."""
    from molann_tpu.ann import create_sequential_nn

    mlp = create_sequential_nn([3, 8, 1], key=jax.random.PRNGKey(3))
    model = lambda xx: mlp(xx.reshape(xx.shape[0], -1))  # noqa: E731
    x = jnp.asarray(rng.normal(size=(32, 1, 3)).astype(np.float32))
    labels = jnp.asarray(([1] * 10 + [0] * 12 + [2] * 10))
    w = jnp.ones(32).at[5].set(2.0)
    a = float(committor_loss(model, x, labels, weights=w))
    b = float(committor_loss(
        model,
        jnp.concatenate([x, x[5:6]]),
        jnp.concatenate([labels, labels[5:6]]),
    ))
    assert abs(a - b) / (abs(b) + 1e-12) < 1e-5


def test_committor_missing_basin_is_finite(rng):
    """A batch with no frames from one basin contributes zero penalty for
    it instead of dividing by zero."""
    from molann_tpu.ann import create_sequential_nn

    mlp = create_sequential_nn([3, 8, 1], key=jax.random.PRNGKey(4))
    model = lambda xx: mlp(xx.reshape(xx.shape[0], -1))  # noqa: E731
    x = jnp.asarray(rng.normal(size=(16, 1, 3)).astype(np.float32))
    labels = jnp.zeros(16, jnp.int32)  # nobody in A or B
    loss, aux = committor_loss(model, x, labels, return_aux=True)
    assert np.isfinite(float(loss))
    assert float(aux["mean_q_a"]) == 0.0 and float(aux["mean_q_b"]) == 0.0
    g = jax.grad(
        lambda m: committor_loss(
            lambda xx: m(xx.reshape(xx.shape[0], -1)), x, labels)
    )(mlp)
    assert all(np.isfinite(np.asarray(leaf)).all()
               for leaf in jax.tree_util.tree_leaves(g))


def test_committor_dp_exact():
    """The loss uses only global means, so a data-parallel step over the
    8-device mesh reproduces the single-device step bit-for-bit-ish."""
    import optax

    from molann_tpu.ann import create_sequential_nn
    from molann_tpu.parallel import data_mesh, shard_batch
    from molann_tpu.train import make_committor_loss, make_train_step

    x, labels, weights, _ = _samples(l=256)
    mlp = create_sequential_nn([3, 8, 1], key=jax.random.PRNGKey(5))
    wrap = make_committor_loss(beta=BETA, alpha=50.0)

    def loss_fn(m, batch):
        xx, lab, ww = batch
        return wrap(lambda v: m(v.reshape(v.shape[0], -1)), (xx, lab, ww))

    opt = optax.adam(1e-2)
    batch = (x, labels, weights)

    single = make_train_step(loss_fn, opt)
    m1, s1, l1 = single(mlp, opt.init(mlp), batch)

    mesh = data_mesh(8)
    dp = make_train_step(loss_fn, opt, mesh=mesh)
    m8, s8, l8 = dp(mlp, opt.init(mlp), shard_batch(batch, mesh))

    np.testing.assert_allclose(float(l8), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m8),
                    jax.tree_util.tree_leaves(m1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
