"""Minimum free-energy paths: the simplified string method in CV space.

After a CV model is trained and a free-energy surface reconstructed
(metadynamics hills -> :meth:`MetadBias.free_energy_estimate`, or
umbrella/MBAR -> ``pmf_from_samples``), the next question the
reference's research ecosystem asks is *what is the transition
pathway?* The simplified string method (E, Ren, Vanden-Eijnden, J.
Chem. Phys. 126, 164103 (2007)) answers it: evolve a chain of images by
steepest descent on the (free-)energy and reparametrize to equal arc
length each step; the converged string is the minimum (free-)energy
path, its interior maxima are the saddle points / transition states.

TPU-shaped: the whole relaxation is ONE ``lax.scan`` of vectorized
image updates (images ride the batch axis), and the energy can be any
differentiable ``[m, d] -> [m]`` function — an analytic potential, a
trained model's CV-space FES via :func:`grid_interpolator`, or a
composition with the model itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["string_method", "grid_interpolator", "linear_path"]


def linear_path(a, b, n_images):
    """Straight-line initial string from ``a`` to ``b`` (``[n_images, d]``)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    t = jnp.linspace(0.0, 1.0, n_images, dtype=jnp.float32)[:, None]
    return (1.0 - t) * a + t * b


def _reparametrize(imgs):
    """Redistribute images to equal arc length along the piecewise-linear
    string (per-dimension ``jnp.interp`` over normalized arc length)."""
    seg = jnp.linalg.norm(jnp.diff(imgs, axis=0), axis=1)
    s = jnp.concatenate([jnp.zeros(1, imgs.dtype), jnp.cumsum(seg)])
    s = s / jnp.maximum(s[-1], 1e-30)
    t = jnp.linspace(0.0, 1.0, imgs.shape[0], dtype=imgs.dtype)
    return jax.vmap(lambda col: jnp.interp(t, s, col), in_axes=1,
                    out_axes=1)(imgs)


def string_method(energy_fn, init_images, *, n_iterations=2000, step=1e-3,
                  pin_ends=False):
    """Relax a string of images to the minimum (free-)energy path.

    energy_fn: differentiable ``[m, d] -> [m]`` (e.g. from
    :func:`grid_interpolator`, or an analytic CV-space potential).
    init_images: ``[m, d]`` starting string (see :func:`linear_path`).
    step: steepest-descent step size (same units as ``cv^2/energy``).
    pin_ends: keep the two endpoints fixed; default False lets them
    slide into their local minima (the standard simplified string).

    Returns ``(images [m, d], energies [m])`` — interior maxima of
    ``energies`` locate the transition states.

    Example:
        >>> import jax.numpy as jnp
        >>> quad = lambda z: jnp.sum((z * z - 1.0) ** 2, axis=-1)
        >>> s0 = linear_path([-1.0, -1.0], [1.0, 1.0], 11)
        >>> imgs, e = string_method(quad, s0, n_iterations=500, step=2e-2)
        >>> bool(jnp.all(jnp.abs(jnp.abs(imgs[0]) - 1.0) < 1e-2))
        True
    """
    imgs0 = jnp.asarray(init_images, jnp.float32)
    if imgs0.ndim != 2 or imgs0.shape[0] < 3:
        raise ValueError(
            f"init_images must be [n_images >= 3, d], got {imgs0.shape}"
        )
    step = jnp.float32(step)
    grad = jax.grad(lambda z: jnp.sum(energy_fn(z)))

    def body(imgs, _):
        moved = imgs - step * grad(imgs)
        if pin_ends:
            moved = moved.at[0].set(imgs[0]).at[-1].set(imgs[-1])
        return _reparametrize(moved), None

    imgs, _ = jax.lax.scan(body, imgs0, None, length=int(n_iterations))
    return imgs, energy_fn(imgs)


def grid_interpolator(mids, values, *, fill=None):
    """Differentiable multilinear interpolation of a gridded function —
    turns a reconstructed FES grid (``molann_tpu fes`` / ``pmf``) into
    the ``[m, d] -> [m]`` energy the string method needs.

    mids: sequence of ``d`` 1-D arrays of UNIFORMLY-spaced grid-cell
    midpoints (as produced by ``MetadBias.free_energy_estimate`` /
    ``pmf_from_samples``). values: ``[len(mids[0]), ..., len(mids[d-1])]``
    grid of function values. Queries are clamped to the grid hull;
    ``fill`` (if given) replaces non-finite grid cells (empty FES bins)
    before interpolation — pass e.g. ``values[finite].max() + 5`` so
    unexplored regions repel the string.

    Returns ``f(z [m, d]) -> [m]``.
    """
    mids = [np.asarray(m, np.float64) for m in mids]
    vals = np.array(values, np.float64)
    if vals.shape != tuple(len(m) for m in mids):
        raise ValueError(
            f"values shape {vals.shape} != grid shape "
            f"{tuple(len(m) for m in mids)}"
        )
    for m in mids:
        if len(m) < 2:
            raise ValueError("each grid axis needs >= 2 points")
        dm = np.diff(m)
        if not np.allclose(dm, dm[0], rtol=1e-4):
            raise ValueError("grid midpoints must be uniformly spaced")
    if fill is not None:
        vals = np.where(np.isfinite(vals), vals, float(fill))
    elif not np.isfinite(vals).all():
        raise ValueError(
            "values contain non-finite cells (empty FES bins); pass "
            "fill= to replace them"
        )
    d = len(mids)
    lo = jnp.asarray([m[0] for m in mids], jnp.float32)
    dx = jnp.asarray([m[1] - m[0] for m in mids], jnp.float32)
    nn = jnp.asarray([len(m) for m in mids], jnp.int32)
    table = jnp.asarray(vals, jnp.float32)
    # all 2^d corner offsets of the containing cell, enumerated statically
    corners = jnp.asarray(
        [[(c >> k) & 1 for k in range(d)] for c in range(2 ** d)],
        jnp.int32,
    )  # [2^d, d]

    def f(z):
        z = jnp.asarray(z, jnp.float32)
        squeeze = z.ndim == 1
        if squeeze:
            z = z[None]
        u = (z - lo) / dx                     # fractional grid coords [m,d]
        u = jnp.clip(u, 0.0, (nn - 1).astype(jnp.float32))
        i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, nn - 2)  # [m, d]
        w = u - i0.astype(jnp.float32)        # in-cell weights [m, d]

        def corner_term(offset):
            idx = i0 + offset                 # [m, d]
            cw = jnp.prod(
                jnp.where(offset == 1, w, 1.0 - w), axis=1
            )                                 # [m]
            flat = jnp.zeros(z.shape[0], jnp.int32)
            for k in range(d):                # static tiny loop over dims
                flat = flat * nn[k] + idx[:, k]
            return cw * jnp.take(table.reshape(-1), flat)

        out = jnp.sum(jax.vmap(corner_term)(corners), axis=0)
        return out[0] if squeeze else out

    return f
