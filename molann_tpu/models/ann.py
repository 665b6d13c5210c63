"""ANN layers over molecular features — TPU-native rebuild of molann.ann.

Same public API as the reference (reference molann/ann.py): ``AlignmentLayer``,
``FeatureMap``, ``FeatureLayer``, ``PreprocessingANN``, ``MolANN``,
``create_sequential_nn`` — but every class is a JAX *pytree* (arrays are
leaves, construction-time index metadata is static aux), so model objects
compose directly with ``jax.jit`` / ``jax.grad`` / ``jax.vmap`` /
``shard_map``::

    model = MolANN(pp_layer, create_sequential_nn([8, 5, 3]))
    fwd = jax.jit(lambda m, x: m(x))
    y = fwd(model, x)                       # x: [l, n_inp, 3] float32
    gx = jax.grad(lambda x: model(x).sum())(x)   # forces w.r.t. coordinates

Numerical contract: identical to the reference to <1e-6 in float32
(golden-value and torch-oracle parity tests in tests/). Forward math runs
through the type-grouped vectorized ops in :mod:`molann_tpu.ops` rather than
the reference's per-feature Python loop (SURVEY.md §3.2), and alignment uses
the differentiable quaternion (QCP) Kabsch solver by default with the
reference's SVD construction available via ``method='svd'``
(:mod:`molann_tpu.ops.alignment`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..ops.alignment import ROTATION_METHODS, align_frames
from ..ops.features import (
    angle_features,
    apply_compiled_features,
    bond_features,
    coordination_features,
    dihedral_features,
    position_features,
)
from ..spec import (
    CompiledFeatures,
    compile_features,
    coordination_pair_list,
    resolve_local_indices,
)
from ..utils.pytree import PytreeNode, register_model

__all__ = [
    "create_sequential_nn",
    "SequentialNN",
    "AlignmentLayer",
    "FeatureMap",
    "FeatureLayer",
    "PreprocessingANN",
    "MolANN",
    "Identity",
    "model_dims",
]


def model_dims(model):
    """``(n_input_atoms, d_out)`` of any evaluable model
    (:class:`MolANN`, :class:`PreprocessingANN`, or :class:`FeatureLayer`)
    — the shapes a trajectory-evaluation pipeline needs before running it."""
    if isinstance(model, MolANN):
        n = model.preprocessing_layer.feature_layer.spec.n_input_atoms
        return n, model.ann_layers.output_dimension()
    if isinstance(model, PreprocessingANN):
        return model.feature_layer.spec.n_input_atoms, model.output_dimension()
    if isinstance(model, FeatureLayer):
        return model.spec.n_input_atoms, model.output_dimension()
    raise TypeError(f"cannot evaluate a {type(model).__name__}")


def _check_input(x, n_atoms):
    assert x.ndim == 3 and x.shape[1] == n_atoms and x.shape[2] == 3, (
        f"Input should be a 3d array with sizes [*, {n_atoms}, 3]. "
        f"Actual sizes: {tuple(x.shape)}"
    )


@register_model
class SequentialNN(PytreeNode):
    """Dense MLP: ``Linear`` + activation per hidden layer, bare ``Linear``
    last — the pytree equivalent of the reference's ``torch.nn.Sequential``
    (reference molann/ann.py:60-65).

    ``params`` is a tuple of ``(W [d_in, d_out], b [d_out])`` leaves.
    """

    __leaves__ = ("params",)
    __static__ = ("layer_dims", "activation")

    def __init__(self, params, layer_dims, activation=jnp.tanh):
        self.params = tuple(params)
        self.layer_dims = tuple(int(d) for d in layer_dims)
        self.activation = activation

    def __call__(self, x):
        n = len(self.params)
        for i, (w, b) in enumerate(self.params):
            x = (
                jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST)
                + b
            )
            if i < n - 1:
                x = self.activation(x)
        return x

    forward = __call__

    def output_dimension(self):
        return self.layer_dims[-1]

    def __len__(self):
        return len(self.params)


def create_sequential_nn(layer_dims, activation=jnp.tanh, *, key=None,
                         dtype=jnp.float32):
    """Construct a feedforward network (reference molann/ann.py:37-67).

    :param layer_dims: list of layer dimensions (>= 2 entries)
    :param activation: elementwise activation (default tanh, matching the
        reference's ``torch.nn.Tanh()`` default)
    :param key: PRNG key for initialization (default ``PRNGKey(0)``)

    Initialization matches ``torch.nn.Linear``'s default: both weight and
    bias ~ U(-1/√fan_in, 1/√fan_in), so training dynamics are comparable.

    Example (runnable; executed by tests/test_docs.py, mirroring the
    reference's docstring examples at molann/ann.py:88-112):

    >>> import jax, jax.numpy as jnp
    >>> nn = create_sequential_nn([2, 5, 3], key=jax.random.PRNGKey(0))
    >>> len(nn)                      # two Linear layers
    2
    >>> nn.output_dimension()
    3
    >>> nn(jnp.ones((4, 2))).shape   # [batch, d_out]
    (4, 3)
    """
    assert len(layer_dims) >= 2, (
        "Error: at least 2 layers are needed to define a neural network "
        "(length={})!".format(len(layer_dims))
    )
    if key is None:
        key = jax.random.PRNGKey(0)
    params = []
    for d_in, d_out in zip(layer_dims[:-1], layer_dims[1:]):
        key, kw, kb = jax.random.split(key, 3)
        bound = 1.0 / math.sqrt(d_in)
        w = jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound)
        b = jax.random.uniform(kb, (d_out,), dtype, -bound, bound)
        params.append((w, b))
    return SequentialNN(tuple(params), layer_dims, activation)


@register_model
class Identity(PytreeNode):
    """No-op layer (stands in for alignment when it is not needed,
    like the reference's ``torch.nn.Identity`` at molann/ann.py:539-542)."""

    __leaves__ = ()
    __static__ = ()

    def __init__(self):
        pass

    def __call__(self, x):
        return x

    forward = __call__


@register_model
class AlignmentLayer(PytreeNode):
    """Kabsch translation+rotation alignment onto a fixed reference
    (reference molann/ann.py:69-199).

    :param align_atom_group: atoms whose coordinates define the reference
        (duck-typed: ``.ix``, ``.positions``)
    :param input_atom_group: atoms forming the network input
    :param method: rotation solver — ``'qcp'`` (default, differentiable
        quaternion method), ``'eigh'``, or ``'svd'`` (the reference's
        construction; see :mod:`molann_tpu.ops.alignment`). ``'eigh'``
        gradients NaN on degenerate spectra (symmetric/collinear align
        groups — see :func:`molann_tpu.ops.alignment.rotation_eigh`); a
        ``UserWarning`` is issued at construction steering to ``'qcp'``.

    ``ref_x`` is the align-group positions centered once at construction
    (reference molann/ann.py:135-141) and is stored as a pytree leaf.
    Forward maps ``[l, n_inp, 3] → [l, n_inp, 3]``: the whole input is
    translated by the align-subset centroid and rotated.

    Example (reference molann/ann.py:88-112):

    >>> import jax.numpy as jnp
    >>> from molann_tpu.systems import alanine_universe
    >>> u = alanine_universe()
    >>> align = AlignmentLayer(u.select_atoms("bynum 1 2 5"), u.atoms)
    >>> x = jnp.asarray(u.atoms.positions[None])   # [1, 22, 3]
    >>> aligned = align(x)
    >>> aligned.shape
    (1, 22, 3)
    >>> # self-alignment maps the align atoms onto the centered reference
    >>> bool(jnp.allclose(aligned[0, [0, 1, 4]], align.ref_x, atol=1e-5))
    True
    """

    __leaves__ = ("ref_x",)
    __static__ = (
        "align_atom_indices",
        "input_atom_indices",
        "input_atom_num",
        "_local_align_atom_indices",
        "method",
    )

    def __init__(self, align_atom_group, input_atom_group, method="qcp"):
        if method not in ROTATION_METHODS:
            raise ValueError(
                f"unknown rotation method {method!r}; "
                f"choose from {sorted(ROTATION_METHODS)}"
            )
        if method == "eigh":
            import warnings

            warnings.warn(
                "AlignmentLayer(method='eigh'): jax.grad through the "
                "batched-eigh rotation solver produces NaNs when the "
                "quaternion matrix has a degenerate lower spectrum "
                "(symmetric or collinear align groups, e.g. planar "
                "systems near self-alignment). Use method='qcp' (the "
                "default) for gradient work.",
                UserWarning,
                stacklevel=2,
            )
        self.align_atom_indices = tuple(int(i) for i in align_atom_group.ix)
        self.input_atom_indices = tuple(int(i) for i in input_atom_group.ix)
        self.input_atom_num = len(input_atom_group)
        self.method = method

        ref = np.asarray(align_atom_group.positions, dtype=np.float32)
        self.ref_x = jnp.asarray(ref - ref.mean(axis=0, keepdims=True))

        try:
            input_list = list(self.input_atom_indices)
            self._local_align_atom_indices = tuple(
                input_list.index(idx) for idx in self.align_atom_indices
            )
        except ValueError:
            raise ValueError("Atoms used for alignment must be among the input")

    def show_info(self):
        """Print input/align indices and the centered reference coordinates
        (reference molann/ann.py:148-155)."""
        print(
            f"\n{self.input_atom_num} atoms used for input, "
            "(0-based) global indices: \n",
            list(self.input_atom_indices),
        )
        print(
            f"\n{len(self._local_align_atom_indices)} atoms used for "
            "alignment, with (0-based) global indices: \n",
            list(self.align_atom_indices),
        )
        print("local indices\n", list(self._local_align_atom_indices))
        print(
            "\ncoordinates of reference state used in aligment:\n",
            np.asarray(self.ref_x),
        )

    def __call__(self, x):
        _check_input(x, self.input_atom_num)
        return align_frames(
            x, self.ref_x, self._local_align_atom_indices, method=self.method
        )

    forward = __call__


@register_model
class FeatureMap(PytreeNode):
    """Map coordinates to ONE feature's value(s)
    (reference molann/ann.py:201-356).

    :param feature: :class:`~molann_tpu.feature.Feature`
    :param input_atom_group: input atoms (must contain the feature's atoms)
    :param use_angle_value: radians instead of cos/sin values

    Example (golden value from BASELINE.md; reference molann/ann.py:219-241):

    >>> import numpy as np, jax.numpy as jnp
    >>> from molann_tpu.feature import Feature
    >>> from molann_tpu.systems import alanine_universe
    >>> u = alanine_universe()
    >>> fmap = FeatureMap(
    ...     Feature("b1", "bond", u.select_atoms("bynum 2 5")), u.atoms)
    >>> fmap.dim()
    1
    >>> x = jnp.asarray(u.atoms.positions[None])
    >>> print(np.round(np.asarray(fmap(x)), 4))
    [[1.5297]]
    """

    __leaves__ = ()
    __static__ = (
        "feature",
        "type_id",
        "use_angle_value",
        "input_atom_num",
        "_local_atom_indices",
    )

    def __init__(self, feature, input_atom_group, use_angle_value=False):
        self.feature = feature
        self.type_id = feature.get_type_id()
        self.use_angle_value = bool(use_angle_value)
        self.input_atom_num = len(input_atom_group)
        self._local_atom_indices = tuple(
            resolve_local_indices(
                [int(i) - 1 for i in feature.get_atom_indices()],
                input_atom_group.ix,
            )
        )

    def dim(self):
        """Feature output dimension (reference molann/ann.py:265-286;
        coordination is a 1-column extension)."""
        if self.type_id in (0, 1, 4):
            return 1
        if self.type_id == 2:
            return 1 if self.use_angle_value else 2
        return 3 * len(self._local_atom_indices)

    def _coordination_args(self):
        n_a, r0, nn, mm = self.feature.get_coordination_params()
        idx = self._local_atom_indices
        a, b = idx[:n_a], idx[n_a:]
        pairs = coordination_pair_list(a, b)
        box = getattr(self.feature, "pbc_box", None)
        dmax = getattr(self.feature, "d_max", None)
        return (tuple(pairs), ((0, len(pairs)),), ((r0, nn, mm),),
                (box,), (dmax,))

    def __call__(self, x):
        _check_input(x, self.input_atom_num)
        idx = self._local_atom_indices
        if self.type_id == 0:
            return angle_features(x, (idx,), self.use_angle_value)[:, :1]
        if self.type_id == 1:
            return bond_features(x, (idx,))[:, :1]
        if self.type_id == 2:
            d = dihedral_features(x, (idx,), self.use_angle_value)
            return d[:, :1] if self.use_angle_value else d.reshape(-1, 2)
        if self.type_id == 4:
            return coordination_features(x, *self._coordination_args())
        return position_features(x, idx)

    forward = __call__

    def __eq__(self, other):
        return isinstance(other, FeatureMap) and all(
            getattr(other, f) == getattr(self, f) for f in self.__static__
        )

    def __hash__(self):
        return hash(tuple(getattr(self, f) for f in self.__static__))


@register_model
class FeatureLayer(PytreeNode):
    """Map coordinates to ALL features of a feature list
    (reference molann/ann.py:358-474).

    Output columns are in feature-list order, exactly as the reference's
    per-feature ``torch.cat`` (molann/ann.py:473); internally the features
    are computed type-grouped in one vectorized chain per type via the
    compiled spec (:mod:`molann_tpu.spec`).

    Example (reference molann/ann.py:379-415; golden values BASELINE.md):

    >>> import numpy as np, jax.numpy as jnp
    >>> from molann_tpu.feature import Feature
    >>> from molann_tpu.systems import alanine_universe
    >>> u = alanine_universe()
    >>> feats = [Feature("b1", "bond", u.select_atoms("bynum 2 5")),
    ...          Feature("a1", "angle", u.select_atoms("bynum 20")
    ...                  + u.select_atoms("bynum 19")
    ...                  + u.select_atoms("bynum 21"))]
    >>> layer = FeatureLayer(feats, u.atoms)
    >>> layer.output_dimension()
    2
    >>> layer.get_feature(0).get_name()
    'b1'
    >>> x = jnp.asarray(u.atoms.positions[None])
    >>> print(np.round(np.asarray(layer(x)), 4))   # columns in list order
    [[ 1.5297 -0.3328]]
    """

    __leaves__ = ("feature_map_list",)
    __static__ = ("feature_list", "use_angle_value", "input_atom_num", "_spec")

    def __init__(self, feature_list, input_atom_group, use_angle_value=False):
        assert len(feature_list) > 0, "Error: feature list is empty!"
        self.feature_list = tuple(feature_list)
        self.use_angle_value = bool(use_angle_value)
        self.input_atom_num = len(input_atom_group)
        self.feature_map_list = tuple(
            FeatureMap(f, input_atom_group, use_angle_value)
            for f in feature_list
        )
        self._spec = compile_features(
            feature_list, input_atom_group.ix, use_angle_value
        )

    def get_feature_info(self):
        """One pandas row per feature (reference molann/ann.py:429-435)."""
        return pd.concat(
            [f.get_feature_info() for f in self.feature_list],
            ignore_index=True,
        )

    def get_feature(self, idx):
        """The idx-th :class:`~molann_tpu.feature.Feature` of the list."""
        return self.feature_list[idx]

    def output_dimension(self):
        """Total output dimension (reference molann/ann.py:446-452)."""
        return self._spec.out_dim

    @property
    def spec(self) -> CompiledFeatures:
        """The compiled static index spec (TPU-native extension)."""
        return self._spec

    def __call__(self, x):
        _check_input(x, self.input_atom_num)
        return apply_compiled_features(self._spec, x)

    forward = __call__


@register_model
class PreprocessingANN(PytreeNode):
    """Optional alignment followed by the feature layer
    (reference molann/ann.py:476-565).

    :param align_layer: :class:`AlignmentLayer` or ``None`` (replaced by
        :class:`Identity`, like the reference at molann/ann.py:539-542)
    :param feature_layer: :class:`FeatureLayer`

    Example (reference molann/ann.py:483-529):

    >>> import jax.numpy as jnp
    >>> from molann_tpu.feature import Feature
    >>> from molann_tpu.systems import alanine_universe
    >>> u = alanine_universe()
    >>> flayer = FeatureLayer(
    ...     [Feature("b1", "bond", u.select_atoms("bynum 2 5"))], u.atoms)
    >>> pp = PreprocessingANN(None, flayer)   # None -> Identity alignment
    >>> type(pp.align_layer).__name__
    'Identity'
    >>> pp.output_dimension()
    1
    >>> pp(jnp.asarray(u.atoms.positions[None])).shape
    (1, 1)
    """

    __leaves__ = ("align_layer", "feature_layer")
    __static__ = ()

    def __init__(self, align_layer, feature_layer):
        self.align_layer = align_layer if align_layer is not None else Identity()
        self.feature_layer = feature_layer

    def output_dimension(self):
        return self.feature_layer.output_dimension()

    def __call__(self, x):
        return self.feature_layer(self.align_layer(x))

    forward = __call__


@register_model
class MolANN(PytreeNode):
    """Full model: preprocessing + trainable network
    (reference molann/ann.py:567-625).

    Example (reference molann/ann.py:576-599); the model object is a JAX
    pytree, so it composes directly with ``jax.jit`` / ``jax.grad``:

    >>> import jax, jax.numpy as jnp
    >>> from molann_tpu.feature import Feature
    >>> from molann_tpu.systems import alanine_universe
    >>> u = alanine_universe()
    >>> pp = PreprocessingANN(None, FeatureLayer(
    ...     [Feature("b1", "bond", u.select_atoms("bynum 2 5"))], u.atoms))
    >>> model = MolANN(pp, create_sequential_nn([pp.output_dimension(), 5, 2]))
    >>> x = jnp.asarray(u.atoms.positions[None])
    >>> jax.jit(lambda m, x: m(x))(model, x).shape
    (1, 2)
    >>> g = jax.grad(lambda x: model(x).sum())(x)   # coordinate gradients
    >>> bool((jnp.linalg.norm(g[0, [1, 4]], axis=-1) > 0).all())
    True
    >>> bool(jnp.abs(g[0, 0]).max() == 0)   # non-feature atom: zero grad
    True
    """

    __leaves__ = ("preprocessing_layer", "ann_layers")
    __static__ = ()

    def __init__(self, preprocessing_layer, ann_layers):
        self.preprocessing_layer = preprocessing_layer
        self.ann_layers = ann_layers

    def get_preprocessing_layer(self):
        return self.preprocessing_layer

    def __call__(self, x):
        return self.ann_layers(self.preprocessing_layer(x))

    forward = __call__
