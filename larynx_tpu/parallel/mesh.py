"""Device mesh construction + sharding rules.

The reference has no distributed execution at all (SURVEY.md §2.4); the
TPU-native design shards over a 2-D ``(data, model)`` mesh:

  * data axis: batch rows (sentences / training examples) — gradients are
    all-reduced over ICI by XLA's sharding propagation
  * model axis: tensor parallelism over the transformer FFN filter
    dimension and attention heads (the encoder's wide matmuls); the flow
    decoder's channels are small (~192) and stay replicated

Shardings are expressed as ``PartitionSpec`` rules + ``NamedSharding``;
XLA inserts the collectives (all-gather / reduce-scatter / psum) — no
hand-written NCCL-style code, per the scaling-book recipe.
"""

import typing

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: typing.Optional[int] = None,
    model_parallel: typing.Optional[int] = None,
    axis_names: typing.Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``model_parallel`` defaults to 2 when the device count is even (a
    cheap-but-real TP axis), else 1.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if model_parallel is None:
        model_parallel = 2 if n % 2 == 0 and n > 1 else 1
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def serving_mesh() -> typing.Optional[Mesh]:
    """1-D data-parallel mesh over the available devices for serving.

    None on a single device (or when LARYNX_TPU_MESH=off).  Uses the
    largest power-of-two device count so batch buckets divide evenly.
    """
    import os

    flag = os.environ.get("LARYNX_TPU_MESH", "auto").lower()
    if flag in ("off", "0", "none"):
        return None
    devices = jax.devices()
    if len(devices) < 2:
        return None
    if flag == "auto" and devices[0].platform == "cpu":
        # a forced-host-platform CPU "mesh" is a test fixture, not a fleet;
        # opt in explicitly with LARYNX_TPU_MESH=on
        return None
    n = 1 << (len(devices).bit_length() - 1)
    return Mesh(np.asarray(devices[:n]), ("data",))


def replicated_spec() -> P:
    return P()


def batch_spec(ndim: int = 2) -> P:
    """Shard axis 0 (batch) over the data axis; rest replicated."""
    return P("data", *([None] * (ndim - 1)))


def glow_param_specs(params) -> typing.Any:
    """PartitionSpec pytree for GlowTTS parameters.

    Encoder FFN conv1 (filter out) is column-parallel, conv2 (filter in)
    row-parallel; attention QKV column-parallel on heads, output proj
    row-parallel.  Everything else (embeddings, norms, flow decoder) is
    replicated — those tensors are small.
    """

    def spec_for(path: typing.Tuple[str, ...], leaf) -> P:
        name = path[-1] if path else ""
        in_enc_layers = "layers" in path and "encoder" in path
        if in_enc_layers:
            # leaves carry a leading stacked-layer axis
            if name == "conv1_w":  # [L, k, h, f]
                return P(None, None, None, "model")
            if name == "conv1_b":  # [L, f]
                return P(None, "model")
            if name == "conv2_w":  # [L, k, f, h]
                return P(None, None, "model", None)
            if name in ("q_w", "k_w", "v_w"):  # [L, h, h]
                return P(None, None, "model")
            if name in ("q_b", "k_b", "v_b"):  # [L, h]
                return P(None, "model")
            if name == "o_w":  # [L, h, h]
                return P(None, "model", None)
        return P()

    paths_and_leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    specs = []
    for path, leaf in paths_and_leaves:
        keys = tuple(
            getattr(k, "key", getattr(k, "idx", str(k))) for k in path
        )
        keys = tuple(str(k) for k in keys)
        specs.append(spec_for(keys, leaf))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree onto the mesh per :func:`glow_param_specs`."""
    specs = glow_param_specs(params)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )
