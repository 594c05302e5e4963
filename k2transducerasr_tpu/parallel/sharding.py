"""Device-mesh sharding for multi-chip inference.

The reference has NO distribution of any kind (SURVEY.md §2.3) — its only
parallelism is the ORT CPU threadpool.  Here scaling is expressed the
idiomatic JAX way: a ``Mesh`` with ``data`` (utterance batches, DP) and
``model`` (tensor-parallel weight shards, TP for the xlarge encoders that
exceed one chip's HBM — BASELINE config #5) axes; params and activations get
``NamedSharding`` annotations and XLA/GSPMD inserts the collectives over
ICI.

Generic TP rule: every >=2-D parameter whose largest axis is divisible by
the model-axis size is sharded over that axis; everything else is
replicated.  GSPMD keeps semantics identical for ANY sharding, so this is
both correct and a solid bandwidth-balanced default; per-family overrides
can refine it later.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def auto_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    n = n_devices if n_devices is not None else len(jax.devices())
    model = model_parallel
    while n % model:
        model //= 2
    return make_mesh(n // model, model)


def param_spec(path_leaf_shape, n_model: int) -> P:
    """Largest-divisible-axis TP rule for one parameter."""
    shape = path_leaf_shape
    if len(shape) < 2 or n_model <= 1:
        return P()
    order = sorted(range(len(shape)), key=lambda a: -shape[a])
    for axis in order:
        if shape[axis] >= 2 * n_model and shape[axis] % n_model == 0:
            spec = [None] * len(shape)
            spec[axis] = "model"
            return P(*spec)
    return P()


def _is_conv_path(path) -> bool:
    """True for conv-kernel leaves (embed convs, conv-module depthwise,
    decoder grouped conv).  Grouped convolutions MUST stay replicated:
    sharding a grouped kernel's output-feature axis changes which group a
    shard's features belong to and GSPMD silently computes garbage
    (reproduced on the CPU backend; see tests/test_sharding.py).  Plain
    convs are tiny here, so all conv kernels just replicate."""
    for k in path:
        name = getattr(k, "key", getattr(k, "name", None))
        if isinstance(name, str) and (name.startswith("conv") or name == "dw"):
            return True
    return False


def _is_replicated_subtree(path) -> bool:
    """True for params that must replicate WHOLESALE: the transducer decoder
    and joiner.  Root cause (measured, tests/test_sharding.py round 3): GSPMD
    computes garbage for a grouped convolution whenever the *input feature
    axis* is sharded — even with the kernel fully replicated (maxdiff ~2.0 on
    unit-scale data vs 0.0 batch-sharded, CPU backend).  The decoder's
    context conv is grouped (icefall: groups=dim//4), and sharding ANY
    adjacent decoder/joiner leaf (embedding dim axis, decoder_proj.w
    contraction axis) lets GSPMD propagate a feature-axis partition into that
    conv.  These nets are tiny ([V,D] + a few [D,D]/[J,V] matmuls); TP exists
    for the xlarge *encoder* (BASELINE config #5), so replication costs
    nothing and keeps the decode loop token-identical to single-chip."""
    for k in path:
        name = getattr(k, "key", getattr(k, "name", None))
        if isinstance(name, str) and name in ("decoder", "joiner"):
            return True
    return False


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings for a param pytree under the TP rule."""
    n_model = mesh.shape["model"]

    def one(path, leaf):
        if _is_replicated_subtree(path) or _is_conv_path(path):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, param_spec(np.shape(leaf), n_model))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh):
    """Place a param pytree onto the mesh with TP shardings."""
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, s), params, param_shardings(params, mesh)
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data parallelism for activations/inputs."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
