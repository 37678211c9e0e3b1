"""Tensor-parallel parameter partitioning over the `model` mesh axis.

The reference is data-parallel only (SURVEY.md §2.8); this module adds the
TPU-native scale-out dimension the reference never had: GSPMD parameter
sharding. Weights of the big matmuls are annotated with PartitionSpecs and
XLA inserts the all-gathers/reduce-scatters — no model-code changes
(the "pick a mesh, annotate shardings, let XLA insert collectives" recipe).

Heuristic (Megatron-style column/row pairing where the pattern is clear,
plain column sharding elsewhere — GSPMD keeps semantics identical for any
choice, the spec only changes layout/collectives):

  - attention qkv / in_proj, MLP fc1/linear1: shard the OUTPUT features
  - attention proj/out_proj, MLP fc2/linear2: shard the INPUT features
  - conv kernels (kh, kw, I, O): shard O when divisible
  - biases/norms/small tensors: replicated
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL_NAMES = ("qkv", "linear1", "fc1", "ref_qk", "in_proj_weight",
              "global_k", "global_v")
_ROW_NAMES = ("proj", "out_proj", "linear2", "fc2")


def _spec_for(path: Tuple[str, ...], shape, model_size: int) -> P:
    if model_size <= 1 or len(shape) == 0:
        return P()
    leaf = path[-1]
    parent = path[-2] if len(path) > 1 else ""
    if leaf == "kernel" and len(shape) == 2:
        din, dout = shape
        if parent in _COL_NAMES and dout % model_size == 0:
            return P(None, "model")
        if parent in _ROW_NAMES and din % model_size == 0:
            return P("model", None)
        if dout % model_size == 0 and dout >= 4 * model_size:
            return P(None, "model")
        return P()
    if leaf == "in_proj_weight" and len(shape) == 2:
        # (3C, C): fused qkv stays divisible per head-group
        return P("model", None) if shape[0] % (3 * model_size) == 0 else P()
    if leaf == "kernel" and len(shape) == 4:
        dout = shape[3]
        if dout % model_size == 0 and dout >= 8 * model_size:
            return P(None, None, None, "model")
        return P()
    return P()


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings for the param tree; replicated when the
    mesh has no (or a trivial) `model` axis."""
    model_size = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)

    def one(path, leaf):
        names = tuple(k.key for k in path)
        return NamedSharding(mesh, _spec_for(names, np.shape(leaf),
                                             model_size))

    return jax.tree_util.tree_map_with_path(one, params)


def place_params(params, mesh: Mesh):
    """Device-put params with their TP shardings."""
    return jax.device_put(params, param_shardings(params, mesh))
