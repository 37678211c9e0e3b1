"""TP param-partitioning tests on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from gwdepth_tpu.parallel import make_mesh, param_shardings, place_params
from gwdepth_tpu.parallel.partition import _spec_for


def test_spec_heuristics():
    assert _spec_for(("transformer", "enc", "linear1", "kernel"),
                     (32, 64), 2) == P(None, "model")
    assert _spec_for(("transformer", "enc", "linear2", "kernel"),
                     (64, 32), 2) == P("model", None)
    assert _spec_for(("attn", "qkv", "kernel"), (32, 96), 2) == P(None, "model")
    # indivisible output -> replicated
    assert _spec_for(("x", "linear1", "kernel"), (32, 63), 2) == P()
    # trivial model axis -> replicated
    assert _spec_for(("x", "linear1", "kernel"), (32, 64), 1) == P()
    # biases replicated
    assert _spec_for(("x", "linear1", "bias"), (64,), 2) == P()


def test_place_params_and_matmul_semantics():
    """A TP-sharded Dense matmul gives the same result as replicated."""
    mesh = make_mesh((4, 2), ("data", "model"))
    params = {"mlp": {"linear1": {"kernel": jnp.arange(32 * 64, dtype=jnp.float32).reshape(32, 64) / 1000,
                                  "bias": jnp.ones((64,))},
                      "linear2": {"kernel": jnp.ones((64, 16)),
                                  "bias": jnp.zeros((16,))}}}
    placed = place_params(params, mesh)
    spec = param_shardings(params, mesh)
    assert spec["mlp"]["linear1"]["kernel"].spec == P(None, "model")

    x = jnp.ones((8, 32))

    def f(p, x):
        h = x @ p["mlp"]["linear1"]["kernel"] + p["mlp"]["linear1"]["bias"]
        return h @ p["mlp"]["linear2"]["kernel"] + p["mlp"]["linear2"]["bias"]

    with mesh:
        got = jax.jit(f)(placed, x)
    want = f(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
