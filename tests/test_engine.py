"""Engine-level unit tests (the epoch loops themselves are driven
end-to-end by tests/test_cli_e2e.py through gwdepth_tpu.main)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gwdepth_tpu.engine import device_prefetch
from gwdepth_tpu.parallel import make_mesh


def _fake_epoch(n, shape=(8, 4)):
    for i in range(n):
        yield np.full(shape, i, np.float32), [f"img{i}"]


def test_device_prefetch_preserves_order_and_content():
    out = list(device_prefetch(_fake_epoch(5)))
    assert [names for _, names in out] == [[f"img{i}"] for i in range(5)]
    for i, (batch, _) in enumerate(out):
        assert isinstance(batch, jax.Array)
        np.testing.assert_array_equal(np.asarray(batch), np.full((8, 4), i))


def test_device_prefetch_places_mesh_sharding():
    mesh = make_mesh((-1,), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    out = list(device_prefetch(_fake_epoch(3), sharding))
    assert len(out) == 3
    for batch, _ in out:
        assert batch.sharding == sharding
        # sharded compute consumes the pre-placed batch directly
        assert jnp.isfinite(batch.sum())


def test_device_prefetch_empty_iterator():
    assert list(device_prefetch(iter([]))) == []
