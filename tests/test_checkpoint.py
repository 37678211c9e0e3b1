"""Orbax checkpoint manager roundtrip: save N epochs, restore latest and a
kept periodic epoch; rolling window drops intermediates
(reference policy: main_glassrgbd.py:213-226)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gwdepth_tpu.config import tiny_test_config
from gwdepth_tpu.parallel import create_train_state
from gwdepth_tpu.utils.checkpoint import CheckpointManager


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_test_config()
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    state = create_train_state(cfg, params, steps_per_epoch=10)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_freq_epochs=2,
                            max_keep=2)
    for epoch in range(4):
        state = state.replace(
            step=state.step + 1,
            params={"w": state.params["w"] + 1.0, "b": state.params["b"]})
        mgr.save(epoch, state, cfg)
    mgr.wait()

    fresh = create_train_state(cfg, jax.tree.map(jnp.zeros_like, params),
                               steps_per_epoch=10)
    restored, next_epoch = mgr.restore(fresh)
    assert next_epoch == 4
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.arange(6.0).reshape(2, 3) + 4.0)
    assert int(restored.step) == 4

    # periodic epoch 2 survives the rolling window (keep_period=2)
    restored2, next2 = mgr.restore(fresh, epoch=2)
    assert next2 == 3
    np.testing.assert_allclose(np.asarray(restored2.params["w"]),
                               np.arange(6.0).reshape(2, 3) + 3.0)
    mgr.close()


def test_restore_empty_dir_returns_epoch0(tmp_path):
    cfg = tiny_test_config()
    params = {"w": jnp.ones((2, 2))}
    state = create_train_state(cfg, params, steps_per_epoch=10)
    mgr = CheckpointManager(str(tmp_path / "empty"))
    same, epoch = mgr.restore(state)
    assert epoch == 0
    np.testing.assert_allclose(np.asarray(same.params["w"]), 1.0)
    mgr.close()
