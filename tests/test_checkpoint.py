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


def test_restore_params_only_no_opt(tmp_path):
    """--no_opt semantics (reference main_glassrgbd.py:160-164): weights
    restored, optimizer state / step counter / start epoch stay fresh."""
    cfg = tiny_test_config()
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    state = create_train_state(cfg, params, steps_per_epoch=10)
    state = state.replace(step=state.step + 7,
                          params={"w": state.params["w"] + 5.0})
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, state, cfg)
    mgr.wait()

    fresh = create_train_state(
        cfg, {"w": jnp.zeros((2, 3))}, steps_per_epoch=10)
    restored, epoch = mgr.restore(fresh, params_only=True)
    assert epoch == 0                       # train from epoch 0
    assert int(restored.step) == 0          # fresh step counter
    np.testing.assert_allclose(np.asarray(restored.params["w"]),
                               np.arange(6.0).reshape(2, 3) + 5.0)
    # optimizer state untouched (fresh zeros moments)
    for leaf in jax.tree.leaves(restored.opt_state):
        if hasattr(leaf, "shape") and leaf.shape == (2, 3):
            np.testing.assert_allclose(np.asarray(leaf), 0.0)
    mgr.close()


def test_resume_lr_drop_override(tmp_path):
    """The reference overrides the restored scheduler's step_size with the
    CURRENT --lr_drop (main_glassrgbd.py:162-163). Our schedule is rebuilt
    from the config each run, so a resumed state at step N follows the new
    lr_drop boundary immediately."""
    from gwdepth_tpu.parallel.train_state import make_lr_schedule
    spe = 10
    old_sched = make_lr_schedule(1e-4, spe, 200)
    new_sched = make_lr_schedule(1e-4, spe, 2)   # resumed run's new lr_drop
    step = 5 * spe                           # epoch 5
    assert float(old_sched(step)) == pytest.approx(1e-4)
    assert float(new_sched(step)) == pytest.approx(1e-6)  # 5//2 = 2 drops


def test_load_meta_returns_epoch_and_config(tmp_path):
    """load_meta reads the JSON sidecar (epoch + full config dict) without
    restoring arrays — the convert/export_torch.py CLI rebuilds the
    training GWDepthConfig from it."""
    cfg = tiny_test_config()
    params = {"w": jnp.ones((2, 2))}
    state = create_train_state(cfg, params, steps_per_epoch=10)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(3, state, cfg)
    mgr.wait()
    meta = mgr.load_meta()
    assert meta["epoch"] == 3
    assert meta["config"]["num_queries"] == cfg.num_queries
    assert tuple(meta["config"]["eval_hw"]) == cfg.eval_hw
    # empty dir -> None
    assert CheckpointManager(str(tmp_path / "none")).load_meta() is None
    mgr.close()
