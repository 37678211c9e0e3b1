"""Train/eval step tests on an 8-device virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8).

The full train step (forward+backward through GlassRGBD) is expensive to
XLA-compile on CPU, so everything that needs it shares ONE jitted sharded
step via a module fixture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gwdepth_tpu.config import tiny_test_config
from gwdepth_tpu.data.batch import dummy_batch
from gwdepth_tpu.models import GlassRGBD
from gwdepth_tpu.parallel import (
    make_mesh, make_train_step, make_eval_step, create_train_state,
    param_group_label, compute_losses)
from gwdepth_tpu.parallel.train_step import (
    depth_error_sums, seg_confusion, summarize_depth, summarize_seg)


@pytest.fixture(scope="module")
def harness():
    cfg = tiny_test_config()
    model = GlassRGBD(cfg)
    batch = dummy_batch(cfg, 8)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch.images)["params"]
    return cfg, model, batch, params


def test_param_group_labels():
    assert param_group_label(("backbone", "conv1", "kernel")) == "frozen"
    assert param_group_label(("backbone", "layer1", "block0", "conv1",
                              "kernel")) == "frozen"
    assert param_group_label(("backbone", "layer2", "block0", "conv1",
                              "kernel")) == "backbone"
    assert param_group_label(("backbone", "layer3", "block1", "bn2",
                              "weight")) == "frozen"
    assert param_group_label(("transformer", "encoder_layer0", "linear1",
                              "kernel")) == "main"


def test_sharded_train_step_end_to_end(harness):
    """One compile, many checks: 8-device data-parallel step runs, loss is
    finite and decreases over a few steps, stem stays frozen, main params
    move, step counter advances."""
    cfg, model, batch, params = harness
    mesh = make_mesh((-1,), ("data",))
    assert mesh.devices.size == 8
    # the step donates its input state; keep the fixture's params alive
    state = create_train_state(cfg, jax.tree.map(jnp.copy, params),
                               steps_per_epoch=1000)
    step = make_train_step(cfg, model, mesh)

    before_stem = np.asarray(params["backbone"]["conv1"]["kernel"]).copy()
    before_main = np.asarray(
        params["transformer"]["encoder_layer0"]["linear1"]["kernel"]).copy()

    losses = []
    with mesh:
        for i in range(3):
            state, log_vec = step(state, batch, jax.random.PRNGKey(i))
            logs = dict(zip(step.log_keys, np.asarray(log_vec).tolist()))
            losses.append(logs["loss"])

    assert int(state.step) == 3
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    np.testing.assert_array_equal(
        before_stem, np.asarray(state.params["backbone"]["conv1"]["kernel"]))
    after_main = np.asarray(
        state.params["transformer"]["encoder_layer0"]["linear1"]["kernel"])
    assert np.abs(after_main - before_main).max() > 0


def test_grad_accum_matches_manual_microbatch_average(harness):
    """grad_accum=2 must produce exactly the update of averaging the two
    strided-microbatch gradients (image i -> microbatch i % 2) and applying
    them once — i.e. data-parallel-over-2x-more-devices semantics. Logs are
    the microbatch mean."""
    cfg, model, batch, params = harness
    cfg2 = cfg.replace(grad_accum=2)
    state = create_train_state(cfg2, jax.tree.map(jnp.copy, params), 1000)
    step = make_train_step(cfg2, model)
    rng = jax.random.PRNGKey(7)
    new_state, logvec = step(state, batch, rng)
    logs = dict(zip(step.log_keys, np.asarray(logvec).tolist()))

    def loss_fn(p, mb, r):
        out = model.apply({"params": p}, mb.images, mb.valid,
                          deterministic=False, rngs={"dropout": r})
        return compute_losses(cfg2, out, mb)

    rngs = jax.random.split(rng, 2)
    grads, losses = [], []
    for j in range(2):
        mb = jax.tree.map(lambda x, j=j: x[j::2], batch)
        (_, lg), g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
            params, mb, rngs[j])
        grads.append(g)
        losses.append(float(lg["loss"]))
    avg = jax.tree.map(lambda a, b: (a + b) / 2.0, *grads)
    exp_state = create_train_state(
        cfg2, jax.tree.map(jnp.copy, params), 1000).apply_gradients(avg)

    np.testing.assert_allclose(logs["loss"], np.mean(losses), rtol=1e-5)
    flat_new = jax.tree_util.tree_leaves(new_state.params)
    flat_exp = jax.tree_util.tree_leaves(exp_state.params)
    for a, b in zip(flat_new, flat_exp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_grad_accum_composes_with_mesh(harness):
    """grad_accum=2 over the 8-device data mesh: the strided microbatch
    split must compose with GSPMD (each microbatch spans all shards) and
    produce a finite step."""
    cfg, model, batch, params = harness
    cfg2 = cfg.replace(grad_accum=2)
    mesh = make_mesh((-1,), ("data",))
    state = create_train_state(cfg2, jax.tree.map(jnp.copy, params), 1000)
    step = make_train_step(cfg2, model, mesh)
    with mesh:
        state, logvec = step(state, batch, jax.random.PRNGKey(3))
    logs = dict(zip(step.log_keys, np.asarray(logvec).tolist()))
    assert np.isfinite(logs["loss"])
    assert int(state.step) == 1


def test_eval_step_and_loss_weighting(harness):
    cfg, model, batch, params = harness
    estep = make_eval_step(cfg, model)
    res = estep(params, batch)
    assert res["depth_sums"].shape == (10,)
    assert res["confusion"].shape == (2, 2)
    d = summarize_depth(res["depth_sums"])
    assert set(d) == {"silog", "abs_rel", "log10", "rms", "sq_rel",
                      "log_rms", "d1", "d2", "d3"}
    s = summarize_seg(res["confusion"])
    assert 0 <= s["mean_iou"] <= 100

    # loss weighting: line ce x1, line L1 x5, depth/seg summed
    out = model.apply({"params": params}, batch.images, batch.valid)
    total, logs = compute_losses(cfg, out, batch)
    manual = sum(v for k, v in logs.items() if k.startswith("loss_ce"))
    manual += sum(v * cfg.line_loss_coef for k, v in logs.items()
                  if k.startswith("loss_line"))
    manual += sum(v for k, v in logs.items() if k.startswith("loss_depth"))
    manual += logs["loss_seg"]
    np.testing.assert_allclose(float(total), float(manual), rtol=1e-5)


def test_depth_error_sums_matches_numpy_reference():
    """Against the reference metric math (src/util/metrics.py:197-218)."""
    rng = np.random.default_rng(3)
    gt = rng.uniform(0.5, 9.0, (2, 8, 8)).astype(np.float32)
    pred = rng.uniform(0.5, 9.0, (2, 8, 8)).astype(np.float32)
    valid = np.ones_like(gt, bool)
    got = np.asarray(depth_error_sums(jnp.asarray(pred), jnp.asarray(gt),
                                      jnp.asarray(valid), 1e-3, 10.0))
    acc = np.zeros(9)
    for b in range(2):
        g, p = gt[b], np.clip(pred[b], 1e-3, 10.0)
        thresh = np.maximum(g / p, p / g)
        acc += np.array([
            np.sqrt(np.mean((np.log(p) - np.log(g)) ** 2)
                    - np.mean(np.log(p) - np.log(g)) ** 2) * 100,
            np.mean(np.abs(g - p) / g),
            np.mean(np.abs(np.log10(p) - np.log10(g))),
            np.sqrt(np.mean((g - p) ** 2)),
            np.mean((g - p) ** 2 / g),
            np.sqrt(np.mean((np.log(g) - np.log(p)) ** 2)),
            (thresh < 1.25).mean(), (thresh < 1.25 ** 2).mean(),
            (thresh < 1.25 ** 3).mean(),
        ])
    np.testing.assert_allclose(got[:9], acc, rtol=1e-4)
    assert got[9] == 2.0


def test_seg_confusion():
    gt = jnp.asarray([[[0, 1], [1, 1]]])
    pred = jnp.asarray([[[0, 0], [1, 1]]])
    valid = jnp.ones((1, 2, 2), bool)
    cm = np.asarray(seg_confusion(pred, gt, valid))
    np.testing.assert_array_equal(cm, [[1, 0], [1, 2]])


def test_line_only_config_paths():
    """with_dense=False (the wireframe recipe): train/eval steps run with
    only line losses and no depth accumulators."""
    cfg = tiny_test_config(with_dense=False)
    model = GlassRGBD(cfg)
    batch = dummy_batch(cfg, 2)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 batch.images)["params"]
    state = create_train_state(cfg, params, 10)
    step = make_train_step(cfg, model)
    state, lv = step(state, batch, jax.random.PRNGKey(1))
    logs = dict(zip(step.log_keys, np.asarray(lv).tolist()))
    assert np.isfinite(logs["loss"]) and "loss_depth_1" not in logs
    estep = make_eval_step(cfg, model)
    res = estep(state.params, batch)
    assert "depth_sums" not in res and "pred_lines" in res


def test_sharded_eval_step_with_batch_padding(harness):
    """Mesh-sharded eval at batch 8 where the last 3 entries are all-invalid
    padding (Loader pad_to_batch) must reproduce the unpadded 5-image
    accumulators exactly — padding contributes nothing to depth sums,
    confusion, or the per-image eval losses."""
    cfg, model, batch, params = harness
    from gwdepth_tpu.data.batch import Batch
    keep = 5

    def zero_tail(x):
        return jnp.concatenate(
            [x[:keep], jnp.zeros_like(x[keep:])], axis=0)

    padded = Batch(images=zero_tail(batch.images),
                   valid=zero_tail(batch.valid),
                   depth=zero_tail(batch.depth),
                   seg=zero_tail(batch.seg),
                   lines=zero_tail(batch.lines),
                   line_mask=zero_tail(batch.line_mask))

    mesh = make_mesh((-1,), ("data",))
    estep_mesh = make_eval_step(cfg, model, mesh)
    with mesh:
        res_pad = estep_mesh(params, padded)

    sub = jax.tree.map(lambda x: x[:keep], batch)
    estep = make_eval_step(cfg, model)
    res_ref = estep(params, sub)

    assert int(res_pad["depth_sums"][9]) == keep
    np.testing.assert_allclose(np.asarray(res_pad["depth_sums"]),
                               np.asarray(res_ref["depth_sums"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(res_pad["confusion"]),
                                  np.asarray(res_ref["confusion"]))
    np.testing.assert_allclose(np.asarray(res_pad["eval_losses"]),
                               np.asarray(res_ref["eval_losses"]),
                               rtol=1e-4, atol=1e-5)
    assert float(res_pad["eval_loss_count"]) == keep


def test_bf16_train_step_finite_and_close_to_f32():
    """--bf16 (cfg.dtype='bfloat16') runs the train step with bf16 compute
    (params stay f32): loss must be finite and within bf16 tolerance of
    the f32 step on identical params/batch. Guards the CLI gate from rot —
    the reference has no mixed-precision path at all."""
    cfg = tiny_test_config()
    model = GlassRGBD(cfg)
    batch = dummy_batch(cfg, 2)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 batch.images)["params"]

    losses = {}
    for dtype in ("float32", "bfloat16"):
        c = cfg.replace(dtype=dtype)
        m = GlassRGBD(c)
        state = create_train_state(c, jax.tree.map(jnp.copy, params), 1000)
        step = make_train_step(c, m)
        state, log = step(state, batch, jax.random.PRNGKey(1))
        logs = dict(zip(step.log_keys, np.asarray(log)))
        assert np.isfinite(logs["loss"]), (dtype, logs)
        losses[dtype] = float(logs["loss"])
        # params updated and finite
        k = np.asarray(
            state.params["transformer"]["encoder_layer0"]["linear1"]["kernel"])
        assert np.isfinite(k).all()
    assert abs(losses["bfloat16"] - losses["float32"]) <= (
        0.1 * abs(losses["float32"]) + 0.05), losses
