"""LONG-HORIZON joint trajectory parity ending in eval-metric equality.

The 4-step optimizer-trajectory test (test_reference_parity_train_loop.py)
pins AdamW/StepLR/clip numerics; this test is the strongest available
proxy for the real-data north star (VERDICT r2 missing #1): it drives
BOTH frameworks — the ACTUAL reference loop (src/main_glassrgbd.py:193-237
epoch structure: train_one_epoch -> lr_scheduler.step -> evaluate) and
ours — for N_STEPS=25 full AdamW+StepLR optimization steps from identical
converted weights on identical synthetic batches, with the LR dropping
TWICE mid-run (lr_drop=10), then runs BOTH eval loops (the real
src/engine_glassrgbd.py:174-342 evaluate vs gwdepth_tpu.engine.evaluate)
on held-out samples and requires the end-state depth 9-tuple, the
segmentation IoU block, and the line-loss meters to agree.

Per-step losses are also tracked the whole way; the tolerance widens
linearly with step index because float non-associativity compounds
through parameter drift.

Runs at the reference's real channel widths with reduced depths on a
128x192 canvas (same sizing rationale as the trajectory test: the
smallest canvas where every CertainSample quota stays satisfiable).
"""

from __future__ import annotations

import importlib

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_harness import (cuda_as_cpu, get_ref, make_ref_args, nchw,
                               state_dict_numpy)
from gwdepth_tpu.config import GWDepthConfig
from gwdepth_tpu.convert.full_model import glassrgbd_torch_to_flax, coverage
from gwdepth_tpu.convert.torch_weights import merge_params

from test_reference_parity_train_loop import _ref_loss
from test_reference_parity_eval_loop import _OurEvalLoader, _RefEvalLoader


@pytest.fixture(scope="module")
def ref():
    return get_ref()


N_STEPS = 25
LR_DROP = 10         # epochs; one epoch == one step -> drops at 10 and 20
N_EVAL = 3
H, W = 128, 192
B = 1


def _cfg() -> GWDepthConfig:
    return GWDepthConfig(
        enc_layers=2, dec_layers=2, dim_feedforward=256, num_queries=30,
        dropout=0.0, dense_trans_layers=(2,), class_trans_layers=(1, 1, 1),
        group_attention_layers=((False, False), (False, False), (False,)),
        train_hw=(H, W), eval_hw=(H, W), lr_drop=LR_DROP)


def _train_batches(rng: np.random.Generator, n: int):
    out = []
    for _ in range(n):
        img = rng.standard_normal((B, H, W, 3), dtype=np.float32)
        depth = (rng.random((B, H, W), dtype=np.float32) * 9.5 + 0.3)
        seg = (rng.random((B, H, W)) > 0.5).astype(np.int64)
        k = int(rng.integers(2, 5))
        lines = rng.random((B, k, 6), dtype=np.float32)
        out.append((img, depth, seg, lines))
    return out


def _eval_samples(rng: np.random.Generator):
    out = []
    for _ in range(N_EVAL):
        img = rng.standard_normal((B, H, W, 3), dtype=np.float32)
        depth = rng.random((B, H, W), dtype=np.float32) * 9.5 + 0.3
        depth[rng.random((B, H, W)) < 0.08] = 0.0   # invalid GT holes
        seg = (rng.random((B, H, W)) > 0.5).astype(np.int64)
        k = int(rng.integers(2, 5))
        lines = rng.random((B, k, 6), dtype=np.float32)
        out.append((img, depth, seg, lines))
    return out


def test_long_horizon_trajectory_then_eval_parity(ref, tmp_path):
    cfg = _cfg()
    args = make_ref_args(cfg, coco_path=None, append_word=None,
                         resume="checkpoint.pth", dataset="glassrgbd")
    torch.manual_seed(31)
    model_t, crits, _ = ref.glassrgbd.build(args)
    model_t.train()

    rng = np.random.default_rng(2026)
    batches = _train_batches(rng, N_STEPS)
    eval_samples = _eval_samples(rng)

    # ---- reference loop: AdamW groups + StepLR + clip (main:59-67,
    # engine:155-159), one epoch == one step
    param_dicts = [
        {"params": [p for n, p in model_t.named_parameters()
                    if "backbone" not in n and p.requires_grad]},
        {"params": [p for n, p in model_t.named_parameters()
                    if "backbone" in n and p.requires_grad],
         "lr": cfg.lr_backbone},
    ]
    opt = torch.optim.AdamW(param_dicts, lr=cfg.lr,
                            weight_decay=cfg.weight_decay)
    sched = torch.optim.lr_scheduler.StepLR(opt, LR_DROP)
    init_state = state_dict_numpy(model_t)

    losses_t = []
    for img, depth, seg, lines in batches:
        nt = ref.misc.NestedTensor(
            nchw(img), torch.zeros((B, H, W), dtype=torch.bool))
        out_t = model_t(nt)
        total = _ref_loss(cfg, crits, out_t, depth, seg, lines)
        opt.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(model_t.parameters(),
                                       cfg.clip_max_norm)
        opt.step()
        sched.step()
        losses_t.append(float(total))

    # ---- the REAL reference eval loop on the trained weights
    model_t.eval()
    eng = importlib.import_module("engine_glassrgbd")
    with cuda_as_cpu(), torch.no_grad():
        stats_t = eng.evaluate(model_t, crits, None,
                               _RefEvalLoader(ref.misc, eval_samples), None,
                               "cpu", "", args, save_dir=str(tmp_path),
                               epoch=0)

    # ---- our loop from the SAME initial weights
    from gwdepth_tpu.data.batch import Batch
    from gwdepth_tpu.engine import evaluate
    from gwdepth_tpu.models import GlassRGBD
    from gwdepth_tpu.parallel.train_state import create_train_state
    from gwdepth_tpu.parallel.train_step import make_train_step, make_eval_step

    m = GlassRGBD(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((B, H, W, 3)))["params"]
    overlay = glassrgbd_torch_to_flax(init_state)
    cov, total_n, missing = coverage(overlay, params)
    assert cov == total_n, f"uncovered {len(missing)}/{total_n}"
    params = merge_params(params, overlay)

    state = create_train_state(cfg, params, steps_per_epoch=1)
    step_fn = make_train_step(cfg, m)

    losses_j = []
    for i, (img, depth, seg, lines) in enumerate(batches):
        T = cfg.max_lines
        tgt = np.zeros((B, T, 6), np.float32)
        msk = np.zeros((B, T), bool)
        tgt[:, :lines.shape[1]] = lines
        msk[:, :lines.shape[1]] = True
        batch = Batch(images=jnp.asarray(img),
                      valid=jnp.ones((B, H, W), bool),
                      depth=jnp.asarray(depth), seg=jnp.asarray(seg),
                      lines=jnp.asarray(tgt), line_mask=jnp.asarray(msk))
        state, logs = step_fn(state, batch, jax.random.PRNGKey(i))
        losses_j.append(float(logs[step_fn.log_keys.index("loss")]))

    # per-step loss trajectory across the full horizon (incl. both LR
    # drops); drift compounds, so the tolerance widens with step index
    for i, (lt, lj) in enumerate(zip(losses_t, losses_j)):
        np.testing.assert_allclose(lj, lt, rtol=2e-3 * (i + 1),
                                   err_msg=f"train loss, step {i}")

    # ---- our eval loop on OUR trained params
    stats_j = evaluate(cfg, state.params, make_eval_step(cfg, m),
                       _OurEvalLoader(cfg, eval_samples))

    # end-state eval parity: the 25-step parameter drift is pure float
    # noise, so the aggregated metrics must still agree tightly
    for k in ["silog", "abs_rel", "log10", "rms", "sq_rel", "log_rms"]:
        np.testing.assert_allclose(stats_j[k], stats_t[k], rtol=2e-2,
                                   err_msg=f"depth metric {k}")
    for k in ["d1", "d2", "d3"]:
        np.testing.assert_allclose(stats_j[k], stats_t[k], atol=1e-2,
                                   err_msg=f"depth metric {k}")
    for ours, theirs in [("iou_background", "Background"),
                         ("iou_glass", "Glass"), ("mean_iou", "Mean IU"),
                         ("pixel_accuracy", "Pixel accuracy"),
                         ("mean_accuracy", "Mean accuracy")]:
        np.testing.assert_allclose(stats_j[ours], stats_t[theirs],
                                   atol=0.5, err_msg=f"seg {ours}")
    for ours, theirs in [("loss_ce", "loss_ce_unscaled"),
                         ("loss_line", "loss_line_unscaled")]:
        np.testing.assert_allclose(stats_j[ours], stats_t[theirs],
                                   rtol=5e-2, atol=1e-3,
                                   err_msg=f"line meter {ours}")
