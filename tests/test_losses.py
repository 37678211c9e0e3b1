"""Golden tests: set criterion / SiLog / seg CE vs the reference math
re-implemented in torch+scipy on random inputs."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402
from scipy.optimize import linear_sum_assignment  # noqa: E402

from gwdepth_tpu.losses import (
    line_set_criterion, silog_loss, seg_ce_loss, multiscale_depth_loss)

RNG = np.random.default_rng(7)


def _reference_criterion(pred_logits, pred_lines, tgt_list, eos_coef=0.1,
                         cost_class=1.0, cost_line=5.0):
    """Port of reference glassrgbd.py:154-244 + matcher.py:49-82 (single
    process: num_items = global count)."""
    B, Q, _ = pred_logits.shape
    logits = torch.from_numpy(pred_logits)
    lines = torch.from_numpy(pred_lines)
    indices = []
    for b, tgt in enumerate(tgt_list):
        prob = TF.softmax(logits[b], -1).numpy()
        cc = -prob[:, np.zeros(len(tgt), np.int64)]
        cl = np.abs(pred_lines[b][:, None, :] - tgt[None]).sum(-1)
        C = cost_line * cl + cost_class * cc
        indices.append(linear_sum_assignment(C))
    num_items = max(sum(len(t) for t in tgt_list), 1)

    loss_line = 0.0
    target_classes = torch.full((B, Q), 1, dtype=torch.int64)
    for b, (tgt, (qi, ti)) in enumerate(zip(tgt_list, indices)):
        src = pred_lines[b][qi]
        loss_line += np.abs(src - tgt[ti]).sum()
        target_classes[b, qi] = 0
    loss_line = loss_line / num_items
    w = torch.tensor([1.0, eos_coef])
    loss_ce = TF.cross_entropy(logits.transpose(1, 2), target_classes, w)
    return float(loss_ce), float(loss_line)


def test_set_criterion_matches_reference():
    B, Q, T, D = 2, 12, 5, 6
    pred_logits = RNG.normal(size=(B, Q, 2)).astype(np.float32)
    pred_lines = RNG.uniform(size=(B, Q, D)).astype(np.float32)
    n_valid = [3, 5]
    tgt_list = [RNG.uniform(size=(n, D)).astype(np.float32) for n in n_valid]

    tgt_lines = np.zeros((B, T, D), np.float32)
    mask = np.zeros((B, T), bool)
    for b, t in enumerate(tgt_list):
        tgt_lines[b, :len(t)] = t
        mask[b, :len(t)] = True

    out = line_set_criterion(
        {"pred_logits": jnp.asarray(pred_logits),
         "pred_lines": jnp.asarray(pred_lines)},
        jnp.asarray(tgt_lines), jnp.asarray(mask),
        eos_coef=0.1, set_cost_class=1.0, set_cost_line=5.0)

    want_ce, want_line = _reference_criterion(pred_logits, pred_lines, tgt_list)
    np.testing.assert_allclose(float(out["loss_line"]), want_line, rtol=1e-4)
    np.testing.assert_allclose(float(out["loss_ce"]), want_ce, rtol=1e-4)


def test_set_criterion_aux_layers():
    B, Q, T, D = 1, 8, 4, 6
    mk = lambda: {"pred_logits": jnp.asarray(RNG.normal(size=(B, Q, 2)).astype(np.float32)),
                  "pred_lines": jnp.asarray(RNG.uniform(size=(B, Q, D)).astype(np.float32))}
    outputs = mk()
    outputs["aux_outputs"] = [mk(), mk()]
    tgt = jnp.asarray(RNG.uniform(size=(B, T, D)).astype(np.float32))
    mask = jnp.ones((B, T), bool)
    out = line_set_criterion(outputs, tgt, mask, eos_coef=0.1,
                             set_cost_class=1.0, set_cost_line=5.0)
    assert {"loss_ce", "loss_line", "loss_ce_0", "loss_line_0",
            "loss_ce_1", "loss_line_1", "cardinality_error"} <= set(out)


def test_silog_matches_reference():
    est = RNG.uniform(0.5, 9.0, size=(2, 1, 16, 16)).astype(np.float32)
    gt = RNG.uniform(0.5, 9.0, size=(2, 1, 16, 16)).astype(np.float32)
    mask = RNG.uniform(size=(2, 1, 16, 16)) > 0.3
    d = torch.log(torch.from_numpy(est)[torch.from_numpy(mask)]) - \
        torch.log(torch.from_numpy(gt)[torch.from_numpy(mask)])
    want = float(torch.sqrt((d ** 2).mean() - 0.85 * d.mean() ** 2) * 10.0)
    got = float(silog_loss(jnp.asarray(est), jnp.asarray(gt), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_seg_ce_matches_torch():
    logits = RNG.normal(size=(2, 2, 9, 9)).astype(np.float32)
    gt = (RNG.uniform(size=(2, 9, 9)) > 0.5).astype(np.int64)
    want = float(TF.cross_entropy(torch.from_numpy(logits), torch.from_numpy(gt)))
    got = float(seg_ce_loss(jnp.asarray(logits), jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_multiscale_depth_loss_runs():
    gt = jnp.asarray(RNG.uniform(0.5, 9.0, size=(2, 1, 32, 32)).astype(np.float32))
    valid = (gt >= 0.2) & (gt < 10.0)
    preds = [jnp.asarray(RNG.uniform(0.05, 0.95, size=(2, 1, s, s)).astype(np.float32))
             for s in (4, 8, 16)] + [gt * 0.9]
    total, per = multiscale_depth_loss(preds, gt, valid,
                                       weights=(0.25, 0.25, 0.25, 1.0))
    assert len(per) == 4 and np.isfinite(float(total))


def test_seg_ce_nhwc_form_matches_nchw():
    logits = RNG.normal(size=(2, 2, 9, 9)).astype(np.float32)
    gt = (RNG.uniform(size=(2, 9, 9)) > 0.5).astype(np.int64)
    a = float(seg_ce_loss(jnp.asarray(logits), jnp.asarray(gt)))
    b = float(seg_ce_loss(jnp.asarray(logits.transpose(0, 2, 3, 1)),
                          jnp.asarray(gt)))
    np.testing.assert_allclose(b, a, rtol=1e-6)
