"""End-to-end EVAL-LOOP parity against the real reference engine.

The train side has optimizer-trajectory parity
(tests/test_reference_parity_train_loop.py); this test closes the eval
side: it runs the ACTUAL `src/engine_glassrgbd.py:evaluate` (imported from
/root/reference through tests/reference_harness.py) and our
`gwdepth_tpu.engine.evaluate` over the SAME images/GT with the SAME
weights (through the production converter) and requires the returned
stats to agree:

  * the 9 depth metrics incl. the loop-level composition no metric unit
    test covers — pred clamping to [min_depth_eval, max_depth_eval] with
    nan->min / inf->max fixes, the GT validity mask, per-image averaging
    into the device accumulator (reference engine_glassrgbd.py:242-264),
  * the segmentation IoU/accuracy block (confusion accumulated across
    images, reference :231-239, 311 -> util/metrics.py:58-99),
  * the eval-time line-loss meters (reference :220-229; our unscaled
    loss_ce / loss_line / cardinality_error equal the reference's
    `*_unscaled` meter averages).

Runs at the reference's real channel widths with reduced depths on a
128x192 canvas (same sizing rationale as the trajectory test).
"""

from __future__ import annotations

import importlib
from types import SimpleNamespace

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


@pytest.fixture(scope="module")
def ref():
    return get_ref()


N_IMGS = 3
H, W = 128, 192
B = 1


def _cfg() -> GWDepthConfig:
    return GWDepthConfig(
        enc_layers=2, dec_layers=2, dim_feedforward=256, num_queries=30,
        dropout=0.0, dense_trans_layers=(2,), class_trans_layers=(1, 1, 1),
        group_attention_layers=((False, False), (False, False), (False,)),
        train_hw=(H, W), eval_hw=(H, W))


def _samples(rng: np.random.Generator):
    """N_IMGS eval samples: image, depth GT (with invalid zeros), seg GT,
    GT lines."""
    out = []
    for _ in range(N_IMGS):
        img = rng.standard_normal((B, H, W, 3), dtype=np.float32)
        depth = rng.random((B, H, W), dtype=np.float32) * 9.5 + 0.3
        # ~8% invalid GT pixels (depth 0, like unfilled RealSense holes)
        depth[rng.random((B, H, W)) < 0.08] = 0.0
        seg = (rng.random((B, H, W)) > 0.5).astype(np.int64)
        n = int(rng.integers(2, 5))
        lines = rng.random((B, n, 6), dtype=np.float32)
        out.append((img, depth, seg, lines))
    return out


class _RefEvalLoader:
    """Minimal stand-in for the reference DataLoader: yields the 5-tuple
    the reference evaluate() consumes (engine_glassrgbd.py:207) with
    NestedTensor-wrapped image/depth/seg, plus the `.dataset.id_to_img`
    attribute it reads (:189)."""

    def __init__(self, misc, samples):
        self._nt = misc.NestedTensor
        self._samples = samples
        self.dataset = SimpleNamespace(
            id_to_img={i: f"img{i}" for i in range(len(samples))})

    def __len__(self):
        return len(self._samples)

    def __iter__(self):
        for i, (img, depth, seg, lines) in enumerate(self._samples):
            mask = torch.zeros((B, H, W), dtype=torch.bool)
            samples = self._nt(nchw(img), mask)
            depth_nt = self._nt(torch.from_numpy(depth)[:, None], mask)
            seg_nt = self._nt(torch.from_numpy(seg)[:, None], mask)
            targets = [{
                "image_id": torch.tensor([i]),
                "lines": torch.from_numpy(lines[b]),
                "labels": torch.zeros(lines.shape[1], dtype=torch.int64),
            } for b in range(B)]
            yield samples, depth_nt, seg_nt, targets, [f"img{i}"]


class _OurEvalLoader:
    """Duck-typed Loader for gwdepth_tpu.engine.evaluate: .epoch(i) yields
    (Batch, names)."""

    def __init__(self, cfg, samples):
        self.cfg = cfg
        self.samples = samples

    def epoch(self, _i):
        from gwdepth_tpu.data.batch import Batch
        T = self.cfg.max_lines
        for i, (img, depth, seg, lines) in enumerate(self.samples):
            tgt = np.zeros((B, T, 6), np.float32)
            msk = np.zeros((B, T), bool)
            tgt[:, :lines.shape[1]] = lines
            msk[:, :lines.shape[1]] = True
            yield Batch(images=jnp.asarray(img),
                        valid=jnp.ones((B, H, W), bool),
                        depth=jnp.asarray(depth), seg=jnp.asarray(seg),
                        lines=jnp.asarray(tgt),
                        line_mask=jnp.asarray(msk)), [f"img{i}"]


def test_eval_loop_vs_reference(ref, tmp_path):
    cfg = _cfg()
    args = make_ref_args(cfg, coco_path=None, append_word=None,
                         resume="checkpoint.pth", dataset="glassrgbd")
    torch.manual_seed(23)
    model_t, crits, _ = ref.glassrgbd.build(args)
    model_t.eval()

    rng = np.random.default_rng(911)
    samples = _samples(rng)

    # ---- the REAL reference eval loop (engine_glassrgbd.py:174-342)
    eng = importlib.import_module("engine_glassrgbd")
    loader_t = _RefEvalLoader(ref.misc, samples)
    with cuda_as_cpu(), torch.no_grad():
        stats_t = eng.evaluate(model_t, crits, None, loader_t, None,
                               "cpu", "", args, save_dir=str(tmp_path),
                               epoch=0)

    # the loop appends the reference-format eval_results.txt line (:327-333)
    assert "depth:" in (tmp_path / "eval_results.txt").read_text()

    # ---- our eval loop from the SAME weights through the converter
    from gwdepth_tpu.engine import evaluate
    from gwdepth_tpu.models import GlassRGBD
    from gwdepth_tpu.parallel.train_step import make_eval_step

    m = GlassRGBD(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((B, H, W, 3)))["params"]
    overlay = glassrgbd_torch_to_flax(state_dict_numpy(model_t))
    cov, total_n, missing = coverage(overlay, params)
    assert cov == total_n, f"uncovered {len(missing)}/{total_n}"
    params = merge_params(params, overlay)

    stats_j = evaluate(cfg, params, make_eval_step(cfg, m),
                       _OurEvalLoader(cfg, samples))

    # ---- depth 9-tuple (meters hold the per-image-averaged values)
    for k in ["silog", "abs_rel", "log10", "rms", "sq_rel", "log_rms"]:
        np.testing.assert_allclose(stats_j[k], stats_t[k], rtol=2e-3,
                                   err_msg=f"depth metric {k}")
    # threshold-count metrics can flip on pixels where the forward's
    # ~1e-5 numerical drift crosses the 1.25^k ratio exactly
    for k in ["d1", "d2", "d3"]:
        np.testing.assert_allclose(stats_j[k], stats_t[k], atol=5e-3,
                                   err_msg=f"depth metric {k}")

    # ---- segmentation block (argmax ties can flip a few of ~74k px)
    for ours, theirs in [("iou_background", "Background"),
                         ("iou_glass", "Glass"), ("mean_iou", "Mean IU"),
                         ("pixel_accuracy", "Pixel accuracy"),
                         ("mean_accuracy", "Mean accuracy")]:
        np.testing.assert_allclose(stats_j[ours], stats_t[theirs],
                                   atol=5e-2, err_msg=f"seg {ours}")

    # ---- eval-time line-loss meters (ours are unscaled). The reference's
    # active build never enables its 'cardinality' loss (glassrgbd.py:
    # 541-545 appends only 'lines_labels' + 'lines'), so our
    # cardinality_error meter is an extra with nothing to compare against.
    for ours, theirs in [("loss_ce", "loss_ce_unscaled"),
                         ("loss_line", "loss_line_unscaled")]:
        np.testing.assert_allclose(stats_j[ours], stats_t[theirs],
                                   rtol=2e-3, atol=1e-4,
                                   err_msg=f"line meter {ours}")
