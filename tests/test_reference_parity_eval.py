"""Reference-code parity for the eval/metric/postprocess layers.

Same philosophy as tests/test_reference_parity.py (the ACTUAL
/root/reference implementation is the oracle, not a hand-written
restatement), covering the layers that file does not:

  * 9-tuple depth metrics        src/util/metrics.py:197-218
  * confusion-matrix mIoU        src/util/metrics.py:37-99
  * L-CNN sAP machinery          evaluation/lcnn/metric.py:11-30,194-210
  * overlap-aware line NMS       evaluation/eval_post_online.py:44-91
  * PostProcess_Line             src/models/glassrgbd.py:452-506
  * sine / learned pos-embeds    src/models/position_encoding.py:12-77
  * plain Swin window attention  src/models/swin_transformer.py:94-175
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_harness import (get_ref, get_ref_eval, state_dict_numpy)


@pytest.fixture(scope="module")
def ref():
    return get_ref()


@pytest.fixture(scope="module")
def refe():
    return get_ref_eval()


# ---------------------------------------------------------------------------
# depth metrics
# ---------------------------------------------------------------------------

def test_depth_errors_vs_reference(refe):
    from gwdepth_tpu.parallel.train_step import (depth_error_sums,
                                                 summarize_depth)
    rng = np.random.default_rng(3)
    B, H, W = 3, 24, 32
    gt = rng.uniform(0.2, 9.5, (B, H, W)).astype(np.float32)
    pred = rng.uniform(0.2, 9.5, (B, H, W)).astype(np.float32)
    valid = rng.random((B, H, W)) > 0.35

    rows = [refe.metrics.compute_depth_errors(gt[b][valid[b]],
                                              pred[b][valid[b]])
            for b in range(B)]
    ref_mean = np.mean(np.asarray(rows, np.float64), axis=0)

    sums = depth_error_sums(jnp.asarray(pred), jnp.asarray(gt),
                            jnp.asarray(valid), 1e-3, 10.0)
    mine = summarize_depth(sums)
    names = ["silog", "abs_rel", "log10", "rms", "sq_rel", "log_rms",
             "d1", "d2", "d3"]
    for i, n in enumerate(names):
        np.testing.assert_allclose(mine[n], ref_mean[i], rtol=2e-5,
                                   atol=1e-6, err_msg=n)


def test_mean_iou_vs_reference(refe):
    from gwdepth_tpu.parallel.train_step import seg_confusion, summarize_seg
    rng = np.random.default_rng(5)
    n_img, H, W = 4, 20, 28
    gts, preds = [], []
    for _ in range(n_img):
        gt = (rng.random((H, W)) > 0.5).astype(np.int32)
        gt[rng.random((H, W)) > 0.9] = 255       # ignore pixels
        gts.append(gt)
        preds.append((rng.random((H, W)) > 0.5).astype(np.int32))
    ref_vals = refe.metrics.compute_mean_ioU(preds, gts, 2,
                                             dataset_name="GLASS")

    cm = sum(seg_confusion(jnp.asarray(p)[None],
                           jnp.asarray(np.minimum(g, 1))[None],
                           jnp.asarray(g != 255)[None])
             for p, g in zip(preds, gts))
    mine = summarize_seg(cm)
    np.testing.assert_allclose(mine["iou_background"],
                               ref_vals["Background"], rtol=1e-9)
    np.testing.assert_allclose(mine["iou_glass"], ref_vals["Glass"],
                               rtol=1e-9)
    np.testing.assert_allclose(mine["mean_iou"], ref_vals["Mean IU"],
                               rtol=1e-9)
    np.testing.assert_allclose(mine["pixel_accuracy"],
                               ref_vals["Pixel accuracy"], rtol=1e-9)
    np.testing.assert_allclose(mine["mean_accuracy"],
                               ref_vals["Mean accuracy"], rtol=1e-9)


# ---------------------------------------------------------------------------
# L-CNN metric machinery (sAP / F-score)
# ---------------------------------------------------------------------------

def test_lcnn_metrics_vs_reference(refe):
    from gwdepth_tpu.evaluation.line_metrics import ap, fscore, ms_tp_fp
    rng = np.random.default_rng(7)
    for n_pred, n_gt in [(1, 1), (5, 4), (30, 20), (60, 3)]:
        pred = rng.random((n_pred, 2, 2)) * 128
        gt = rng.random((n_gt, 2, 2)) * 128
        # make some predictions real hits so tp isn't all-zero
        k = min(n_pred, n_gt, 3)
        pred[:k] = gt[:k] + rng.normal(0, 0.5, (k, 2, 2))
        for thr in (5.0, 10.0, 15.0):
            tp_r, fp_r = refe.lcnn_metric.msTPFP(pred, gt, thr)
            tp_m, fp_m = ms_tp_fp(pred, gt, thr)
            np.testing.assert_array_equal(tp_m, tp_r,
                                          err_msg=f"tp {n_pred}x{n_gt}@{thr}")
            np.testing.assert_array_equal(fp_m, fp_r,
                                          err_msg=f"fp {n_pred}x{n_gt}@{thr}")
            tp_c = np.cumsum(tp_r) / n_gt
            fp_c = np.cumsum(fp_r) / n_gt
            np.testing.assert_allclose(ap(tp_c, fp_c),
                                       refe.lcnn_metric.ap(tp_c, fp_c),
                                       rtol=1e-12, err_msg="ap")
            np.testing.assert_allclose(fscore(tp_c, fp_c),
                                       refe.lcnn_metric.fscore(tp_c, fp_c),
                                       rtol=1e-12, err_msg="fscore")


# ---------------------------------------------------------------------------
# line NMS (offline postprocess)
# ---------------------------------------------------------------------------

def test_line_nms_vs_reference(refe):
    from gwdepth_tpu.evaluation.line_metrics import line_nms
    rng = np.random.default_rng(11)
    n = 40
    lines = rng.random((n, 2, 2)) * 128
    # clusters of near-duplicates exercise the suppression/trim branches
    lines[10:20] = lines[:10] + rng.normal(0, 0.8, (10, 2, 2))
    scores = np.sort(rng.random(n))[::-1].copy()
    for thr, tol in [(0.01, 1e9), (3.0, 1e9), (3.0, 0.1), (10.0, 0.05)]:
        nl_r, ns_r, ids_r = refe.eval_post_online.postprocess(
            lines, scores, threshold=thr, tol=tol, do_clip=False)
        nl_m, ns_m, ids_m = line_nms(lines, scores, threshold=thr, tol=tol)
        np.testing.assert_array_equal(ids_m, np.asarray(ids_r),
                                      err_msg=f"kept ids thr={thr} tol={tol}")
        np.testing.assert_allclose(nl_m, np.asarray(nl_r), rtol=1e-12,
                                   err_msg=f"trimmed lines thr={thr}")
        np.testing.assert_allclose(ns_m, np.asarray(ns_r), rtol=1e-12)


# ---------------------------------------------------------------------------
# PostProcess_Line
# ---------------------------------------------------------------------------

def test_postprocess_line_vs_reference(ref):
    from gwdepth_tpu.evaluation.line_metrics import postprocess_lines
    rng = np.random.default_rng(13)
    Q = 25
    logits = rng.standard_normal((1, Q, 2)).astype(np.float32)
    lines4 = rng.random((1, Q, 4)).astype(np.float32)
    hw = (480, 640)
    pp = ref.glassrgbd.PostProcess_Line()
    with torch.no_grad():
        res = pp({"pred_logits": torch.from_numpy(logits),
                  "pred_lines": torch.from_numpy(lines4)},
                 torch.as_tensor([hw]), "prediction")
    my_lines, my_scores = postprocess_lines(logits[0], lines4[0], hw)
    np.testing.assert_allclose(my_scores, res[0]["scores"].numpy(),
                               rtol=1e-6, err_msg="scores")
    np.testing.assert_allclose(my_lines, res[0]["lines"].numpy(),
                               rtol=1e-6, err_msg="lines")


# ---------------------------------------------------------------------------
# position embeddings
# ---------------------------------------------------------------------------

def test_sine_posemb_vs_reference(ref):
    from gwdepth_tpu.ops.posemb import sine_posemb_from_mask
    rng = np.random.default_rng(17)
    B, H, W = 2, 9, 13
    pad_mask = np.zeros((B, H, W), bool)
    pad_mask[0, -3:, :] = True     # reference mask: True = padding
    pad_mask[1, :, -5:] = True
    x = torch.zeros((B, 4, H, W))
    nt = ref.misc.NestedTensor(x, torch.from_numpy(pad_mask))
    for normalize in (False, True):
        pe = ref.position_encoding.PositionEmbeddingSine(
            num_pos_feats=16, normalize=normalize)
        with torch.no_grad():
            pos_t = pe(nt)
        pos_j = sine_posemb_from_mask(jnp.asarray(~pad_mask), 16,
                                      normalize=normalize)
        np.testing.assert_allclose(np.asarray(pos_j), pos_t.numpy(),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"normalize={normalize}")


def test_learned_posemb_vs_reference(ref):
    from gwdepth_tpu.ops.posemb import LearnedPosEmb2D
    torch.manual_seed(7)
    pe = ref.position_encoding.PositionEmbeddingLearned(num_pos_feats=12)
    B, H, W = 2, 10, 14
    nt = ref.misc.NestedTensor(torch.zeros((B, 4, H, W)),
                               torch.zeros((B, H, W), dtype=torch.bool))
    with torch.no_grad():
        pos_t = pe(nt)

    m = LearnedPosEmb2D(num_pos_feats=12)
    params = {"row_embed": jnp.asarray(pe.row_embed.weight.detach().numpy()),
              "col_embed": jnp.asarray(pe.col_embed.weight.detach().numpy())}
    pos_j = m.apply({"params": params}, B, H, W)
    np.testing.assert_allclose(np.asarray(pos_j).transpose(0, 3, 1, 2),
                               pos_t.numpy(), rtol=1e-6)


# ---------------------------------------------------------------------------
# SNE surface normals (offline toolchain)
# ---------------------------------------------------------------------------

def test_sne_vs_reference(ref):
    import importlib

    from reference_harness import cuda_as_cpu
    sne_t = importlib.import_module("models.sne_model")
    rng = np.random.default_rng(23)
    H, W = 24, 32
    depth = rng.uniform(0.5, 8.0, (H, W)).astype(np.float32)
    cam = np.array([[320.0, 0.0, 16.3], [0.0, 318.0, 12.1],
                    [0.0, 0.0, 1.0]], np.float32)
    with cuda_as_cpu(), torch.no_grad():
        # the reference forward mutates its depth argument — pass a copy
        out_t = sne_t.SNE()(torch.from_numpy(depth.copy()),
                            torch.from_numpy(cam))

    from gwdepth_tpu.tools.sne import sne_normals
    out_j = sne_normals(jnp.asarray(depth), jnp.asarray(cam))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               atol=2e-4, rtol=1e-3, err_msg="normals")


# ---------------------------------------------------------------------------
# SmoothedValue meter semantics
# ---------------------------------------------------------------------------

def test_smoothed_value_vs_reference(ref):
    from gwdepth_tpu.utils.logging import SmoothedValue
    rng = np.random.default_rng(29)
    rv = ref.misc.SmoothedValue(window_size=7)
    mv = SmoothedValue(window_size=7)
    vals = rng.standard_normal(23).astype(np.float32)
    for i, v in enumerate(vals):
        rv.update(float(v), n=int(1 + i % 3))
        mv.update(float(v), n=int(1 + i % 3))
        # even/odd deque fills both hit torch's lower-median rule
        np.testing.assert_allclose(mv.median, rv.median, rtol=1e-6,
                                   err_msg=f"median @{i}")
        np.testing.assert_allclose(mv.avg, rv.avg, rtol=1e-6)
        np.testing.assert_allclose(mv.global_avg, rv.global_avg, rtol=1e-6)
        np.testing.assert_allclose(mv.max, rv.max, rtol=1e-6)
        np.testing.assert_allclose(mv.value, rv.value, rtol=1e-6)
    assert str(mv) == str(rv)


# ---------------------------------------------------------------------------
# plain Swin window attention (with_line=False fallback)
# ---------------------------------------------------------------------------

def test_plain_swin_attention_vs_reference(ref):
    from gwdepth_tpu.models.swin import PlainWindowAttention
    C, ws, heads, nW, B = 16, 4, 4, 6, 1
    N = ws * ws
    torch.manual_seed(9)
    rw = ref.swin_transformer.WindowAttention(
        C, window_size=(ws, ws), num_heads=heads).eval()

    rng = np.random.default_rng(19)
    x = rng.standard_normal((nW, N, C)).astype(np.float32)
    mask = (rng.random((nW, N, N)) > 0.7).astype(np.float32) * -100.0

    sd = state_dict_numpy(rw)
    params = {
        "qkv": {"kernel": jnp.asarray(sd["qkv.weight"].T),
                "bias": jnp.asarray(sd["qkv.bias"])},
        "proj": {"kernel": jnp.asarray(sd["proj.weight"].T),
                 "bias": jnp.asarray(sd["proj.bias"])},
        "rel_pos_bias": {"relative_position_bias_table":
                         jnp.asarray(sd["relative_position_bias_table"])},
    }
    m = PlainWindowAttention(C, ws, heads)
    for msk_t, msk_j in [(None, None),
                         (torch.from_numpy(mask), jnp.asarray(mask))]:
        with torch.no_grad():
            out_t = rw(torch.from_numpy(x), mask=msk_t)[0]
        out_j = m.apply({"params": params},
                        jnp.asarray(x)[None], msk_j)
        np.testing.assert_allclose(np.asarray(out_j)[0], out_t.numpy(),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"mask={'yes' if msk_j is not None else 'no'}")
