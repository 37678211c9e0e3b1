"""Sharded train / eval steps.

Functional re-derivation of the reference engine
(reference: src/engine_glassrgbd.py:22-171 train, :174-342 eval):

train step = forward -> Hungarian set criterion (weighted ce + 5*L1 over
final + 5 aux layers) + multi-scale SiLog (weights 1/4,1/4,1/4,1 with
nearest-downsampled GT and mask >= 0.2m) + 2x seg CE -> grad -> global-norm
clip 0.1 -> grouped AdamW. All of it jit-compiles into one XLA program;
under a Mesh the batch axis is sharded over `data` and the gradient mean is
partitioned by SPMD (the DDP all-reduce equivalent).

eval step = forward -> clamped depth -> 9 depth error sums over the GT-valid
mask + 2x2 seg confusion matrix, returned as per-batch accumulators the host
sums across the split (reference: engine_glassrgbd.py:242-264, 311).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gwdepth_tpu.config import GWDepthConfig
from gwdepth_tpu.data.batch import Batch
from gwdepth_tpu.losses import (
    line_set_criterion, multiscale_depth_loss, seg_ce_loss)
from gwdepth_tpu.parallel.train_state import TrainState


def compute_losses(cfg: GWDepthConfig, outputs: Dict, batch: Batch
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total weighted loss + log dict (reference: engine_glassrgbd.py:61-115,
    weight_dict from glassrgbd.py:542-554)."""
    logs: Dict[str, jnp.ndarray] = {}
    total = jnp.zeros((), jnp.float32)

    if cfg.with_line:
        ld = line_set_criterion(
            outputs, batch.lines, batch.line_mask,
            eos_coef=cfg.eos_coef, set_cost_class=cfg.set_cost_class,
            set_cost_line=cfg.set_cost_line, matcher_backend=cfg.matcher,
            focal=cfg.label_loss_func == "focal_loss",
            focal_gamma=cfg.focal_gamma)
        for k, v in ld.items():
            logs[k] = v
            if k.startswith("loss_ce"):
                total = total + v
            elif k.startswith("loss_line"):
                total = total + v * cfg.line_loss_coef

    if cfg.with_dense:
        valid = (batch.depth >= cfg.train_min_depth) & \
                (batch.depth < cfg.max_depth)
        preds = [d[:, None] for d in outputs["pred_depth"]]   # (B,1,h,w)
        loss_depth, per_scale = multiscale_depth_loss(
            preds, batch.depth[:, None], valid[:, None],
            cfg.depth_loss_weights, cfg.variance_focus)
        for name, l in zip(("1_16", "1_8", "1_4", "1"), per_scale):
            logs[f"loss_depth_{name}"] = l
        # NHWC straight from the decoder — see seg_ce_loss on why no
        # transpose here
        loss_seg = seg_ce_loss(outputs["pred_seg"], batch.seg) \
            * cfg.seg_loss_weight
        logs["loss_seg"] = loss_seg
        total = total + loss_depth + loss_seg

        if cfg.with_plane_norm_loss and cfg.with_line:
            from gwdepth_tpu.losses.plane import plane_norm_loss
            lp = plane_norm_loss(outputs["pred_depth"][-1],
                                 outputs["pred_lines"],
                                 outputs["pred_logits"], valid)
            # the reference LOGS the scaled plane loss but never adds it to
            # the optimized total (engine_glassrgbd.py:108-135) — preserved
            logs["loss_plane"] = lp * cfg.plane_norm_loss_coef

    logs["loss"] = total
    return total, logs


def make_train_step(cfg: GWDepthConfig, model,
                    mesh: Optional[Mesh] = None) -> Callable:
    """Returns jitted (state, batch, rng) -> (state, logs).

    The returned callable carries `log_keys`: the log dict is returned as
    ONE stacked vector (logs dict order, filled at trace time) so the host
    needs a single device transfer per step — per-scalar pulls cost ~1.5s
    each over a remote-TPU tunnel."""
    log_keys: list = []
    A = max(int(cfg.grad_accum), 1)

    def loss_fn(params, batch: Batch, rng):
        outputs = model.apply(
            {"params": params}, batch.images, batch.valid,
            deterministic=False, rngs={"dropout": rng})
        return compute_losses(cfg, outputs, batch)

    def step(state: TrainState, batch: Batch, rng):
        if A == 1:
            (_, logs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch, rng)
            if not log_keys:
                log_keys.extend(logs.keys())
            return state.apply_gradients(grads), jnp.stack(
                [logs[k] for k in log_keys])

        # Gradient accumulation: one update from A sequential microbatches,
        # semantically identical to data-parallel over A x more devices
        # (grads and logs are the mean over microbatches). The split is
        # STRIDED (image i -> microbatch i % A) so each microbatch stays
        # spread across the data-sharded batch axis under a mesh.
        B = batch.images.shape[0]
        assert B % A == 0, f"batch {B} not divisible by grad_accum {A}"
        micro = jax.tree.map(
            lambda x: jnp.moveaxis(
                x.reshape(B // A, A, *x.shape[1:]), 1, 0), batch)
        rngs = jax.random.split(rng, A)

        def body(gsum, xs):
            mb, r = xs
            (_, logs), g = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, mb, r)
            if not log_keys:
                log_keys.extend(logs.keys())
            return (jax.tree.map(jnp.add, gsum, g),
                    jnp.stack([logs[k] for k in log_keys]))

        zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, p.dtype),
                             state.params)
        gsum, logmat = jax.lax.scan(body, zeros, (micro, rngs))
        grads = jax.tree.map(lambda g: g / A, gsum)
        return state.apply_gradients(grads), logmat.mean(axis=0)

    if mesh is None:
        fn = jax.jit(step, donate_argnums=(0,))
        fn.batch_sharding = None
    else:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        # batch sharded over `data`; state inherits its placement (DP keeps
        # it replicated via place_replicated; TP pre-shards params over the
        # `model` axis via partition.place_params)
        fn = jax.jit(step, donate_argnums=(0,),
                     in_shardings=(None, data, repl))
        fn.batch_sharding = data  # engine.device_prefetch places batches
    fn.log_keys = log_keys
    return fn


def depth_error_sums(pred: jnp.ndarray, gt: jnp.ndarray,
                     valid: jnp.ndarray, min_d: float, max_d: float
                     ) -> jnp.ndarray:
    """Per-image 9 depth metrics over the valid mask, summed across the
    batch, plus a count — the device-side accumulator the reference keeps
    on CUDA (engine_glassrgbd.py:203,263-264). Metric definitions follow
    src/util/metrics.py:197-218 (silog here is x100, eval convention).

    pred/gt: (B, H, W); valid: (B, H, W) bool. Returns (10,)."""
    pred = jnp.clip(pred, min_d, max_d)
    pred = jnp.where(jnp.isnan(pred), min_d, pred)
    pred = jnp.where(jnp.isinf(pred), max_d, pred)

    m = valid.astype(jnp.float32)
    cnt = jnp.maximum(m.sum(axis=(1, 2)), 1.0)
    gt_s = jnp.where(valid, gt, 1.0)
    pr_s = jnp.where(valid, pred, 1.0)

    def mmean(x):
        return (x * m).sum(axis=(1, 2)) / cnt

    thresh = jnp.maximum(gt_s / pr_s, pr_s / gt_s)
    d1 = mmean((thresh < 1.25).astype(jnp.float32))
    d2 = mmean((thresh < 1.25 ** 2).astype(jnp.float32))
    d3 = mmean((thresh < 1.25 ** 3).astype(jnp.float32))
    rms = jnp.sqrt(mmean((gt_s - pr_s) ** 2))
    log_rms = jnp.sqrt(mmean((jnp.log(gt_s) - jnp.log(pr_s)) ** 2))
    abs_rel = mmean(jnp.abs(gt_s - pr_s) / gt_s)
    sq_rel = mmean((gt_s - pr_s) ** 2 / gt_s)
    err = jnp.log(pr_s) - jnp.log(gt_s)
    silog = jnp.sqrt(mmean(err ** 2) - mmean(err) ** 2) * 100.0
    log10 = mmean(jnp.abs(jnp.log10(pr_s) - jnp.log10(gt_s)))

    per_img = jnp.stack([silog, abs_rel, log10, rms, sq_rel, log_rms,
                         d1, d2, d3], axis=1)           # (B, 9)
    has_any = (m.sum(axis=(1, 2)) > 0).astype(jnp.float32)
    sums = (per_img * has_any[:, None]).sum(axis=0)
    return jnp.concatenate([sums, has_any.sum()[None]])


def seg_confusion(pred_cls: jnp.ndarray, gt: jnp.ndarray,
                  valid: jnp.ndarray, num_classes: int = 2) -> jnp.ndarray:
    """Streaming confusion matrix (reference: src/util/metrics.py:31-56).
    pred_cls/gt: (B, H, W) int; valid excludes ignore pixels."""
    idx = gt * num_classes + pred_cls
    idx = jnp.where(valid, idx, num_classes * num_classes)
    counts = jnp.bincount(idx.reshape(-1),
                          length=num_classes * num_classes + 1)
    return counts[:-1].reshape(num_classes, num_classes).astype(jnp.float32)


def make_eval_step(cfg: GWDepthConfig, model,
                   mesh: Optional[Mesh] = None,
                   return_dense: bool = False) -> Callable:
    """Returns jitted (params, batch) -> dict of device accumulators:
    depth_sums (10,), confusion (2,2), plus line outputs for offline
    sAP/F-score dumps. `return_dense` additionally returns the full-res
    depth map and seg argmax per image (for save_dense visualization,
    reference engine_glassrgbd.py:266-274) — costs a per-batch transfer."""

    def step(params, batch: Batch) -> Dict[str, jnp.ndarray]:
        outputs = model.apply({"params": params}, batch.images, batch.valid)
        res: Dict[str, jnp.ndarray] = {}
        # all-invalid images are batch padding (Loader pad_to_batch) and
        # must not contribute to any accumulator
        img_ok = batch.valid.any(axis=(1, 2))
        if cfg.with_line:
            # eval-time line losses, logged like the reference
            # (engine_glassrgbd.py:220-229). Computed PER IMAGE then summed
            # over real images: the reference evaluates at batch 1, so
            # per-image normalization is its exact semantics, and batch
            # padding drops out cleanly.
            def one(logits, lines, tgt, msk):
                ld = line_set_criterion(
                    {"pred_logits": logits[None], "pred_lines": lines[None]},
                    tgt[None], msk[None],
                    eos_coef=cfg.eos_coef, set_cost_class=cfg.set_cost_class,
                    set_cost_line=cfg.set_cost_line,
                    matcher_backend=cfg.matcher)
                return jnp.stack([ld["loss_ce"], ld["loss_line"],
                                  ld["cardinality_error"]])
            per_img = jax.vmap(one)(outputs["pred_logits"],
                                    outputs["pred_lines"],
                                    batch.lines, batch.line_mask)   # (B, 3)
            res["eval_losses"] = (per_img
                                  * img_ok[:, None].astype(jnp.float32)).sum(0)
            res["eval_loss_count"] = img_ok.sum().astype(jnp.float32)
        if cfg.with_dense:
            depth = outputs["pred_depth"][-1]
            gt_valid = (batch.depth > cfg.min_depth_eval) & \
                       (batch.depth < cfg.max_depth_eval) & batch.valid \
                       & img_ok[:, None, None]
            res["depth_sums"] = depth_error_sums(
                depth, batch.depth, gt_valid,
                cfg.min_depth_eval, cfg.max_depth_eval)
            pred_cls = jnp.argmax(outputs["pred_seg"], axis=-1)
            res["confusion"] = seg_confusion(pred_cls, batch.seg,
                                             batch.valid)
            if return_dense:
                res["pred_depth_full"] = depth
                res["pred_seg_cls"] = pred_cls
        if cfg.with_line:
            res["pred_logits"] = outputs["pred_logits"]
            res["pred_lines"] = outputs["pred_lines"]
            # actual image extent on the padded canvas (h, w) per image —
            # needed to convert canvas-normalized coords to image coords
            res["extent"] = jnp.stack(
                [batch.valid.any(axis=2).sum(axis=1),
                 batch.valid.any(axis=1).sum(axis=1)], axis=1)
        return res

    if mesh is None:
        fn = jax.jit(step)
        fn.batch_sharding = None
        return fn
    # shard the eval batch over `data` like the train step; the reduced
    # accumulators (depth_sums / confusion / eval_losses) come back
    # replicated, per-image line outputs stay batch-sharded
    data = NamedSharding(mesh, P("data"))
    fn = jax.jit(step, in_shardings=(None, data))
    fn.batch_sharding = data
    return fn


def summarize_depth(depth_sums: jnp.ndarray) -> Dict[str, float]:
    names = ["silog", "abs_rel", "log10", "rms", "sq_rel", "log_rms",
             "d1", "d2", "d3"]
    cnt = max(float(depth_sums[9]), 1.0)
    return {n: float(depth_sums[i]) / cnt for i, n in enumerate(names)}


def summarize_seg(confusion: jnp.ndarray) -> Dict[str, float]:
    """mIoU / accuracies from the summed confusion matrix
    (reference: src/util/metrics.py:77-99)."""
    import numpy as np
    cm = np.asarray(confusion, np.float64)
    pos = cm.sum(1)
    res = cm.sum(0)
    tp = np.diag(cm)
    iou = tp / np.maximum(1.0, pos + res - tp) * 100
    return {
        "iou_background": float(iou[0]),
        "iou_glass": float(iou[1]) if len(iou) > 1 else 0.0,
        "mean_iou": float(iou.mean()),
        "pixel_accuracy": float(tp.sum() / max(pos.sum(), 1.0) * 100),
        "mean_accuracy": float((tp / np.maximum(1.0, pos)).mean() * 100),
    }
