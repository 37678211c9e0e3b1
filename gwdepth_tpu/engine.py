"""Epoch-level train / eval loops.

Mirrors the reference engine's control flow
(reference: src/engine_glassrgbd.py:22-171 train_one_epoch, :174-342
evaluate) on top of the jitted sharded steps in
gwdepth_tpu/parallel/train_step.py. Differences by design:

- the whole optimization step (fwd+bwd+clip+AdamW) is ONE device program;
  the host loop only feeds batches and drains logs;
- non-finite loss aborts like the reference (engine_glassrgbd.py:150-153)
  but raises instead of sys.exit so callers can handle it;
- eval accumulates the 9 depth-metric sums and the seg confusion matrix on
  device and summarizes once at the end (engine_glassrgbd.py:203,242-264,
  309-325).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax
import numpy as np

from gwdepth_tpu.config import GWDepthConfig
from gwdepth_tpu.parallel.train_step import summarize_depth, summarize_seg
from gwdepth_tpu.utils.logging import MetricLogger


def device_prefetch(it, sharding=None, lookahead: int = 1):
    """Yield (device_batch, names) with the NEXT batch's host->device
    transfer already dispatched: jax.device_put is asynchronous, so the
    copy overlaps the current step's compute instead of serializing inside
    the jit call. `sharding` places mesh-sharded batches directly (the
    train/eval steps export theirs as `.batch_sharding`)."""
    import collections
    q = collections.deque()
    for batch, names in it:
        dev = jax.device_put(batch, sharding)
        q.append((dev, names))
        if len(q) > lookahead:
            yield q.popleft()
    while q:
        yield q.popleft()


def train_one_epoch(cfg: GWDepthConfig, state, train_step: Callable,
                    loader, epoch: int, rng,
                    logger: Optional[MetricLogger] = None,
                    vis_dir: Optional[str] = None):
    """Returns (state, stats dict of epoch global averages). `vis_dir`
    saves the first batch's label overlay once per epoch — the reference's
    training-input visual check (engine_glassrgbd.py:47-50)."""
    logger = logger or MetricLogger(print_freq=10)
    header = f"Epoch: [{epoch}]"
    first = True
    # Device log vectors are flushed in BATCHES of print_freq, DOUBLE
    # BUFFERED: remote-TPU tunnels charge seconds per device->host
    # transfer, so a per-step pull would dominate the (133 ms) step
    # (measured 17.5 s/step). Each print window stacks its vectors into
    # one array, starts an async host copy, and drains the PREVIOUS
    # window — the transfer overlaps the next window's compute (202
    # ms/step measured even with multi-second transfer latency). Every
    # value still reaches the meters in order; the reference's per-step
    # non-finite abort (engine_glassrgbd.py:150-153) fires with <= 2
    # print windows of lag.
    import jax.numpy as jnp
    pending = []
    inflight = [None]

    def drain():
        if inflight[0] is None:
            return
        mat = np.asarray(inflight[0])
        inflight[0] = None
        for row in mat:
            scal = dict(zip(train_step.log_keys, row.tolist()))
            if not math.isfinite(scal["loss"]):
                raise FloatingPointError(
                    f"Loss is {scal['loss']}, stopping training "
                    "(ref engine:150-153)")
            logger.update(**scal)

    def flush():
        if pending:
            stacked = jnp.stack(pending)
            pending.clear()
            try:
                stacked.copy_to_host_async()
            except Exception:
                pass  # backends without async copy fall back to sync drain
            drain()
            inflight[0] = stacked
        else:
            drain()

    stream = device_prefetch(loader.epoch(epoch),
                             getattr(train_step, "batch_sharding", None))
    for batch, _names in logger.log_every(stream, header,
                                          total=len(loader),
                                          before_print=flush):
        if first and vis_dir is not None:
            import os
            from gwdepth_tpu.utils.visualize import show_labels
            show_labels(np.asarray(batch.images[0]),
                        np.asarray(batch.lines[0][np.asarray(
                            batch.line_mask[0])]),
                        os.path.join(vis_dir, f"input_epoch{epoch}.png"),
                        with_center=cfg.with_center)
        first = False
        rng, step_rng = jax.random.split(rng)
        state, log_vec = train_step(state, batch, step_rng)
        pending.append(log_vec)
    flush()
    drain()    # the final window is still inflight after flush()
    logger.synchronize_between_processes()
    return state, {k: m.global_avg for k, m in logger.meters.items()}


def evaluate(cfg: GWDepthConfig, params, eval_step: Callable, loader,
             collect_lines: bool = False,
             save_dense_dir: Optional[str] = None,
             save_line_dir: Optional[str] = None,
             line_score_thresh: float = 0.7) -> Dict[str, float]:
    """Returns the reference's eval dict: 9 depth metrics + seg IoUs
    (+ optionally raw line predictions per image for offline sAP).
    `save_dense_dir` saves per-image prediction grids like the reference's
    --save_dense path (engine_glassrgbd.py:266-274); requires an eval_step
    built with return_dense=True. `save_line_dir` renders pred-vs-GT line
    overlays per image (engine_glassrgbd.py:286-305); implies line
    collection."""
    # accumulate ON DEVICE; one host transfer at the end (remote-TPU
    # tunnels charge ~seconds per transfer)
    import jax.numpy as jnp
    acc = None
    add = jax.jit(lambda a, b: jax.tree.map(jnp.add, a, b))
    line_dumps = []
    stream = device_prefetch(loader.epoch(0),
                             getattr(eval_step, "batch_sharding", None))
    for batch, names in stream:
        res = eval_step(params, batch)
        if cfg.with_dense:
            cur = {"depth_sums": res["depth_sums"],
                   "confusion": res["confusion"]}
            if "eval_losses" in res:
                cur["eval_losses"] = res["eval_losses"]
                cur["eval_loss_count"] = res["eval_loss_count"]
            acc = cur if acc is None else add(acc, cur)
        if save_dense_dir is not None and "pred_depth_full" in res:
            import os
            from gwdepth_tpu.utils.visualize import save_dense_pred
            # one pull per batch, GT included (batch lives on device now)
            got_d = jax.device_get({"d": res["pred_depth_full"],
                                    "s": res["pred_seg_cls"],
                                    "gtd": batch.depth, "gts": batch.seg,
                                    "img": batch.images})
            for i, name in enumerate(names):
                save_dense_pred(
                    got_d["d"][i], got_d["gtd"][i],
                    got_d["s"][i], got_d["gts"][i], got_d["img"][i],
                    os.path.join(save_dense_dir, f"{name}.png"),
                    max_depth=cfg.max_depth)
        if cfg.with_line and (collect_lines or save_line_dir):
            # keep DEVICE references; one batched host pull after the loop
            # (a per-image device_get costs seconds over the remote tunnel)
            for i, name in enumerate(names):
                line_dumps.append({
                    "name": name,
                    "pred_logits": res["pred_logits"][i],
                    "pred_lines": res["pred_lines"][i],
                    "extent": res["extent"][i],
                    "_gt": (batch.lines[i], batch.line_mask[i],
                            batch.images[i]) if save_line_dir else None,
                })
    # ONE host pull for everything accumulated (metric sums + any line
    # dumps + GT needed for the overlay renders)
    acc, line_dumps = jax.device_get((acc, line_dumps))

    if save_line_dir is not None:
        import os
        from gwdepth_tpu.evaluation.line_metrics import softmax
        from gwdepth_tpu.utils.visualize import vis_pred_lines
        for d in line_dumps:
            gt_lines, gt_mask, img = d.pop("_gt")
            img = np.asarray(img)
            h, w = img.shape[:2]
            scores = softmax(np.asarray(d["pred_logits"]), -1)[:, 0]
            pred_px = np.asarray(d["pred_lines"])[:, :4] \
                * np.array([w, h, w, h])
            gt_px = np.asarray(gt_lines)[np.asarray(gt_mask)][:, :4] \
                * np.array([w, h, w, h])
            vis_pred_lines(pred_px, scores, gt_px, img,
                           os.path.join(save_line_dir, f"{d['name']}.png"),
                           score_thresh=line_score_thresh)
    for d in line_dumps:
        d.pop("_gt", None)

    eval_losses = None
    if acc is not None:
        depth_sums = np.asarray(acc["depth_sums"], np.float64)
        confusion = np.asarray(acc["confusion"], np.float64)
        if "eval_losses" in acc:
            eval_losses = (np.asarray(acc["eval_losses"])
                           / max(float(acc["eval_loss_count"]), 1.0))
    else:
        depth_sums = np.zeros(10, np.float64)
        confusion = np.zeros((2, 2), np.float64)
    stats: Dict[str, float] = {}
    if cfg.with_dense:
        stats.update(summarize_depth(depth_sums))
        stats.update(summarize_seg(confusion))
    if eval_losses is not None:
        stats["loss_ce"] = float(eval_losses[0])
        stats["loss_line"] = float(eval_losses[1])
        stats["cardinality_error"] = float(eval_losses[2])
    if collect_lines:
        stats["line_dumps"] = line_dumps  # type: ignore[assignment]
    return stats


def format_eval_line(epoch: int, stats: Dict[str, float]) -> str:
    """eval_results.txt-style line (reference: engine_glassrgbd.py:327-333)."""
    depth_keys = ["silog", "abs_rel", "log10", "rms", "sq_rel", "log_rms",
                  "d1", "d2", "d3"]
    seg_keys = ["iou_glass", "iou_background", "mean_iou",
                "pixel_accuracy", "mean_accuracy"]
    d = {k: round(stats[k], 4) for k in depth_keys if k in stats}
    s = {k: round(stats[k], 2) for k in seg_keys if k in stats}
    return f"oneline eval epoch{epoch} depth:{d} segmentation:{s}"
