"""Headline benchmark: stage-1 GW-Depth inference throughput.

Protocol mirrors the reference eval path (batch 1 images resized so the
long side is 1024, reference: script/evaluation/eval_stage1_line-glassrgbd.sh,
src/datasets/coco.py:84-91): full ResNet-50 + DETR line branch + dense
depth/seg branch forward. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

`vs_baseline` compares against the reference PyTorch model running the same
forward on CPU (the only reference hardware available here — the reference
repo records no throughput numbers, BASELINE.md). The CPU baseline was
measured once with torch 2.x eager on this machine's host CPU and is pinned
below; see bench_baseline.py for the measurement script.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# The ACTUAL reference PyTorch model (imported from /root/reference via
# tests/reference_harness.py — real glassrgbd.py forward), batch 1 @
# 768x1024, torch eager on this host's CPU, median of 4 runs at 14.27
# s/image (spread 13.8-14.7); measured 2026-08-17 via bench_baseline.py.
CPU_BASELINE_IMAGES_PER_SEC = 0.0701


def main():
    from gwdepth_tpu.config import GWDepthConfig
    from gwdepth_tpu.models import GlassRGBD

    cfg = GWDepthConfig(eval_hw=(768, 1024), dropout=0.0)
    model = GlassRGBD(cfg)
    # ENTROPY-fresh inputs, one per timed iteration: the remote-TPU tunnel
    # memoizes identical (program, input) executions ACROSS PROCESSES, so
    # a fixed-seed benchmark replayed by the driver would report cache
    # lookups, not compute. (Eval fwd was verified memo-free, fresh ==
    # repeat — the entropy seed keeps that guarantee cheap and permanent.)
    import os
    seed = int.from_bytes(os.urandom(8), "little") % (2 ** 31)
    n_iters = 24
    inputs = [jax.random.normal(jax.random.PRNGKey(seed + i),
                                (1, *cfg.eval_hw, 3), jnp.float32)
              for i in range(n_iters + 2)]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), inputs[0])

    @jax.jit
    def fwd(images):
        out = model.apply(params, images)
        return out["pred_depth"][-1], out["pred_seg"], out["pred_logits"]

    # warmup / compile
    jax.block_until_ready(fwd(inputs[0]))
    jax.block_until_ready(fwd(inputs[1]))
    t0 = time.perf_counter()
    outs = [fwd(inputs[2 + i]) for i in range(n_iters)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    ips = n_iters / dt

    print(json.dumps({
        "metric": "eval_forward_images_per_sec_768x1024",
        "value": round(ips, 3),
        "unit": "images/sec",
        "vs_baseline": round(ips / CPU_BASELINE_IMAGES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
