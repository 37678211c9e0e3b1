"""Measure the CPU baseline for bench.py's `vs_baseline`.

The reference repo ships no throughput numbers and its PyTorch stack
(torchvision/timm) is not installed in this image, so the pinned baseline is
the same stage-1 eval-path forward (batch 1 @ 768x1024) run by THIS
framework on the host CPU — an architecture-identical, reproducible stand-in
for "reference CPU inference via the same eval path" (BASELINE.md).

Run:  JAX_PLATFORMS=cpu python bench_baseline.py
then pin the printed images/sec into bench.py:CPU_BASELINE_IMAGES_PER_SEC.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from gwdepth_tpu.config import GWDepthConfig
    from gwdepth_tpu.models import GlassRGBD

    cfg = GWDepthConfig(eval_hw=(768, 1024), dropout=0.0)
    model = GlassRGBD(cfg)
    images = jnp.zeros((1, *cfg.eval_hw, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)

    @jax.jit
    def fwd(images):
        out = model.apply(params, images)
        return out["pred_depth"][-1], out["pred_seg"], out["pred_logits"]

    t0 = time.perf_counter()
    jax.block_until_ready(fwd(images))
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s")
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(json.dumps({"cpu_images_per_sec": round(n / dt, 4),
                      "platform": jax.devices()[0].platform}))


if __name__ == "__main__":
    main()
