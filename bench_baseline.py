"""Measure the REFERENCE model's CPU baseline for bench.py's `vs_baseline`.

Runs the ACTUAL reference implementation (imported from /root/reference via
tests/reference_harness.py — real src/models/glassrgbd.py forward, real
multiscale_transformerr.py dense encoder) at the eval protocol: batch 1,
768x1024 canvas (long side 1024, reference src/datasets/coco.py:84-91),
stage-1 flags, torch eager on the host CPU.  The reference repo records no
throughput numbers (BASELINE.md), so this measurement IS the baseline.

Run:  python bench_baseline.py  [--iters N]
then pin the printed images/sec into bench.py:CPU_BASELINE_IMAGES_PER_SEC.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--hw", type=int, nargs=2, default=(768, 1024))
    args_cli = ap.parse_args()

    sys.path.insert(0, "tests")
    import numpy as np
    import torch
    from reference_harness import get_ref, make_ref_args

    from gwdepth_tpu.config import GWDepthConfig

    torch.set_num_threads(torch.get_num_threads())  # default threading
    ref = get_ref()
    cfg = GWDepthConfig(eval_hw=tuple(args_cli.hw), dropout=0.0)
    args = make_ref_args(cfg)
    torch.manual_seed(0)
    model, _, _ = ref.glassrgbd.build(args)
    model.eval()

    H, W = cfg.eval_hw
    rng = np.random.default_rng(0)
    times = []
    with torch.no_grad():
        # one un-timed warmup (allocator, lazy init)
        img = torch.from_numpy(
            rng.standard_normal((1, 3, H, W), dtype=np.float32))
        nt = ref.misc.NestedTensor(
            img, torch.zeros((1, H, W), dtype=torch.bool))
        model(nt)
        for _ in range(args_cli.iters):
            img = torch.from_numpy(
                rng.standard_normal((1, 3, H, W), dtype=np.float32))
            nt = ref.misc.NestedTensor(
                img, torch.zeros((1, H, W), dtype=torch.bool))
            t0 = time.perf_counter()
            model(nt)
            times.append(time.perf_counter() - t0)

    per_img = float(np.median(times))
    print(json.dumps({
        "reference_cpu_images_per_sec": round(1.0 / per_img, 4),
        "per_image_sec": round(per_img, 3),
        "times": [round(t, 3) for t in times],
        "hw": list(cfg.eval_hw),
        "torch_threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
