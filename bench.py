"""Headline benchmark: stage-1 GW-Depth inference + training throughput.

Protocol mirrors the reference eval path (batch 1 images resized so the
long side is 1024, reference: script/evaluation/eval_stage1_line-glassrgbd.sh,
src/datasets/coco.py:84-91): full ResNet-50 + DETR line branch + dense
depth/seg branch forward; plus the full 704x1024 train step (forward +
Hungarian criterion + backward + grouped AdamW), the reference's training
shape (src/datasets/transforms_depth.py crop sizes).

Prints TWO JSON lines; the LAST is the headline the driver records:
  {"metric": "train_step_images_per_sec_704x1024", ...}
  {"metric": "eval_forward_images_per_sec_768x1024", ..., "vs_baseline": N}

`vs_baseline` compares against the ACTUAL reference PyTorch model running
the same eval forward on the host CPU (bench_baseline.py measurement —
the reference repo records no throughput numbers, BASELINE.md).

`mfu` = XLA cost_analysis flops / measured time / chip peak.  Peak is
v5e bf16 (197 TFLOP/s): the tunnel's XLA executes f32 matmuls as bf16
passes (xla_allow_excess_precision), so bf16 peak is the honest
denominator.  The train step's Hungarian solve runs data-dependent
`while_loop`s whose trip counts cost_analysis cannot see, so its flops
(and hence MFU) are a floor estimate.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# The ACTUAL reference PyTorch model (imported from /root/reference via
# tests/reference_harness.py — real glassrgbd.py forward), batch 1 @
# 768x1024, torch eager on this host's CPU, median of 4 runs at 14.27
# s/image (spread 13.8-14.7); measured 2026-08-17 via bench_baseline.py.
CPU_BASELINE_IMAGES_PER_SEC = 0.0701

PEAK_FLOPS = 197e12  # TPU v5e bf16 peak

# XLA cost_analysis flops of the batch-1 768x1024 eval forward (pure-XLA
# path, measured 2026-08-17). Pinned because the timed path uses Pallas
# custom-calls whose flops cost_analysis cannot see — both paths compute
# identical convolutions, and an extra full-model tunnel compile just for
# accounting costs minutes of bench budget. Re-measure if the
# architecture changes: see /tmp recipe in the git history (flops =
# fwd.lower(x).compile().cost_analysis()["flops"] with use_pallas=False).
# Cross-check 2026-08-18: the CPU backend reports 1.643e12 for the same
# graph (different fusion/accounting); the TPU-backend figure below is
# the honest MFU denominator for TPU timings.
EVAL_FWD_FLOPS = 1.241e12


def _flops(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) if ca else 0.0
    except Exception:
        return 0.0


def bench_eval_fwd(seed: int):
    import dataclasses

    from gwdepth_tpu.config import GWDepthConfig
    from gwdepth_tpu.models import GlassRGBD

    cfg = GWDepthConfig(eval_hw=(768, 1024), dropout=0.0)
    if jax.default_backend() == "tpu":
        # serving path: fused Pallas inference kernels (same math; the
        # predict CLI enables them the same way)
        cfg = dataclasses.replace(cfg, use_pallas=True)
    model = GlassRGBD(cfg)
    # ENTROPY-fresh inputs, one per timed iteration: the remote-TPU tunnel
    # memoizes identical (program, input) executions ACROSS PROCESSES, so
    # a fixed-seed benchmark replayed by the driver would report cache
    # lookups, not compute. (Eval fwd was verified memo-free, fresh ==
    # repeat — the entropy seed keeps that guarantee cheap and permanent.)
    n_windows, n_iters = 3, 12
    total = n_windows * n_iters
    inputs = [jax.random.normal(jax.random.PRNGKey(seed + i),
                                (1, *cfg.eval_hw, 3), jnp.float32)
              for i in range(total + 2)]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), inputs[0])

    @jax.jit
    def fwd(images):
        out = model.apply(params, images)
        return out["pred_depth"][-1], out["pred_seg"], out["pred_logits"]

    flops = EVAL_FWD_FLOPS
    # warmup / compile
    jax.block_until_ready(fwd(inputs[0]))
    jax.block_until_ready(fwd(inputs[1]))
    # best of 3 sustained windows: the tunnel drifts through fast/slow
    # states over minutes (CLAUDE.md "wedge" notes — a mid-state tunnel
    # once read 22.5 img/s for 27 img/s code); the best window is the
    # code's throughput, the slow ones are the tunnel's
    ips = 0.0
    for w in range(n_windows):
        t0 = time.perf_counter()
        outs = [fwd(inputs[2 + w * n_iters + i]) for i in range(n_iters)]
        jax.block_until_ready(outs)
        ips = max(ips, n_iters / (time.perf_counter() - t0))
    return ips, (flops * ips / PEAK_FLOPS if flops else None)


def bench_train_step(seed: int):
    from gwdepth_tpu.config import GWDepthConfig
    from gwdepth_tpu.data.batch import dummy_batch
    from gwdepth_tpu.models import GlassRGBD
    from gwdepth_tpu.parallel import (create_train_state, make_train_step,
                                      place_replicated)

    cfg = GWDepthConfig(train_hw=(704, 1024), batch_size=1)
    model = GlassRGBD(cfg)
    batch = dummy_batch(cfg, batch_size=1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 batch.images)["params"]
    state = create_train_state(cfg, params, steps_per_epoch=1000)
    step = make_train_step(cfg, model)

    n_windows, n_iters = 4, 8
    total = n_windows * n_iters
    # entropy-fresh images per step (same anti-memoization rule as above)
    images = [jax.random.normal(jax.random.PRNGKey(seed + 7919 * i),
                                batch.images.shape, jnp.float32)
              for i in range(total + 2)]
    rngs = [jax.random.PRNGKey(seed ^ i) for i in range(total + 2)]
    # ONE compile: reuse the AOT executable for both the flops accounting
    # and the timed calls.  jit's own dispatch cache is separate from
    # lower().compile(), so calling the jitted step here would compile the
    # whole train program a SECOND time — minutes of tunnel churn that
    # also deepens the degraded transient handled below.
    step = step.lower(state, batch, rngs[0]).compile()
    flops = _flops(step)
    # warmup (also places the donated state on device in the output layout)
    state, _ = step(state, batch.replace(images=images[0]), rngs[0])
    state, _ = step(state, batch.replace(images=images[1]), rngs[1])
    jax.block_until_ready(state.params)
    # The train-step compile leaves the tunnel in a degraded transient
    # that decays over minutes (measured 7.6 s/step right after compile).
    # Let it decay before the first window, and again between windows.
    time.sleep(75.0)
    # Best of 4 windows, each CLOSED BY A REAL device_get of the log:
    # block_until_ready on the DONATED state can return before the tunnel
    # executes (it once reported a physically impossible 11.4 ms/step,
    # MFU>2; later 42-50 ms/step readings blocked the same way and are
    # equally impossible — the bare eval forward alone costs ~36 ms, so
    # fwd+bwd+matcher+AdamW cannot run in 50).  The forced pull (~30-40 ms
    # per window, amortized over 8 steps) guarantees the work happened
    # inside the timed region; two independent windowed runs with the pull
    # agree at ~150 ms/step, which is the honest sustained number.
    # A clearly degraded window triggers a 90 s recovery pause.
    ips = 0.0
    for w in range(n_windows):
        t0 = time.perf_counter()
        for i in range(n_iters):
            k = 2 + w * n_iters + i
            state, log = step(state, batch.replace(images=images[k]),
                              rngs[k])
        jax.block_until_ready(state.params)
        float(jax.device_get(log)[0])
        # the recovery decision must look at THIS window, not the running
        # max — a degraded window after one good one still needs the pause
        win_ips = n_iters / (time.perf_counter() - t0)
        ips = max(ips, win_ips)
        if w < n_windows - 1:
            time.sleep(90.0 if win_ips < 1.0 else 30.0)
    return ips, (flops * ips / PEAK_FLOPS if flops else None)


def _probe_tunnel(timeout_s: float = 150.0) -> bool:
    """True if a trivial TPU matmul completes in a fresh subprocess.

    The axon tunnel can WEDGE so hard that even `x @ x` hangs (CLAUDE.md);
    the wedge is tied to tunnel state, not this process, and historically
    clears on its own within ~1 h.  Probing in a SUBPROCESS (cwd must be
    the repo root for the axon plugin to register) lets us kill a hung
    probe cleanly and retry, instead of wedging the benchmark process
    itself."""
    import subprocess
    import sys

    code = (
        "import jax, jax.numpy as jnp\n"
        "x = jnp.ones((256, 256))\n"
        "print(float((x @ x).sum()))\n"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           cwd=os.path.dirname(os.path.abspath(__file__)),
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _wait_for_tunnel(budget_minutes: float = 35.0) -> bool:
    """Probe until the tunnel answers or the budget runs out.  Keeps a
    transient wedge from costing the round its headline number while
    still aborting (via the caller) if the outage outlasts the budget."""
    import sys

    deadline = time.monotonic() + budget_minutes * 60.0
    attempt = 0
    while True:
        attempt += 1
        if _probe_tunnel():
            if attempt > 1:
                print(f"bench.py: tunnel answered on probe {attempt}",
                      file=sys.stderr, flush=True)
            return True
        if time.monotonic() > deadline:
            return False
        print(f"bench.py: tunnel probe {attempt} hung — wedged? "
              "waiting 5 min before retry", file=sys.stderr, flush=True)
        time.sleep(300.0)


def _watchdog(minutes: float = 30.0):
    """The axon tunnel can WEDGE so hard that even device warmup blocks
    forever (CLAUDE.md).  If the benchmark hasn't finished within the
    budget, exit non-zero WITHOUT printing a JSON line — a hang would eat
    the driver's whole round, and a fabricated number would be recorded."""
    import threading

    def fire():
        import sys
        print(f"bench.py watchdog: no result after {minutes} min — "
              "tunnel wedged? aborting without a JSON line", file=sys.stderr,
              flush=True)
        os._exit(3)

    t = threading.Timer(minutes * 60.0, fire)
    t.daemon = True
    t.start()
    return t


def main():
    seed = int.from_bytes(os.urandom(8), "little") % (2 ** 31)
    if not _wait_for_tunnel():
        import sys
        print("bench.py: tunnel never answered within the probe budget — "
              "aborting without a JSON line", file=sys.stderr, flush=True)
        raise SystemExit(3)
    watchdog = _watchdog()

    tr_ips, tr_mfu = bench_train_step(seed)
    print(json.dumps({
        "metric": "train_step_images_per_sec_704x1024",
        "value": round(tr_ips, 3),
        "unit": "images/sec",
        "ms_per_step": round(1000.0 / tr_ips, 1),
        "mfu": round(tr_mfu, 4) if tr_mfu else None,
    }), flush=True)

    ips, mfu = bench_eval_fwd(seed)
    print(json.dumps({
        "metric": "eval_forward_images_per_sec_768x1024",
        "value": round(ips, 3),
        "unit": "images/sec",
        "mfu": round(mfu, 4) if mfu else None,
        "vs_baseline": round(ips / CPU_BASELINE_IMAGES_PER_SEC, 2),
    }), flush=True)
    watchdog.cancel()


if __name__ == "__main__":
    main()
