"""In-graph perf ablations for the point machinery + Pallas diffusion.

Times isolated jitted sub-graphs on the real chip with entropy-fresh
inputs (the tunnel memoizes identical (program, input) executions, see
CLAUDE.md). Single-op micro-benches carry ~1-3 ms dispatch overhead, so
every measurement here loops the op inside ONE jit via lax.scan and
divides by the trip count.

Run from the repo root (the axon TPU plugin registers only there):
    python tools/bench_ablation.py [--what pyramid,diffusion,sample,fwd]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp


def _seed() -> int:
    return int.from_bytes(os.urandom(8), "little") % (2 ** 31)


def timed_scan(fn, xs, n_loop: int = 16, n_rep: int = 8):
    """Median wall time of `fn(*xs)` amortized over an in-jit scan."""

    @jax.jit
    def run(args, noise):
        def body(carry, eps):
            out = fn(*[a + eps * 0 for a in args])
            # fold the output back in so iterations cannot be elided; add
            # the (zero-scaled) noise so the loop is not loop-invariant
            s = sum(jnp.sum(o) for o in jax.tree.leaves(out))
            return carry + s + eps * 0, ()

        total, _ = jax.lax.scan(body, 0.0, noise)
        return total

    key = jax.random.PRNGKey(_seed())
    times = []
    for r in range(n_rep + 1):
        noise = jax.random.normal(jax.random.fold_in(key, r), (n_loop,))
        t0 = time.perf_counter()
        run(args=xs, noise=noise).block_until_ready()
        dt = time.perf_counter() - t0
        if r:                       # first rep is compile+warm
            times.append(dt / n_loop)
    times.sort()
    return times[len(times) // 2]


def bench_pyramid():
    from gwdepth_tpu.models.points import PyramidLayer
    out = {}
    for tag, (H, W, P) in {"1/8 P=30": (88, 128, 30),
                           "1/4 P=80": (176, 256, 80)}.items():
        m = PyramidLayer(P, (16, 8, 4, 2))
        x = jax.random.normal(jax.random.PRNGKey(_seed()), (1, H, W, P))
        params = m.init(jax.random.PRNGKey(0), x)
        t = timed_scan(lambda x: m.apply(params, x), (x,))
        out[tag] = round(t * 1e3, 3)
    return out


def bench_certain_sample():
    from gwdepth_tpu.models.points import certain_sample
    out = {}
    for tag, (h, w, H, W, S) in {
            "16->8 S=30": (44, 64, 88, 128, 30),
            "8->4 S=80": (88, 128, 176, 256, 80)}.items():
        small = jax.random.uniform(jax.random.PRNGKey(_seed()), (1, h, w))
        large = jax.random.uniform(jax.random.PRNGKey(_seed() ^ 1),
                                   (1, H, W))
        t = timed_scan(
            lambda s, l: certain_sample(s, l, (0.1, 0.3, 0.5, 0.7, 0.9),
                                        S, 1e-4),
            (small, large))
        out[tag] = round(t * 1e3, 3)
    return out


def bench_diffusion():
    from gwdepth_tpu.models.swin import RefAttnDiffusion
    out = {}
    # 1/32 ref layer at eval size: 24x32 map, win 7 -> 4x5=20 windows
    # padded -> (B, nW, heads, N, n_rf) = (1, 20, 16, 49, 40)
    shape = (1, 20, 16, 49, 40)
    a = jax.random.normal(jax.random.PRNGKey(_seed()), shape)
    for tag, use_pallas in {"xla": False, "pallas": True}.items():
        m = RefAttnDiffusion(16, use_pallas=use_pallas)
        params = m.init(jax.random.PRNGKey(0), a)
        try:
            t = timed_scan(lambda x: m.apply(params, x), (a,))
            out[tag] = round(t * 1e3, 3)
        except Exception as e:  # pallas lowering may refuse a shape
            out[tag] = f"FAILED: {type(e).__name__}"
    return out


def bench_eval_fwd(use_pallas: bool):
    from gwdepth_tpu.config import GWDepthConfig
    from gwdepth_tpu.models import GlassRGBD
    cfg = GWDepthConfig(eval_hw=(768, 1024), dropout=0.0,
                        use_pallas=use_pallas)
    model = GlassRGBD(cfg)
    n = 12
    xs = [jax.random.normal(jax.random.PRNGKey(_seed() + i),
                            (1, *cfg.eval_hw, 3)) for i in range(n + 1)]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), xs[0])

    @jax.jit
    def fwd(images):
        out = model.apply(params, images)
        return out["pred_depth"][-1], out["pred_seg"], out["pred_logits"]

    jax.block_until_ready(fwd(xs[0]))
    t0 = time.perf_counter()
    outs = [fwd(x) for x in xs[1:]]
    jax.block_until_ready(outs)
    return round((time.perf_counter() - t0) / n * 1e3, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="pyramid,sample,diffusion")
    args = ap.parse_args()
    what = args.what.split(",")
    res = {}
    if "pyramid" in what:
        res["pyramid_ms"] = bench_pyramid()
    if "sample" in what:
        res["certain_sample_ms"] = bench_certain_sample()
    if "diffusion" in what:
        res["ref_diffusion_ms"] = bench_diffusion()
    if "fwd" in what:
        res["eval_fwd_ms"] = {"xla": bench_eval_fwd(False),
                              "pallas": bench_eval_fwd(True)}
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
