"""Per-op device profile of the eval forward through jax.profiler.

The axon tunnel DOES export device-side op traces (verified: the
trace.json carries a `/device:TPU:0` process with per-op durations on the
"XLA Ops" thread), so instead of guessing from slope ablations we can read
exactly where the forward's time goes — per HLO op, aggregated, at any
batch size.  This is the diagnosis tool for the batch>1 serving
regression (VERDICT r2 weak #3) and the MFU ceiling (weak #2).

Run from the repo root:
    python tools/profile_fwd.py --batch 1 --iters 3 [--train] [--out DIR]

Prints a JSON summary: total device time per iteration, top ops by
cumulative duration (with op-name buckets: conv / dot / fusion /
copy+layout / all-else), and the trace path for manual inspection.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.chdir(_ROOT)

import jax
import jax.numpy as jnp


def _seed() -> int:
    return int.from_bytes(os.urandom(8), "little") % (2 ** 31)


def run_traced(batch: int, iters: int, out_dir: str, train: bool,
               use_pallas: bool = True):
    from gwdepth_tpu.config import GWDepthConfig
    from gwdepth_tpu.models import GlassRGBD

    if train:
        from gwdepth_tpu.data.batch import dummy_batch
        from gwdepth_tpu.parallel import create_train_state, make_train_step
        cfg = GWDepthConfig(train_hw=(704, 1024), batch_size=batch)
        model = GlassRGBD(cfg)
        bt = dummy_batch(cfg, batch_size=batch)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     bt.images)["params"]
        state = create_train_state(cfg, params, steps_per_epoch=1000)
        step = make_train_step(cfg, model)
        imgs = [jax.random.normal(jax.random.PRNGKey(_seed() + i),
                                  bt.images.shape) for i in range(iters + 1)]
        state, _ = step(state, bt.replace(images=imgs[0]),
                        jax.random.PRNGKey(0))       # compile+warm
        jax.block_until_ready(state.params)
        with jax.profiler.trace(out_dir):
            for i in range(iters):
                state, log = step(state, bt.replace(images=imgs[1 + i]),
                                  jax.random.PRNGKey(i))
            jax.block_until_ready(state.params)
            float(jax.device_get(log)[0])
        return

    cfg = GWDepthConfig(eval_hw=(768, 1024), dropout=0.0,
                        use_pallas=use_pallas)
    model = GlassRGBD(cfg)
    xs = [jax.random.normal(jax.random.PRNGKey(_seed() + i),
                            (batch, *cfg.eval_hw, 3))
          for i in range(iters + 1)]
    params = jax.jit(model.init)(jax.random.PRNGKey(0), xs[0])

    @jax.jit
    def fwd(p, images):
        o = model.apply(p, images)
        return o["pred_depth"][-1], o["pred_seg"], o["pred_logits"]

    jax.block_until_ready(fwd(params, xs[0]))        # compile+warm
    with jax.profiler.trace(out_dir):
        outs = [fwd(params, xs[1 + i]) for i in range(iters)]
        jax.block_until_ready(outs)


_BUCKETS = [
    ("conv", re.compile(r"conv|%conv")),
    ("dot", re.compile(r"dot|gemm|matmul")),
    ("custom-call", re.compile(r"custom-call|tpu_custom_call|mosaic")),
    ("copy/layout", re.compile(r"copy|transpose|bitcast|reshape")),
    ("sort/topk", re.compile(r"sort|top-k|topk")),
    ("gather/scatter", re.compile(r"gather|scatter|dynamic")),
    ("reduce", re.compile(r"reduce")),
    ("fusion", re.compile(r"fusion")),
]


def _module_key(tf_op: str, depth: int = 3) -> str:
    """jit(fwd)/GlassRGBD/dense_encoder/class_transformer3/... ->
    dense_encoder/class_transformer3 (first `depth`-1 model levels)."""
    parts = [p for p in tf_op.split("/") if p and not p.startswith("jit(")]
    if parts and parts[0] == "GlassRGBD":
        parts = parts[1:]
    return "/".join(parts[:depth - 1]) or "(top)"


def summarize(out_dir: str, iters: int, top_n: int = 40) -> dict:
    files = sorted(glob.glob(os.path.join(
        out_dir, "plugins/profile/*/*.trace.json.gz")))
    assert files, f"no trace under {out_dir}"
    with gzip.open(files[-1]) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "device" in n}
    ops = collections.Counter()
    counts = collections.Counter()
    modules = collections.Counter()
    module_copies = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tids.get((e["pid"], e["tid"]), "")
        if "XLA Ops" not in tname:
            continue
        name = e["name"]
        dur = float(e.get("dur", 0.0))
        ops[name] += dur
        counts[name] += 1
        total += dur
        args = e.get("args", {})
        mod = _module_key(args.get("tf_op", ""))
        modules[mod] += dur
        if args.get("hlo_category") == "data formatting":
            module_copies[mod] += dur
    buckets = collections.Counter()
    for name, dur in ops.items():
        for bname, pat in _BUCKETS:
            if pat.search(name):
                buckets[bname] += dur
                break
        else:
            buckets["other"] += dur
    return {
        "trace": files[-1],
        "device_total_ms_per_iter": round(total / 1e3 / max(iters, 1), 3),
        "buckets_ms_per_iter": {k: round(v / 1e3 / max(iters, 1), 3)
                                for k, v in buckets.most_common()},
        "modules_ms_per_iter": {
            k: {"total": round(v / 1e3 / max(iters, 1), 3),
                "data_formatting": round(
                    module_copies[k] / 1e3 / max(iters, 1), 3)}
            for k, v in modules.most_common(24)},
        "top_ops_ms_per_iter": [
            {"op": k, "ms": round(v / 1e3 / max(iters, 1), 4),
             "calls": counts[k] // max(iters, 1)}
            for k, v in ops.most_common(top_n)],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--summarize-only", default=None,
                    help="re-analyze an existing trace dir, no TPU run")
    args = ap.parse_args()
    if args.summarize_only:
        print(json.dumps(summarize(args.summarize_only, args.iters,
                                   args.top), indent=1))
        return
    out = args.out or f"/tmp/gw-trace-b{args.batch}" + \
        ("-train" if args.train else "")
    run_traced(args.batch, args.iters, out, args.train,
               use_pallas=not args.no_pallas)
    print(json.dumps(summarize(out, args.iters, args.top), indent=1))


if __name__ == "__main__":
    main()
