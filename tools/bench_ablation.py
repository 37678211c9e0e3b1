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
import sys
import time

# `python tools/bench_ablation.py` puts tools/ (not the repo root) on
# sys.path; the axon plugin registers ONLY when cwd == the repo root
# (CLAUDE.md) — without the chdir a non-root cwd would silently
# benchmark on CPU in the same JSON shape.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.chdir(_ROOT)

import jax
import jax.numpy as jnp


def _seed() -> int:
    return int.from_bytes(os.urandom(8), "little") % (2 ** 31)


def timed_scan(fn, xs, n_rep: int = 6, consts=None):
    """Per-iteration wall time of `fn(*xs)` by the SLOPE method: time the
    same in-jit scan at n=8 and n=32 trips and divide the difference by
    24.  Dividing ONE blocked call by its trip count inflates the result
    by (fixed ~30-40 ms tunnel dispatch)/n — the slope cancels it
    (CLAUDE.md measurement notes; verified against bench.py's sustained
    pipeline numbers).

    `consts`: a pytree passed as a REAL jit argument and prepended to
    `fn`'s args (fn(consts, *xs)). Big loop-invariant state (params,
    opt_state) must ride here — closed-over arrays serialize into the
    program body as constants, and a 66M-param train state blows the
    remote-compile request past the tunnel's HTTP 413 size limit."""

    def make(n_loop):
        @jax.jit
        def run(consts, args, noise):
            def body(carry, eps):
                fresh = [a + eps * 0 for a in args]
                out = (fn(consts, *fresh) if consts is not None
                       else fn(*fresh))
                # fold the output back in so iterations cannot be elided;
                # the (zero-scaled) noise keeps the loop non-invariant
                s = sum(jnp.sum(o) for o in jax.tree.leaves(out))
                return carry + s + eps * 0, ()

            total, _ = jax.lax.scan(body, 0.0, noise)
            return total
        return run

    key = jax.random.PRNGKey(_seed())
    runs = {n: make(n) for n in (8, 32)}
    times = {8: [], 32: []}
    for r in range(n_rep + 1):
        for n in (8, 32):
            noise = jax.random.normal(jax.random.fold_in(key, 2 * r + n),
                                      (n,))
            t0 = time.perf_counter()
            # float() forces execution through the tunnel even for scalar
            # outputs (block_until_ready alone can return early, CLAUDE.md)
            float(runs[n](consts, xs, noise))
            dt = time.perf_counter() - t0
            if r:                   # first rep is compile+warm
                times[n].append(dt)
    med = {n: sorted(ts)[len(ts) // 2] for n, ts in times.items()}
    return (med[32] - med[8]) / 24.0


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


def bench_conv_kernel():
    """taps vs im2col fused-conv kernel at the model's hot link shapes
    (slope method; r4 kernel work — see ops/fused_conv.py:_make_kernel).
    Also times the XLA formulation of the same link for the floor."""
    from gwdepth_tpu.ops.fused_conv import (conv3x3_ln_act,
                                            conv3x3_ln_act_reference)
    out = {}
    for tag, (H, W, Ci, Co) in {
            "1/4 160->160": (176, 256, 160, 160),
            "1/4 80->80": (176, 256, 80, 80),
            "1/4 eval 192x256 160": (192, 256, 160, 160),
            "1/8 300->160": (88, 128, 300, 160)}.items():
        x = jax.random.normal(jax.random.PRNGKey(_seed()), (1, H, W, Ci))
        w = jax.random.normal(jax.random.PRNGKey(_seed() ^ 3),
                              (3, 3, Ci, Co)) * 0.05
        g = jnp.ones((Co,))
        b = jnp.zeros((Co,))
        row = {}
        for mode, fn in {
                "taps": lambda x, w: conv3x3_ln_act(
                    x, w, g, b, act="gelu", im2col=False),
                "im2col": lambda x, w: conv3x3_ln_act(
                    x, w, g, b, act="gelu", im2col=True),
                "xla": lambda x, w: conv3x3_ln_act_reference(
                    x, w, g, b, act="gelu")}.items():
            try:
                row[mode] = round(timed_scan(fn, (x, w), n_rep=4) * 1e3, 3)
            except Exception as e:
                row[mode] = f"FAILED: {type(e).__name__}: {e}"[:100]
        out[tag] = row
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


def bench_eval_batch():
    """Sustained eval-forward throughput vs batch size on one chip.

    Batch 1 is the reference eval protocol (bs=1, engine_glassrgbd.py:174)
    and bench.py's headline; this measures how much MXU utilization the
    batch-1 protocol leaves on the table for real serving (batch the
    dispatch-bound small ops, amortize per-program tunnel overhead)."""
    from gwdepth_tpu.config import GWDepthConfig
    from gwdepth_tpu.models import GlassRGBD
    cfg = GWDepthConfig(eval_hw=(768, 1024), dropout=0.0, use_pallas=True)
    model = GlassRGBD(cfg)
    out = {}
    n_windows = 3
    for bs in (1, 2, 4, 8):
        n = max(4, 12 // bs)
        # entropy-fresh inputs for EVERY window: the tunnel memoizes
        # identical (program, input) executions, so reusing one xs list
        # across windows would let max() pick a cache-lookup window
        xs = [jax.random.normal(jax.random.PRNGKey(_seed() + i),
                                (bs, *cfg.eval_hw, 3))
              for i in range(n_windows * n + 1)]
        params = jax.jit(model.init)(jax.random.PRNGKey(0), xs[0])

        # params is an explicit jit ARG (timed_scan's `consts` convention):
        # closing over it serializes the weights into the program body and
        # risks the tunnel's remote-compile HTTP 413 limit (advisor r2)
        @jax.jit
        def fwd(p, images, csum_in):
            o = model.apply(p, images)
            # checksum CHAINED through the window: the single end-of-window
            # 4-byte pull transitively forces every iteration (the tunnel
            # can early-ack block_until_ready even on array outputs; and
            # without the chain the pull proves only the LAST program ran)
            csum = jnp.sum(o["pred_depth"][-1]) + csum_in
            return o["pred_depth"][-1], o["pred_seg"], o["pred_logits"], csum

        csum = jnp.float32(0.0)
        csum = fwd(params, xs[0], csum)[3]
        jax.block_until_ready(csum)
        best = 0.0
        for w in range(n_windows):
            t0 = time.perf_counter()
            for x in xs[1 + w * n:1 + (w + 1) * n]:
                csum = fwd(params, x, csum)[3]
            float(jax.device_get(csum))
            best = max(best, n * bs / (time.perf_counter() - t0))
        out[f"bs{bs}"] = round(best, 2)
        del params, xs
    return out


def bench_batch_slope():
    """SLOPE-measured per-image forward cost vs batch size (bs 1/2/4).

    bench_eval_batch times sustained dispatch loops, which entangles the
    per-call tunnel overhead with compute; the in-graph scan slope
    isolates pure per-iteration compute, so bs-dependent differences here
    are real layout/compute pathology, not dispatch artifacts
    (VERDICT r2 weak #3: batched serving REGRESSES vs batch 1)."""
    from gwdepth_tpu.config import GWDepthConfig
    from gwdepth_tpu.models import GlassRGBD
    cfg = GWDepthConfig(eval_hw=(768, 1024), dropout=0.0, use_pallas=True)
    model = GlassRGBD(cfg)
    out = {}
    params = None
    for bs in (1, 2, 4):
        x = jax.random.normal(jax.random.PRNGKey(_seed()),
                              (bs, *cfg.eval_hw, 3))
        if params is None:
            params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

        def fwd(p, images):
            o = model.apply(p, images)
            return (o["pred_depth"][-1], o["pred_seg"], o["pred_logits"])

        try:
            t = timed_scan(fwd, (x,), n_rep=3, consts=params)
            out[f"bs{bs}_ms_per_img"] = round(t * 1e3 / bs, 2)
        except Exception as e:
            out[f"bs{bs}_ms_per_img"] = f"FAILED: {type(e).__name__}"[:80]
    return out


def bench_batch_components():
    """Per-component batch scaling: slope ms/IMG at bs=1 vs bs=4 for each
    hot sub-graph of the eval forward. A component whose per-image cost
    RISES with batch is the batched-serving pathology; one whose cost
    falls batches well. Shapes mirror the 768x1024 eval protocol."""
    from gwdepth_tpu.config import GWDepthConfig
    from gwdepth_tpu.models import GlassRGBD
    from gwdepth_tpu.models.resnet import ResNetBackbone
    from gwdepth_tpu.models.swin import SwinLayer
    from gwdepth_tpu.models.points import PyramidLayer, certain_sample

    cfg = GWDepthConfig(eval_hw=(768, 1024), dropout=0.0)
    out = {}

    def slope_pair(tag, make_mod, make_args):
        for bs in (1, 4):
            try:
                m, args_fn = make_mod(), make_args
                xs = args_fn(bs)
                params = jax.jit(m.init)(jax.random.PRNGKey(0), *xs)
                t = timed_scan(
                    lambda p, *a: m.apply(p, *a), xs, n_rep=3,
                    consts=params)
                out[f"{tag}_bs{bs}_ms_per_img"] = round(t * 1e3 / bs, 3)
            except Exception as e:
                out[f"{tag}_bs{bs}_ms_per_img"] = \
                    f"FAILED: {type(e).__name__}: {e}"[:100]

    # backbone (768x1024 -> 4 levels)
    slope_pair(
        "backbone",
        lambda: ResNetBackbone(cfg.backbone, dtype=jnp.float32),
        lambda bs: (jax.random.normal(jax.random.PRNGKey(_seed()),
                                      (bs, 768, 1024, 3)),))

    # class transformer stages (dims D/2, D/4, D/8 at 1/16, 1/8, 1/4 with
    # heads=16 -> head_dim 8/4/2: the lane-padding suspects)
    D = cfg.dense_trans_dim
    for tag, (dim, depth, hw) in {
            "class1_1_16": (D // 2, cfg.class_trans_layers[0], (48, 64)),
            "class2_1_8": (D // 4, cfg.class_trans_layers[1], (96, 128)),
            "class3_1_4": (D // 8, cfg.class_trans_layers[2], (192, 256)),
    }.items():
        def make_args(bs, dim=dim, hw=hw):
            k = jax.random.PRNGKey(_seed())
            x = jax.random.normal(k, (bs, *hw, dim))
            tok = jax.random.normal(jax.random.fold_in(k, 1),
                                    (bs, *hw, cfg.class_token_dim))
            return (x, None, None, tok, tok)
        slope_pair(
            tag,
            lambda dim=dim, depth=depth: SwinLayer(
                dim, depth, cfg.dense_trans_heads, cfg.window_size,
                cfg.mlp_ratio, "class", cfg.class_token_dim),
            make_args)

    # point machinery at its two call sites
    for tag, (h, w, H, W, S) in {
            "certain_sample_16_8": (48, 64, 96, 128, 30),
            "certain_sample_8_4": (96, 128, 192, 256, 80)}.items():
        for bs in (1, 4):
            small = jax.random.uniform(jax.random.PRNGKey(_seed()),
                                       (bs, h, w))
            large = jax.random.uniform(jax.random.PRNGKey(_seed() ^ 1),
                                       (bs, H, W))
            try:
                t = timed_scan(
                    lambda s, l: certain_sample(
                        s, l, cfg.depth_interval, S, 1e-4),
                    (small, large), n_rep=3)
                out[f"{tag}_bs{bs}_ms_per_img"] = round(t * 1e3 / bs, 3)
            except Exception as e:
                out[f"{tag}_bs{bs}_ms_per_img"] = \
                    f"FAILED: {type(e).__name__}"[:80]

    for tag, (H, W, P) in {"pyramid_1_8": (96, 128, 30),
                           "pyramid_1_4": (192, 256, 80)}.items():
        def make_args(bs, H=H, W=W, P=P):
            return (jax.random.normal(jax.random.PRNGKey(_seed()),
                                      (bs, H, W, P)),)
        slope_pair(tag, lambda P=P: PyramidLayer(P, (16, 8, 4, 2)),
                   make_args)

    return out


def bench_fwd_variants():
    """Slope-measured full-forward time under feature-gate ablations:
    the difference vs 'full' prices each component at eval size."""
    from gwdepth_tpu.config import GWDepthConfig
    from gwdepth_tpu.models import GlassRGBD
    variants = {
        "full": {},
        "pallas": {"use_pallas": True},
        "no_line": {"with_line": False},
        "no_point_pred": {"depth_sample_layers": (False, False, False)},
        "class_layers_111": {"class_trans_layers": (1, 1, 1)},
        "dense_layers_2": {"dense_trans_layers": (2,)},
    }
    out = {}
    for tag, kw in variants.items():
        try:
            cfg = GWDepthConfig(eval_hw=(768, 1024), dropout=0.0, **kw)
            model = GlassRGBD(cfg)
            x = jax.random.normal(jax.random.PRNGKey(_seed()),
                                  (1, *cfg.eval_hw, 3))
            params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

            def fwd(img):
                o = model.apply(params, img)
                return (o["pred_depth"][-1], o["pred_seg"],
                        o["pred_logits"])

            out[tag] = round(timed_scan(fwd, (x,), n_rep=3) * 1e3, 2)
        except Exception as e:
            out[tag] = f"FAILED: {type(e).__name__}: {e}"[:120]
    return out


def bench_train_variants():
    """Slope-measured decomposition of the full 704x1024 train step:
    full step vs no-optimizer vs forward-only, and each of those with the
    line criterion dropped (XLA then DCEs the line branch + its backward),
    to price backward / matcher+criterion / optimizer separately."""
    import dataclasses

    from gwdepth_tpu.config import GWDepthConfig
    from gwdepth_tpu.data.batch import dummy_batch
    from gwdepth_tpu.models import GlassRGBD
    from gwdepth_tpu.parallel import create_train_state
    from gwdepth_tpu.parallel.train_step import compute_losses

    cfg = GWDepthConfig(train_hw=(704, 1024), batch_size=1)
    cfg_noline = dataclasses.replace(cfg, with_line=False)
    cfg_pallas = dataclasses.replace(cfg, use_pallas=True)
    model = GlassRGBD(cfg)
    model_pallas = GlassRGBD(cfg_pallas)
    batch = dummy_batch(cfg, batch_size=1)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, batch.images)["params"]
    state = create_train_state(cfg, params, steps_per_epoch=1000)

    def loss_fn(p, bt, images, c, m=model):
        outputs = m.apply({"params": p}, images, bt.valid,
                          deterministic=False, rngs={"dropout": rng})
        total, _ = compute_losses(c, outputs, bt.replace(images=images))
        return total

    def full(consts, images):
        st, bt = consts
        grads = jax.grad(loss_fn)(st.params, bt, images, cfg)
        return (st.apply_gradients(grads).params,)

    def full_pallas(consts, images):
        # same params, fused-kernel fwd + analytic custom-VJP bwd
        st, bt = consts
        grads = jax.grad(
            lambda p: loss_fn(p, bt, images, cfg_pallas, m=model_pallas)
        )(st.params)
        return (st.apply_gradients(grads).params,)

    def grad_only(c):
        def fn(consts, images):
            st, bt = consts
            return (jax.grad(loss_fn)(st.params, bt, images, c),)
        return fn

    def loss_fn_det(p, bt, images, c):
        # deterministic forward: prices dropout (threefry bit-gen + masks)
        outputs = model.apply({"params": p}, images, bt.valid,
                              deterministic=True)
        total, _ = compute_losses(c, outputs, bt.replace(images=images))
        return total

    def grad_det(consts, images):
        st, bt = consts
        return (jax.grad(loss_fn_det)(st.params, bt, images, cfg),)

    def loss_det(consts, images):
        st, bt = consts
        return (loss_fn_det(st.params, bt, images, cfg),)

    def loss_only(c):
        def fn(consts, images):
            st, bt = consts
            return (loss_fn(st.params, bt, images, c),)
        return fn

    x = jax.random.normal(jax.random.PRNGKey(_seed()),
                          batch.images.shape)
    out = {}
    names = os.environ.get(
        "TRAIN_VARIANTS",
        "full_step,full_step_pallas,grad,grad_noline,loss_fwd,"
        "loss_fwd_noline,grad_det,loss_fwd_det")
    all_fns = {
        "full_step": full,
        "full_step_pallas": full_pallas,
        "grad": grad_only(cfg),
        "grad_noline": grad_only(cfg_noline),
        "loss_fwd": loss_only(cfg),
        "loss_fwd_noline": loss_only(cfg_noline),
        "grad_det": grad_det,
        "loss_fwd_det": loss_det,
    }
    chosen = {}
    for k in (s.strip() for s in names.split(",")):
        if k in all_fns:
            chosen[k] = all_fns[k]
        else:
            # report, don't raise: a typo must not discard the variants
            # that would have succeeded after minutes of setup
            out[k] = f"FAILED: unknown variant (of {sorted(all_fns)})"
    for tag, fn in chosen.items():
        try:
            out[tag] = round(
                timed_scan(fn, (x,), n_rep=3, consts=(state, batch)) * 1e3,
                2)
        except Exception as e:
            out[tag] = f"FAILED: {type(e).__name__}: {e}"[:120]
    return out


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
    if "conv" in what:
        res["conv_kernel_ms"] = bench_conv_kernel()
    if "diffusion" in what:
        res["ref_diffusion_ms"] = bench_diffusion()
    if "fwd" in what:
        res["eval_fwd_ms"] = {"xla": bench_eval_fwd(False),
                              "pallas": bench_eval_fwd(True)}
    if "batch" in what:
        res["eval_batch_img_per_s"] = bench_eval_batch()
    if "batch_slope" in what:
        res["eval_batch_slope"] = bench_batch_slope()
    if "batch_components" in what:
        res["batch_components"] = bench_batch_components()
    if "variants" in what:
        res["fwd_variants_ms"] = bench_fwd_variants()
    if "train" in what:
        res["train_variants_ms"] = bench_train_variants()
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
