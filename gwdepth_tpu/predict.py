"""Standalone inference CLI: folder of RGB images -> depth / seg / lines.

The reference has no GT-free inference path (its eval loop requires depth/
seg/line ground truth, src/engine_glassrgbd.py:174-342); deployment-style
prediction is a capability gap this module fills. The preprocessing
reproduces the eval protocol exactly (resize long side to 1024, normalize,
fixed canvas + validity mask — reference: src/datasets/coco.py:84-91) and
the forward is one jitted program reused across images.

Outputs per image `<name>`:
  <name>_depth.npy    float32 meters at the original resolution
  <name>_depth.png    16-bit millimeters (same convention as the GT pngs,
                      reference: glassrgbd_norhint.py:273)
  <name>_seg.png      8-bit {0, 255} glass mask
  <name>_lines.json   {"lines": [[x1,y1,x2,y2]...] original-pixel coords,
                       "centers": [[x,y]...], "scores": [...]}
  <name>_vis.png      (with --save_vis) depth colormap + line overlay

Usage:
  python -m gwdepth_tpu.predict --images <dir|file> --output_dir out \
      [--resume <ckpt_dir>] [--torch_init <ref.pth>] [--score 0.75] \
      [--tiny] [--save_vis]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List, Tuple

import numpy as np
from PIL import Image

VALID_EXT = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("GW-Depth TPU inference")
    p.add_argument("--images", required=True,
                   help="image file or directory of images")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--resume", type=str, default="",
                   help="orbax checkpoint directory (exp/.../checkpoints)")
    p.add_argument("--torch_init", type=str, default="",
                   help="reference GlassRGBD .pth checkpoint to import")
    p.add_argument("--score", type=float, default=0.75,
                   help="line score threshold (softmax class 0)")
    p.add_argument("--eval_h", type=int, default=0)
    p.add_argument("--eval_w", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--save_vis", action="store_true")
    p.add_argument("--no_line", action="store_true",
                   help="depth/seg only (with_line=False)")
    p.add_argument("--no_pallas", action="store_true",
                   help="disable the fused Pallas inference kernels")
    p.add_argument("--batch", type=int, default=1,
                   help="images per forward pass (last batch pads by "
                        "repeating; throughput-serving knob)")
    p.add_argument("--mesh", type=int, default=1,
                   help="shard the serving batch over N devices (data-"
                        "parallel inference; --batch must be a multiple)")
    return p


def list_images(path: str) -> List[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(os.path.join(path, n) for n in os.listdir(path)
                  if n.lower().endswith(VALID_EXT))


def preprocess(img: Image.Image, canvas_hw: Tuple[int, int], test_size=1024):
    """Eval-protocol preprocessing for a GT-free image. Returns the padded
    canvas image, validity mask, and the resized (h, w) of the real area."""
    from gwdepth_tpu.data.transforms import Sample, eval_transform

    z = np.zeros((img.height, img.width), np.float32)
    s = Sample(img.convert("RGB"), z, z.astype(np.uint8),
               np.zeros((0, 4)), np.zeros((0, 2)), np.zeros((0,), np.int64))
    # arbitrary inference inputs may be portrait; best-effort canvas fit
    s = eval_transform(s, canvas_hw, test_size=test_size,
                       max_size=test_size, strict_protocol=False)
    h, w = s.image.shape[:2]
    ch, cw = canvas_hw
    canvas = np.zeros((ch, cw, 3), np.float32)
    canvas[:h, :w] = s.image
    valid = np.zeros((ch, cw), bool)
    valid[:h, :w] = True
    return canvas, valid, (h, w)


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    from gwdepth_tpu.config import GWDepthConfig, tiny_test_config
    from gwdepth_tpu.models import GlassRGBD

    if args.tiny:
        cfg = tiny_test_config()
    else:
        cfg = GWDepthConfig(dropout=0.0)
    if not args.no_pallas and jax.default_backend() == "tpu":
        # forward-only fused kernels (diffusion + pyramid conv chains):
        # measured 39.8 -> 35.8 ms/img at 768x1024 on v5e. TPU only —
        # off-TPU they'd run in (slow) interpret mode.
        cfg = cfg.replace(use_pallas=True)
    if args.no_line:
        cfg = cfg.replace(with_line=False)
    if args.eval_h and args.eval_w:
        cfg = cfg.replace(eval_hw=(args.eval_h, args.eval_w))

    files = list_images(args.images)
    if not files:
        raise SystemExit(f"no images under {args.images}")
    os.makedirs(args.output_dir, exist_ok=True)

    model = GlassRGBD(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.eval_hw, 3), jnp.float32))["params"]

    if args.torch_init:
        import torch as _torch
        from gwdepth_tpu.convert.full_model import glassrgbd_torch_to_flax
        from gwdepth_tpu.convert.torch_weights import merge_params
        sd = _torch.load(args.torch_init, map_location="cpu",
                         weights_only=False)
        sd = sd.get("model", sd)
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        overlay = glassrgbd_torch_to_flax(sd)
        params = jax.tree.map(jnp.asarray, merge_params(params, overlay))
        print(f"imported {len(jax.tree.leaves(overlay))} tensors from "
              f"{args.torch_init}")
    elif args.resume:
        from gwdepth_tpu.parallel import create_train_state
        from gwdepth_tpu.utils.checkpoint import CheckpointManager
        state = create_train_state(cfg, params)
        state, epoch = CheckpointManager(args.resume).restore(state)
        params = state.params
        print(f"restored epoch {epoch} from {args.resume}")
    else:
        print("WARNING: random weights (no --resume/--torch_init) — "
              "for pipeline smoke tests only")

    def fwd_fn(images, valid):
        out = model.apply({"params": params}, images, valid)
        r = {"depth": out["pred_depth"][-1], "seg": out["pred_seg"]}
        if out["pred_logits"] is not None:
            r["logits"] = out["pred_logits"]
            r["lines"] = out["pred_lines"]
        return r

    if args.mesh > 1:
        # data-parallel serving: batch sharded over `data`, params
        # replicated once before the first call (avoids a layout-change
        # recompile on step 2 — see parallel/mesh.py:place_replicated)
        if args.batch % args.mesh:
            raise SystemExit(f"--batch {args.batch} must be a multiple of "
                             f"--mesh {args.mesh}")
        from gwdepth_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                               place_replicated)
        mesh = make_mesh((args.mesh,), ("data",))
        params = place_replicated(params, mesh)
        shard = batch_sharding(mesh)
        fwd = jax.jit(fwd_fn, in_shardings=(shard, shard))
        print(f"serving over {args.mesh}-device data mesh")
    else:
        fwd = jax.jit(fwd_fn)

    ch, cw = cfg.eval_hw
    B = max(1, args.batch)
    for start in range(0, len(files), B):
        group = files[start:start + B]
        metas, canvases, valids = [], [], []
        for path in group:
            img = Image.open(path)
            canvas, valid, hw = preprocess(img, (ch, cw))
            metas.append((path, img.size, hw))
            canvases.append(canvas)
            valids.append(valid)
        while len(canvases) < B:          # pad tail batch by repetition
            canvases.append(canvases[-1])
            valids.append(valids[-1])
        outb = fwd(jnp.asarray(np.stack(canvases)),
                   jnp.asarray(np.stack(valids)))
        outb = jax.tree.map(np.asarray, outb)
        for bi, (path, (ow, oh), (h, w)) in enumerate(metas):
            _emit_one(outb, bi, path, ow, oh, h, w, cfg, args)


def _emit_one(out, bi, path, ow, oh, h, w, cfg, args):
    """Write the outputs for one image of a batched forward."""
    ch, cw = cfg.eval_hw
    name = os.path.splitext(os.path.basename(path))[0]

    # crop to the real area, resize back to the original resolution
    depth = out["depth"][bi][:h, :w]
    depth_full = np.asarray(Image.fromarray(depth).resize(
        (ow, oh), Image.BILINEAR))
    seg = out["seg"][bi][:h, :w].argmax(-1).astype(np.uint8)
    seg_full = np.asarray(Image.fromarray(seg * 255).resize(
        (ow, oh), Image.NEAREST))

    np.save(os.path.join(args.output_dir, f"{name}_depth.npy"),
            depth_full.astype(np.float32))
    Image.fromarray((np.clip(depth_full, 0, 65.535) * 1000)
                    .astype(np.uint16)).save(
        os.path.join(args.output_dir, f"{name}_depth.png"))
    Image.fromarray(seg_full).save(
        os.path.join(args.output_dir, f"{name}_seg.png"))

    rec = {"image": os.path.basename(path), "lines": [], "centers": [],
           "scores": []}
    if "logits" in out:
        # lines are CANVAS-normalized; real area is the top-left (h, w)
        # -> rescale through the resized frame to original pixels
        p = np.exp(out["logits"][bi])
        p = p / p.sum(-1, keepdims=True)
        scores = p[:, 0]
        keep = scores > args.score
        ln = out["lines"][bi][keep]
        sx, sy = cw * (ow / w), ch * (oh / h)
        rec["lines"] = (ln[:, :4] * [sx, sy, sx, sy]).tolist()
        if ln.shape[1] >= 6:
            rec["centers"] = (ln[:, 4:6] * [sx, sy]).tolist()
        rec["scores"] = scores[keep].tolist()
    with open(os.path.join(args.output_dir, f"{name}_lines.json"),
              "w") as f:
        json.dump(rec, f)

    if args.save_vis:
        from gwdepth_tpu.utils.visualize import colorize_depth, draw_lines
        vis = colorize_depth(depth_full, cfg.max_depth)
        if rec["lines"]:
            vis = draw_lines(vis, np.asarray(rec["lines"]))
        Image.fromarray(vis).save(
            os.path.join(args.output_dir, f"{name}_vis.png"))
    print(f"{name}: depth [{depth_full.min():.2f}, "
          f"{depth_full.max():.2f}] m, {len(rec['lines'])} lines")


if __name__ == "__main__":
    main()
