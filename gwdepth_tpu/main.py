"""Training / evaluation CLI.

Mirrors the reference entry point flag-for-flag where flags are active
(reference: src/main_glassrgbd.py:25-241, src/args.py:4-173): feature gates
--with_line/--with_dense/--with_center, optimizer (lr, lr_backbone,
lr_drop, epochs, clip), dataset paths, --eval/--resume. Recipes translate
1:1 from script/train/a0_train_stage1_res50_glassrgbd.sh:

  python -m gwdepth_tpu.main --output_dir exp/ckpt_0 \
      --data_path ... --gt_depth_path ... --gt_seg_path ... \
      --gt_line_path ... --filenames_file_train ... --filenames_file_eval ... \
      --with_line --with_dense --with_center --num_queries 100

Distributed: no torch.distributed.launch equivalent is needed — the mesh
covers all local devices; multi-host runs call jax.distributed.initialize
(the NCCL init analogue, reference src/util/misc.py:414-436).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from gwdepth_tpu.config import GWDepthConfig


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("GW-Depth TPU training", add_help=True)
    cfg = GWDepthConfig()
    # optimizer / schedule (reference: src/args.py:6-21)
    # losses / matcher costs / eval clamps are live reference flags too
    # (reference: src/args.py:15-20,63-81,96-100; consumed at
    # glassrgbd.py:547-565, engine_glassrgbd.py:90-135,249-253)
    for name in ("lr", "lr_backbone", "weight_decay", "dropout", "eos_coef",
                 "variance_focus", "set_cost_class", "set_cost_line",
                 "line_loss_coef", "seg_loss_weight", "plane_norm_loss_coef",
                 "min_depth_eval", "max_depth_eval"):
        p.add_argument(f"--{name}", type=float, default=getattr(cfg, name))
    for name in ("batch_size", "grad_accum", "epochs", "lr_drop", "seed",
                 "num_queries", "enc_layers", "dec_layers", "hidden_dim",
                 "nheads", "dim_feedforward", "layer1_num", "num_ref",
                 "max_lines", "class_init_size", "dense_trans_dim",
                 "dense_trans_heads", "class_token_dim"):
        p.add_argument(f"--{name}", type=int, default=getattr(cfg, name))
    p.add_argument("--pre_norm", action="store_true")
    p.add_argument("--clip_max_norm", type=float, default=cfg.clip_max_norm)
    p.add_argument("--backbone", type=str, default=cfg.backbone)
    p.add_argument("--position_embedding", type=str, default="sine",
                   choices=("sine", "v2", "learned", "v3"))
    p.add_argument("--max_depth", type=float, default=cfg.max_depth)
    # feature gates (reference: src/args.py:126-131)
    for gate in ("with_line", "with_dense", "with_center",
                 "with_plane_norm_loss", "with_reflection",
                 "with_dense_center", "with_line_depth",
                 "aux_loss_off", "eval",
                 "log_depth_error", "bf16", "benchmark", "save_dense",
                 "save_line", "dump_gt_lines", "no_opt"):
        p.add_argument(f"--{gate}", action="store_true")
    # focal label loss (reference: src/args.py:69-71, stage-2 focal recipes)
    p.add_argument("--label_loss_func", type=str, default="cross_entropy",
                   choices=("cross_entropy", "focal_loss"))
    p.add_argument("--focal_gamma", type=float, default=2.0)
    # per-class-layer PointGuidedTokenFuse gate (the reference declares
    # --class_tokenfuse_layers but never consumes it, src/args.py:154;
    # here it is functional) — e.g. "1,0,0"
    p.add_argument("--class_tokenfuse_layers", type=str, default="0,0,0")
    # paths (reference: src/args.py:102-108)
    for name in ("data_path", "gt_depth_path", "gt_seg_path", "gt_line_path",
                 "filenames_file_train", "filenames_file_eval",
                 "glassrgbd_images_json", "output_dir", "resume",
                 "torch_init", "frozen_weights", "coco_path",
                 "coco_ann_train", "coco_ann_val"):
        p.add_argument(f"--{name}", type=str, default="")
    p.add_argument("--save_freq", type=int, default=25)
    p.add_argument("--eval_batch_size", type=int, default=1)
    p.add_argument("--eval_freq", type=int, default=1)
    p.add_argument("--matcher", type=str, default="jax",
                   choices=("jax", "scipy"))
    p.add_argument("--use_pallas", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--mesh", type=str, default="-1",
                   help="mesh shape, e.g. '-1' (pure DP) or '4,2' (DPxTP)")
    p.add_argument("--train_h", type=int, default=cfg.train_hw[0])
    p.add_argument("--train_w", type=int, default=cfg.train_hw[1])
    p.add_argument("--eval_h", type=int, default=cfg.eval_hw[0])
    p.add_argument("--eval_w", type=int, default=cfg.eval_hw[1])
    p.add_argument("--tiny", action="store_true",
                   help="toy model dims for smoke runs (keeps every "
                        "architectural mechanism)")
    return p


# CLI dests that map 1:1 onto GWDepthConfig fields (everything except the
# derived ones assembled in _config_kwargs and the runtime-only flags)
_CFG_PASSTHROUGH = (
    "lr", "lr_backbone", "weight_decay", "dropout", "eos_coef",
    "variance_focus", "set_cost_class", "set_cost_line", "line_loss_coef",
    "seg_loss_weight", "plane_norm_loss_coef", "min_depth_eval",
    "max_depth_eval", "batch_size", "grad_accum", "epochs", "lr_drop",
    "seed", "clip_max_norm", "backbone", "position_embedding", "pre_norm",
    "num_queries", "enc_layers", "dec_layers", "hidden_dim", "nheads",
    "dim_feedforward", "layer1_num", "num_ref", "max_lines", "max_depth",
    "class_init_size", "dense_trans_dim", "dense_trans_heads",
    "class_token_dim", "with_line", "with_dense", "with_center",
    "with_plane_norm_loss", "with_reflection", "with_dense_center",
    "with_line_depth", "label_loss_func", "focal_gamma", "matcher",
    "use_pallas", "remat", "data_path", "gt_depth_path", "gt_seg_path",
    "gt_line_path", "filenames_file_train", "filenames_file_eval",
    "glassrgbd_images_json", "output_dir",
)


def _config_kwargs(args: argparse.Namespace) -> dict:
    kw = {name: getattr(args, name) for name in _CFG_PASSTHROUGH}
    kw.update(
        class_tokenfuse_layers=tuple(
            bool(int(v)) for v in args.class_tokenfuse_layers.split(",")),
        aux_loss=not args.aux_loss_off,
        log_depth_error=True,
        dtype="bfloat16" if args.bf16 else "float32",
        train_hw=(args.train_h, args.train_w),
        eval_hw=(args.eval_h, args.eval_w),
        mesh_shape=tuple(int(v) for v in args.mesh.split(",")),
        mesh_axes=("data", "model")[:len(args.mesh.split(","))],
    )
    return kw


def config_from_args(args: argparse.Namespace) -> GWDepthConfig:
    kw = _config_kwargs(args)
    if args.tiny:
        # Forward only the values the user actually changed so the toy
        # dims survive: every flag at its parser default is dropped and
        # tiny_test_config's base wins (a round-1 advisor finding was the
        # tiny branch silently ignoring gates; filtering generically
        # covers every current and future flag).
        from gwdepth_tpu.config import tiny_test_config
        defaults = _config_kwargs(build_argparser().parse_args([]))
        kw = {k: v for k, v in kw.items() if v != defaults[k]}
        return tiny_test_config(**kw)
    return GWDepthConfig(**kw)


def resolve_checkpoint_path(path_or_url: str) -> str:
    """Local path, or a URL resolved through the torch-hub checkpoint cache
    ($TORCH_HOME/hub/checkpoints, default ~/.cache/torch) — downloading via
    torch.hub only when the cached copy is absent (reference warm start:
    main_glassrgbd.py:107-111 torch.hub.load_state_dict_from_url)."""
    if not path_or_url.startswith(("http://", "https://")):
        return path_or_url
    fname = path_or_url.rsplit("/", 1)[-1].split("?")[0]
    home = os.environ.get(
        "TORCH_HOME", os.path.expanduser("~/.cache/torch"))
    cached = os.path.join(home, "hub", "checkpoints", fname)
    if os.path.exists(cached):
        print(f"using cached checkpoint {cached}")
        return cached
    import torch.hub
    torch.hub.load_state_dict_from_url(path_or_url, map_location="cpu",
                                       check_hash=True)
    return cached


def load_frozen_weights(params, path: str):
    """Partial warm start for two-stage training: only the transformer /
    dense encoder-decoder / class + line heads come across, never the
    backbone or input projections (reference main_glassrgbd.py:165-191
    loads the 'encoder', 'decoder', 'class_embed', 'lines_embed' substring
    groups; 'encoder'/'decoder' also match dense_encoder and depth_decoder
    there — semantics preserved)."""
    import jax
    import jax.numpy as jnp
    import torch as _torch
    from gwdepth_tpu.convert.torch_weights import merge_params
    from gwdepth_tpu.convert.full_model import glassrgbd_torch_to_flax
    fsd = _torch.load(path, map_location="cpu", weights_only=False)
    fsd = fsd.get("model", fsd)
    fsd = {k: (v.numpy() if hasattr(v, "numpy") else v)
           for k, v in fsd.items()}
    keep = ("encoder", "decoder", "class_embed", "lines_embed",
            "bbox_embed")
    fsd = {k: v for k, v in fsd.items() if any(t in k for t in keep)}
    overlay = glassrgbd_torch_to_flax(fsd)
    params = jax.tree.map(jnp.asarray, merge_params(params, overlay))
    print(f"frozen_weights from {path}: "
          f"{len(jax.tree.leaves(overlay))} tensors loaded "
          "(encoder/decoder/heads only)")
    return params


def main(argv=None):
    args = build_argparser().parse_args(argv)
    cfg = config_from_args(args)

    from gwdepth_tpu.data.dataset import GlassRGBDDataset, Loader
    from gwdepth_tpu.data.coco_lines import CocoLinesDataset

    def build_dataset(split):
        """COCO-lines (wireframe/york, reference legacy main.py path) when
        --coco_path is given, else GW-Depth."""
        if args.coco_path:
            ann = args.coco_ann_train if split == "train" else args.coco_ann_val
            return CocoLinesDataset(cfg, args.coco_path, ann, split)
        return GlassRGBDDataset(cfg, split)
    from gwdepth_tpu.engine import train_one_epoch, evaluate, format_eval_line
    from gwdepth_tpu.models import GlassRGBD
    from gwdepth_tpu.parallel import (
        make_mesh, make_train_step, make_eval_step, create_train_state)
    from gwdepth_tpu.utils.checkpoint import CheckpointManager
    from gwdepth_tpu.utils.logging import MetricLogger

    out_dir = cfg.output_dir or "exp/default"
    os.makedirs(out_dir, exist_ok=True)

    # startup banner (reference: main_glassrgbd.py:26, misc.py:248-265)
    from gwdepth_tpu.utils.logging import git_sha_banner
    print("git:", git_sha_banner())

    # seed offset per process (reference: main_glassrgbd.py:36-39)
    seed = cfg.seed + jax.process_index()
    np.random.seed(seed)
    rng = jax.random.PRNGKey(seed)

    model = GlassRGBD(cfg)
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)

    eval_ds = build_dataset("val")
    # reference evaluates at batch 1 (main_glassrgbd.py:92-97); batch > 1
    # pads the final batch with all-invalid images that the accumulators
    # ignore, keeping metric sums exact
    eval_loader = Loader(eval_ds, batch_size=args.eval_batch_size,
                         shuffle=False, drop_last=False,
                         pad_to_batch=args.eval_batch_size > 1)
    eval_step = make_eval_step(cfg, model, mesh,
                               return_dense=args.save_dense)

    import jax.numpy as jnp
    init_imgs = jnp.zeros((1, *cfg.train_hw, 3), jnp.float32)
    params = jax.jit(model.init)(rng, init_imgs)["params"]
    # resume and frozen_weights are mutually exclusive, as in the
    # reference (main_glassrgbd.py:104-105)
    assert not (args.resume and args.frozen_weights), \
        "--resume and --frozen_weights are mutually exclusive"
    if args.torch_init:
        # DETR-R50 / torchvision warm start (reference downloads
        # detr-r50-e632da11.pth and loads non-strict,
        # main_glassrgbd.py:107-127). URLs resolve through the torch-hub
        # cache directory first, downloading only when absent.
        import torch as _torch
        args.torch_init = resolve_checkpoint_path(args.torch_init)
        from gwdepth_tpu.convert.torch_weights import (
            detr_torch_to_flax, merge_params)
        from gwdepth_tpu.convert.full_model import glassrgbd_torch_to_flax
        sd = _torch.load(args.torch_init, map_location="cpu",
                         weights_only=False)
        sd = sd.get("model", sd)
        sd = {k: v.numpy() for k, v in sd.items()
              if hasattr(v, "numpy")}
        # a trained reference GlassRGBD checkpoint carries dense_encoder
        # keys; otherwise treat as a DETR-R50 warm start
        if any(k.startswith("dense_encoder.") for k in sd):
            overlay = glassrgbd_torch_to_flax(sd)
            kind = "full GlassRGBD checkpoint"
        else:
            overlay = detr_torch_to_flax(sd)
            kind = "DETR warm start"
        params = jax.tree.map(jnp.asarray, merge_params(params, overlay))
        print(f"{kind} from {args.torch_init}: "
              f"{len(jax.tree.leaves(overlay))} tensors converted")
    if args.frozen_weights:
        params = load_frozen_weights(
            params, resolve_checkpoint_path(args.frozen_weights))
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"model: {n_params / 1e6:.1f}M params, devices: "
          f"{jax.device_count()}, mesh: {mesh.shape}")

    if args.dump_gt_lines:
        # GT `lpos` npz for the offline sAP/F-score drivers
        # (reference: src/datasets/glassrgbd_norhint.py:306-330)
        from gwdepth_tpu.evaluation import dump_gt_lines
        gt_dir = os.path.join(out_dir, "lines_npz", "eval")
        n = dump_gt_lines(eval_ds, gt_dir)
        print(f"GT line npz dumps ({n} images) -> {gt_dir}")
        if not args.eval:
            return {"gt_lines_dumped": n}

    if args.eval:
        state = create_train_state(cfg, params)
        ckpt = CheckpointManager(os.path.join(out_dir, "checkpoints"))
        state, _ = ckpt.restore(state)
        with mesh:
            sd_dir = (os.path.join(out_dir, "dense_pred")
                      if args.save_dense else None)
            sl_dir = (os.path.join(out_dir, "line_pred")
                      if args.save_line else None)
            stats = evaluate(cfg, state.params, eval_step, eval_loader,
                             collect_lines=args.benchmark,
                             save_dense_dir=sd_dir, save_line_dir=sl_dir)
        if args.benchmark and cfg.with_line:
            # per-image npz dumps for offline sAP/F-score
            # (reference: src/engine.py:117-165)
            from gwdepth_tpu.evaluation import dump_benchmark_npz
            bench_dir = os.path.join(out_dir, "benchmark", "benchmark_val")
            ch, cw = cfg.eval_hw
            for d in stats.pop("line_dumps", []):
                ih, iw = [int(v) for v in d["extent"]]
                # canvas-normalized -> image-normalized coords
                lines = np.asarray(d["pred_lines"], np.float64).copy()
                lines[:, 0::2] *= cw / max(iw, 1)
                lines[:, 1::2] *= ch / max(ih, 1)
                dump_benchmark_npz(bench_dir, d["name"], d["pred_logits"],
                                   lines, (ih, iw))
            print(f"benchmark npz dumps -> {bench_dir}")
        print(format_eval_line(0, stats))
        with open(os.path.join(out_dir, "eval_results.txt"), "a") as f:
            f.write(format_eval_line(0, stats) + "\n")
        return stats

    train_ds = build_dataset("train")
    train_loader = Loader(train_ds, batch_size=cfg.batch_size, shuffle=True,
                          seed=seed, num_workers=args.num_workers)
    from gwdepth_tpu.parallel import place_params, place_replicated
    # replicated under a pure-data mesh; TP-sharded when a `model` axis
    # exists (opt-state moments inherit the param shardings via zeros_like)
    params = place_params(params, mesh)
    state = create_train_state(cfg, params,
                               steps_per_epoch=max(len(train_loader), 1))
    state = state.replace(step=place_replicated(state.step, mesh))
    train_step = make_train_step(cfg, model, mesh)
    ckpt = CheckpointManager(os.path.join(out_dir, "checkpoints"),
                             save_freq_epochs=args.save_freq)
    # --no_opt: weights only, fresh optimizer/epoch (reference
    # main_glassrgbd.py:160-164); the new --lr_drop always applies because
    # the LR schedule is rebuilt from the current config.
    # --resume forms: a checkpoint DIRECTORY (another experiment's orbax
    # checkpoints), a .pth file (reference torch checkpoint -> converted,
    # weights only), or any other truthy value to resume this experiment's
    # own rolling checkpoint (reference path semantics:
    # main_glassrgbd.py:106-164).
    start_epoch = 0
    if args.resume:
        if args.resume.endswith(".pth") or args.resume.startswith("http"):
            import torch as _torch
            from gwdepth_tpu.convert.torch_weights import merge_params
            from gwdepth_tpu.convert.full_model import glassrgbd_torch_to_flax
            sd = _torch.load(resolve_checkpoint_path(args.resume),
                             map_location="cpu", weights_only=False)
            sd = sd.get("model", sd)
            sd = {k: v.numpy() for k, v in sd.items()
                  if hasattr(v, "numpy")}
            overlay = glassrgbd_torch_to_flax(sd)
            state = state.replace(params=jax.tree.map(
                jnp.asarray, merge_params(state.params, overlay)))
            print(f"resumed weights from torch checkpoint {args.resume} "
                  "(optimizer state not portable from torch — fresh)")
        else:
            rdir = (args.resume if os.path.isdir(args.resume)
                    else os.path.join(out_dir, "checkpoints"))
            rckpt = (CheckpointManager(rdir) if rdir !=
                     os.path.join(out_dir, "checkpoints") else ckpt)
            state, start_epoch = rckpt.restore(state,
                                               params_only=args.no_opt)

    print("Start training")
    t0 = time.time()
    for epoch in range(start_epoch, cfg.epochs):
        with mesh:
            state, train_stats = train_one_epoch(
                cfg, state, train_step, train_loader, epoch, rng,
                vis_dir=os.path.join(out_dir, "input_log"))
        ckpt.save(epoch, state, cfg)
        log = {"epoch": epoch,
               **{f"train_{k}": v for k, v in train_stats.items()}}
        if (epoch + 1) % args.eval_freq == 0:
            with mesh:
                stats = evaluate(cfg, state.params, eval_step, eval_loader)
            log.update({f"test_{k}": v for k, v in stats.items()})
            with open(os.path.join(out_dir, "eval_results.txt"), "a") as f:
                f.write(format_eval_line(epoch, stats) + "\n")
        # JSON lines log (reference: main_glassrgbd.py:231-237)
        with open(os.path.join(out_dir, "log.txt"), "a") as f:
            f.write(json.dumps(log) + "\n")
    ckpt.wait()
    print(f"Training time {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
