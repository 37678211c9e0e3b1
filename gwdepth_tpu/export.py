"""Ahead-of-time model export for serving (StableHLO artifacts).

Serializes the jitted stage-1 eval forward (images + validity mask ->
depth / seg / line outputs, weights BAKED IN as constants) with
`jax.export`, so a serving process can run the model without the Python
model code — deserialize and `call`. The reference has no deployment
artifact story at all (its eval path requires the full training repo);
this is a TPU-native capability extension alongside `predict.py`.

Usage:
  python -m gwdepth_tpu.export --output model.shlo \
      [--resume ckpt_dir | --torch_init ref.pth] [--tiny] [--batch 1]

  # serving side:
  from gwdepth_tpu.export import load_exported
  fwd = load_exported("model.shlo")
  depth, seg, logits, lines = fwd(images, valid)   # fixed shapes
"""

from __future__ import annotations

import argparse
from typing import Callable, Optional, Tuple


def export_forward(cfg, params, batch_size: int = 1,
                   platforms: Tuple[str, ...] = ("cpu", "tpu")) -> bytes:
    """Serialize the eval forward at `cfg.eval_hw` with weights baked in.
    Lowers for every platform in `platforms` (one artifact serves both a
    CPU smoke host and the TPU fleet). Returns the artifact bytes."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from gwdepth_tpu.models import GlassRGBD

    model = GlassRGBD(cfg)

    @jax.jit
    def fwd(images, valid):
        out = model.apply(params, images, valid)
        res = [out["pred_depth"][-1], out["pred_seg"]]
        if out["pred_logits"] is not None:
            res += [out["pred_logits"], out["pred_lines"]]
        return tuple(res)

    H, W = cfg.eval_hw
    exp = jexport.export(fwd, platforms=platforms)(
        jax.ShapeDtypeStruct((batch_size, H, W, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, H, W), jnp.bool_))
    return exp.serialize()


def save_exported(path: str, cfg, params, batch_size: int = 1) -> str:
    with open(path, "wb") as f:
        f.write(export_forward(cfg, params, batch_size))
    return path


def load_exported(path: str) -> Callable:
    """Deserialize an artifact into a callable (images, valid) -> outputs."""
    from jax import export as jexport
    with open(path, "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))

    def call(images, valid):
        return exp.call(images, valid)

    call.in_avals = exp.in_avals
    return call


def main(argv: Optional[Tuple[str, ...]] = None):
    p = argparse.ArgumentParser("GW-Depth model export")
    p.add_argument("--output", required=True)
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--torch_init", type=str, default="")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--eval_h", type=int, default=0)
    p.add_argument("--eval_w", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from gwdepth_tpu.config import GWDepthConfig, tiny_test_config

    cfg = tiny_test_config() if args.tiny else GWDepthConfig(dropout=0.0)
    if args.eval_h and args.eval_w:
        cfg = cfg.replace(eval_hw=(args.eval_h, args.eval_w))

    from gwdepth_tpu.models import GlassRGBD
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
        sd = {k: v.numpy() for k, v in sd.get("model", sd).items()
              if hasattr(v, "numpy")}
        params = jax.tree.map(
            jnp.asarray, merge_params(params, glassrgbd_torch_to_flax(sd)))
    elif args.resume:
        from gwdepth_tpu.parallel import create_train_state
        from gwdepth_tpu.utils.checkpoint import CheckpointManager
        state = create_train_state(cfg, params)
        state, _ = CheckpointManager(args.resume).restore(state)
        params = state.params

    out = save_exported(args.output, cfg, {"params": params}, args.batch)
    import os
    print(f"exported {os.path.getsize(out) / 1e6:.1f} MB -> {out}")


if __name__ == "__main__":
    main()
