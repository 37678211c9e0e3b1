"""Flax -> torch REVERSE converter: export this framework's weights as a
reference-loadable state dict.

The import direction (convert/full_model.py:glassrgbd_torch_to_flax) maps
every trained reference tensor into our param tree; this module inverts it
so a model trained (or fine-tuned) HERE can be loaded back into the
reference PyTorch code (/root/reference/src/main_glassrgbd.py:129-157
resume path) — the "switch back" half of the migration story.

Mechanism: PROBE INVERSION. For each torch key in a template state dict,
push an `arange` probe tensor through the forward converter; the values
that land in the produced flax leaves record exactly which torch flat
index went where, so reading our params back through that index map
inverts every transpose / reshape / qkv-split the forward map performs.
The exporter therefore can never drift from the importer: any mapping
rule added to glassrgbd_torch_to_flax is inverted automatically.

Keys the forward converter does not consume (integer buffers like
`num_batches_tracked`, bitrotted gated modules) are passed through from
the template unchanged and reported, so `load_state_dict(strict=True)`
works on the reference side.

CLI:
    python -m gwdepth_tpu.convert.export_torch \
        --resume exp/run/checkpoints --template reference_ckpt.pth \
        --out exported.pth
(the model config is read from the orbax checkpoint's saved metadata)
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Tuple

import numpy as np

from gwdepth_tpu.convert.full_model import glassrgbd_torch_to_flax

__all__ = ["glassrgbd_flax_to_torch", "export_reference_checkpoint"]


def _leaves(tree, prefix=()):
    if isinstance(tree, Mapping):
        for k in tree:
            yield from _leaves(tree[k], prefix + (k,))
    else:
        yield prefix, tree


def _get(tree, path):
    node = tree
    for k in path:
        if not isinstance(node, Mapping) or k not in node:
            return None
        node = node[k]
    return node


def _invert_key(key: str, shape: Tuple[int, ...]):
    """Index maps for one torch tensor: list of (flax_path, index_map)
    where index_map[i] is the torch FLAT index stored at flat position i
    of the flax leaf.  None if the forward converter ignores the key or
    does something non-bijective with it."""
    size = int(np.prod(shape)) if shape else 1
    probe = np.arange(size, dtype=np.float64).reshape(shape)
    try:
        overlay = glassrgbd_torch_to_flax({key: probe})
    except Exception:
        return None
    entries = []
    covered = np.zeros(size, dtype=bool)
    for path, leaf in _leaves(overlay):
        flat = np.asarray(leaf, dtype=np.float64).ravel()
        idx = flat.astype(np.int64)
        # a pure rearrangement keeps probe values integral and in range
        if flat.size == 0 or (flat != idx).any() or \
                idx.min() < 0 or idx.max() >= size:
            return None
        covered[idx] = True
        entries.append((path, idx))
    if not entries or not covered.all():
        return None  # converter dropped part of the tensor: pass through
    return entries


def glassrgbd_flax_to_torch(params, template: Mapping[str, np.ndarray]
                            ) -> Tuple[Dict[str, np.ndarray], List[str],
                                       List[Tuple[str, str]]]:
    """Export `params` (our GlassRGBD param tree) into the key/shape/
    layout contract of `template` (a reference state dict mapping names to
    arrays).  Returns (state_dict, exported_keys, passthrough);
    passthrough entries keep the template's values, each tagged with why:
    'non_float' (integer buffers like num_batches_tracked), 'unmapped'
    (the forward converter ignores the key), or 'gated_off' (it maps onto
    a module the current config does not build — the reference trains no
    gradient into those either)."""
    out: Dict[str, np.ndarray] = {}
    exported: List[str] = []
    passthrough: List[Tuple[str, str]] = []
    for key, tval in template.items():
        tval = np.asarray(tval)
        reason = None
        leaves = None
        if not np.issubdtype(tval.dtype, np.floating):
            reason = "non_float"
        else:
            entries = _invert_key(key, tuple(tval.shape))
            if entries is None:
                reason = "unmapped"
            else:
                leaves = [(_get(params, path), idx)
                          for path, idx in entries]
                if any(lf is None for lf, _ in leaves):
                    leaves, reason = None, "gated_off"
        if leaves is None:
            out[key] = tval
            passthrough.append((key, reason))
            continue
        dest = np.empty(tval.size, dtype=np.float64)
        for leaf, idx in leaves:
            dest[idx] = np.asarray(leaf, dtype=np.float64).ravel()
        out[key] = dest.reshape(tval.shape).astype(tval.dtype)
        exported.append(key)
    return out, exported, passthrough


def export_reference_checkpoint(params, template_path: str, out_path: str,
                                epoch: int = 0) -> Tuple[List[str],
                                                         List[str]]:
    """Load a reference .pth as the key/layout template, export `params`
    into it, and save a reference-format checkpoint
    ({'model': state_dict, 'epoch': epoch} — the structure
    main_glassrgbd.py:221-226 writes and :129 loads)."""
    import torch

    raw = torch.load(template_path, map_location="cpu", weights_only=False)
    sd = raw.get("model", raw) if isinstance(raw, dict) else raw
    template = {k: v.detach().cpu().numpy() for k, v in sd.items()
                if hasattr(v, "detach")}
    state, exported, passthrough = glassrgbd_flax_to_torch(params, template)
    torch_sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in state.items()}
    torch.save({"model": torch_sd, "epoch": epoch}, out_path)
    return exported, passthrough


def main(argv=None):
    import argparse

    import jax
    import jax.numpy as jnp

    from gwdepth_tpu.config import GWDepthConfig
    from gwdepth_tpu.models import GlassRGBD
    from gwdepth_tpu.parallel import create_train_state
    from gwdepth_tpu.utils.checkpoint import CheckpointManager

    p = argparse.ArgumentParser("export flax checkpoint as reference .pth")
    p.add_argument("--resume", required=True,
                   help="orbax checkpoint directory")
    p.add_argument("--template", required=True,
                   help="reference .pth providing the key/layout contract")
    p.add_argument("--out", required=True)
    p.add_argument("--epoch", type=int, default=None)
    args = p.parse_args(argv)

    mgr = CheckpointManager(args.resume)
    meta = mgr.load_meta(args.epoch)
    if meta and meta.get("config"):
        known = {f.name for f in
                 __import__("dataclasses").fields(GWDepthConfig)}
        cfg = GWDepthConfig(**{k: _retuple(v) for k, v in
                               meta["config"].items() if k in known})
    else:
        cfg = GWDepthConfig()
    model = GlassRGBD(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.eval_hw, 3), jnp.float32))["params"]
    state = create_train_state(cfg, params)
    state, epoch = mgr.restore(state, epoch=args.epoch)
    exported, passthrough = export_reference_checkpoint(
        state.params, args.template, args.out,
        epoch=(args.epoch if args.epoch is not None else max(epoch - 1, 0)))
    print(f"exported {len(exported)} tensors "
          f"({len(passthrough)} passed through from the template) "
          f"-> {args.out}")


def _retuple(v):
    """JSON round-trip turns config tuples into lists; GWDepthConfig
    fields are hashable tuples."""
    if isinstance(v, list):
        return tuple(_retuple(x) for x in v)
    return v


if __name__ == "__main__":
    main()
