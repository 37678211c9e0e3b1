"""Optimizer + train state with the reference's parameter grouping.

The reference trains with AdamW in two LR groups — backbone at
`lr_backbone` (1e-5), everything else at `lr` (1e-4), weight decay 1e-4 on
all parameters, StepLR x0.1 at `lr_drop` epochs
(reference: src/main_glassrgbd.py:59-67). The backbone stem
(conv1/bn1/layer1) is never trained (reference: src/models/backbone.py:62-64)
and FrozenBatchNorm statistics/affines are buffers, i.e. constants
(backbone.py:19-55). Here the same policy is expressed as optax
multi_transform param labels over the functional param tree.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from gwdepth_tpu.config import GWDepthConfig


def param_group_label(path: Tuple[str, ...]) -> str:
    """Map a param path to {frozen, backbone, main}.

    frozen: the stem (conv1/bn1/layer1) and every FrozenBatchNorm tensor
    (weight/bias/running stats are constants). backbone: remaining ResNet
    params (trained at lr_backbone). main: everything else."""
    parts = [p for p in path]
    if parts and parts[0] == "backbone":
        if len(parts) > 1 and parts[1] in ("conv1", "bn1", "layer1"):
            return "frozen"
        if any(p.startswith("bn") or p == "downsample_bn" for p in parts):
            return "frozen"
        return "backbone"
    return "main"


def make_lr_schedule(base_lr: float, steps_per_epoch: int,
                     lr_drop_epochs: int) -> optax.Schedule:
    """StepLR: x0.1 every `lr_drop` epochs (main_glassrgbd.py:66-67)."""
    def sched(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * jnp.power(0.1, epoch // lr_drop_epochs)
    return sched


def clip_like_torch(max_norm: float, label_fn) -> optax.GradientTransformation:
    """Global-norm clip with `torch.nn.utils.clip_grad_norm_` semantics
    (engine_glassrgbd.py:157-159):

    * frozen params are `requires_grad=False` in the reference (backbone
      stem, backbone.py:62-64; FrozenBatchNorm tensors are buffers), so
      their grads DO NOT EXIST there and are excluded from the norm. Here
      the functional grad covers every leaf, so frozen-labeled grads are
      zeroed before the norm is taken — with clip 0.1 active on nearly
      every step, including them would rescale every real update.
    * torch's factor is max_norm / (norm + 1e-6) clamped to 1, applied
      unconditionally (optax clips only above the threshold, no eps)."""
    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        labels = label_fn(updates)
        updates = jax.tree.map(
            lambda g, l: jnp.zeros_like(g) if l == "frozen" else g,
            updates, labels)
        g_norm = optax.global_norm(updates)
        coef = jnp.minimum(1.0, max_norm / (g_norm + 1e-6))
        return jax.tree.map(lambda g: g * coef.astype(g.dtype),
                            updates), state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: GWDepthConfig, steps_per_epoch: int = 1000
                   ) -> optax.GradientTransformation:
    """Global-norm clip (0.1, engine_glassrgbd.py:157-159) then grouped
    AdamW. Frozen params get zero updates."""
    def adamw(base_lr):
        return optax.adamw(
            make_lr_schedule(base_lr, steps_per_epoch, cfg.lr_drop),
            b1=0.9, b2=0.999, eps=1e-8, weight_decay=cfg.weight_decay)

    label_fn = lambda params: jax.tree_util.tree_map_with_path(
        lambda path, _: param_group_label(
            tuple(k.key for k in path)), params)
    grouped = optax.multi_transform(
        {"main": adamw(cfg.lr), "backbone": adamw(cfg.lr_backbone),
         "frozen": optax.set_to_zero()},
        label_fn)
    return optax.chain(clip_like_torch(cfg.clip_max_norm, label_fn), grouped)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)

    def replace(self, **kw) -> "TrainState":
        import dataclasses
        return dataclasses.replace(self, **kw)


def create_train_state(cfg: GWDepthConfig, params: Any,
                       steps_per_epoch: int = 1000) -> TrainState:
    """`params` is the model's "params" collection (a plain dict tree)."""
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), tx=tx)
