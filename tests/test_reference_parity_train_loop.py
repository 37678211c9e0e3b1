"""Multi-step OPTIMIZER-TRAJECTORY parity against the real reference loop.

The other reference-parity tests pin the forward, the loss composition and
single-backward gradients.  This one closes the remaining training-loop
gap: it runs N full optimization steps on BOTH frameworks from identical
initial weights (through the production converter) on identical batches and
requires the per-step losses AND the final parameter tree to agree.  That
exercises, end to end, the pieces no single-step test can:

  * AdamW numerics and the two-LR param grouping
    (reference src/main_glassrgbd.py:59-67: backbone group at lr_backbone,
    the rest at lr, weight_decay on both),
  * torch-exact global-norm clipping: norm over the requires_grad params
    only (the frozen stem/FrozenBatchNorm tensors carry no grad in torch,
    src/models/backbone.py:62-64), factor max_norm/(norm+1e-6) clamped
    to 1 (src/engine_glassrgbd.py:157-159),
  * StepLR x0.1 every lr_drop epochs (src/main_glassrgbd.py:66-67) — the
    run is 4 steps at one step/epoch with lr_drop=2, so the LR drops twice
    mid-trajectory,
  * that frozen params stay EXACTLY at their initial values.

Runs at the reference's real channel widths with reduced depths (the
reference hardcodes width couplings, see test_reference_parity.py's full
forward test) on a 128x192 canvas — the smallest size where every
CertainSample quota stays satisfiable (1/16 scale = 96 px >= 30 samples).
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_harness import get_ref, make_ref_args, state_dict_numpy, nchw
from gwdepth_tpu.config import GWDepthConfig
from gwdepth_tpu.convert.full_model import glassrgbd_torch_to_flax, coverage
from gwdepth_tpu.convert.torch_weights import merge_params


@pytest.fixture(scope="module")
def ref():
    return get_ref()


N_STEPS = 4
LR_DROP = 2          # epochs; one epoch == one step here
H, W = 128, 192
B = 1


def _cfg() -> GWDepthConfig:
    return GWDepthConfig(
        enc_layers=2, dec_layers=2, dim_feedforward=256, num_queries=30,
        dropout=0.0, dense_trans_layers=(2,), class_trans_layers=(1, 1, 1),
        group_attention_layers=((False, False), (False, False), (False,)),
        train_hw=(H, W), eval_hw=(H, W), lr_drop=LR_DROP)


def _batches(rng: np.random.Generator):
    """N_STEPS distinct batches: image, depth GT, seg GT, GT lines."""
    out = []
    for _ in range(N_STEPS):
        img = rng.standard_normal((B, H, W, 3), dtype=np.float32)
        depth = (rng.random((B, H, W), dtype=np.float32) * 9.5 + 0.3)
        seg = (rng.random((B, H, W)) > 0.5).astype(np.int64)
        n = int(rng.integers(2, 5))
        lines = rng.random((B, n, 6), dtype=np.float32)
        out.append((img, depth, seg, lines))
    return out


def _ref_loss(cfg, crits, outputs, depth, seg, lines):
    """Total train loss exactly as the reference engine composes it
    (src/engine_glassrgbd.py:61-115)."""
    import torch.nn.functional as TF
    criterion, crit_depth, crit_seg = crits[0], crits[1], crits[2]
    targets = [{"lines": torch.from_numpy(lines[b]),
                "labels": torch.zeros(lines.shape[1], dtype=torch.int64)}
               for b in range(B)]
    loss_dict = criterion(outputs, targets)
    wd = criterion.weight_dict
    total = sum(loss_dict[k] * wd[k] for k in loss_dict if k in wd)
    gt = torch.from_numpy(depth)[:, None]
    mask = (gt >= cfg.train_min_depth) & (gt < cfg.max_depth)
    for pd, w in zip(outputs["pred_depth"], cfg.depth_loss_weights):
        d_gt = TF.interpolate(gt, size=pd.shape[-2:], mode="nearest")
        m_rs = TF.interpolate(mask.to(torch.uint8), size=pd.shape[-2:],
                              mode="nearest")
        total = total + crit_depth(pd, d_gt, m_rs.bool()) * w
    total = total + crit_seg(outputs["pred_seg"],
                             torch.from_numpy(seg)) * cfg.seg_loss_weight
    return total


def test_optimizer_trajectory_vs_reference(ref):
    cfg = _cfg()
    args = make_ref_args(cfg)
    torch.manual_seed(11)
    model_t, crits, _ = ref.glassrgbd.build(args)
    model_t.train()

    rng = np.random.default_rng(517)
    batches = _batches(rng)

    # ---- reference loop: AdamW groups + StepLR + clip, per main/engine
    param_dicts = [
        {"params": [p for n, p in model_t.named_parameters()
                    if "backbone" not in n and p.requires_grad]},
        {"params": [p for n, p in model_t.named_parameters()
                    if "backbone" in n and p.requires_grad],
         "lr": cfg.lr_backbone},
    ]
    opt = torch.optim.AdamW(param_dicts, lr=cfg.lr,
                            weight_decay=cfg.weight_decay)
    sched = torch.optim.lr_scheduler.StepLR(opt, LR_DROP)

    init_state = state_dict_numpy(model_t)

    losses_t = []
    for img, depth, seg, lines in batches:
        nt = ref.misc.NestedTensor(
            nchw(img), torch.zeros((B, H, W), dtype=torch.bool))
        out_t = model_t(nt)
        total = _ref_loss(cfg, crits, out_t, depth, seg, lines)
        opt.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(model_t.parameters(),
                                       cfg.clip_max_norm)
        opt.step()
        sched.step()                      # one epoch == one step
        losses_t.append(float(total))

    final_state = state_dict_numpy(model_t)

    # ---- our loop from the SAME initial weights
    from gwdepth_tpu.data.batch import Batch
    from gwdepth_tpu.models import GlassRGBD
    from gwdepth_tpu.parallel.train_state import create_train_state
    from gwdepth_tpu.parallel.train_step import make_train_step

    m = GlassRGBD(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((B, H, W, 3)))["params"]
    overlay = glassrgbd_torch_to_flax(init_state)
    cov, total_n, missing = coverage(overlay, params)
    assert cov == total_n, f"uncovered {len(missing)}/{total_n}"
    params = merge_params(params, overlay)

    state = create_train_state(cfg, params, steps_per_epoch=1)
    step_fn = make_train_step(cfg, m)

    losses_j = []
    for i, (img, depth, seg, lines) in enumerate(batches):
        T = cfg.max_lines
        tgt = np.zeros((B, T, 6), np.float32)
        msk = np.zeros((B, T), bool)
        tgt[:, :lines.shape[1]] = lines
        msk[:, :lines.shape[1]] = True
        batch = Batch(images=jnp.asarray(img),
                      valid=jnp.ones((B, H, W), bool),
                      depth=jnp.asarray(depth), seg=jnp.asarray(seg),
                      lines=jnp.asarray(tgt), line_mask=jnp.asarray(msk))
        state, logs = step_fn(state, batch, jax.random.PRNGKey(i))
        losses_j.append(float(logs[step_fn.log_keys.index("loss")]))

    # per-step loss trajectory (tolerance widens as param drift compounds)
    for i, (lt, lj) in enumerate(zip(losses_t, losses_j)):
        np.testing.assert_allclose(lj, lt, rtol=2e-3 * (i + 1),
                                   err_msg=f"train loss, step {i}")

    # final parameter tree: convert the trained reference weights and
    # compare EVERY leaf our tree covers (backbone + both branches + heads)
    final_overlay = glassrgbd_torch_to_flax(final_state)

    mismatches = []

    def cmp(path, ours, ref_tree):
        node = ref_tree
        for k in path:
            node = node[k]
        ours = np.asarray(ours)
        node = np.asarray(node)
        if ours.shape != node.shape:
            mismatches.append((path, "shape", ours.shape, node.shape))
        elif not np.allclose(ours, node, atol=5e-5, rtol=5e-3):
            err = float(np.max(np.abs(ours - node)))
            mismatches.append(("/".join(path), "value", err))

    def walk(tree, ours, path=()):
        # overlay keys missing from our tree are reference params for
        # gated-OFF modules (e.g. attn/ref with group_attention False);
        # torch never builds a grad for them, so they are inert there too
        if isinstance(tree, dict):
            for k, v in tree.items():
                if isinstance(ours, dict) and k in ours:
                    walk(v, ours[k], path + (k,))
        else:
            cmp(path, ours, final_overlay)

    walk(final_overlay, state.params)
    assert not mismatches, f"{len(mismatches)} param leaves diverged: " \
                           f"{mismatches[:8]}"

    # frozen params must be bit-identical to their initial values
    init_overlay = glassrgbd_torch_to_flax(init_state)
    from gwdepth_tpu.parallel.train_state import param_group_label

    def check_frozen(tree, ours, path=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                if isinstance(ours, dict) and k in ours:
                    check_frozen(v, ours[k], path + (k,))
        elif param_group_label(path) == "frozen":
            np.testing.assert_array_equal(
                np.asarray(ours), np.asarray(tree),
                err_msg=f"frozen param moved: {'/'.join(path)}")

    check_frozen(init_overlay, state.params)
