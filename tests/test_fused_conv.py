"""Fused conv3x3+LN+act Pallas kernel (ops/fused_conv.py).

Runs in interpret mode on the CPU test backend; the same code path
compiles on TPU. bf16-tap tolerance: the fused kernel multiplies taps in
bf16 with f32 accumulation (the reference's own cuDNN convs run TF32),
so comparisons against the f32 XLA chain use a correspondingly loose
tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gwdepth_tpu.models.points import ConvLn, PyramidLayer
from gwdepth_tpu.ops.fused_conv import (conv3x3_ln_act,
                                        conv3x3_ln_act_reference,
                                        fused_conv_ln_act)

K = jax.random.PRNGKey(0)


@pytest.mark.parametrize("act", [None, "gelu", "elu"])
@pytest.mark.parametrize("ci", [16, 40, 300])  # 300 -> multi-chunk K loop
def test_kernel_matches_reference(act, ci):
    co = 24
    x = jax.random.normal(jax.random.fold_in(K, ci), (2, 12, 20, ci))
    w = jax.random.normal(jax.random.fold_in(K, ci + 1),
                          (3, 3, ci, co)) * (1.0 / ci) ** 0.5
    g = jax.random.normal(jax.random.fold_in(K, 2), (co,)) * 0.1 + 1.0
    b = jax.random.normal(jax.random.fold_in(K, 3), (co,)) * 0.1
    ref = conv3x3_ln_act_reference(x, w, g, b, act=act)
    got = conv3x3_ln_act(x, w, g, b, act=act, fast=True, interpret=True,
                         k_chunk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)
    # f32 taps must match tightly
    got32 = conv3x3_ln_act(x, w, g, b, act=act, fast=False, interpret=True,
                           k_chunk=128)
    np.testing.assert_allclose(np.asarray(got32), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    # the im2col formulation (one wide dot per chunk over a gathered
    # (9*kc, CH) scratch) computes the same multiplies as the taps
    # formulation; only the contraction ORDER differs (one 9*kc-long sum
    # vs 9 accumulated kc-long dots), so agreement is to f32
    # reassociation (measured 7e-7 max at these shapes)
    got_ik = conv3x3_ln_act(x, w, g, b, act=act, fast=True, interpret=True,
                            k_chunk=128, im2col=True)
    np.testing.assert_allclose(np.asarray(got_ik), np.asarray(got),
                               atol=5e-6, rtol=1e-5)


def test_kernel_residual():
    ci = co = 32
    x = jax.random.normal(jax.random.fold_in(K, 5), (1, 10, 14, ci))
    r = jax.random.normal(jax.random.fold_in(K, 6), (1, 10, 14, co))
    w = jax.random.normal(jax.random.fold_in(K, 7),
                          (3, 3, ci, co)) * 0.1
    g = jnp.ones((co,)); b = jnp.zeros((co,))
    ref = conv3x3_ln_act_reference(x, w, g, b, residual=r, act="gelu")
    got = conv3x3_ln_act(x, w, g, b, residual=r, act="gelu",
                         fast=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("act", ["gelu", "elu"])
def test_fused_wrapper_grad_matches_reference(act):
    """The analytic VJP (_fused_bwd) must match the autodiff of the XLA
    reference chain for dx/dw/dg/db, with non-trivial LN params.

    x/w are pre-rounded to bf16 so the fused path's bf16 tap cast is a
    no-op and both chains see identical conv inputs — the comparison then
    isolates the VJP math instead of forward-precision noise (gelu's
    curvature near 0 amplifies a bf16-tap ulp into an O(1) relative
    gradient difference on near-zero elements)."""
    ci = co = 8
    x = jax.random.normal(jax.random.fold_in(K, 8), (1, 6, 6, ci))
    w = jax.random.normal(jax.random.fold_in(K, 9), (3, 3, ci, co)) * 0.2
    x = x.astype(jnp.bfloat16).astype(jnp.float32)
    w = w.astype(jnp.bfloat16).astype(jnp.float32)
    g = jax.random.normal(jax.random.fold_in(K, 12), (co,)) * 0.2 + 1.0
    b = jax.random.normal(jax.random.fold_in(K, 13), (co,)) * 0.3

    def loss_fused(x, w, g, b):
        return jnp.sum(fused_conv_ln_act(x, w, g, b, act) ** 2)

    def loss_ref(x, w, g, b):
        return jnp.sum(conv3x3_ln_act_reference(x, w, g, b, act=act) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, g, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, g, b)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=5e-2, rtol=5e-2)


def test_convln_fused_same_params_and_output():
    """ConvLn(fuse=True) shares the param tree with the XLA ConvLn and
    produces the same output (bf16-tap tolerance)."""
    ci, co = 24, 24
    x = jax.random.normal(jax.random.fold_in(K, 10), (1, 9, 11, ci))
    plain = ConvLn(co, fuse_act="gelu")
    fused = ConvLn(co, fuse=True, fuse_act="gelu")
    p1 = plain.init(jax.random.PRNGKey(1), x)
    p2 = fused.init(jax.random.PRNGKey(1), x)
    f1 = jax.tree_util.tree_flatten_with_path(p1)[0]
    f2 = jax.tree_util.tree_flatten_with_path(p2)[0]
    assert [p for p, _ in f1] == [p for p, _ in f2]
    for (pa, va), (_, vb) in zip(f1, f2):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(pa))
    y1 = plain.apply(p1, x)
    y2 = fused.apply(p1, x)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               atol=5e-2, rtol=5e-2)


def test_pyramid_fused_same_params_and_output():
    P = 10
    x = jax.random.normal(jax.random.fold_in(K, 11), (1, 18, 20, P)) * 0.3
    plain = PyramidLayer(P, (16, 8, 4, 2))
    fused = PyramidLayer(P, (16, 8, 4, 2), use_pallas=True)
    p1 = plain.init(jax.random.PRNGKey(2), x)
    p2 = fused.init(jax.random.PRNGKey(2), x)
    f1 = jax.tree_util.tree_flatten_with_path(p1)[0]
    f2 = jax.tree_util.tree_flatten_with_path(p2)[0]
    assert [p for p, _ in f1] == [p for p, _ in f2]
    y1 = plain.apply(p1, x)
    y2 = fused.apply(p1, x)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               atol=5e-2, rtol=5e-2)


def test_model_loss_and_grads_pallas_vs_xla():
    """Training with --use_pallas must optimize the same objective: the
    full tiny-model loss and gradient direction with the fused kernels
    (interpret mode on CPU) match the XLA path on identical params."""
    from gwdepth_tpu.config import tiny_test_config
    from gwdepth_tpu.data.batch import dummy_batch
    from gwdepth_tpu.models import GlassRGBD
    from gwdepth_tpu.parallel import compute_losses

    cfg_x = tiny_test_config(batch_size=1)
    cfg_p = cfg_x.replace(use_pallas=True)
    batch = dummy_batch(cfg_x, 1)
    mx, mp = GlassRGBD(cfg_x), GlassRGBD(cfg_p)
    params = jax.jit(mx.init)(jax.random.PRNGKey(0), batch.images)["params"]
    # the fused path must share the exact param tree (checkpoint compat)
    pp = jax.eval_shape(mp.init, jax.random.PRNGKey(0),
                        batch.images)["params"]
    assert jax.tree_util.tree_structure(pp) == \
        jax.tree_util.tree_structure(params)

    def make_loss(model, cfg):
        def f(params):
            out = model.apply({"params": params}, batch.images, batch.valid,
                              deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(1)})
            return compute_losses(cfg, out, batch)[0]
        return f

    lx, gx = jax.value_and_grad(make_loss(mx, cfg_x))(params)
    lp, gp = jax.value_and_grad(make_loss(mp, cfg_p))(params)
    np.testing.assert_allclose(float(lp), float(lx), rtol=2e-2)

    vx = jnp.concatenate([r.ravel() for r in jax.tree_util.tree_leaves(gx)])
    vp = jnp.concatenate([r.ravel() for r in jax.tree_util.tree_leaves(gp)])
    nx, npn = float(jnp.linalg.norm(vx)), float(jnp.linalg.norm(vp))
    cos = float(jnp.vdot(vx, vp)) / (nx * npn)
    assert cos > 0.99, cos
    assert 0.9 < npn / nx < 1.1, (npn, nx)


def test_diffusion_custom_vjp_grad_matches_xla():
    """ref_attn_diffusion (Pallas fwd + custom VJP) must match grads of
    the XLA formulation it backpropagates through."""
    from gwdepth_tpu.models.swin import diffusion_xla
    from gwdepth_tpu.ops.pallas_kernels import ref_attn_diffusion

    kk = jax.random.fold_in(K, 20)
    B, P, R, H = 1, 12, 8, 4
    a = jax.nn.softmax(jax.random.normal(kk, (B, P, R, H)), axis=2)
    w = jax.random.normal(jax.random.fold_in(K, 21), (3, 3, H, H)) * 0.2
    b = jax.random.normal(jax.random.fold_in(K, 22), (H,)) * 0.1

    yp, vjp_p = jax.vjp(ref_attn_diffusion, a, w, b)
    yx, vjp_x = jax.vjp(diffusion_xla, a, w, b)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yx),
                               atol=1e-5, rtol=1e-4)
    # identical cotangent -> identical grads (the custom VJP runs the XLA
    # vjp at the same primals); forward-noise-amplified cotangents would
    # only blur the comparison
    ct = jax.random.normal(jax.random.fold_in(K, 23), yp.shape)
    gp = vjp_p(ct)
    gx = vjp_x(ct)
    for p, x in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(p), np.asarray(x),
                                   atol=1e-5, rtol=1e-4)


def test_frame_chain_matches_nhwc_path():
    """fused_conv_ln_act_frame == fused_conv_ln_act through frames, in
    values AND grads (the frame VJP routes through the NHWC machinery
    via exact 0/1 extraction/embedding)."""
    from gwdepth_tpu.ops.fused_conv import (
        frame_to_nhwc, fused_conv_ln_act, fused_conv_ln_act_frame,
        nhwc_to_frame)
    rng = np.random.default_rng(11)
    B, H, W, Ci, Co = 2, 9, 13, 8, 8
    x = jnp.asarray(rng.normal(size=(B, H, W, Ci)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, Ci, Co)).astype(np.float32)) * 0.2
    g = jnp.asarray(rng.normal(size=(Co,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(Co,)).astype(np.float32))

    def f_nhwc(x, w, g, b):
        return jnp.sum(fused_conv_ln_act(x, w, g, b, "gelu") ** 2)

    def f_frame(x, w, g, b):
        yf = fused_conv_ln_act_frame(nhwc_to_frame(x), w, g, b, "gelu",
                                     (H, W))
        return jnp.sum(frame_to_nhwc(yf, (H, W)) ** 2)

    va, ga = jax.value_and_grad(f_nhwc, argnums=(0, 1, 2, 3))(x, w, g, b)
    vb, gb = jax.value_and_grad(f_frame, argnums=(0, 1, 2, 3))(x, w, g, b)
    np.testing.assert_allclose(float(vb), float(va), rtol=2e-5)
    for a_, b_ in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a_),
                                   rtol=2e-4, atol=2e-5)
    # chained round trip: two links, frame in between
    y1 = fused_conv_ln_act_frame(nhwc_to_frame(x), w, g, b, "gelu", (H, W))
    y2 = fused_conv_ln_act_frame(y1, w, g, b, None, (H, W))
    ref = fused_conv_ln_act(
        fused_conv_ln_act(x, w, g, b, "gelu"), w, g, b, None)
    np.testing.assert_allclose(np.asarray(frame_to_nhwc(y2, (H, W))),
                               np.asarray(ref), rtol=2e-5, atol=2e-6)
