"""Backbone golden test: our flax ResNet-50 (frozen BN) vs an independent
torch implementation with torchvision parameter naming, weights shared via
the converter."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from gwdepth_tpu.models.resnet import ResNetBackbone, pyramid_masks
from gwdepth_tpu.convert.torch_weights import resnet_torch_to_flax


class TorchFrozenBN(tnn.Module):
    """reference backbone.py:19-55 semantics."""

    def __init__(self, n):
        super().__init__()
        self.register_buffer("weight", torch.rand(n) + 0.5)
        self.register_buffer("bias", torch.randn(n) * 0.1)
        self.register_buffer("running_mean", torch.randn(n) * 0.1)
        self.register_buffer("running_var", torch.rand(n) + 0.5)

    def forward(self, x):
        w = self.weight.reshape(1, -1, 1, 1)
        b = self.bias.reshape(1, -1, 1, 1)
        rv = self.running_var.reshape(1, -1, 1, 1)
        rm = self.running_mean.reshape(1, -1, 1, 1)
        scale = w * (rv + 1e-5).rsqrt()
        return x * scale + (b - rm * scale)


class TorchBottleneck(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = TorchFrozenBN(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = TorchFrozenBN(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = TorchFrozenBN(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class TorchResNet50(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = TorchFrozenBN(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64
        for i, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), (3, 4, 6, 3))):
            stride = 1 if i == 0 else 2
            ds = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                TorchFrozenBN(planes * 4))
            layers = [TorchBottleneck(inplanes, planes, stride, ds)]
            inplanes = planes * 4
            layers += [TorchBottleneck(inplanes, planes) for _ in range(blocks - 1)]
            setattr(self, f"layer{i + 1}", tnn.Sequential(*layers))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        feats = []
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
            feats.append(x)
        return feats


def test_resnet50_matches_torch():
    torch.manual_seed(0)
    tm = TorchResNet50().eval()
    x = np.random.default_rng(0).normal(size=(1, 3, 65, 97)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = [f.numpy() for f in tm(torch.from_numpy(x))]

    params = resnet_torch_to_flax(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    model = ResNetBackbone("resnet50")
    got = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == 4
    for g, w in zip(got, want):
        g = np.asarray(g).transpose(0, 3, 1, 2)
        assert g.shape == w.shape
        np.testing.assert_allclose(g, w, atol=2e-3, rtol=1e-3)


def test_pyramid_masks_shapes():
    model = ResNetBackbone("resnet50")
    x = jnp.zeros((2, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    feats = model.apply({"params": params}, x)
    valid = jnp.zeros((2, 64, 96), bool).at[:, :48, :64].set(True)
    masks = pyramid_masks(valid, feats)
    assert [m.shape[1:] for m in masks] == [(16, 24), (8, 12), (4, 6), (2, 3)]
    # 1/4-level mask keeps ~3/4 x ~2/3 of pixels valid
    assert np.asarray(masks[0])[0, :12, :16].all()
    assert not np.asarray(masks[0])[0, 15, 23]
