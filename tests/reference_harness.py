"""Import harness for the ACTUAL reference code at /root/reference.

Round-1 parity tests used hand-written torch oracles that *restated* the
reference math; a shared misreading would pass them (VERDICT.md "Missing
#1").  This module makes the real reference implementation importable so
tests can assert numerical equivalence against it directly:

  * stubs the junk/unavailable imports the reference drags in
    (`timm.models.layers`, `imp` (removed in py3.12), `torchvision`) —
    see reference src/models/multiscale_transformerr.py:9-28,
    src/models/points/points_sample.py:1-10, src/models/glassrgbd.py:1-13;
  * puts /root/reference and /root/reference/src on sys.path (reference
    modules import both `models.*` and `src.models.*` spellings);
  * provides `make_ref_args` to synthesize the argparse namespace the
    reference model constructors consume (reference src/args.py:4-173);
  * provides a torchvision-naming-compatible ResNet so the reference's
    `build_backbone` (src/models/backbone.py:84-95) runs its REAL
    FrozenBatchNorm2d / BackboneBase / Joiner code on top of it.

Nothing here copies reference code; the stubs are minimal shims and the
ResNet is the standard bottleneck topology (also used as the torch oracle
in tests/test_resnet.py).
"""

from __future__ import annotations

import sys
import types
from collections import OrderedDict
from types import SimpleNamespace

import numpy as np
import torch
import torch.nn as tnn

REF = "/root/reference"

_ref_cache = None


# ---------------------------------------------------------------------------
# stub modules
# ---------------------------------------------------------------------------

class _DropPath(tnn.Module):
    """timm DropPath shim: identity at p=0 (the only rate the reference
    model config uses; multiscale_transformerr.py BasicLayer default)."""

    def __init__(self, drop_prob=0.0, scale_by_keep=True):
        super().__init__()
        self.drop_prob = float(drop_prob or 0.0)

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
        return x * mask / keep


def _to_2tuple(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


class _IntermediateLayerGetter(tnn.ModuleDict):
    """torchvision.models._utils.IntermediateLayerGetter shim: run child
    modules in registration order, collect the requested ones."""

    def __init__(self, model, return_layers):
        layers = OrderedDict()
        remaining = dict(return_layers)
        for name, module in model.named_children():
            layers[name] = module
            if name in remaining:
                del remaining[name]
            if not remaining:
                break
        if remaining:
            raise ValueError(f"missing layers {remaining}")
        super().__init__(layers)
        self.return_layers = dict(return_layers)

    def forward(self, x):
        out = OrderedDict()
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


class _Bottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 norm_layer=tnn.BatchNorm2d):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = norm_layer(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = norm_layer(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = norm_layer(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class _StubResNet(tnn.Module):
    """Bottleneck ResNet with torchvision child naming (conv1/bn1/layerN/
    blockM.convK|bnK|downsample.{0,1}) so reference key remaps and our
    converter (convert/torch_weights.py:resnet_torch_to_flax) both apply."""

    def __init__(self, layers, norm_layer=tnn.BatchNorm2d):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0], 1, norm_layer)
        self.layer2 = self._make_layer(128, layers[1], 2, norm_layer)
        self.layer3 = self._make_layer(256, layers[2], 2, norm_layer)
        self.layer4 = self._make_layer(512, layers[3], 2, norm_layer)

    def _make_layer(self, planes, blocks, stride, norm_layer):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                           bias=False),
                norm_layer(planes * 4))
        mods = [_Bottleneck(self.inplanes, planes, stride, downsample,
                            norm_layer)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            mods.append(_Bottleneck(self.inplanes, planes,
                                    norm_layer=norm_layer))
        return tnn.Sequential(*mods)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


def _stub_resnet(name):
    layers = {"resnet50": [3, 4, 6, 3], "resnet101": [3, 4, 23, 3]}[name]

    def factory(replace_stride_with_dilation=None, pretrained=False,
                norm_layer=tnn.BatchNorm2d, **kw):
        if replace_stride_with_dilation and any(replace_stride_with_dilation):
            raise NotImplementedError("dilation not stubbed")
        return _StubResNet(layers, norm_layer=norm_layer)

    return factory


def install_stubs():
    """Idempotently install import shims for timm / imp / torchvision."""
    if "timm.models.layers" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        layers.DropPath = _DropPath
        layers.to_2tuple = _to_2tuple
        timm.models = timm_models
        timm_models.layers = layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = layers
    if "imp" not in sys.modules:
        sys.modules["imp"] = types.ModuleType("imp")  # removed in py3.12
    if "numpy.lib.function_base" not in sys.modules:
        # privatized in numpy 2.x; depth_interpolation.py:10 imports interp
        fb = types.ModuleType("numpy.lib.function_base")
        fb.interp = np.interp
        sys.modules["numpy.lib.function_base"] = fb
    if not hasattr(np.lib, "save"):  # read_binfile.py:7 (numpy 2.x drop)
        np.lib.save = np.save
    if not hasattr(np, "mat"):       # raw_preprocess.py:9 (numpy 2.x drop)
        np.mat = np.asmatrix if hasattr(np, "asmatrix") else np.asarray
    if "pyrealsense2" not in sys.modules:
        # depth_interpolation.py needs only the intrinsics container and
        # the (de)projection entry points; with all-zero distortion
        # coefficients librealsense's brown-conrady math reduces exactly
        # to the pinhole model implemented here.
        rs = types.ModuleType("pyrealsense2")

        class _Intrinsics:  # mutable attribute bag (read_camera_intrin)
            pass

        class _Distortion:
            inverse_brown_conrady = "inverse_brown_conrady"
            brown_conrady = "brown_conrady"
            none = "none"

        def _deproject(intrin, pixel, depth):
            assert not any(intrin.coeffs), "stub supports zero coeffs only"
            x = (pixel[0] - intrin.ppx) / intrin.fx
            y = (pixel[1] - intrin.ppy) / intrin.fy
            return [depth * x, depth * y, depth]

        def _project(intrin, point):
            assert not any(intrin.coeffs), "stub supports zero coeffs only"
            x = point[0] / point[2]
            y = point[1] / point[2]
            return [x * intrin.fx + intrin.ppx, y * intrin.fy + intrin.ppy]

        rs.intrinsics = _Intrinsics
        rs.distortion = _Distortion
        rs.rs2_deproject_pixel_to_point = _deproject
        rs.rs2_project_point_to_pixel = _project
        sys.modules["pyrealsense2"] = rs
    if "skimage" not in sys.modules:  # lcnn/trainer.py:16, unused here
        sk = types.ModuleType("skimage")
        sk.io = types.ModuleType("skimage.io")
        sys.modules["skimage"] = sk
        sys.modules["skimage.io"] = sk.io
    # evaluation/lcnn/metric.py uses the np.bool/np.float aliases numpy
    # removed in 1.24
    for name, alias in (("bool", bool), ("float", float), ("int", int)):
        if not hasattr(np, name):
            setattr(np, name, alias)
    if "docopt" not in sys.modules:  # evaluation/eval_post_online.py:15
        doc = types.ModuleType("docopt")
        doc.docopt = lambda *a, **k: {}
        sys.modules["docopt"] = doc
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__version__ = "0.15.0"
        tv_models = types.ModuleType("torchvision.models")
        tv_utils = types.ModuleType("torchvision.models._utils")
        tv_utils.IntermediateLayerGetter = _IntermediateLayerGetter
        tv_models._utils = tv_utils
        tv_models.resnet50 = _stub_resnet("resnet50")
        tv_models.resnet101 = _stub_resnet("resnet101")
        tv_transforms = types.ModuleType("torchvision.transforms")

        class _Normalize(tnn.Module):  # util/commons.py:72 subclasses this
            def __init__(self, mean, std, inplace=False):
                super().__init__()
                self.mean, self.std = mean, std

            def forward(self, t):
                mean = torch.as_tensor(self.mean, dtype=t.dtype)[:, None, None]
                std = torch.as_tensor(self.std, dtype=t.dtype)[:, None, None]
                return (t - mean) / std

        tv_transforms.Normalize = _Normalize

        # --- PIL-backed functional shims for datasets/transforms_depth.py.
        # The line/center/aux-map math under parity test lives in the
        # reference module itself; these shims only carry the raster ops.
        from PIL import Image as _PILImage

        class _Interp:
            NEAREST = _PILImage.NEAREST
            BILINEAR = _PILImage.BILINEAR

        tv_func = types.ModuleType("torchvision.transforms.functional")
        tv_func.hflip = lambda im: im.transpose(_PILImage.FLIP_LEFT_RIGHT)
        tv_func.vflip = lambda im: im.transpose(_PILImage.FLIP_TOP_BOTTOM)
        tv_func.crop = lambda im, top, left, h, w: \
            im.crop((left, top, left + w, top + h))

        def _tv_resize(im, size, interpolation=_Interp.BILINEAR, **kw):
            h, w = size  # transforms_depth always passes an (h, w) pair
            return im.resize((int(w), int(h)), interpolation)

        def _tv_to_tensor(im):
            arr = np.asarray(im, dtype=np.float32) / 255.0
            return torch.from_numpy(arr).permute(2, 0, 1).contiguous()

        def _tv_normalize(t, mean, std, inplace=False):
            mean = torch.as_tensor(mean, dtype=t.dtype)[:, None, None]
            std = torch.as_tensor(std, dtype=t.dtype)[:, None, None]
            return (t - mean) / std

        tv_func.resize = _tv_resize
        tv_func.to_tensor = _tv_to_tensor
        tv_func.normalize = _tv_normalize
        tv_transforms.functional = tv_func
        tv_transforms.InterpolationMode = _Interp

        class _RandomCrop:
            @staticmethod
            def get_params(img, output_size):
                import random as _random
                w, h = img.size
                th, tw = output_size
                return (_random.randint(0, h - th),
                        _random.randint(0, w - tw), th, tw)

        tv_transforms.RandomCrop = _RandomCrop
        tv_datasets = types.ModuleType("torchvision.datasets")

        class _CocoDetection(torch.utils.data.Dataset):
            """Base-class shim: datasets/coco.py subclasses it at import
            time; these tests never instantiate it."""

        tv_datasets.CocoDetection = _CocoDetection
        tv.datasets = tv_datasets
        sys.modules["torchvision.datasets"] = tv_datasets
        tv.transforms = tv_transforms
        sys.modules["torchvision.transforms"] = tv_transforms
        sys.modules["torchvision.transforms.functional"] = tv_func
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
        sys.modules["torchvision.models._utils"] = tv_utils
    if "shapely" not in sys.modules:
        _install_shapely_stub()
    import matplotlib
    matplotlib.use("Agg")


def _install_shapely_stub():
    """shapely is not installed in this image; both the reference
    (transforms_depth.py:21,32-44) and our data/transforms.py use it only
    for rectangle-x-polygon intersection during crop center recompute.
    This stub implements that one case exactly (Sutherland-Hodgman against
    the convex crop rectangle) with the shapely API surface both sides
    touch.  NOTE: because BOTH sides import this same stub, the clip
    geometry itself is shared-implementation; the parity tests cross-check
    everything around it (when the fallback fires, vertex bookkeeping,
    clamping, flip handling)."""

    def _clip(subject, clipper):
        def inside(p, a, b, sign):
            return sign * ((b[0] - a[0]) * (p[1] - a[1])
                           - (b[1] - a[1]) * (p[0] - a[0])) >= 0

        def isect(a, b, p, q):
            x1, y1, x2, y2 = a[0], a[1], b[0], b[1]
            x3, y3, x4, y4 = p[0], p[1], q[0], q[1]
            den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
            t = ((x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)) / den
            return (x1 + t * (x2 - x1), y1 + t * (y2 - y1))

        n = len(clipper)
        area2 = sum(clipper[k][0] * clipper[(k + 1) % n][1]
                    - clipper[(k + 1) % n][0] * clipper[k][1]
                    for k in range(n))
        sign = 1.0 if area2 > 0 else -1.0
        out = list(subject)
        for k in range(n):
            a, b = clipper[k], clipper[(k + 1) % n]
            inp, out = out, []
            if not inp:
                break
            for idx in range(len(inp)):
                p, q = inp[idx - 1], inp[idx]
                if inside(q, a, b, sign):
                    if not inside(p, a, b, sign):
                        out.append(isect(a, b, p, q))
                    out.append(q)
                elif inside(p, a, b, sign):
                    out.append(isect(a, b, p, q))
        return out

    class Polygon:
        def __init__(self, coords):
            c = [tuple(map(float, p)) for p in coords]
            if len(c) > 1 and c[0] == c[-1]:
                c = c[:-1]
            self._c = c

        geom_type = "Polygon"

        @property
        def is_empty(self):
            return len(self._c) < 3

        @property
        def exterior(self):
            return SimpleNamespace(coords=self._c + self._c[:1])

        def intersection(self, other):
            return Polygon(_clip(other._c, self._c))

    def mapping(geom):
        if geom.is_empty:
            return {"type": "Polygon", "coordinates": []}
        return {"type": "Polygon",
                "coordinates": [list(geom.exterior.coords)]}

    shp = types.ModuleType("shapely")
    geo = types.ModuleType("shapely.geometry")
    geo.Polygon = Polygon
    geo.mapping = mapping
    shp.geometry = geo
    sys.modules["shapely"] = shp
    sys.modules["shapely.geometry"] = geo


_ref_tool_cache = None


def get_ref_toolchain():
    """Import the reference's offline GT-construction toolchain (cached):
    depth_interpolation/depth_interpolation.py over the pyrealsense2
    pinhole stub."""
    global _ref_tool_cache
    if _ref_tool_cache is not None:
        return _ref_tool_cache
    install_stubs()
    p = f"{REF}/depth_interpolation"
    if p not in sys.path:
        sys.path.insert(0, p)
    import importlib
    _ref_tool_cache = SimpleNamespace(
        depth_interpolation=importlib.import_module("depth_interpolation"))
    return _ref_tool_cache


_ref_data_cache = None


def get_ref_data():
    """Import the reference's data-transform layer (cached)."""
    global _ref_data_cache
    if _ref_data_cache is not None:
        return _ref_data_cache
    install_stubs()
    for p in (REF, f"{REF}/src"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib
    _ref_data_cache = SimpleNamespace(
        transforms_depth=importlib.import_module("datasets.transforms_depth"),
        glassrgbd_norhint=importlib.import_module(
            "datasets.glassrgbd_norhint"))
    return _ref_data_cache


def get_ref():
    """Import the real reference modules (cached).  Returns a namespace of
    the active model/loss modules."""
    global _ref_cache
    if _ref_cache is not None:
        return _ref_cache
    install_stubs()
    for p in (REF, f"{REF}/src"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib
    mods = {}
    for name in [
            "models.position_encoding",
            "models.multi_head_attention",
            "models.transformer",
            "models.matcher",
            "models.backbone",
            "src.models.points.points_sample",
            "src.models.geometry_utils",
            "models.multiscale_transformerr",
            "models.swin_transformer",
            "models.dense_upsample",
            "models.glassrgbd",
            "util.misc",
    ]:
        mods[name.split(".")[-1]] = importlib.import_module(name)
    _ref_cache = SimpleNamespace(**mods)
    return _ref_cache


_ref_eval_cache = None


def get_ref_eval():
    """Import the reference's eval/metric layer (cached): util.metrics,
    the vendored L-CNN metric module, and the offline line postprocess."""
    global _ref_eval_cache
    if _ref_eval_cache is not None:
        return _ref_eval_cache
    install_stubs()
    for p in (REF, f"{REF}/src", f"{REF}/evaluation"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib
    mods = {
        "metrics": importlib.import_module("util.metrics"),
        "lcnn_metric": importlib.import_module("lcnn.metric"),
        "eval_post_online": importlib.import_module("eval_post_online"),
    }
    _ref_eval_cache = SimpleNamespace(**mods)
    return _ref_eval_cache


import contextlib


@contextlib.contextmanager
def cuda_as_cpu():
    """Make .cuda() a no-op so reference modules that hardcode CUDA
    placement (PlaneLoss, src/models/glassrgbd.py:392,405-441) run on this
    CPU-only box.  Restores the real methods on exit."""
    t_cuda, m_cuda = torch.Tensor.cuda, tnn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    tnn.Module.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda, tnn.Module.cuda = t_cuda, m_cuda


# ---------------------------------------------------------------------------
# reference args namespace
# ---------------------------------------------------------------------------

def make_ref_args(cfg, **over):
    """Argparse-namespace for the reference model builders, derived from a
    GWDepthConfig.  Field set = every `args.<x>` read by the active model
    files (reference src/args.py defaults for those our config lacks)."""
    ns = SimpleNamespace(
        device="cpu",
        backbone=cfg.backbone,
        dilation=False,
        position_embedding=cfg.position_embedding,
        layer1_num=cfg.layer1_num,
        enc_layers=cfg.enc_layers,
        dec_layers=cfg.dec_layers,
        dim_feedforward=cfg.dim_feedforward,
        hidden_dim=cfg.hidden_dim,
        dropout=cfg.dropout,
        nheads=cfg.nheads,
        num_queries=cfg.num_queries,
        pre_norm=cfg.pre_norm,
        aux_loss=cfg.aux_loss,
        with_line=cfg.with_line,
        with_dense=cfg.with_dense,
        with_center=cfg.with_center,
        with_dense_center=cfg.with_dense_center,
        with_line_depth=cfg.with_line_depth,
        with_plane_norm_loss=cfg.with_plane_norm_loss,
        max_depth=cfg.max_depth,
        min_depth_eval=cfg.min_depth_eval,
        max_depth_eval=cfg.max_depth_eval,
        dense_trans_dim=cfg.dense_trans_dim,
        dense_trans_layers=list(cfg.dense_trans_layers),
        dense_trans_heads=cfg.dense_trans_heads,
        class_trans_layers=list(cfg.class_trans_layers),
        group_attention_layers=[list(g) for g in
                                cfg.group_attention_layers],
        depth_interval=list(cfg.depth_interval),
        depth_sample_layers=list(cfg.depth_sample_layers),
        interval_sample_num=list(cfg.interval_sample_num),
        class_tokenfuse_layers=list(cfg.class_tokenfuse_layers),
        class_token_dim=cfg.class_token_dim,
        num_ref=cfg.num_ref,
        set_cost_class=cfg.set_cost_class,
        set_cost_line=cfg.set_cost_line,
        line_loss_coef=cfg.line_loss_coef,
        eos_coef=cfg.eos_coef,
        label_loss_func=cfg.label_loss_func,
        label_loss_params="{}",
        variance_focus=cfg.variance_focus,
        log_depth_error=cfg.log_depth_error,
        lr_backbone=cfg.lr_backbone,
        output_dir="",
        # defaults the reference hardcodes (src/args.py:141-165)
        class_init_size=getattr(cfg, "class_init_size", 32),
        points_double_layers=[False, False, False],
        with_point_attention=False,
        adaptive_min_ratio=1 / 16,
        num_clusters=16,
        shortest_ratio=0.08,
    )
    for k, v in over.items():
        setattr(ns, k, v)
    return ns


# ---------------------------------------------------------------------------
# tensor shuttle helpers
# ---------------------------------------------------------------------------

def state_dict_numpy(module: tnn.Module):
    # .copy(): .numpy() on a CPU tensor ALIASES its storage, so a later
    # in-place optimizer step would silently rewrite the snapshot (bit us
    # in the trajectory test: "initial" weights tracked the trained ones).
    return {k: v.detach().cpu().numpy().copy() for k, v in
            module.state_dict().items()}


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2) \
        .contiguous().float()


def nhwc(t: torch.Tensor) -> np.ndarray:
    return t.detach().cpu().numpy().transpose(0, 2, 3, 1)
