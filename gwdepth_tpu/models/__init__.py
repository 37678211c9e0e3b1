from gwdepth_tpu.models.resnet import ResNetBackbone, pyramid_masks  # noqa: F401
