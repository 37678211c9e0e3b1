from gwdepth_tpu.models.resnet import ResNetBackbone, pyramid_masks  # noqa: F401
from gwdepth_tpu.models.detr import DETRTransformer, MLP  # noqa: F401
from gwdepth_tpu.models.glassrgbd import GlassRGBD  # noqa: F401
from gwdepth_tpu.models.dense_encoder import DenseEncoder  # noqa: F401
from gwdepth_tpu.models.decoder import DensePrediction  # noqa: F401
