"""Model zoo: the multi-level NeRF pipeline and its MLPs."""

from multinerf_tpu.models.mlp import MLP, NerfMLP, PropMLP  # noqa: F401
from multinerf_tpu.models.nerf import (  # noqa: F401
    DeviceImageRenderer,
    ImageRenderer,
    Model,
    construct_model,
    render_image,
)
