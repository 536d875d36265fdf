from bevy_gaussian_splatting_tpu.models.cloud import (  # noqa: F401
    Gaussian3dCloud,
    Gaussian4dCloud,
    random_gaussians_3d,
    random_gaussians_3d_seeded,
    random_gaussians_4d,
    random_gaussians_4d_seeded,
    test_model_3d,
)
from bevy_gaussian_splatting_tpu.models.settings import CloudSettings  # noqa: F401
from bevy_gaussian_splatting_tpu.models.camera import Camera  # noqa: F401
