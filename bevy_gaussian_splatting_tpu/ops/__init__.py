from bevy_gaussian_splatting_tpu.ops import (  # noqa: F401
    covariance,
    sh,
    transforms,
    color,
)
