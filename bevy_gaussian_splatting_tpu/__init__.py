"""bevy_gaussian_splatting_tpu — a TPU-native differentiable Gaussian-splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``mosure/bevy_gaussian_splatting`` (reference: /root/reference): 2DGS surfels, 3DGS,
temporal 4DGS with spherical-harmonic color, depth-sorted alpha compositing, seven
rasterize output modes, PLY / gcloud / glTF ``KHR_gaussian_splatting`` IO, morph
compute passes, and spatial query utilities — plus (new to this build) a hand-derived
backward pass making the renderer differentiable end-to-end and multi-chip sharding
over a ``jax.sharding.Mesh``.

Architecture (TPU-first, not a port):
  - ``models/``   SoA pytree clouds, settings, cameras (reference L1: src/gaussian/)
  - ``ops/``      projection / SH / sort / rasterization kernels (reference L4-L6 WGSL)
  - ``io/``       PLY, gcloud (flexbuffers), KHR glTF scene IO (reference L3: src/io/)
  - ``render/``   the functional pipeline: render(cloud, camera, settings) -> image
  - ``parallel/`` device-mesh sharding of gaussians x tiles (new; reference has none)
  - ``morph/``    interpolation / particle compute effects (reference src/morph/)
  - ``query/``    select / sparse / raycast utilities (reference src/query/)
"""

__version__ = "0.1.0"

from bevy_gaussian_splatting_tpu.models.cloud import (  # noqa: F401
    Gaussian3dCloud,
    Gaussian3dCovCloud,
    Gaussian4dCloud,
    precompute_covariance_3d,
    random_gaussians_3d,
    random_gaussians_3d_seeded,
    random_gaussians_4d,
    random_gaussians_4d_seeded,
    set_sh_degree,
    sh_coeff_width,
    sh_degree_from_width,
    test_model_3d,
)
from bevy_gaussian_splatting_tpu.models.settings import (  # noqa: F401
    CloudSettings,
    DrawMode,
    GaussianMode,
    GaussianColorSpace,
    PlaybackMode,
    RadixSortDepthBits,
    RasterizeMode,
    SortMode,
)
from bevy_gaussian_splatting_tpu.models.camera import Camera  # noqa: F401
