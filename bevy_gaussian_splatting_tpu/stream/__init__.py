"""Cloud streaming / level-of-detail layer.

The reference declares this subsystem but never implements it
(`src/stream/slice.rs` is fully commented out; README.md:55-58 lists
"streaming" and "level of detail" as planned).  This module is the TPU
build's real implementation:

- :mod:`slice`   — spatial chunking of a cloud into AABB-tagged blocks
  (the `slice.rs` intent), plus exact re-assembly.
- :mod:`lod`     — importance-ordered LOD chains (opacity x footprint
  scoring with optional opacity-mass compensation) and distance-based
  level selection.
- :mod:`scene`   — a host-side streaming scene: chunks persisted as
  `.gcloud` files with a JSON manifest, background prefetch of chunks
  entering the camera's radius, eviction of far chunks, and
  bucket-padded assembly so resident-set changes re-use compiled
  pipelines instead of recompiling per size.
"""

from bevy_gaussian_splatting_tpu.stream.lod import (
    build_lod_chain,
    select_lod,
)
from bevy_gaussian_splatting_tpu.stream.scene import StreamingCloudScene
from bevy_gaussian_splatting_tpu.stream.slice import (
    CloudChunk,
    concat_clouds,
    slice_cloud,
)

__all__ = [
    "CloudChunk",
    "StreamingCloudScene",
    "build_lod_chain",
    "concat_clouds",
    "select_lod",
    "slice_cloud",
]
