from bevy_gaussian_splatting_tpu.train.densify import (  # noqa: F401
    DensifyState,
    accumulate_stats,
    densify_and_prune,
    init_densify_state,
)
