"""custom_vjp wrapper: differentiable Pallas compositing core.

``composite_core(params_aligned, aligned_start, count)`` runs the forward
kernel and, on the backward pass, the hand-derived backward kernel
(tile_bwd.py) — replacing XLA AD's rematerialized scan on the hot training
path.  The surrounding pipeline stays XLA-differentiable: the parameter gather
transpose accumulates the per-pair gradients into per-gaussian gradients, and
the epilogue provides the transmittance/background cotangents.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bevy_gaussian_splatting_tpu.models.settings import CloudSettings
from bevy_gaussian_splatting_tpu.ops.pallas import tile_bwd, tile_fwd

_CORE_CACHE: dict = {}


def get_composite_core(settings: CloudSettings, width: int, height: int, interpret: bool):
    """A cached custom_vjp function for this pipeline specialization."""
    key = (settings.static_key(), width, height, interpret)
    fn = _CORE_CACHE.get(key)
    if fn is not None:
        return fn

    @jax.custom_vjp
    def core(params_aligned, aligned_start, count):
        return tile_fwd.pallas_forward_raw(
            params_aligned, aligned_start, count, settings, width, height,
            interpret=interpret,
        )

    def core_fwd(params_aligned, aligned_start, count):
        out_raw = tile_fwd.pallas_forward_raw(
            params_aligned, aligned_start, count, settings, width, height,
            interpret=interpret,
        )
        return out_raw, (params_aligned, aligned_start, count, out_raw)

    def core_bwd(res, g_out):
        params_aligned, aligned_start, count, out_raw = res
        num_tiles = (width // tile_fwd.TILE) * (height // tile_fwd.TILE)
        g = g_out.reshape(num_tiles, 8, tile_fwd.PIX)
        o = out_raw.reshape(num_tiles, 8, tile_fwd.PIX)
        # rows 0-2: ghat_rgb; row 3: ghat_T; rows 4-6: total rgb; row 7: T_fin
        gbar = jnp.concatenate([g[:, :4, :], o[:, :3, :], o[:, 3:4, :]], axis=1)
        dparams = tile_bwd.pallas_composite_backward(
            params_aligned, aligned_start, count, gbar, settings, width, height,
            interpret=interpret,
        )
        f0 = jax.dtypes.float0
        return (
            dparams,
            np.zeros(aligned_start.shape, dtype=f0),
            np.zeros(count.shape, dtype=f0),
        )

    core.defvjp(core_fwd, core_bwd)
    _CORE_CACHE[key] = core
    return core
