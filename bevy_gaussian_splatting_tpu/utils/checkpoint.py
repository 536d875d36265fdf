"""Training checkpoint/resume for clouds + optimizer state.

The reference persists assets only (gcloud write, GLB export — SURVEY.md §5);
training state checkpointing is new with the differentiable renderer.  Uses a
plain npz container (works everywhere; orbax optional for sharded meshes).
"""

from __future__ import annotations

import dataclasses
import io

import jax
import jax.numpy as jnp
import numpy as np

from bevy_gaussian_splatting_tpu.models.cloud import Gaussian3dCloud, Gaussian4dCloud


def save_checkpoint(path: str, cloud, opt_state=None, step: int = 0, extra: dict = None):
    """Serialize cloud + optimizer pytree + metadata to one npz file."""
    arrays = {}
    arrays["__cloud_format__"] = np.array(
        ["4d" if isinstance(cloud, Gaussian4dCloud) else "3d"]
    )
    arrays["__step__"] = np.array([step])
    for f in dataclasses.fields(cloud):
        arrays[f"cloud/{f.name}"] = np.asarray(getattr(cloud, f.name))
    if opt_state is not None:
        leaves, treedef = jax.tree.flatten(opt_state)
        arrays["__opt_treedef__"] = np.array([str(treedef)])
        for i, leaf in enumerate(leaves):
            arrays[f"opt/{i}"] = np.asarray(leaf)
    if extra:
        for k, v in extra.items():
            arrays[f"extra/{k}"] = np.asarray(v)
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_checkpoint(path: str, opt_state_template=None):
    """Returns (cloud, opt_state or None, step, extra dict).

    ``opt_state_template`` (e.g. ``optimizer.init(cloud)``) supplies the pytree
    structure for the optimizer leaves."""
    with np.load(path, allow_pickle=False) as z:
        fmt = str(z["__cloud_format__"][0])
        step = int(z["__step__"][0])
        cls = Gaussian4dCloud if fmt == "4d" else Gaussian3dCloud
        cloud = cls(
            **{
                k.split("/", 1)[1]: jnp.asarray(z[k])
                for k in z.files
                if k.startswith("cloud/")
            }
        )
        opt_state = None
        if opt_state_template is not None:
            leaves = [
                jnp.asarray(z[f"opt/{i}"])
                for i in range(len(jax.tree.leaves(opt_state_template)))
            ]
            opt_state = jax.tree.unflatten(
                jax.tree.structure(opt_state_template), leaves
            )
        extra = {
            k.split("/", 1)[1]: z[k] for k in z.files if k.startswith("extra/")
        }
    return cloud, opt_state, step, extra
