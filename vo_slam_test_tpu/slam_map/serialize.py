"""Map snapshot save/load.

The reference has no mid-run checkpointing (SURVEY.md §5: trajectories and
the vocabulary are its only outputs). The SoA MapState is trivially
serializable: one compressed npz holds the entire map, and a loaded map is
immediately trackable-against (relocalization into a prior session's map
works with the same vocabulary).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .map_state import MapCaps, MapState


def save_map(path: str, m: MapState, caps: MapCaps) -> None:
    data = {f: np.asarray(getattr(m, f)) for f in m.__dataclass_fields__}
    data["_caps"] = np.array(
        [caps.max_kf, caps.max_pt, caps.max_obs, caps.n_feat], np.int64
    )
    np.savez_compressed(path, **data)


def load_map(path: str):
    """Returns (MapState, MapCaps)."""
    z = np.load(path)
    caps = MapCaps(*[int(v) for v in z["_caps"]])
    fields = {k: jnp.asarray(z[k]) for k in z.files if k != "_caps"}
    return MapState(**fields), caps
