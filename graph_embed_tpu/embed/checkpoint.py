"""Checkpoint / resume for the multilevel embedding.

The reference has no checkpointing (SURVEY.md SS5); its nearest analogue is
the warm-start coords path (forceatlas.hpp:118-125, embed.cpp:363-371).
Here the multilevel recursion is checkpointed at its natural level
boundaries: after each level's refinement, (level index, coords, radii,
parent coords/radii, RNG key) are saved; ``embed_resumable`` restarts from
the last completed level.

Format: plain ``.npz`` per level plus a tiny JSON manifest -- no orbax
dependency needed for arrays this shape (coords are [n, d]); everything is
host numpy at the boundary, which also keeps checkpoints portable across
backends.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import Graph
from ..forceatlas.flat import force_atlas
from ..forceatlas.multilevel import force_atlas_multilevel
from ..partition.interpolation import Partition
from ..utils.params import ForceAtlasParams, MultilevelFAParams
from .radii import radii_inner, radii_top_level, renormalize_into_parents
from .driver import validate_hierarchy


class CheckpointStore:
    """Directory-backed store: one .npz per completed level + manifest."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._manifest = os.path.join(path, "manifest.json")

    def save_level(self, level: int, **arrays):
        np.savez(os.path.join(self.path, f"level_{level}.npz"),
                 **{k: np.asarray(v) for k, v in arrays.items() if v is not None})
        state = self.read_manifest()
        state["completed"] = sorted(set(state.get("completed", []) + [level]))
        with open(self._manifest, "w") as f:
            json.dump(state, f)

    def load_level(self, level: int):
        p = os.path.join(self.path, f"level_{level}.npz")
        if not os.path.exists(p):
            return None
        with np.load(p) as z:
            return {k: z[k] for k in z.files}

    def read_manifest(self):
        if os.path.exists(self._manifest):
            with open(self._manifest) as f:
                return json.load(f)
        return {}

    def last_completed(self, k: int):
        """Smallest completed level index given levels run k, k-1, ..., 0
        (coarse to fine); returns None if nothing usable."""
        done = set(self.read_manifest().get("completed", []))
        # find the deepest prefix k, k-1, ... that is contiguous in `done`
        last = None
        for lvl in range(k, -1, -1):
            if lvl in done:
                last = lvl
            else:
                break
        return last


def embed_resumable(graphs: list[Graph], parts: list[Partition], dim: int = 3,
                    *, store: CheckpointStore, key=None,
                    base_params: ForceAtlasParams | None = None,
                    refine_params: MultilevelFAParams | None = None,
                    base_iterations: int | None = None,
                    refine_iterations: int = 100):
    """Checkpointable variant of embed.driver.embed: identical math, but each
    level's outputs are persisted and the run restarts after the last
    completed level."""
    validate_hierarchy(graphs, parts)
    if key is None:
        key = jax.random.PRNGKey(0)
    base_params = base_params or ForceAtlasParams()
    refine_params = refine_params or MultilevelFAParams()
    k = len(parts)

    # per-level keys derived up front so resume reproduces the same streams
    level_keys = {}
    for l in range(k, -1, -1):
        key, sub = jax.random.split(key)
        level_keys[l] = sub

    resume_from = store.last_completed(k)
    coords_A = r_A = coords_Ac = r_Ac = None

    if resume_from is not None and resume_from <= k:
        data = store.load_level(resume_from)
        coords_A = jnp.asarray(data["coords"])
        r_A = jnp.asarray(data["r_A"]) if "r_A" in data else None
        coords_Ac = (jnp.asarray(data["coords_parent"])
                     if "coords_parent" in data else None)
        r_Ac = jnp.asarray(data["r_parent"]) if "r_parent" in data else None
        start = resume_from - 1
    else:
        coords_A = force_atlas(graphs[k], dim, key=level_keys[k],
                               params=base_params,
                               iterations=base_iterations)
        store.save_level(k, coords=coords_A)
        start = k - 1
        r_Ac = coords_Ac = None
        r_A = None

    if k == 0 or start < 0:
        return coords_A

    prev_r = r_Ac
    prev_coords = coords_Ac
    for l in range(start, -1, -1):
        A_c = graphs[l + 1]
        if prev_r is None and l == k - 1:
            s, r, _ = A_c.to_coo_numpy()
            r_lvl = radii_top_level(coords_A, coarse_edges=(s, r))
        else:
            grandparent = parts[l + 1]
            r_lvl = radii_inner(coords_A, prev_r, None, A_c, grandparent)
            coords_A, r_lvl = renormalize_into_parents(
                coords_A, r_lvl, prev_coords, prev_r, grandparent)

        coords = force_atlas_multilevel(
            graphs[l], parts[l], coords_A, r_lvl, dim, key=level_keys[l],
            iterations=refine_iterations, params=refine_params)
        store.save_level(l, coords=coords, r_A=r_lvl,
                         coords_parent=coords_A, r_parent=r_lvl)
        prev_coords, prev_r = coords_A, r_lvl
        coords_A = coords
    return coords_A
