"""Segment-op helpers with static sizes and deterministic tie-breaking.

These wrap ``jax.ops.segment_*`` for the patterns the framework uses
everywhere: per-vertex reductions over edge arrays (the array-first
replacement for the reference's per-row CSR loops, e.g. forceatlas.hpp:169,
partitioner.cpp:1145).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(values, segment_ids, num_segments: int):
    return jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)


def segment_max(values, segment_ids, num_segments: int):
    return jax.ops.segment_max(values, segment_ids, num_segments=num_segments)


def segment_min(values, segment_ids, num_segments: int):
    return jax.ops.segment_min(values, segment_ids, num_segments=num_segments)


def segment_argmax(values, segment_ids, payload, num_segments: int, *,
                   fill_payload):
    """For each segment, the ``payload`` of a maximizing element.

    Ties broken toward the *smallest* payload, making the result order
    independent (the determinism tie-break called for by SURVEY.md SS7).
    Segments with no elements (or only -inf values) get ``fill_payload``.
    """
    m = jax.ops.segment_max(values, segment_ids, num_segments=num_segments)
    is_best = values == m[segment_ids]
    cand = jnp.where(is_best, payload, fill_payload)
    best = jax.ops.segment_min(cand, segment_ids, num_segments=num_segments)
    return m, best
