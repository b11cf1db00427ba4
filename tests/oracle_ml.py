"""Numpy transcription of the reference multilevel machinery:
forceAtlasMultilevel forces (forceatlas.hpp:314-574), the radii collision
sweep (embed.cpp:616-756) and renormalization (:757-777) -- the
differential-test oracles for the embed subsystem."""

from __future__ import annotations

import numpy as np

from oracle import csr_of


def ml_local_degrees(g, v_A, use_weights=True):
    """forceatlas.hpp:362-383: same-aggregate incident weight incl. self."""
    indptr, indices, data = csr_of(g)
    n = g.n
    deg = np.zeros(n)
    for i in range(n):
        for k in range(indptr[i], indptr[i + 1]):
            if v_A[indices[k]] == v_A[i]:
                deg[i] += data[k] if use_weights else 1.0
    return deg


def ml_forces(g, v_A, coords, coords_A, deg, *, repel=1.0, attract=1.0,
              gravity=1.0, pull=100.0, use_weights=True, linlog=False,
              nohubs=False, delta=1.0, eps=1e-5):
    """One force evaluation of forceAtlasMultilevel (forceatlas.hpp:390-475),
    transcribed per aggregate and flattened back to global vertex order."""
    indptr, indices, data = csr_of(g)
    n = g.n
    dim = coords.shape[1]
    forces = np.zeros((n, dim))
    m = int(v_A.max()) + 1
    for a in range(m):
        v = np.nonzero(v_A == a)[0]
        for li, i in enumerate(v):
            force_i = np.zeros(dim)
            deg_ip1 = deg[i] + 1
            for j in v:
                if j != i:
                    deg_jp1 = deg[j] + 1
                    d = np.sqrt(((coords[j] - coords[i]) ** 2).sum())
                    d = max(d, eps)
                    fr = deg_ip1 * deg_jp1 * repel / (d * d)
                    force_i += -(coords[j] - coords[i]) / d * fr
            mag = np.sqrt((coords[i] ** 2).sum())
            mag = max(mag, eps)
            for k2 in range(indptr[i], indptr[i + 1]):
                j = indices[k2]
                if v_A[j] == a and j != i:
                    d = np.sqrt(((coords[j] - coords[i]) ** 2).sum())
                    d = max(d, eps)
                    fa = d
                    if linlog:
                        fa = np.log(1 + fa)
                    a_ij = data[k2] if use_weights else 1.0
                    if delta == 1.0:
                        fa = fa * a_ij
                    elif delta != 0.0:
                        fa = np.sign(a_ij) * abs(a_ij) ** delta * fa
                    if nohubs:
                        fa = fa / deg_ip1
                    force_i += (coords[j] - coords[i]) / d * (attract * fa)
                else:
                    dAB = np.sqrt(
                        ((coords_A[v_A[j]] - coords_A[a]) ** 2).sum())
                    dAB = max(dAB, eps)
                    direction = (coords_A[v_A[j]] - coords_A[a]) / dAB
                    force_i += direction * (pull * 1.0) / mag
            uv2 = -coords[i] / mag
            forces[i] = force_i + uv2 * gravity * deg_ip1
    return forces


def collision_sweep(pairs, dists, m):
    """embed.cpp:616-678: sorted time list, pop closest, assign radii,
    update remaining times.  pairs: list of (i, j); dists: |c_i - c_j|.
    Returns r [m]."""
    times = [(-d / 2.0, i, j) for (i, j), d in zip(pairs, dists)]
    times.sort()
    r = np.zeros(m)
    count = 0
    while count < m and times:
        t_ij, i, j = times.pop()
        dist = -t_ij
        if r[i] <= 0 and r[j] > 0:
            r[i] = dist
            times = [(-(2 * (-t) - (-t_ij)), a, b)
                     if (a == i or b == i) else (t, a, b)
                     for t, a, b in times]
            times.sort()
            count += 1
        elif r[i] > 0 and r[j] <= 0:
            r[j] = dist
            times = [(-(2 * (-t) - (-t_ij)), a, b)
                     if (a == j or b == j) else (t, a, b)
                     for t, a, b in times]
            times.sort()
            count += 1
        elif r[i] <= 0 and r[j] <= 0:
            r[i] = dist
            r[j] = dist
            times = [(-(2 * (-t) - (-t_ij)), a, b)
                     if (a == i or b == i or a == j or b == j) else (t, a, b)
                     for t, a, b in times]
            times.sort()
            count += 2
    return r


def renormalize(coords_A, r_A, coords_Ac, r_Ac, gp, eps=1e-6):
    """embed.cpp:757-777."""
    coords_A = coords_A.copy()
    r_A = r_A.copy()
    mc = int(gp.max()) + 1
    for b in range(mc):
        children = np.nonzero(gp == b)[0]
        alpha = 0.0
        for a in children:
            dis = np.sqrt(((coords_Ac[b] - coords_A[a]) ** 2).sum()) + r_A[a]
            alpha = max(alpha, dis)
        alpha = max(alpha, eps)
        for a in children:
            coords_A[a] = coords_Ac[b] + (r_Ac[b] / alpha) * (
                coords_A[a] - coords_Ac[b])
            r_A[a] = (r_Ac[b] / alpha) * r_A[a]
    return coords_A, r_A


def ml_iteration(g, v_A, coords, forces_prev, coords_A, deg, *, ks=0.1,
                 ksmax=1.0, tolerate=1.0, eps=1e-5, **force_kw):
    """One full multilevel iteration incl. the eps-clamped swing and speed
    schedule (forceatlas.hpp:477-537; globals forced to 1.0 at :498,:512)."""
    forces = ml_forces(g, v_A, coords, coords_A, deg, **force_kw)
    n = coords.shape[0]
    new_coords = coords.copy()
    for i in range(n):
        swing = np.sqrt(((forces[i] - forces_prev[i]) ** 2).sum())
        swing = max(swing, eps)
        total_f = np.sqrt((forces[i] ** 2).sum())
        speed = ks * tolerate / (1 + tolerate * np.sqrt(swing))
        if total_f > 0:
            speed = min(speed, ksmax / total_f)
        new_coords[i] = coords[i] + forces[i] * speed
    return new_coords, forces


def ml_epilogue(v_A, coords, coords_A, r_A, eps=1e-5):
    """Center/max-norm/place epilogue (forceatlas.hpp:539-570)."""
    out = coords.copy()
    m = int(v_A.max()) + 1
    for a in range(m):
        v = np.nonzero(v_A == a)[0]
        avg = coords[v].mean(axis=0)
        centered = coords[v] - avg
        mx = max(np.sqrt((centered ** 2).sum(axis=1)).max(), eps)
        out[v] = coords_A[a] + r_A[a] * centered / mx
    return out
