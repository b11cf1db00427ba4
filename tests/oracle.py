"""Pure-numpy transcription of the reference C++ semantics, used as the
differential-test oracle (SURVEY.md SS4 consequence (3)).

Each function is a literal loop-level transcription of the cited reference
code (float64), NOT a copy -- the reference is C++ over linalgcpp CSR.
"""

from __future__ import annotations

import numpy as np


def csr_of(g):
    """(indptr, indices, data) numpy views of a Graph's valid prefix."""
    s, r, w = g.to_coo_numpy()
    n = g.n
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, s + 1, 1)
    indptr = np.cumsum(indptr)
    return indptr, r.astype(np.int64), w.astype(np.float64)


def degrees(g, use_weights=True):
    """forceatlas.hpp:127-140."""
    indptr, indices, data = csr_of(g)
    n = g.n
    deg = np.zeros(n)
    for i in range(n):
        if use_weights:
            deg[i] = data[indptr[i]:indptr[i + 1]].sum()
        else:
            deg[i] = indptr[i + 1] - indptr[i]
    return deg


def fa_forces(g, coords, deg, *, repel=1.0, attract=1.0, gravity=1.0,
              use_weights=True, linlog=False, nohubs=False, delta=1.0,
              eps=1e-5):
    """One force evaluation, literal transcription of forceatlas.hpp:146-212."""
    indptr, indices, data = csr_of(g)
    n = g.n
    dim = coords.shape[1]
    forces = np.zeros((n, dim))
    for i in range(n):
        force_i = np.zeros(dim)
        deg_ip1 = deg[i] + 1
        for j in range(n):
            if i != j:
                deg_jp1 = deg[j] + 1
                d = np.sqrt(((coords[j] - coords[i]) ** 2).sum())
                d = max(d, eps)
                fr = deg_ip1 * deg_jp1 * repel / (d * d)
                direction = -(coords[j] - coords[i]) / d
                force_i += direction * fr
        for k2 in range(indptr[i], indptr[i + 1]):
            j = indices[k2]
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
            Fa = attract * fa
            direction = (coords[j] - coords[i]) / d
            force_i += direction * Fa
        mag = np.sqrt((coords[i] ** 2).sum())
        uv2 = -coords[i] / mag if mag > 0 else np.zeros(dim)
        forces[i] = force_i + uv2 * gravity * deg_ip1
    return forces


def fa_iteration(g, coords, forces_prev, deg, *, ks=0.1, ksmax=1.0,
                 tolerate=1.0, **force_kw):
    """One full iteration incl. swing/speed (forceatlas.hpp:146-269),
    reproducing the hardcoded globalSwing = globalTraction = 1.0
    (:228,:242)."""
    n = coords.shape[0]
    forces = fa_forces(g, coords, deg, **force_kw)
    swing = np.sqrt(((forces - forces_prev) ** 2).sum(axis=1))
    global_speed = tolerate * 1.0 / 1.0
    new_coords = coords.copy()
    for i in range(n):
        total_f = np.sqrt((forces[i] ** 2).sum())
        speed = ks * global_speed / (1 + global_speed * np.sqrt(swing[i]))
        if total_f > 0:
            speed = min(speed, ksmax / total_f)
        new_coords[i] = coords[i] + forces[i] * speed
    return new_coords, forces


def modularity(g, vertex_to_agg, int_truncate=False):
    """src/partitioner.cpp:69-114 (int truncation at :90 optional)."""
    s, r, w = g.to_coo_numpy()
    if int_truncate:
        w = np.trunc(w)
    m = int(vertex_to_agg.max()) + 1
    d = np.zeros(m)
    out = np.zeros(m)
    T = 0.0
    for i, j, a_ij in zip(s, r, w):
        A, B = vertex_to_agg[i], vertex_to_agg[j]
        if A == B:
            d[A] += a_ij
        else:
            out[A] += a_ij
        T += a_ij
    alpha = (d + out) / T
    return (d / T - alpha * alpha).sum()


def galerkin_dense(g, vertex_to_agg, m):
    """Dense P^T A P oracle (examples/embed.cpp:95-98)."""
    A = g.to_dense_numpy().astype(np.float64)
    n = g.n
    P = np.zeros((n, m))
    P[np.arange(n), vertex_to_agg] = 1.0
    return P.T @ A @ P


def greedy_partition_rounds(g, *, positive_merging=True,
                            matching_iterations=2, stall=1.0,
                            max_rounds=10_000):
    """Literal sequential transcription of the single-level ``partition``
    (src/partitioner.cpp:970-1266): greedy one-sided commit, map adjacency.
    Returns (vertex_to_agg dense, Q, num_aggs)."""
    indptr, indices, data = csr_of(g)
    n = g.n
    a = [dict() for _ in range(n)]
    alpha = np.zeros(n)
    for i in range(n):
        for k in range(indptr[i], indptr[i + 1]):
            j = int(indices[k])
            if i != j:
                a[i][j] = a[i].get(j, 0.0) + data[k]
            alpha[i] += data[k]
    T = data.sum()
    d_sum = sum(data[k] for i in range(n)
                for k in range(indptr[i], indptr[i + 1]) if indices[k] == i)
    alpha /= T
    Q = d_sum / T - (alpha ** 2).sum()

    used = list(range(n))
    pointer = list(range(n))
    ident = list(range(n))
    inf = np.inf
    max_eta = np.full(n, -inf)
    max_ind = np.full(n, -1)
    notouch = np.zeros(n, dtype=bool)

    M = n
    M_prev = M
    rounds = 0
    while True:
        rounds += 1
        merged = []
        dQ = 0.0
        for _ in range(matching_iterations):
            for x in range(len(used)):
                i = used[x]
                if (not notouch[i]) or max_eta[i] == -inf:
                    best, best_j = -inf, -1
                    for j, a_ij in a[i].items():
                        if not notouch[j]:
                            eta = 2 * (a_ij / T - alpha[i] * alpha[j])
                            if eta > best:
                                best, best_j = eta, j
                    max_eta[i] = best
                    max_ind[i] = best_j
            for x in range(len(used)):
                i = used[x]
                if not notouch[i]:
                    j = int(max_ind[i])
                    if j != -1 and not notouch[j] and not (max_eta[i] < max_eta[j]):
                        if (not positive_merging) or max_eta[i] > 0:
                            if len(a[i]) < len(a[j]):
                                ip, jp = j, i
                            else:
                                ip, jp = i, j
                            merged.append((ip, jp))
                            notouch[i] = True
                            notouch[j] = True
                            dQ += max_eta[i]
        for ip, jp in merged:
            for k, a_jk in list(a[jp].items()):
                del a[k][jp]
                max_eta[k] = -inf
                if k == ip:
                    alpha[ip] += alpha[jp]
                else:
                    a[ip][k] = a[ip].get(k, 0.0) + a_jk
                    a[k][ip] = a[k].get(ip, 0.0) + a_jk
        Q += dQ
        M_prev = M
        for ip, jp in merged:
            idx = pointer[jp]
            k = used[-1]
            used[idx], used[-1] = used[-1], used[idx]
            used.pop()
            pointer[k] = idx
            ident[jp] = ip
            notouch[ip] = False
        M -= len(merged)
        if M / M_prev >= stall or rounds >= max_rounds:
            break

    def find(i):
        root = i
        while ident[root] != root:
            root = ident[root]
        while ident[i] != root:
            ident[i], i = root, ident[i]
        return root

    roots = sorted({find(i) for i in range(n)})
    rank = {r: x for x, r in enumerate(roots)}
    v2a = np.array([rank[find(i)] for i in range(n)], dtype=np.int64)
    return v2a, Q, len(roots)
