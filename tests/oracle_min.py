"""Numpy transcription of embedViaMinimization (src/embed.cpp:341-559):
Gauss-Seidel coordinate descent with 12-step bisection line search."""

import numpy as np

from oracle import csr_of

W_EDGE = 1.0e6
EPS = 10e-12


def axis_dirs(d):
    dirs = []
    for k in range(d):
        e = [0.0] * d
        e[k] = 1.0
        dirs.append(list(e))
        e2 = [0.0] * d
        e2[k] = -1.0
        dirs.append(e2)
    return np.array(dirs)


def minimize_sweeps(g, coords, iters):
    indptr, indices, _ = csr_of(g)
    n, d = coords.shape
    coords = coords.copy()
    dirs = axis_dirs(d)

    for _ in range(iters):
        for i in range(n):
            x_i = coords[i]
            nbrs = [int(indices[k]) for k in range(indptr[i], indptr[i + 1])
                    if indices[k] != i]
            if not nbrs:
                continue
            best_J, best_t, best_s = np.inf, 0.0, -1
            for s_idx in range(dirs.shape[0]):
                x_s = dirs[s_idx]
                t, jump = 0.5, 0.25
                while True:
                    dJ = 0.0
                    for r in range(n):
                        if r == i:
                            continue
                        u = x_s - x_i
                        v = x_i - coords[r]
                        z = u * t + v
                        t1 = max(float((z * z).sum()), EPS)
                        t2 = float((z * u).sum())
                        dJ += -(1.0 / np.sqrt(t1 ** 3)) * t2
                    for r in nbrs:
                        a = (1 - t) * x_i + t * x_s - coords[r]
                        dJ += W_EDGE * 2.0 * float((a * (x_s - x_i)).sum())
                    t = t + jump if dJ < 0 else t - jump
                    jump /= 2.0
                    if jump <= 1e-4:
                        break
                J = 0.0
                for r in range(n):
                    if r == i:
                        continue
                    u = x_s - x_i
                    v = x_i - coords[r]
                    z = u * t + v
                    t1 = max(float((z * z).sum()), EPS)
                    J += 1.0 / np.sqrt(t1)
                for r in nbrs:
                    a = (1 - t) * x_i + t * x_s - coords[r]
                    J += W_EDGE * float((a * a).sum())
                if J < best_J:
                    best_J, best_t, best_s = J, t, s_idx
            if best_s >= 0:
                coords[i] = x_i * (1 - best_t) + dirs[best_s] * best_t
    # normalize quirk: vertices 1..n-1 only (embed.cpp:528-557)
    if n > 1:
        avg = coords[1:].sum(axis=0) / (n - 1)
        coords = coords - avg
        mx = np.sqrt((coords[1:] ** 2).sum(axis=1)).max()
        coords = coords / mx
    return coords
