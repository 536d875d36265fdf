"""Characterize XLA row-gather throughput on TPU.

The stage profiler shows the same row gather running at ~7 ns/row in one spot
(params[g_s]: 6M indices into a 1M x 16 table) and ~29 ns/row in another
(dsorted[inv_pair]: ~1.8M-element permutation of a 1.8M x 16 table).  This
sweep isolates the variable: table rows, index count, index distribution.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(name, fn, *args, iters=8, windows=3):
    out = fn(*args)
    _ = np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
    best = float("inf")
    for _w in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
        t1 = time.perf_counter()
        best = min(best, (t1 - t0) / iters)
    log(f"{name:<52} {best * 1e3:9.2f} ms")
    return best


def main():
    rng = np.random.default_rng(0)
    log(f"devices={jax.devices()}")

    gather = jax.jit(lambda a, i: a[i])

    for n_rows, n_idx, dist in [
        (1_000_000, 6_000_000, "random"),
        (1_000_000, 2_000_000, "random"),
        (2_000_000, 2_000_000, "random"),
        (2_000_000, 2_000_000, "perm"),
        (2_000_000, 6_000_000, "random"),
        (4_000_000, 4_000_000, "perm"),
        (1_000_000, 1_000_000, "perm"),
    ]:
        tbl = jnp.asarray(rng.standard_normal((n_rows, 16)), jnp.float32)
        if dist == "perm":
            idx = jnp.asarray(rng.permutation(n_rows)[:n_idx], jnp.int32)
        else:
            idx = jnp.asarray(rng.integers(0, n_rows, size=n_idx), jnp.int32)
        t = timeit(
            f"gather [{n_rows/1e6:.0f}M,16]f32 by {n_idx/1e6:.0f}M {dist}",
            gather, tbl, idx,
        )
        log(f"    -> {t / n_idx * 1e9:6.2f} ns/row, {n_idx * 64 / t / 1e9:7.2f} GB/s")

    # layout probe: same gather but the operand is produced by a transpose
    # inside the jit (mirrors dsorted = pallas_out[:, :p].T in the bwd path)
    n_rows = n_idx = 2_000_000
    tblT = jnp.asarray(rng.standard_normal((16, n_rows)), jnp.float32)
    idx = jnp.asarray(rng.permutation(n_rows), jnp.int32)

    @jax.jit
    def gather_from_transpose(aT, i):
        return aT.T[i]

    t = timeit("gather [2M,16] by 2M perm, operand = .T inside jit",
               gather_from_transpose, tblT, idx)
    log(f"    -> {t / n_idx * 1e9:6.2f} ns/row")

    # split probe: two half-width gathers from half-size tables
    tblA = jnp.asarray(rng.standard_normal((n_rows, 8)), jnp.float32)
    tblB = jnp.asarray(rng.standard_normal((n_rows, 8)), jnp.float32)

    @jax.jit
    def gather_halves(a, b, i):
        return a[i], b[i]

    t = timeit("2x gather [2M,8] by 2M perm (half tables)",
               gather_halves, tblA, tblB, idx)
    log(f"    -> {t / n_idx * 1e9:6.2f} ns/row combined")
    return 0


if __name__ == "__main__":
    sys.exit(main())
