"""Row-gather rate vs ROW WIDTH at fixed (sub-cliff) table scale.

Round-4 correction (ops/pallas/core._gather_rate): the 64 MiB cliff model's
"width-independent <= 64 B" claim breaks at 64 B — [1M, 16] f32 gathers at
22.9 ns/row even sub-cliff, [1M, 10] at 9.3, <= 8-col pieces at ~7.  This
probe completes the width curve (4..16 plus split combinations) so the
2DGS-table floor argument rests on measured rates at every candidate width,
not interpolation.

Run on TPU:  PROF_N=1000000 PROF_Q=1600000 python tools/probe_gather_width.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = int(os.environ.get("PROF_N", 1_000_000))
    q = int(os.environ.get("PROF_Q", 1_600_000))
    iters = int(os.environ.get("PROF_ITERS", 8))

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (q,), 0, n)
    idx = jax.device_put(idx.astype(jnp.int32))

    def time_gather(widths):
        """One jit gathering len(widths) pieces of the given widths from
        independent tables (sum consumed so nothing is DCE'd)."""
        tables = [
            jax.device_put(
                jax.random.normal(jax.random.fold_in(key, 10 + i), (n, w),
                                  jnp.float32)
            )
            for i, w in enumerate(widths)
        ]

        @jax.jit
        def f(idx, *ts):
            return sum(jnp.sum(t[idx]) for t in ts)

        out = f(idx, *tables)
        _ = np.asarray(jnp.ravel(out)[:1])
        best = float("inf")
        for _w in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(idx, *tables)
            _ = np.asarray(jnp.ravel(out)[:1])
            best = min(best, (time.perf_counter() - t0) / iters)
        ns_row = best / q * 1e9
        log(f"widths {widths}: {best * 1e3:.2f} ms = {ns_row:.1f} ns/row "
            f"(table {sum(widths) * n * 4 / 2**20:.0f} MiB total)")
        return ns_row

    log(f"rows {n}, queries {q}")
    for w in (4, 8, 9, 10, 11, 12, 14, 15, 16):
        time_gather((w,))
    log("-- split combinations (one jit each) --")
    for combo in ((8, 8), (8, 7), (10, 5), (10, 6), (12, 3)):
        time_gather(combo)
    return 0


if __name__ == "__main__":
    sys.exit(main())
