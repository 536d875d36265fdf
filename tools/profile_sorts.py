"""On-device cost model probe: lax.sort operand scaling + row-gather rates.

Feeds the P-stage cost model (ops/pallas/core.py gather cliff + the grad
reorder sort of get_train_core_windowed): measures stable 1-key sorts with a
varying number of carried operands at the training pair-budget size, and the
row-gather rate for the params gather, IN CHAINED ITERATIONS (relay-safe
timing: tiny readback, min over windows).

    python tools/profile_sorts.py            # P = 1605632 (1M-scene budget)
    PROF_P=6291456 python tools/profile_sorts.py
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
    log(f"{name:<44} {best * 1e3:9.2f} ms")
    return best


def main():
    p = int(os.environ.get("PROF_P", 1_605_632))
    n = int(os.environ.get("PROF_N", 1_000_000))
    key = jax.random.PRNGKey(0)
    tile_key = jax.random.randint(key, (p,), 0, 1024, dtype=jnp.int32)
    cols = [
        jax.random.normal(jax.random.PRNGKey(i + 1), (p,), jnp.float32)
        for i in range(16)
    ]
    log(f"P = {p}, N = {n}, devices: {jax.devices()}")

    for k in (1, 2, 5, 9, 11, 16):
        @jax.jit
        def srt(tk, cs, _k=k):
            out = jax.lax.sort((tk,) + tuple(cs[:_k]), num_keys=1,
                               is_stable=True)
            # chainable dependency: feed the sorted key back
            return out[0], out[1:]

        def chain(tk, cs, _f=srt):
            for _ in range(1):
                tk, cs2 = _f(tk, list(cs))
            return tk

        timeit(f"stable sort 1 key + {k:2d} f32 carries", chain, tile_key,
               cols)

    # complex64 carries: two f32 columns ride as one operand.  If sort
    # permute cost is per-ROW per-operand (like the row gathers, which are
    # width-independent <= 64B), c64 packing halves the operand bill of the
    # grad-reorder and unpermute sorts.
    # NOTE: every output must be RETURNED from the jit or XLA drops the
    # unused carry operands from the sort entirely (the first version of
    # this probe returned only carry 0 and read a bogus ~flat cost).
    for k in (2, 5, 8):
        @jax.jit
        def srtc(tk, cs, _k=k):
            packed = tuple(
                jax.lax.complex(cs[2 * i], cs[2 * i + 1]) for i in range(_k)
            )
            out = jax.lax.sort((tk,) + packed, num_keys=1, is_stable=True)
            return out[0], [jnp.real(c) for c in out[1:]] + [
                jnp.imag(c) for c in out[1:]
            ]

        try:
            timeit(f"stable sort 1 key + {k:2d} c64 carries", srtc, tile_key,
                   cols)
        except Exception as e:  # pragma: no cover - probe robustness
            log(f"c64 carries k={k}: FAILED ({type(e).__name__}: {e})")
            break

    # i64 bitcast packing as an alternative 2-in-1 carrier
    for k in (5,):
        @jax.jit
        def srti(tk, cs, _k=k):
            packed = tuple(
                jax.lax.bitcast_convert_type(
                    jnp.stack([cs[2 * i], cs[2 * i + 1]], axis=-1), jnp.int64
                )
                for i in range(_k)
            )
            out = jax.lax.sort((tk,) + packed, num_keys=1, is_stable=True)
            return out[0], out[1]

        try:
            timeit(f"stable sort 1 key + {k:2d} i64 carries", srti, tile_key,
                   cols)
        except Exception as e:  # pragma: no cover - probe robustness
            log(f"i64 carries k={k}: FAILED ({type(e).__name__}: {e})")
            break

    # row gather at the training shapes: [n, 10] table, p indices
    table = jax.random.normal(jax.random.PRNGKey(99), (n, 10), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(98), (p,), 0, n, jnp.int32)

    @jax.jit
    def gath(t, i):
        return t[i]

    timeit("row gather [n,10] by P idx", gath, table, idx)
    return 0


if __name__ == "__main__":
    sys.exit(main())
