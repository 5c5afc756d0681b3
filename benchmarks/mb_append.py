"""Decode-append strategy microbench.

Compares the per-step KV append cost at engine decode shapes:

  a) row-scatter  — the current store_decode_all_layers pattern: one XLA
     scatter of L*Bd*H rows of [2D] (each row its own index; XLA serializes
     per index).
  b) win-scatter  — the aligned decode-block design: the same bytes as a
     scatter of L*Bd windows of [hs, 2D] into a bitcast view
     [NB, hs, page_size, 2D] of the same pages buffer (decode blocks give
     every (layer, slot) an aligned run of hs consecutive page ids, and
     pad-to-page makes the in-block offset uniform across layers/heads).
  c) win-scatter K=4 — blocks of hs*K pages (page p0 + h*K + j), view
     [NB', hs, K, page_size, 2D]: same index count, K× fewer blocks.

Timing uses the in-jit chained-scan pattern (see bench_kernels.py): per-
dispatch timing through the relay is not trustworthy.

Usage: python benchmarks/mb_append.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

L, Bd, H, D, PAGE = 32, 64, 8, 128, 64
P = 1792  # pages per layer (multiple of H*K; pool size doesn't change the scatter cost)
STEPS = 28


def log(m):
    print(m, file=sys.stderr, flush=True)


def report(name, fn, pages, kv, offs_sets):
    """Time with per-call VARIED `offs` — the axon relay memoizes identical
    dispatches (NOTES.md round-2 gotcha), so repeating one argument tuple
    reports ~0 ms."""
    log(f"{name}: compiling ...")
    jax.block_until_ready(fn(pages, kv, offs_sets[0]))
    log(f"{name}: compiled")
    times = []
    for offs in offs_sets[1:]:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(pages, kv, offs))
        times.append(time.perf_counter() - t0)
    per_step = float(np.median(times)) / STEPS
    bw = (L * Bd * H * 2 * D * 2) / per_step / 1e9
    print(f"{name:18s} {per_step*1e3:8.3f} ms/step  {bw:7.1f} GB/s")


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    log("devices ok")
    # Trash pages widened to H*K so BOTH bitcast views (groups of H and of
    # H*K pages) divide the row count evenly.
    rows = L * P * PAGE + H * 4 * PAGE
    rng = np.random.default_rng(0)
    kv = jnp.asarray(rng.normal(size=(L, Bd, H, 2 * D)), jnp.bfloat16)

    # Row-scatter: realistic rows — each (l, b, h) lane its own page walk.
    page_of = rng.integers(0, P, size=(L, Bd, H)).astype(np.int32)
    base_rows = (
        np.arange(L, dtype=np.int64)[:, None, None] * (P * PAGE)
        + page_of.astype(np.int64) * PAGE
    ).reshape(-1)

    @jax.jit
    def row_scatter(pages, kv, offs):
        def body(c, off):
            r = jnp.asarray(base_rows, jnp.int32) + off
            c = c.at[r].set(kv.reshape(-1, 2 * D), unique_indices=True,
                            mode="drop")
            return c, None
        pages, _ = jax.lax.scan(body, pages, offs)
        return pages

    # Window-scatter: one aligned block (run of H page ids, H-aligned) per
    # (l, slot); write at uniform in-block offset off.
    blk = rng.integers(0, P // H, size=(L, Bd)).astype(np.int32)
    blk = blk + np.arange(L, dtype=np.int32)[:, None] * (P // H)

    @jax.jit
    def win_scatter(pages, kv, offs):
        def body(c, off):
            view = c.reshape(-1, H, PAGE, 2 * D)
            view = view.at[jnp.asarray(blk), :, off, :].set(
                kv, unique_indices=True, mode="drop"
            )
            return view.reshape(rows, 2 * D), None
        pages, _ = jax.lax.scan(body, pages, offs)
        return pages

    # K=4 variant: blocks of H*K pages; same index count.
    K = 4
    blk4 = rng.integers(0, P // (H * K), size=(L, Bd)).astype(np.int32)
    blk4 = blk4 + np.arange(L, dtype=np.int32)[:, None] * (P // (H * K))

    @jax.jit
    def win_scatter_k4(pages, kv, offs):
        def body(c, off):
            view = c.reshape(-1, H, K, PAGE, 2 * D)
            view = view.at[jnp.asarray(blk4), :, off // PAGE, off % PAGE, :].set(
                kv, unique_indices=True, mode="drop"
            )
            return view.reshape(rows, 2 * D), None
        pages, _ = jax.lax.scan(body, pages, offs)
        return pages

    # Varied per timed call (relay memoization defeat); values stay < PAGE.
    offs_sets = [
        (jnp.arange(STEPS, dtype=jnp.int32) + i) % PAGE for i in range(6)
    ]
    for name, fn in [
        ("row-scatter", row_scatter),
        ("win-scatter", win_scatter),
        ("win-scatter K=4", win_scatter_k4),
    ]:
        pages = jnp.zeros((rows, 2 * D), jnp.bfloat16)
        report(name, fn, pages, kv, offs_sets)


if __name__ == "__main__":
    main()
