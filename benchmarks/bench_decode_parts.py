"""Decode-step component microbenchmarks.

Round-1 left ~9.5 ms/step of the 26 ms decode step unaccounted (NOTES.md:
attention ~12.3, weight reads ~4.2). Suspects: the per-step cross-layer
append scatter (L*Bd*H = 14336 rows; XLA scatters serialize ~175 ns/row),
the per-step page-table/lens slot gathers, and sampling/logits glue. This
times each alone so the decode-v4 redesign (ring-deferred append) is
evidence-driven.

Usage: python benchmarks/bench_decode_parts.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from compactor_vllm_tpu.kv_cache.state import (
    KVCacheGeometry,
    init_kv_cache,
    store_decode_all_layers,
)
from compactor_vllm_tpu.layers.ops import sample_tokens

L, Bd, H, D, PAGE = 28, 64, 8, 128, 64
VOCAB = 151936
STEPS = 16  # chained steps per measurement


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / STEPS


def timeit_donated(fn, cache, *args):
    """For cache-carrying fns: donate the cache and thread it through calls
    (a non-donated 7 GB cache arg otherwise copies per call -> OOM)."""
    cache = fn(cache, *args)
    jax.block_until_ready(cache)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        cache = fn(cache, *args)
        jax.block_until_ready(cache)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / STEPS


def main():
    log(f"device: {jax.devices()[0].device_kind}")
    geom = KVCacheGeometry(
        num_layers=L, num_pages=8704, page_size=PAGE, num_kv_heads=H,
        head_dim=D, num_slots=Bd + 1, max_pages_per_head=72,
    )
    cache = init_kv_cache(geom, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    pt = rng.integers(0, geom.num_pages, size=cache.page_table.shape).astype(np.int32)
    lens = rng.integers(1024, 2048, size=cache.bh_lens.shape).astype(np.int32)
    cache = cache._replace(page_table=jnp.asarray(pt), bh_lens=jnp.asarray(lens))
    slots = jnp.asarray(np.arange(1, Bd + 1, dtype=np.int32))
    valid = jnp.ones(Bd, bool)
    kv = jnp.asarray(
        rng.normal(size=(L, Bd, H, D)).astype(np.float32), jnp.bfloat16
    )
    results = {}

    def report(name, dt):
        log(f"{name:>38}: {dt*1e3:8.3f} ms/step")
        results[name] = dt * 1e3

    # (b) page-table + lens slot gathers
    @jax.jit
    def gathers(cache, x):
        def body(c, i):
            pt_sel = cache.page_table[:, slots]
            lens_sel = cache.bh_lens[:, slots]
            return c + pt_sel.sum() + lens_sel.sum() + i, ()
        c, _ = jax.lax.scan(body, x, jnp.arange(STEPS, dtype=jnp.int32))
        return c
    report("pt+lens slot gathers", timeit(gathers, cache, jnp.int32(0)))

    # (c) sampling from full-vocab logits
    hidden = jnp.asarray(rng.normal(size=(Bd, 2048)).astype(np.float32), jnp.bfloat16)
    head = jnp.asarray(rng.normal(size=(2048, VOCAB)).astype(np.float32) * 0.02,
                       jnp.bfloat16)
    temps = jnp.zeros(Bd, jnp.float32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def logits_sample(hidden, head):
        def body(c, i):
            lg = (hidden @ head).astype(jnp.float32)
            t = sample_tokens(lg, temps, jax.random.fold_in(key, i))
            return c + t.sum(), ()
        c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(STEPS, dtype=jnp.int32))
        return c
    report("lm_head GEMM + sampling", timeit(logits_sample, hidden, head))

    from functools import partial

    # (d) deferred-window append: per-step window update + ONE
    # flush_decode_window per STEPS-step loop (round 5; replaces (a)).
    from compactor_vllm_tpu.kv_cache.state import flush_decode_window

    @partial(jax.jit, donate_argnums=(0,))
    def window_steps(cache, kv):
        pt_sel = cache.page_table[:, slots]
        lens0 = cache.bh_lens[:, slots]
        recent = jnp.zeros((L, Bd, H, STEPS, 2 * D), kv.dtype)

        def body(carry, i):
            rec = carry
            step_kv = jnp.concatenate(
                [kv + i.astype(kv.dtype), kv], axis=-1
            )
            rec = jax.lax.dynamic_update_slice_in_dim(
                rec, step_kv[:, :, :, None, :], i, axis=3
            )
            return rec, ()

        recent, _ = jax.lax.scan(
            body, recent, jnp.arange(STEPS, dtype=jnp.int32)
        )
        return flush_decode_window(
            geom, cache, recent, lens0,
            jnp.full((Bd,), STEPS, jnp.int32), slots, valid, pt_sel,
        )

    # (a) cross-layer append scatter, chained STEPS times (donates the cache
    # -> earlier sections need the live cache)
    @partial(jax.jit, donate_argnums=(0,))
    def scatter_steps(cache, kv):
        def body(c, i):
            c = store_decode_all_layers(geom, c, kv + i, kv, slots, valid)
            return c, ()
        c, _ = jax.lax.scan(body, cache, jnp.arange(STEPS, dtype=jnp.bfloat16))
        return c
    report("append scatter (store_decode_all)", timeit_donated(scatter_steps, cache, kv))
    # The donated pool is dead now; drop the reference so the window section
    # can allocate its own without two 7.6 GB pools coexisting.
    del cache

    cache2 = init_kv_cache(geom, dtype=jnp.bfloat16)._replace(
        page_table=jnp.asarray(pt), bh_lens=jnp.asarray(lens)
    )
    report(
        "window append (update+flush)",
        timeit_donated(window_steps, cache2, kv),
    )

    print(json.dumps(results))


if __name__ == "__main__":
    main()
