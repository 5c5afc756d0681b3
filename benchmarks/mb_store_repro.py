"""Standalone paged_compact_store repro at the headline bench geometry.

Round-5 bisect of the compressed-prefill TPU fault (BENCH_r04 rc=1): the
per-variant bench_prefill_step runs showed the fault is SCORE-DEPENDENT —
real-jnp-Compactor scores pass, dummy (k_post[:, :, 0]) and fused-colmass
scores fault — so the trigger must live in the (rank, counts) selection
pattern the fused compact+store kernel receives. This driver reproduces the
exact engine geometry (28 layers x 2600-page pool, Bp=4 x 4096 tokens,
page 64, t_pad 16896) and feeds paged_compact_store selections derived from
synthetic score patterns, one pattern per process run:

  balanced   iid scores -> near-equal per-head counts (expected PASS)
  skew       head 0 dominates the joint budget (counts[0] ~ 4096, rest ~ 0)
  prefix     descending in token -> first-half tokens selected, all heads
  suffix     ascending in token -> last-half tokens selected
  nan        all-NaN scores -> flat token-major tie fill
  protected  +inf on protected spans + iid elsewhere (engine-like)
  zero       one head count 0, others balanced

Usage: python benchmarks/mb_store_repro.py PATTERN [--layers N] [--cpu]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from compactor_vllm_tpu.compression.select import threshold_select
from compactor_vllm_tpu.kv_cache.allocator import PageAllocator
from compactor_vllm_tpu.kv_cache.state import KVCacheGeometry, init_kv_cache
from compactor_vllm_tpu.ops.pallas_attention import (
    STORE_GROUP,
    paged_compact_store,
)

PROMPT, B, H, D, PAGE = 4096, 4, 8, 128, 64
T_PAD = 16896
RESERVE = PROMPT + 64


def log(m):
    print(m, file=sys.stderr, flush=True)


def build_scores(pattern: str, rng: np.random.Generator) -> np.ndarray:
    s = rng.standard_normal((T_PAD, H)).astype(np.float32)
    if pattern == "balanced":
        return s
    if pattern == "skew":
        s[:, 0] += 100.0
        return s
    if pattern == "prefix":
        return -np.arange(T_PAD, dtype=np.float32)[:, None] + 0 * s
    if pattern == "suffix":
        return np.arange(T_PAD, dtype=np.float32)[:, None] + 0 * s
    if pattern == "nan":
        return np.full((T_PAD, H), np.nan, np.float32)
    if pattern == "protected":
        for b in range(B):
            st = b * PROMPT
            s[st : st + 16] = np.inf
            s[st + PROMPT - 64 : st + PROMPT] = np.inf
        return s
    if pattern == "zero":
        s[:, 3] -= 1000.0  # head 3 loses every joint-budget contest
        return s
    raise SystemExit(f"unknown pattern {pattern!r}")


def main():
    pattern = sys.argv[1] if len(sys.argv) > 1 else "balanced"
    L = 28
    for i, a in enumerate(sys.argv):
        if a == "--layers":
            L = int(sys.argv[i + 1])
    interpret = "--cpu" in sys.argv
    maxp = -(-RESERVE // PAGE) + 2  # engine: max_model_len 4288 -> 67
    geom = KVCacheGeometry(
        num_layers=L, num_slots=8, num_kv_heads=H, head_dim=D,
        page_size=PAGE, num_pages=2600, max_pages_per_head=maxp,
    )
    log(f"device: {jax.devices()[0].device_kind}; pattern={pattern} L={L}")
    alloc = PageAllocator(
        num_layers=L, num_shards=1, pages_per_shard=2600, num_kv_heads=H,
        max_pages_per_head=maxp, num_slots=8, page_size=PAGE,
    )
    slots = []
    for sid in range(B):
        slots.append(alloc.alloc_slot(sid))
        alloc.reserve(sid, RESERVE)
    slots = np.array(slots, np.int32)
    pt = alloc.page_table[:, slots]  # [L, B, H, maxp]
    ng = -(-maxp // STORE_GROUP)
    contig = np.stack(
        [alloc.contig_groups(s, STORE_GROUP) for s in slots]
    ).astype(np.int32)  # [B, H, ng] (layer-invariant flags)
    assert contig.shape == (B, H, ng), contig.shape

    starts = np.arange(B, dtype=np.int32) * PROMPT
    lens = np.full(B, PROMPT, np.int32)
    retain = np.full(B, int(0.5 * PROMPT * H), np.int32)

    rng = np.random.default_rng(0)
    scores = build_scores(pattern, rng)
    sel = threshold_select(
        jnp.asarray(scores), jnp.asarray(starts), jnp.asarray(lens),
        jnp.asarray(retain), pad_to_page=PAGE,
    )
    counts = np.asarray(sel.counts)
    log(f"counts per (seq, head):\n{counts}")

    k = jnp.asarray(
        rng.standard_normal((T_PAD, H, D)), jnp.bfloat16
    )
    v = jnp.asarray(
        rng.standard_normal((T_PAD, H, D)), jnp.bfloat16
    )
    cache = init_kv_cache(geom, jnp.bfloat16)
    rows_per_layer = geom.rows_per_layer

    pt_j = jnp.asarray(pt)
    contig_j = jnp.asarray(contig)

    def run(kv_pages, k, v, rank, counts):
        def body(kvp, xs):
            layer, pt_l = xs
            kvp = paged_compact_store(
                k, v, rank, counts, kvp,
                jnp.asarray(starts), jnp.asarray(lens), pt_l,
                layer * rows_per_layer, page_size=PAGE,
                store_contig=contig_j, interpret=interpret,
            )
            return kvp, 0

        kvp, _ = jax.lax.scan(
            body, kv_pages, (jnp.arange(L, dtype=jnp.int32), pt_j)
        )
        return kvp

    fn = jax.jit(run, donate_argnums=(0,))
    log("compiling + first dispatch ...")
    t0 = time.perf_counter()
    out = fn(cache.kv_pages, k, v, sel.rank, sel.counts)
    out.block_until_ready()
    log(f"first dispatch ok in {time.perf_counter() - t0:.1f}s")
    # A second dispatch with fresh data (relay memoizes identical dispatches).
    k2 = jnp.asarray(rng.standard_normal((T_PAD, H, D)), jnp.bfloat16)
    t0 = time.perf_counter()
    out = fn(out, k2, v, sel.rank, sel.counts)
    out.block_until_ready()
    log(f"second dispatch ok in {time.perf_counter() - t0:.3f}s")
    # Touch the stored rows (readback faults surface here, like the bench).
    chk = jnp.sum(out[: geom.rows_per_layer].astype(jnp.float32))
    print(f"PASS {pattern} checksum={float(chk):.3e}")


if __name__ == "__main__":
    main()
