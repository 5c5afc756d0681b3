"""Kernel microbenchmarks (the reference's kernel headline is Triton-vs-
FlashAttention TFLOP/s, README.md:64-67 + flash_attn_vs_triton_h100.png).

Times the Pallas paged attention kernels on the TPU chip across a
(query_len, cache_len) grid, amortizing the dispatch round-trip by scanning
28 kernel invocations per measurement (see NOTES.md: the remote relay adds
~4 ms per execution). Prints a table + one JSON summary line.

Usage: python benchmarks/bench_kernels.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from compactor_vllm_tpu.kv_cache.allocator import PageAllocator
from compactor_vllm_tpu.kv_cache.state import KVCacheGeometry, init_kv_cache
from compactor_vllm_tpu.ops.pallas_attention import (
    _row_tile,
    paged_decode_attention,
    paged_prefill_attention,
)

PAGE = 64
H, HQ, D = 8, 16, 128
LAYERS = 28  # chained invocations per measurement


def log(m):
    print(m, file=sys.stderr, flush=True)


def chain_time(fn, args_list):
    """Median seconds per chained-scan execution over varying inputs."""
    float(fn(*args_list[0]))
    times = []
    for a in args_list:
        t0 = time.perf_counter()
        out = fn(*a)
        float(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_prefill(q_len, batch):
    geom = KVCacheGeometry(
        num_layers=1, num_pages=8192, page_size=PAGE, num_kv_heads=H,
        head_dim=D, num_slots=batch + 1, max_pages_per_head=512,
    )
    cache = init_kv_cache(geom, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    G = HQ // H
    TM = _row_tile(G)
    starts = np.arange(batch, dtype=np.int32) * q_len
    lens = np.full(batch, q_len, np.int32)
    Tp = batch * q_len + 512
    pt = np.zeros((batch, H, 512), np.int32)
    clens = np.zeros((batch, H), np.int32)

    @jax.jit
    def run(q, k, v, bases):
        # bases is a runtime zeros array: varying it per scan step stops XLA
        # from hoisting the (otherwise loop-invariant) kernel out of the scan.
        def body(c, base):
            o = paged_prefill_attention(
                q, k, v, cache.kv_pages, jnp.asarray(pt),
                jnp.asarray(clens), jnp.asarray(starts), jnp.asarray(lens), base,
                sm_scale=D**-0.5, page_size=PAGE, max_q=((q_len + TM - 1)//TM)*TM,
            )
            return c + o.astype(jnp.float32).sum(), None
        tot, _ = jax.lax.scan(body, 0.0, bases)
        return tot

    bases = jnp.asarray(np.zeros(LAYERS, np.int32))
    args = []
    for i in range(5):
        q = jnp.asarray(rng.normal(size=(Tp, HQ, D)).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(Tp, H, D)).astype(np.float32), jnp.bfloat16)
        args.append((q, k, k, bases))
    dt = chain_time(run, args) / LAYERS
    flops = batch * 2 * 2 * (q_len * q_len / 2) * D * HQ
    return dt, flops / dt / 1e12


def bench_decode(ctx_len, batch, group_pages=None):
    import compactor_vllm_tpu.ops.pallas_attention as _pa0

    group_pages = group_pages or _pa0.decode_group_pages()
    geom = KVCacheGeometry(
        num_layers=1, num_pages=batch * H * (ctx_len // PAGE + 2) + 64,
        page_size=PAGE, num_kv_heads=H, head_dim=D, num_slots=batch + 1,
        max_pages_per_head=ctx_len // PAGE + 2,
    )
    alloc = PageAllocator(
        num_layers=1, num_shards=1, pages_per_shard=geom.num_pages,
        num_kv_heads=H, max_pages_per_head=geom.max_pages_per_head,
        num_slots=batch + 1, page_size=PAGE,
    )
    cache = init_kv_cache(geom, dtype=jnp.bfloat16)
    slots = []
    for i in range(batch):
        alloc.alloc_slot(i)
        alloc.reserve(i, ctx_len + PAGE)
        slots.append(alloc.slot_of_seq[i])
    slots = np.array(slots, np.int32)
    pt = alloc.page_table[0][slots]
    contig = np.stack([alloc.contig_groups(s, group_pages) for s in slots]).astype(np.int32)
    lens = np.full((batch, H), ctx_len, np.int32)
    rng = np.random.default_rng(1)

    @jax.jit
    def run(q, kn, vn, bases):
        def body(c, base):
            o = paged_decode_attention(
                q, kn, vn, cache.kv_pages, jnp.asarray(pt),
                jnp.asarray(lens), base, jnp.asarray(contig),
                sm_scale=D**-0.5, page_size=PAGE, group_pages=group_pages,
            )
            return c + o.astype(jnp.float32).sum(), None
        tot, _ = jax.lax.scan(body, 0.0, bases)
        return tot

    bases = jnp.asarray(np.zeros(LAYERS, np.int32))
    args = []
    for i in range(5):
        q = jnp.asarray(rng.normal(size=(batch, HQ, D)).astype(np.float32), jnp.bfloat16)
        kn = jnp.asarray(rng.normal(size=(batch, H, D)).astype(np.float32), jnp.bfloat16)
        args.append((q, kn, kn, bases))
    dt = chain_time(run, args) / LAYERS
    kv_bytes = batch * H * ctx_len * D * 2 * 2
    return dt, kv_bytes / dt / 1e9


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}")
    results = {"device": str(dev.device_kind), "prefill": {}, "decode": {}}

    log(f"{'prefill q_len':>14} {'batch':>6} {'ms/layer':>9} {'TF/s':>7}")
    for q_len, batch in [(1024, 8), (4096, 2), (8192, 1)]:
        dt, tf = bench_prefill(q_len, batch)
        log(f"{q_len:>14} {batch:>6} {dt*1e3:>9.2f} {tf:>7.1f}")
        results["prefill"][f"q{q_len}_b{batch}"] = {"ms": dt * 1e3, "tflops": tf}

    log(f"{'decode ctx':>14} {'batch':>6} {'GP':>4} {'ms/layer':>9} {'GB/s':>7}")
    import sys as _sys

    gps = [int(g) for g in _sys.argv[1:]] or [None]
    for gp in gps:
        for ctx, batch in [(1024, 16), (2048, 16), (4096, 16), (2048, 64)]:
            dt, bw = bench_decode(ctx, batch, group_pages=gp)
            log(f"{ctx:>14} {batch:>6} {gp or 0:>4} {dt*1e3:>9.3f} {bw:>7.0f}")
            results["decode"][f"ctx{ctx}_b{batch}_gp{gp}"] = {"ms": dt * 1e3, "gbps": bw}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
