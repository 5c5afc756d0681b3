"""Engine-level fused-decode-loop A/B: window append vs row scatter.

Times ModelRunner.run_decode_loop dispatches (the REAL compiled loop:
attention + MLP + sampling + append) at the headline decode shape, toggling
`decode_window_append`. The bench_decode_parts microbench times the append
structures in isolation, which misrepresents flush costs that overlap with
the loop's compute in the real program — this driver settles the default.

Usage: python benchmarks/mb_decode_loop_time.py [B] [ctx] [n_steps] [kv_dtype]

kv_dtype defaults to fp8 at B>=64: a real (non-aliased) bf16 pool for
64 x 2048-token sequences is ~15.5 GB of KV alone and cannot fit the part;
fp8 halves it and exercises the quantize-at-append path besides. Use
`auto` (bf16) with B<=32 for the full-precision A/B.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from compactor_vllm_tpu.config import BatchCompressionParams, CompressionMethod, LLMConfig, SamplingParams
from compactor_vllm_tpu.core.runner import ModelRunner
from compactor_vllm_tpu.models.transformer import ModelSpec, init_params
from compactor_vllm_tpu.utils.sequence import Sequence


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ctx = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    kv_dtype = sys.argv[4] if len(sys.argv) > 4 else ("fp8" if B >= 64 else "auto")
    page = 64
    # Qwen3-0.6B geometry (the flagship config — same L/H/D KV footprint as
    # the 1.7B part, smaller params leave HBM room for the real page pool).
    spec = ModelSpec(
        model_type="qwen3", num_layers=28, num_q_heads=16, num_kv_heads=8,
        head_dim=128, hidden_size=1024, intermediate_size=3072,
        vocab_size=151936, use_qk_norm=True, tie_word_embeddings=True,
        rope_theta=1000000.0,
    )
    # Real (non-aliased) pool sized for B sequences of ctx + n_steps tokens.
    reserve_tokens = ctx + ((n_steps + page - 1) // page) * page
    pool = B * ((reserve_tokens + page - 1) // page) * spec.num_kv_heads
    pool += 2 * spec.num_kv_heads  # slack
    kv_bytes = pool * page * spec.head_dim * 2 * spec.num_layers
    kv_bytes *= 1 if kv_dtype == "fp8" else 2
    cfg = LLMConfig(
        max_num_seqs=B, max_model_len=ctx + 512,
        max_num_batched_tokens=16384, kvcache_page_size=page,
        num_kv_pages=pool, eos=-1, seed=0,
        kv_cache_dtype=kv_dtype,
        prefill_token_buckets=(16384,),
        decode_batch_buckets=(B,),
    )
    log(f"kv pool: {pool} pages/(layer,shard), {kv_bytes / 2**30:.2f} GiB "
        f"({kv_dtype})")
    log(f"device: {jax.devices()[0].device_kind}; B={B} ctx={ctx} "
        f"n_steps={n_steps}")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    runner = ModelRunner(cfg, spec=spec, params=params)
    rng = np.random.default_rng(0)
    seqs = [
        Sequence(
            prompt_token_ids=rng.integers(1, 50_000, size=ctx).tolist(),
            sampling_params=SamplingParams(
                temperature=0.0, max_new_tokens=4096,
            ),
        )
        for _ in range(B)
    ]
    for s in seqs:
        runner.allocs[0].alloc_slot(s.seq_id)
        runner.allocs[0].reserve(s.seq_id, reserve_tokens)
    runner.sync_page_table(
        [type("U", (), {"slot": runner.allocs[0].slot_of_seq[s.seq_id]})()
         for s in seqs]
    )
    log("prefill (fills the caches once)...")
    # run_prefill bypasses the scheduler: chunk to the batched-token budget
    # ourselves (64 x 2048 tokens in one call would compile a 128K-token
    # prefill program).
    group = max(1, cfg.max_num_batched_tokens // ctx)
    for i in range(0, B, group):
        runner.run_prefill(seqs[i : i + group],
                           BatchCompressionParams(CompressionMethod.NONE))

    results = {}
    for window in (True, False):
        runner.cfg.decode_window_append = window
        runner._fn_cache.clear()
        label = "window" if window else "row_scatter"
        log(f"[{label}] compiling + warmup ...")
        runner.run_decode_loop(seqs, n_steps)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            runner.run_decode_loop(seqs, n_steps)
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        per_step = dt / n_steps * 1e3
        log(f"[{label}] {dt*1e3:.1f} ms/loop = {per_step:.2f} ms/step "
            f"({B / (dt / n_steps):.0f} tok/s)")
        results[label] = per_step
    print(json.dumps(results))


if __name__ == "__main__":
    main()
