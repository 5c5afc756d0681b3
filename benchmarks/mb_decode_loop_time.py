"""Engine-level fused-decode-loop A/B: window append vs row scatter.

Times ModelRunner.run_decode_loop dispatches (the REAL compiled loop:
attention + MLP + sampling + append) at the headline decode shape, toggling
`decode_window_append`. The bench_decode_parts microbench times the append
structures in isolation, which misrepresents flush costs that overlap with
the loop's compute in the real program — this driver settles the default.

Usage: python benchmarks/mb_decode_loop_time.py [B] [ctx] [n_steps]
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
    spec = ModelSpec(
        model_type="qwen3", num_layers=28, num_q_heads=16, num_kv_heads=8,
        head_dim=128, hidden_size=2048, intermediate_size=6144,
        vocab_size=151936, use_qk_norm=True, tie_word_embeddings=True,
        rope_theta=1000000.0,
    )
    cfg = LLMConfig(
        max_num_seqs=B, max_model_len=ctx + 512,
        max_num_batched_tokens=16384, kvcache_page_size=64,
        num_kv_pages=8704, eos=-1, seed=0,
        prefill_token_buckets=(16384,),
        decode_batch_buckets=(B,),
    )
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
        runner.allocs[0].reserve(s.seq_id, ctx + 512)
    runner.sync_page_table(
        [type("U", (), {"slot": runner.allocs[0].slot_of_seq[s.seq_id]})()
         for s in seqs]
    )
    log("prefill (fills the caches once)...")
    runner.run_prefill(seqs, BatchCompressionParams(CompressionMethod.NONE))

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
