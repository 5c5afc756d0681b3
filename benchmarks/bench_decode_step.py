"""In-engine decode-step attribution: times the REAL fused decode loop
(ModelRunner._decode_loop_fn, the exact program the bench's decode phase
dispatches) at a steady live batch, then re-times it with one component
stubbed out at a time:

  full       — the production program
  noappend   — store_decode_all_layers replaced by identity
  noattn     — attn.decode replaced by q*scale (KV never read)
  nolmhead   — logits+sampling replaced by a 256-col slice sampler
  noattn+noappend — both (bounds the non-attention non-append rest)

Differences against `full` give the authoritative per-component ms/step the
microbenches (bench_decode_parts, mb_decode_structs) could only approximate
out of context. Run: python benchmarks/bench_decode_step.py [--ctx 2048]
[--live 32] [--steps 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from compactor_vllm_tpu import (
    LLMConfig,
    SamplingParams,
    Sequence,
    SequenceCompressionParams,
)
from compactor_vllm_tpu.core import runner as runner_mod
from compactor_vllm_tpu.core.runner import ModelRunner
from compactor_vllm_tpu.models import transformer as tr_mod
from compactor_vllm_tpu.models.transformer import (
    AttentionImpl,
    ModelSpec,
    init_params,
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def build_runner(cfg, spec, params):
    return ModelRunner(cfg, spec, params)


def seed_cache(runner, n_live, ctx, horizon):
    """Allocate n_live slots with ctx tokens per head already 'cached'
    (random content — throughput is value-independent) and return the
    fabricated mid-generation sequences."""
    alloc = runner.alloc
    seqs = []
    updates = []
    for i in range(n_live):
        s = Sequence(
            prompt_token_ids=list(range(1, ctx + 1)),
            sampling_params=SamplingParams(
                temperature=0.0, max_new_tokens=100_000
            ),
            compression_params=SequenceCompressionParams(compression_ratio=1.0),
        )
        s.num_prefilled_tokens = s.num_prompt_tokens
        s.max_head_len = ctx
        alloc.alloc_slot(s.seq_id)
        updates.append(alloc.reserve(s.seq_id, ctx + horizon))
        seqs.append(s)
    runner.sync_page_table(updates)
    slots = np.array([alloc.slot_of_seq[s.seq_id] for s in seqs], np.int32)
    lens = np.array(runner.cache.bh_lens)
    lens[:, slots] = ctx
    kvp = jax.random.normal(
        jax.random.PRNGKey(7), runner.cache.kv_pages.shape, jnp.float32
    ).astype(runner.cache.kv_pages.dtype)
    runner.cache = runner.cache._replace(
        bh_lens=jnp.asarray(lens), kv_pages=kvp
    )
    return seqs


def time_loop(runner, seqs, n_steps, reps=6):
    # First call compiles; later calls are the measurement. Each call runs
    # n_steps fused decode iterations (all lanes stay alive: eos=-1,
    # max_new huge). Lengths grow by n_steps per call — reserve covers it.
    t0 = time.perf_counter()
    runner.run_decode_loop(seqs, n_steps)
    log(f"  compile+first: {time.perf_counter() - t0:.1f}s")
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        runner.run_decode_loop(seqs, n_steps)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / n_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--live", type=int, default=32)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument(
        "--variants",
        default="full,noappend,noattn,nolmhead,noattn_noappend",
    )
    args = ap.parse_args()

    log(f"device: {jax.devices()[0].device_kind} ({jax.default_backend()})")
    spec = ModelSpec(
        model_type="qwen3", num_layers=28, num_q_heads=16, num_kv_heads=8,
        head_dim=128, hidden_size=2048, intermediate_size=6144,
        vocab_size=151936, use_qk_norm=True, tie_word_embeddings=True,
        rope_theta=1000000.0,
    )
    horizon = args.steps * 8 + 64
    need_pages = args.live * spec.num_kv_heads * (
        (args.ctx + horizon) // 64 + 1
    )
    cfg = LLMConfig(
        max_num_seqs=args.live,
        max_model_len=args.ctx + horizon,
        max_num_batched_tokens=16384,
        kvcache_page_size=64,
        num_kv_pages=need_pages + 64,
        eos=-1,
        seed=0,
        decode_batch_buckets=(args.live,),
    )
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    orig_store = tr_mod.store_decode_all_layers
    orig_logits = runner_mod.compute_local_logits
    results = {}
    for variant in args.variants.split(","):
        log(f"--- {variant}")
        tr_mod.store_decode_all_layers = orig_store
        runner_mod.compute_local_logits = orig_logits
        runner = build_runner(cfg, spec, params)
        if "noappend" in variant:
            tr_mod.store_decode_all_layers = (
                lambda geom, state, k, v, slots, valid, pt=None, cur=None: state
            )
        if "noattn" in variant:
            real = runner.attn

            def stub_decode(geom, cache, layer, q, k_new, v_new, meta,
                            sm_scale, pt_l=None, lens_l=None):
                return q * sm_scale

            runner.attn = AttentionImpl(
                prefill=real.prefill, decode=stub_decode,
                store_full=real.store_full, store_sel=real.store_sel,
                prefill_scored=real.prefill_scored,
            )
        if "nolmhead" in variant:
            runner_mod.compute_local_logits = (
                lambda params, spec, hidden: hidden[:, :256].astype(jnp.float32)
            )
        seqs = seed_cache(runner, args.live, args.ctx, horizon)
        dt = time_loop(runner, seqs, args.steps)
        log(f"  {variant}: {dt * 1e3:.3f} ms/step "
            f"({args.live / dt:.0f} tok/s at B={args.live})")
        results[variant] = dt * 1e3
        del runner
    tr_mod.store_decode_all_layers = orig_store
    runner_mod.compute_local_logits = orig_logits

    if "full" in results:
        full = results["full"]
        for k, v in results.items():
            if k != "full":
                log(f"  {k:>18}: -{full - v:6.3f} ms vs full")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
