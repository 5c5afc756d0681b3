"""Headline benchmark: RULER-4K-style serving throughput at 50% KV compression.

Mirrors the reference's headline measurement (README.md:40-42, BASELINE.md:
compactor-vllm 30,349 tok/s on 1x H100, RULER-4K): N requests with ~4K-token
prompts, short generations, continuous batching, Compactor compression at 50%
retention. Reports total (prompt + generated) tokens per second.

Runs on the real TPU chip (default platform). Weights are random-init bf16 —
throughput is weight-value independent. Prints ONE JSON line.

Per-phase checkpointing: each phase (parity, nocomp, headline) appends its
result to BENCH_PARTIAL.json as it lands, so a TPU fault in a later phase
still leaves the earlier measurements on disk (round 4 lost a 14,583 tok/s
nocomp figure to a headline crash). The default run measures the
uncompressed floor FIRST, then the compressed headline; `--headline-only`
skips the floor, `--nocomp` measures only the floor.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

BASELINE_TOK_S = 30_349.0  # reference compactor-vllm, 1x H100, RULER-4K

PARTIAL_PATH = "BENCH_PARTIAL.json"
_partial: dict = {}


def checkpoint(key, value):
    """Record a phase result; survives a later-phase device fault."""
    _partial[key] = value
    try:
        with open(PARTIAL_PATH, "w") as f:
            json.dump(_partial, f, indent=1)
    except OSError:
        pass


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    # Fail FAST if the TPU claim is wedged (axon relay: a client killed
    # mid-claim can hang every later process in PJRT init indefinitely —
    # NOTES.md round 3). A bounded subprocess probe turns an indefinite
    # hang into a clean JSON error the driver can record.
    if "--skip-probe" not in sys.argv:
        import subprocess

        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=240, check=True, capture_output=True,
            )
        except Exception as e:
            print(json.dumps({
                "metric": "ruler4k_throughput_qwen3_1.7b_compactor50",
                "value": 0.0,
                "unit": "tok/s",
                "vs_baseline": 0.0,
                "error": f"TPU device claim unavailable ({type(e).__name__})"
                         " — relay wedged; see NOTES.md round-3 infra note",
            }))
            sys.exit(1)

    import jax.numpy as jnp

    from compactor_vllm_tpu import (
        BatchCompressionParams,
        CompressionMethod,
        LLMConfig,
        LLMEngine,
        SamplingParams,
        Sequence,
        SequenceCompressionParams,
    )
    from compactor_vllm_tpu.models.transformer import ModelSpec, init_params

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({jax.default_backend()})")

    # Parity preamble (VERDICT round-2 #8): every bench run re-proves
    # Mosaic-vs-oracle parity on the real chip before reporting a number.
    # Skippable for quick iteration with --skip-parity.
    if "--skip-parity" not in sys.argv:
        from benchmarks.smoke_tpu_parity import run_parity_smoke

        log("parity preamble: PALLAS vs REFERENCE on-chip ...")
        if not run_parity_smoke(log=log):
            print(json.dumps({
                "metric": "ruler4k_throughput_qwen3_1.7b_compactor50",
                "value": 0.0,
                "unit": "tok/s",
                "vs_baseline": 0.0,
                "error": "on-chip parity preamble FAILED — not reporting",
            }))
            sys.exit(1)
        log("parity preamble ok")
        checkpoint("parity", "ok")

    # Qwen3-1.7B geometry (largest dense config that comfortably fits a 16GB
    # v5e chip alongside an 8GB KV pool).
    spec = ModelSpec(
        model_type="qwen3", num_layers=28, num_q_heads=16, num_kv_heads=8,
        head_dim=128, hidden_size=2048, intermediate_size=6144,
        vocab_size=151936, use_qk_norm=True, tie_word_embeddings=True,
        rope_theta=1000000.0,
    )
    prompt_len, new_tokens, n_requests = 4096, 128, 64
    fp8 = "--fp8" in sys.argv  # fp8 KV variant (reported, not the headline)
    nocomp = "--nocomp" in sys.argv  # uncompressed comparison run
    cfg = LLMConfig(
        max_num_seqs=64,
        max_model_len=prompt_len + new_tokens + 64,
        max_num_batched_tokens=16384,
        kvcache_page_size=64,
        # ~8GB pool; compression reclaim sustains ~32 live seqs (fp8 pages
        # are half-size, so the same page count = a 4GB pool with headroom
        # for more).
        num_kv_pages=8704,  # same page count regardless of dtype: pages bound TOKEN capacity, so admission is identical and fp8 effects isolate
        kv_cache_dtype="fp8" if fp8 else "auto",
        eos=-1,
        seed=0,
        # Multiple buckets: capacity-limited refill batches (1-3 seqs) pad
        # to 4K/8K instead of paying a full 16K-shape prefill step — the
        # compressed run's partial batches cost ~2s of its round-5 wall time.
        prefill_token_buckets=(4096, 8192, 16384),
        decode_batch_buckets=(16, 32, 64),
    )
    log("initializing params...")
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    engine = LLMEngine(cfg, spec=spec, params=params, tokenizer=None)

    rng = np.random.default_rng(0)

    def make_seqs():
        return [
            Sequence(
                prompt_token_ids=rng.integers(1, 50_000, size=prompt_len).tolist(),
                sampling_params=SamplingParams(temperature=0.0, max_new_tokens=new_tokens),
                compression_params=SequenceCompressionParams(
                    compression_ratio=0.5,
                    protected_first_tokens=16,
                    protected_last_tokens=64,
                ),
            )
            for _ in range(n_requests)
        ]

    def measure(tag, method):
        bp = BatchCompressionParams(compression_method=method, chunk_size=512)
        log(f"[{tag}] warmup (compiles prefill + decode at full shapes)...")
        t0 = time.perf_counter()
        engine.generate_from_sequences(make_seqs(), bp)
        log(f"[{tag}] warmup done in {time.perf_counter() - t0:.1f}s")
        log(f"[{tag}] timed run: {n_requests} x "
            f"({prompt_len} prompt + {new_tokens} new)...")
        seqs = make_seqs()
        t0 = time.perf_counter()
        outs = engine.generate_from_sequences(seqs, bp)
        dt = time.perf_counter() - t0
        total_tokens = sum(s.seq.num_tokens for s in outs)
        tok_s = total_tokens / dt
        log(f"[{tag}] {total_tokens} tokens in {dt:.2f}s = {tok_s:.0f} tok/s")
        log(f"[{tag}] phases: {engine.last_stats.summary()}")
        # Peak KV memory (BASELINE.md second headline: 60.3 GB uncompressed
        # vs 31.3 GB at 50% on the reference's H100 run).
        geom = engine.runner.geom
        itemsize = jnp.dtype(engine.runner._cache_dtype).itemsize
        page_bytes = 2 * geom.page_size * geom.head_dim * itemsize  # k+v
        peak_gb = (engine.runner.alloc.peak_used_pages * page_bytes
                   * geom.num_layers / 2**30)
        log(f"[{tag}] peak KV in use: {peak_gb:.2f} GB (pool "
            f"{geom.num_pages * page_bytes * geom.num_layers / 2**30:.2f} GB)")
        full_pages = (
            n_requests * geom.num_kv_heads
            * -(-(prompt_len + new_tokens) // geom.page_size)
        )
        full_gb = full_pages * page_bytes * geom.num_layers / 2**30
        log(f"[{tag}] uncompressed KV for this workload would need "
            f"{full_gb:.2f} GB -> peak ratio {peak_gb / full_gb:.2f} "
            f"(reference @50%: ~0.52)")
        checkpoint(tag, {
            "tok_s": round(tok_s, 1), "peak_kv_gb": round(peak_gb, 2),
        })
        return tok_s

    suffix = "_fp8kv" if fp8 else ""
    if nocomp:
        tok_s = measure("uncompressed", CompressionMethod.NONE)
        print(json.dumps({
            "metric": f"ruler4k_throughput_qwen3_1.7b_uncompressed{suffix}",
            "value": round(tok_s, 1),
            "unit": "tok/s",
            "vs_baseline": round(tok_s / BASELINE_TOK_S, 4),
        }))
        return

    floor = None
    if "--headline-only" not in sys.argv:
        # Measure the uncompressed floor FIRST: if the compressed phase
        # faults, the floor (and the retention denominator) is already on
        # disk in BENCH_PARTIAL.json.
        floor = measure("uncompressed", CompressionMethod.NONE)

    try:
        tok_s = measure("compactor50", CompressionMethod.COMPACTOR)
    except Exception as e:  # noqa: BLE001 — report the floor, not nothing
        err = f"{type(e).__name__}: {str(e)[:200]}"
        checkpoint("headline_error", err)
        if floor is not None:
            print(json.dumps({
                "metric": f"ruler4k_throughput_qwen3_1.7b_uncompressed{suffix}",
                "value": round(floor, 1),
                "unit": "tok/s",
                "vs_baseline": round(floor / BASELINE_TOK_S, 4),
                "error": f"compressed headline phase FAILED ({err}); "
                         "reporting the uncompressed floor",
            }))
            sys.exit(1)
        raise
    out = {
        "metric": f"ruler4k_throughput_qwen3_1.7b_compactor50{suffix}",
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 4),
    }
    if floor is not None:
        out["retention_vs_uncompressed"] = round(tok_s / floor, 4)
        checkpoint("retention_vs_uncompressed", out["retention_vs_uncompressed"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
