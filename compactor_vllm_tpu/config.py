"""Engine, sampling, and compression configuration.

Capability parity with the reference engine's config surface
(reference: src/compactor_vllm/config/engine_config.py:9-95,
config/sampling_params.py:4-11, compression/compression_config.py:8-44),
re-designed for a TPU/XLA execution model: everything that changes compiled
program shapes (buckets, page size, mesh axes) lives here and is static.
"""

from __future__ import annotations

import enum
import os
from dataclasses import dataclass

__all__ = [
    "AttentionBackend",
    "CompressionMethod",
    "SamplingParams",
    "SequenceCompressionParams",
    "BatchCompressionParams",
    "LLMConfig",
    "RESERVED_SLOT",
]

# Batch slot 0 is reserved as the scatter/padding target for inactive lanes in
# bucketed (padded) programs; kernels and stores treat it as a scratch row.
# (reference: config/constants.py:3 RESERVED_BATCH)
RESERVED_SLOT = 0


class AttentionBackend(enum.Enum):
    """Which attention implementation the engine runs.

    PALLAS is the production TPU kernel path; REFERENCE is the pure-jnp
    dense-gather oracle (always available, used for tests and CPU runs).
    """

    PALLAS = "pallas"
    REFERENCE = "reference"


class CompressionMethod(enum.Enum):
    NONE = "none"
    COMPACTOR = "compactor"
    SNAPKV = "snapkv"


def method_name(method) -> str:
    """Canonical registry name of a compression method (enum member or
    registered string name)."""
    return method.value if isinstance(method, CompressionMethod) else method


def is_none_method(method) -> bool:
    """True when `method` (enum member or registered name) disables
    compression."""
    return method_name(method) == CompressionMethod.NONE.value


@dataclass(frozen=True)
class SamplingParams:
    """Per-sequence sampling parameters (reference: config/sampling_params.py:4-11)."""

    temperature: float = 1.0
    max_new_tokens: int = 64

    def __post_init__(self):
        assert self.temperature >= 0.0, "temperature must be non-negative"
        assert self.max_new_tokens >= 1, "max_new_tokens must be >= 1"


@dataclass(frozen=True)
class SequenceCompressionParams:
    """Per-sequence KV compression knobs.

    compression_ratio is the fraction of (token, head) pairs retained over the
    unprotected span; protected ranges always survive compression.
    (reference: compression/compression_config.py:8-24)
    """

    compression_ratio: float = 1.0
    protected_first_tokens: int = 16
    protected_last_tokens: int = 64
    # Opt-in cap on any single head's retained tokens, as a multiple of the
    # budget-implied per-head average (plus protected spans). The joint
    # (token, head) top-k permits arbitrary per-head skew, which forces
    # admission to reserve pages for the WHOLE prompt per head; with a cap
    # the scheduler reserves only cap + max_new tokens per head — the
    # reclaim-aware admission that makes 128K prompts servable on a 16 GB
    # chip. None preserves the reference's uncapped semantics.
    max_head_retention_factor: float | None = None

    def __post_init__(self):
        assert 0.0 < self.compression_ratio <= 1.0
        assert self.protected_first_tokens >= 0
        assert self.protected_last_tokens >= 0
        if self.max_head_retention_factor is not None:
            assert self.max_head_retention_factor >= 1.0


@dataclass(frozen=True)
class BatchCompressionParams:
    """Per-generate-call compression configuration.

    SnapKV is query-aware over the trailing window and therefore incompatible
    with chunked scoring; it forcibly disables chunking
    (reference: compression/compression_config.py:39-44).
    """

    compression_method: CompressionMethod = CompressionMethod.NONE
    do_chunked_compression: bool = True
    chunk_size: int = 512

    def __post_init__(self):
        if method_name(self.compression_method) == CompressionMethod.SNAPKV.value:
            object.__setattr__(self, "do_chunked_compression", False)
        assert self.chunk_size > 0


@dataclass
class LLMConfig:
    """Engine configuration (reference: config/engine_config.py:15-95).

    TPU-specific additions: page/bucket geometry is static so every program
    shape is known at trace time, and the device mesh is described here
    instead of NCCL ranks.
    """

    model: str = ""
    model_path: str | None = None

    # Batching / lengths.
    max_num_seqs: int = 64
    max_model_len: int = 4096
    max_num_batched_tokens: int = 16384
    # Chunked prefill: prompts longer than max_num_batched_tokens prefill in
    # page-aligned chunks (the attention kernel's phase-1 page walk covers the
    # already-cached prefix). Decouples the batch token budget — and so peak
    # activation memory — from max_model_len. Composes with chunk-local KV
    # compression (Compactor: per-chunk scoring/selection under pro-rated
    # budgets, with pad_retained_to_page); query-aware methods (SnapKV)
    # still require whole-prompt prefill and disable chunking
    # (runner.generate's chunk_ok gate).
    enable_chunked_prefill: bool = False
    # Head-of-line skip aging: how many times the scheduler may admit
    # sequences from behind a prompt whose page reservation does not fit
    # before that prompt becomes a barrier (bounds starvation of long
    # prompts; the reference is strict FCFS, core/scheduler.py:104-105).
    hol_skip_limit: int = 16

    # KV cache geometry.
    kvcache_page_size: int = 64
    num_kv_pages: int | None = None  # per (layer, shard) pool; None => derive from HBM
    hbm_utilization: float = 0.9
    # KV cache element type: "auto" follows `dtype`; "fp8" stores
    # float8_e4m3 — halves KV bandwidth and doubles cache capacity
    # (the TPU analog of the reference's fp8 path,
    # attention/sparse_decode_kernel.py:84,136-161; e4m3's dynamic range
    # covers RMSNorm-scale K/V without per-row scales).
    kv_cache_dtype: str = "auto"
    # Round the decode query through e4m3 before the QK dot — numerics
    # analog of the reference's fp8 q cast next to its fp8 KV
    # (attention/sparse_decode_kernel.py:84,137-139). Accuracy knob on TPU:
    # the decode pipeline is element-rate bound (NOTES.md round 4), so the
    # rounded q is carried in the compute dtype and there is no speed claim.
    fp8_query: bool = False
    # Decode-append strategy: aligned decode blocks turn the per-step cache
    # append into a few wide window writes instead of L*B*H row scatters
    # (kv_cache/state.py store_decode_blocks). Auto-falls-back per batch when
    # a sequence's retained lengths are not page-aligned (requires
    # pad_retained_to_page) or the pool is too fragmented for aligned runs.
    # DEFAULT OFF: measured on chip (round 4), XLA realizes the strided
    # [H, 2D]-window scatter by transposing the ENTIRE pages buffer — a
    # pool-sized temp copy per decode loop (OOM at the 8 GB bench pool) that
    # no formulation of the view avoids (benchmarks/mb_scatter_mem.py). The
    # allocator machinery stays for the deferred-flush append design.
    decode_block_append: bool = False
    # Deferred decode append: the fused decode loop accumulates its steps'
    # K/V in a recent-window buffer that attention reads as an extra operand,
    # and flushes the whole window to the paged cache once per loop with
    # F-aligned contiguous-window scatters (kv_cache/state.py
    # flush_decode_window) — replacing n_steps row scatters. Ignored when
    # decode_block_append engages. Reference appends per token in-kernel
    # (store_kv_cache.py:374-466).
    # DEFAULT OFF: the engine-level fused-loop A/B (round 5,
    # benchmarks/mb_decode_loop_time.py) measured the window variant 3-10%
    # SLOWER per decode step than in-loop row scatters (60.4 vs 58.8 ms at
    # B=64/ctx2048/fp8; 17.3 vs 16.1 at B=32/ctx2048; 27.2 vs 24.6 at
    # B=64/ctx1024) — inside the compiled loop XLA overlaps the row scatter
    # with compute, while the window's extra attention operand + the
    # recent-buffer carry cost more than the scatter they avoid. The
    # standalone microbench that motivated the design (2.95 ms/step,
    # bench_decode_parts) measured the scatter WITHOUT that overlap. Both
    # paths are token-identical and tested; the window stays selectable for
    # parts/shapes where scatter lowering is worse.
    decode_window_append: bool = False
    # GEMM weight storage: "auto" keeps the checkpoint dtype; "int8" applies
    # per-output-channel weight-only quantization at engine init
    # (layers/quant.py) — halves the weight bytes every decode step streams.
    # "w8a8" additionally quantizes activations per-token and runs native
    # int8 x int8 dots with int32 accumulation (the MXU's 2x int8 rate; TPU
    # analog of the reference's vendored low-precision matmuls,
    # triton_kernels/numerics_details/flexpoint.py). MoE expert stacks stay
    # bf16 in both modes; embed/lm_head are weight-only in both.
    weight_dtype: str = "auto"

    # Compression.
    leverage_sketch_size: int = 48
    # Pad-to-page top-up: round each head's retained count up to a page
    # multiple with its next-best-scored tokens — the last page is allocated
    # either way, so the extra retained KV is (near-)free capacity
    # (reference: kv_cache/store_kv_cache.py:178-248).
    pad_retained_to_page: bool = True

    # Parallelism: tensor-parallel size over the ICI mesh `tp` axis.
    tensor_parallel_size: int = 1
    # Data-parallel replicas (engine-level; each replica runs the full model).
    data_parallel_size: int = 1

    # Execution.
    attention_backend: AttentionBackend = AttentionBackend.PALLAS
    dtype: str = "bfloat16"
    eos: int = -1
    seed: int = 0

    # Shape bucketing for compiled steps (replaces CUDA graph capture,
    # reference: core/model_runner.py:493-545). Token buckets bound padded
    # prefill sizes; batch buckets bound padded decode batch sizes.
    prefill_token_buckets: tuple[int, ...] = ()
    decode_batch_buckets: tuple[int, ...] = ()
    # Decode iterations fused into one compiled dispatch with in-device
    # termination masking (the reference's CUDA-graph decode loop analog,
    # core/model_runner.py:391-491).
    decode_loop_steps: int = 32

    # Persistent XLA compilation cache — the analog of the reference's Triton
    # autotune disk cache (attention/sparse_varlen_kernel.py cache_results +
    # compile_kernels.py AOT CLI). None disables; "" uses the default path.
    compilation_cache_dir: str | None = ""

    def __post_init__(self):
        assert self.max_num_seqs >= 1
        assert self.kvcache_page_size >= 8 and (
            self.kvcache_page_size & (self.kvcache_page_size - 1) == 0
        ), "page size must be a power of two >= 8"
        assert 1 <= self.tensor_parallel_size <= 64
        assert 0.0 < self.hbm_utilization <= 1.0
        if self.weight_dtype not in ("auto", "int8", "w8a8"):
            raise ValueError(
                f"weight_dtype must be 'auto', 'int8', or 'w8a8', got "
                f"{self.weight_dtype!r}"
            )
        if not self.enable_chunked_prefill:
            # Without chunked prefill a whole prompt must fit one batch.
            self.max_num_batched_tokens = max(
                self.max_num_batched_tokens, self.max_model_len
            )
        else:
            # Chunks are 8-page aligned (store-group granularity).
            assert self.max_num_batched_tokens >= 8 * self.kvcache_page_size
        if not self.prefill_token_buckets:
            buckets = []
            b = 256
            while b < self.max_num_batched_tokens:
                buckets.append(b)
                b *= 2
            buckets.append(self.max_num_batched_tokens)
            self.prefill_token_buckets = tuple(buckets)
        # Buckets define prefill token capacity: without chunked prefill they
        # must cover a whole prompt, and the batch budget must never exceed
        # the largest bucket.
        if (
            not self.enable_chunked_prefill
            and self.prefill_token_buckets[-1] < self.max_model_len
        ):
            self.prefill_token_buckets = self.prefill_token_buckets + (self.max_model_len,)
        self.max_num_batched_tokens = min(
            self.max_num_batched_tokens, self.prefill_token_buckets[-1]
        )
        if not self.decode_batch_buckets:
            buckets = []
            b = 8
            while b < self.max_num_seqs:
                buckets.append(b)
                b *= 2
            buckets.append(self.max_num_seqs)
            self.decode_batch_buckets = tuple(buckets)
        if self.model and self.model_path is None:
            self.model_path = self.model if os.path.isdir(self.model) else None

    @property
    def max_pages_per_head(self) -> int:
        return cdiv(self.max_model_len, self.kvcache_page_size)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
