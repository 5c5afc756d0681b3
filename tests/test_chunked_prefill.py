"""Chunked prefill: prompts longer than max_num_batched_tokens prefill in
page-aligned chunks through the attention kernels' cached-prefix phase, with
greedy tokens exactly matching a single-shot engine (VERDICT round-2 item 9).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactor_vllm_tpu.config import (
    AttentionBackend,
    BatchCompressionParams,
    CompressionMethod,
    LLMConfig,
    SamplingParams,
)
from compactor_vllm_tpu.core.engine import LLMEngine
from compactor_vllm_tpu.models.transformer import ModelSpec, init_params
from compactor_vllm_tpu.utils.sequence import Sequence


def small_spec():
    return ModelSpec(
        model_type="llama", num_layers=2, num_q_heads=4, num_kv_heads=2,
        head_dim=16, hidden_size=64, intermediate_size=128, vocab_size=128,
    )


def make_engine(spec, params, backend, chunked, budget):
    cfg = LLMConfig(
        max_num_seqs=4,
        max_model_len=256,
        max_num_batched_tokens=budget,
        kvcache_page_size=8,
        num_kv_pages=256,
        attention_backend=backend,
        enable_chunked_prefill=chunked,
        dtype="float32",
        eos=-2,
        seed=3,
    )
    return LLMEngine(cfg, spec=spec, params=params, tokenizer=None)


def prompts(lens, vocab, seed=9, cp=None):
    from compactor_vllm_tpu.config import SequenceCompressionParams

    rng = np.random.default_rng(seed)
    return [
        Sequence(
            prompt_token_ids=rng.integers(0, vocab, size=L).tolist(),
            sampling_params=SamplingParams(temperature=0.0, max_new_tokens=6),
            compression_params=cp or SequenceCompressionParams(),
        )
        for L in lens
    ]


@pytest.mark.parametrize(
    "backend", [AttentionBackend.PALLAS, AttentionBackend.REFERENCE]
)
def test_chunked_prefill_matches_single_shot(backend):
    spec = small_spec()
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    lens = [150, 40, 97]  # 150 and 97 must chunk under a 64-token budget
    ref = make_engine(
        spec, params, backend, chunked=False, budget=1024
    ).generate_from_sequences(prompts(lens, spec.vocab_size))
    got = make_engine(
        spec, params, backend, chunked=True, budget=64
    ).generate_from_sequences(prompts(lens, spec.vocab_size))
    for a, b in zip(ref, got):
        assert a.completion_token_ids == b.completion_token_ids


def test_chunked_prefill_rejects_non_chunk_local_method():
    """SnapKV is query-aware (needs the prompt-tail window) — chunked prefill
    must refuse over-budget prompts for it; Compactor (chunk-local) streams
    them (tests below)."""
    spec = small_spec()
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = make_engine(
        spec, params, AttentionBackend.REFERENCE, chunked=True, budget=64
    )
    with pytest.raises(ValueError, match="whole-prompt"):
        eng.generate_from_sequences(
            prompts([150], spec.vocab_size),
            BatchCompressionParams(
                compression_method=CompressionMethod.SNAPKV, chunk_size=16
            ),
        )


@pytest.mark.parametrize(
    "backend", [AttentionBackend.PALLAS, AttentionBackend.REFERENCE]
)
def test_chunked_compressed_ratio1_matches_single_shot(backend):
    """Compactor + chunked prefill at ratio 1.0: selection retains every
    (token, head) pair, so chunked-compressed greedy tokens must exactly
    match the single-shot compressed run AND the plain uncompressed run
    (VERDICT round-2 #6 'Done' criterion)."""
    from compactor_vllm_tpu.config import SequenceCompressionParams

    spec = small_spec()
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    lens = [150, 40, 97]
    # Protection zeroed: protected pairs consume the single-shot budget
    # (reference arguments.py:109-122) but ride ON TOP of the per-chunk
    # budget (Sequence.chunk_retain_budget — deliberate deviation so a
    # fully-protected final chunk is never truncated), so exact parity
    # holds only for pure ratio-1.0 retention.
    cp = SequenceCompressionParams(
        compression_ratio=1.0, protected_first_tokens=0,
        protected_last_tokens=0,
    )
    bp = BatchCompressionParams(
        compression_method=CompressionMethod.COMPACTOR, chunk_size=16
    )
    ref = make_engine(
        spec, params, backend, chunked=False, budget=1024
    ).generate_from_sequences(prompts(lens, spec.vocab_size, cp=cp), bp)
    plain = make_engine(
        spec, params, backend, chunked=False, budget=1024
    ).generate_from_sequences(prompts(lens, spec.vocab_size))
    got = make_engine(
        spec, params, backend, chunked=True, budget=64
    ).generate_from_sequences(prompts(lens, spec.vocab_size, cp=cp), bp)
    for a, b, c in zip(ref, got, plain):
        assert a.completion_token_ids == b.completion_token_ids
        assert a.completion_token_ids == c.completion_token_ids


def test_chunked_compressed_pages_align_and_reclaim():
    """Compactor + chunked prefill at ratio 0.5: non-final chunks leave every
    head's retained count page-aligned (pad-to-page), generation completes,
    and every page is eventually freed."""
    from compactor_vllm_tpu.config import SequenceCompressionParams

    spec = small_spec()
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = make_engine(
        spec, params, AttentionBackend.PALLAS, chunked=True, budget=64
    )
    page = eng.runner.cfg.kvcache_page_size
    free_before = eng.runner.alloc.min_free_pages()
    runner = eng.runner
    orig = runner.run_prefill
    snapshots = []

    def capture(seqs_, bp_):
        out = orig(seqs_, bp_)
        for s in seqs_:
            slot = runner.alloc.slot_of_seq[s.seq_id]
            snapshots.append(
                (s.num_prefilled_tokens < s.num_prompt_tokens,
                 np.asarray(runner.cache.bh_lens[:, slot]))
            )
        return out
    runner.run_prefill = capture

    cp = SequenceCompressionParams(
        compression_ratio=0.5, protected_first_tokens=4,
        protected_last_tokens=8,
    )
    lens = [150, 97]
    bp = BatchCompressionParams(
        compression_method=CompressionMethod.COMPACTOR, chunk_size=16
    )
    outs = eng.generate_from_sequences(prompts(lens, spec.vocab_size, cp=cp), bp)
    assert any(mid for mid, _ in snapshots), "no mid-prompt chunk captured"
    for mid, lens_arr in snapshots:
        if mid:  # non-final chunk: per-head counts are page multiples
            assert (lens_arr % page == 0).all(), lens_arr
    for o, L in zip(outs, lens):
        assert len(o.completion_token_ids) == 6
        # compression really dropped pairs
        assert o.seq.max_head_len < L
    assert eng.runner.alloc.min_free_pages() == free_before
    eng.runner.alloc.check_invariants()


def test_chunked_prefill_under_dp2_matches_single_shot():
    """Chunked prefill composed with engine-level data parallelism: each dp
    group chunks its own long prompts independently; greedy tokens match the
    dp=1 single-shot engine."""
    spec = small_spec()
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    lens = [150, 40, 97, 130]
    ref = make_engine(
        spec, params, AttentionBackend.REFERENCE, chunked=False, budget=1024
    ).generate_from_sequences(prompts(lens, spec.vocab_size))

    cfg = LLMConfig(
        max_num_seqs=4,
        max_model_len=256,
        max_num_batched_tokens=64,
        kvcache_page_size=8,
        num_kv_pages=256,
        attention_backend=AttentionBackend.REFERENCE,
        enable_chunked_prefill=True,
        data_parallel_size=2,
        dtype="float32",
        eos=-2,
        seed=3,
    )
    eng = LLMEngine(cfg, spec=spec, params=params, tokenizer=None)
    got = eng.generate_from_sequences(prompts(lens, spec.vocab_size))
    for a, b in zip(ref, got):
        assert a.completion_token_ids == b.completion_token_ids


def test_chunked_compressed_decode_uses_blocks_and_matches_fallback():
    """After a chunked compressed prefill (pad-to-page keeps every head
    page-aligned), the final-chunk reclaim installs decode blocks; greedy
    tokens must match the row-scatter fallback exactly."""
    from compactor_vllm_tpu.config import SequenceCompressionParams

    spec = small_spec()
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    lens = [150, 97]
    cp = SequenceCompressionParams(
        compression_ratio=0.5, protected_first_tokens=2,
        protected_last_tokens=4,
    )
    bp = BatchCompressionParams(
        compression_method=CompressionMethod.COMPACTOR, chunk_size=16
    )
    eng = make_engine(spec, params, "pallas", chunked=True, budget=64)
    # Block append defaults off; opt in so the install path is exercised.
    eng.cfg.decode_block_append = True
    installed = []
    orig = eng.runner.alloc.alloc_decode_blocks_batch

    def spy(reqs):
        outs = orig(reqs)
        installed.extend(1 for o in outs if o is not None)
        return outs

    eng.runner.alloc.alloc_decode_blocks_batch = spy
    got = eng.generate_from_sequences(prompts(lens, spec.vocab_size, cp=cp), bp)
    assert installed, "chunked compressed prefill never installed decode blocks"

    ref_eng = make_engine(spec, params, "pallas", chunked=True, budget=64)
    ref_eng.cfg.decode_block_append = False
    ref = ref_eng.generate_from_sequences(
        prompts(lens, spec.vocab_size, cp=cp), bp
    )
    for a, b in zip(got, ref):
        assert a.completion_token_ids == b.completion_token_ids
    eng.runner.alloc.check_invariants()
