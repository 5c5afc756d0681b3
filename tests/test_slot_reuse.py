"""Slot-reuse regression: compressed prefill over a REUSED slot (stale
device bh_lens from the previous occupant) must behave exactly like a fresh
slot.

Round-3/4 post-mortem (NOTES.md round 5): the compressed path read cached_ph
from device bh_lens unmasked; a released-and-reused slot's stale lens pushed
the fused compact store's destination pages past max_pages_per_head — OOB
page-table reads feeding wild DMAs, the 16K-bench 'TPU backend error
(Internal)'. On CPU the same bug silently corrupts lengths instead of
faulting, which this test catches.
"""

import jax
import jax.numpy as jnp
import numpy as np

from compactor_vllm_tpu.config import (
    BatchCompressionParams,
    CompressionMethod,
    LLMConfig,
    SamplingParams,
    SequenceCompressionParams,
)
from compactor_vllm_tpu.core.engine import LLMEngine
from compactor_vllm_tpu.models.transformer import ModelSpec, init_params
from compactor_vllm_tpu.utils.sequence import Sequence


def small_spec():
    return ModelSpec(
        model_type="llama", num_layers=2, num_q_heads=4, num_kv_heads=2,
        head_dim=16, hidden_size=64, intermediate_size=128, vocab_size=256,
        rope_theta=10000.0,
    )


def make_engine(spec, params, max_seqs):
    cfg = LLMConfig(
        max_num_seqs=max_seqs, max_model_len=128, kvcache_page_size=8,
        num_kv_pages=256, dtype="float32", eos=-2, seed=3,
    )
    return LLMEngine(cfg, spec=spec, params=params, tokenizer=None)


def seqs(n, vocab, seed=9):
    rng = np.random.default_rng(seed)
    return [
        Sequence(
            prompt_token_ids=rng.integers(0, vocab, size=48).tolist(),
            sampling_params=SamplingParams(temperature=0.0, max_new_tokens=6),
            compression_params=SequenceCompressionParams(
                compression_ratio=0.5, protected_first_tokens=2,
                protected_last_tokens=4,
            ),
        )
        for _ in range(n)
    ]


def test_compressed_prefill_on_reused_slot_matches_fresh():
    spec = small_spec()
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    bp = BatchCompressionParams(
        compression_method=CompressionMethod.COMPACTOR, chunk_size=16
    )
    # max_num_seqs=2 forces the 3rd/4th request onto RELEASED slots whose
    # device bh_lens still hold the previous occupants' retained lengths.
    eng_reuse = make_engine(spec, params, max_seqs=2)
    got = eng_reuse.generate_from_sequences(seqs(4, spec.vocab_size), bp)
    # Same requests with enough slots that none is reused.
    eng_fresh = make_engine(spec, params, max_seqs=4)
    ref = eng_fresh.generate_from_sequences(seqs(4, spec.vocab_size), bp)
    for a, b in zip(got, ref):
        assert a.completion_token_ids == b.completion_token_ids
    # Retained lengths never exceed the slot's reservation.
    geom = eng_reuse.runner.geom
    lens = np.asarray(eng_reuse.runner.cache.bh_lens)
    assert (lens <= geom.max_pages_per_head * geom.page_size).all()
    eng_reuse.runner.alloc.check_invariants()


def test_direct_runner_reprefill_same_slot():
    """bench_prefill_step-style harness: re-running prefill on the same
    slots (num_prefilled_tokens reset) must not grow the cache."""
    spec = small_spec()
    params = init_params(spec, jax.random.PRNGKey(1), dtype=jnp.float32)
    eng = make_engine(spec, params, max_seqs=2)
    runner = eng.runner
    bp = BatchCompressionParams(
        compression_method=CompressionMethod.COMPACTOR, chunk_size=16
    )
    ss = seqs(2, spec.vocab_size)
    for s in ss:
        runner.allocs[0].alloc_slot(s.seq_id)
        runner.allocs[0].reserve(s.seq_id, 64)
    runner.sync_page_table(
        [type("U", (), {"slot": runner.allocs[0].slot_of_seq[s.seq_id]})()
         for s in ss]
    )
    runner.run_prefill(ss, bp)
    lens1 = np.asarray(runner.cache.bh_lens).copy()
    for s in ss:
        s.num_prefilled_tokens = 0
    runner.run_prefill(ss, bp)
    lens2 = np.asarray(runner.cache.bh_lens)
    np.testing.assert_array_equal(lens1, lens2)
