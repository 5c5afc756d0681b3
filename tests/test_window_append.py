"""Deferred-window decode append: flush_decode_window unit parity against a
row-by-row oracle, and engine-level greedy parity vs the row-scatter
fallback (uncompressed + compressed, partial windows, multi-loop runs).

The window append replaces per-step decode row scatters with one
contiguous-window flush per fused decode loop (reference appends per token
in-kernel: kv_cache/store_kv_cache.py:374-466).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactor_vllm_tpu.config import (
    BatchCompressionParams,
    CompressionMethod,
    LLMConfig,
    SamplingParams,
    SequenceCompressionParams,
)
from compactor_vllm_tpu.core.engine import LLMEngine
from compactor_vllm_tpu.kv_cache.allocator import PageAllocator
from compactor_vllm_tpu.kv_cache.state import (
    KVCacheGeometry,
    flush_decode_window,
    init_kv_cache,
)
from compactor_vllm_tpu.models.transformer import ModelSpec, init_params
from compactor_vllm_tpu.utils.sequence import Sequence


# --------------------------------------------------------------- unit level


@pytest.mark.parametrize("W,page", [(8, 8), (16, 8), (4, 16), (32, 8)])
def test_flush_matches_row_oracle(W, page):
    """Ragged, misaligned per-(l, h) base lens; ragged per-lane appends."""
    L, Bd, H, D, maxp = 3, 4, 2, 8, 12
    rng = np.random.default_rng(0)
    geom = KVCacheGeometry(
        num_layers=L, num_pages=96, page_size=page, num_kv_heads=H,
        head_dim=D, num_slots=6, max_pages_per_head=maxp,
    )
    alloc = PageAllocator(
        num_layers=L, num_shards=1, pages_per_shard=96, num_kv_heads=H,
        max_pages_per_head=maxp, num_slots=6, page_size=page,
    )
    slots = []
    for sid in range(Bd):
        slots.append(alloc.alloc_slot(sid))
        alloc.reserve(sid, maxp * page)
    slots = np.array(slots, np.int32)
    state = init_kv_cache(geom, jnp.float32)
    state = state._replace(
        page_table=jnp.asarray(alloc.page_table),
        kv_pages=jnp.asarray(
            rng.standard_normal(state.kv_pages.shape), jnp.float32
        ),
    )
    # Misaligned ragged bases (different per layer AND head), bounded so
    # base + W fits the reservation.
    lens0 = rng.integers(0, maxp * page - W, size=(L, Bd, H)).astype(np.int32)
    appended = np.array([W, W // 2, 0, 1][:Bd], np.int32)
    valid = np.array([True, True, True, False][:Bd])
    recent = rng.standard_normal((L, Bd, H, W, 2 * D)).astype(np.float32)
    B = geom.num_slots
    bh_lens = np.zeros((L, B, H), np.int32)
    bh_lens[:, slots] = lens0
    state = state._replace(bh_lens=jnp.asarray(bh_lens))
    pt_sel = state.page_table[:, slots]

    out = flush_decode_window(
        geom, state, jnp.asarray(recent), jnp.asarray(lens0),
        jnp.asarray(appended), jnp.asarray(slots), jnp.asarray(valid),
        pt_sel,
    )
    # Oracle: write each appended row individually through the page table.
    exp = np.array(state.kv_pages)
    pt = np.array(alloc.page_table)
    for l in range(L):
        for b in range(Bd):
            if not valid[b]:
                continue
            for h in range(H):
                for t in range(int(appended[b])):
                    pos = int(lens0[l, b, h]) + t
                    row = (
                        l * geom.rows_per_layer
                        + int(pt[l, slots[b], h, pos // page]) * page
                        + pos % page
                    )
                    exp[row] = recent[l, b, h, t]
    got = np.array(out.kv_pages)
    # Only check rows covered by bh_lens (tail rows may carry window
    # garbage by design).
    np.testing.assert_allclose(got[: geom.num_rows][
        _covered_rows(geom, pt, slots, lens0, appended, valid)
    ], exp[: geom.num_rows][
        _covered_rows(geom, pt, slots, lens0, appended, valid)
    ])
    # Lengths advanced by the per-lane appends on valid lanes only.
    new_lens = np.array(out.bh_lens)
    for b in range(Bd):
        expect = lens0[:, b] + (int(appended[b]) if valid[b] else 0)
        np.testing.assert_array_equal(new_lens[:, slots[b]], expect)


def _covered_rows(geom, pt, slots, lens0, appended, valid):
    """Boolean row mask of every (l, b, h) prefix within bh_lens."""
    L, Bd, H = lens0.shape
    page = geom.page_size
    mask = np.zeros(geom.num_rows, bool)
    for l in range(L):
        for b in range(Bd):
            n = int(appended[b]) if valid[b] else 0
            for h in range(H):
                for pos in range(int(lens0[l, b, h]) + n):
                    row = (
                        l * geom.rows_per_layer
                        + int(pt[l, slots[b], h, pos // page]) * page
                        + pos % page
                    )
                    mask[row] = True
    return mask


# ------------------------------------------------------------- engine level


def small_spec():
    return ModelSpec(
        model_type="llama", num_layers=2, num_q_heads=4, num_kv_heads=2,
        head_dim=16, hidden_size=64, intermediate_size=128, vocab_size=256,
        rope_theta=10000.0,
    )


def make_engine(spec, params, window, **kw):
    cfg = LLMConfig(
        max_num_seqs=4, max_model_len=128, kvcache_page_size=8,
        num_kv_pages=256, dtype="float32", eos=-2, seed=11,
        decode_batch_buckets=(4,), decode_window_append=window, **kw,
    )
    eng = LLMEngine(cfg, spec=spec, params=params, tokenizer=None)
    return eng


def prompts(lens, vocab, max_new, cp=None, seed=5):
    rng = np.random.default_rng(seed)
    kw = {} if cp is None else {"compression_params": cp}
    return [
        Sequence(
            prompt_token_ids=rng.integers(0, vocab, size=L).tolist(),
            sampling_params=SamplingParams(
                temperature=0.0,
                max_new_tokens=mn,
            ),
            **kw,
        )
        for L, mn in zip(lens, max_new)
    ]


def test_engine_window_matches_row_scatter_uncompressed():
    """Odd prompt lengths (misaligned bases -> seed path), ragged max_new
    (partial windows), > decode_loop_steps generations (multi-loop)."""
    spec = small_spec()
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    lens, max_new = [13, 29, 5], [40, 7, 3]
    ref = make_engine(spec, params, window=False).generate_from_sequences(
        prompts(lens, spec.vocab_size, max_new)
    )
    got = make_engine(spec, params, window=True).generate_from_sequences(
        prompts(lens, spec.vocab_size, max_new)
    )
    for a, b in zip(ref, got):
        assert a.completion_token_ids == b.completion_token_ids
    assert any(len(o.completion_token_ids) == 40 for o in got)


def test_engine_window_matches_row_scatter_compressed():
    spec = small_spec()
    params = init_params(spec, jax.random.PRNGKey(1), dtype=jnp.float32)
    cp = SequenceCompressionParams(
        compression_ratio=0.5, protected_first_tokens=2,
        protected_last_tokens=4,
    )
    bp = BatchCompressionParams(
        compression_method=CompressionMethod.COMPACTOR, chunk_size=16
    )
    lens, max_new = [64, 33], [20, 6]
    ref = make_engine(spec, params, window=False).generate_from_sequences(
        prompts(lens, spec.vocab_size, max_new, cp=cp), bp
    )
    got = make_engine(spec, params, window=True).generate_from_sequences(
        prompts(lens, spec.vocab_size, max_new, cp=cp), bp
    )
    for a, b in zip(ref, got):
        assert a.completion_token_ids == b.completion_token_ids


def test_engine_window_reference_backend():
    from compactor_vllm_tpu.config import AttentionBackend

    spec = small_spec()
    params = init_params(spec, jax.random.PRNGKey(2), dtype=jnp.float32)
    lens, max_new = [9, 21], [12, 12]
    outs = []
    for window in (False, True):
        eng = make_engine(
            spec, params, window=window,
            attention_backend=AttentionBackend.REFERENCE,
        )
        outs.append(eng.generate_from_sequences(
            prompts(lens, spec.vocab_size, max_new)
        ))
    for a, b in zip(*outs):
        assert a.completion_token_ids == b.completion_token_ids
