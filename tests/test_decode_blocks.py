"""Decode-block append path: aligned block allocation (PageAllocator.
alloc_decode_blocks), the window-scatter store (store_decode_blocks), and
engine-level greedy parity with the row-scatter fallback.

The decode-block design replaces the reference's per-(b,h) in-kernel append
(kv_cache/store_kv_cache.py:374-466): when compressed retained lengths are
page-aligned (pad_retained_to_page), every head of a slot appends at the
same in-block offset, so one step's L*Bd*H row scatters collapse to L*Bd
[H, 2D] window writes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from compactor_vllm_tpu.kv_cache.allocator import PageAllocator
from compactor_vllm_tpu.kv_cache.state import (
    KVCacheGeometry,
    init_kv_cache,
    store_decode_all_layers,
    store_decode_blocks,
)


def make_alloc(L=2, S=1, P=64, H=4, maxp=8, slots=4, page=8):
    return PageAllocator(
        num_layers=L, num_shards=S, pages_per_shard=P, num_kv_heads=H,
        max_pages_per_head=maxp, num_slots=slots, page_size=page,
    )


def test_alloc_decode_blocks_installs_aligned_runs():
    a = make_alloc()
    hs = a.heads_per_shard
    a.alloc_slot(7)
    # Page-aligned retained lens: head h keeps (h+1) pages worth of tokens.
    lens = np.tile((np.arange(a.H) + 1)[None, :] * a.page_size, (a.L, 1))
    a.grow_per_head(7, lens)
    start_cols = lens // a.page_size
    free_before = a.free_count.copy()
    blocks = a.alloc_decode_blocks(7, 2, start_cols.astype(np.int64))
    assert blocks is not None and blocks.shape == (a.L, a.S, 2)
    # Every block's first page is hs-aligned and its hs pages left the pool.
    assert (blocks % hs == 0).all()
    assert (a.free_count == free_before - 2 * hs).all()
    for l in range(a.L):
        for h in range(a.H):
            cols = start_cols[l, h] + np.arange(2)
            expect = blocks[l, h // hs] + h % hs
            assert (a.page_table[l, a.slot_of_seq[7], h, cols] == expect).all()
            assert a.num_pages[l, a.slot_of_seq[7], h] == start_cols[l, h] + 2
    a.check_invariants()
    # Release returns every page (blocks are ordinary page-table entries).
    a.release_slot(7)
    assert (a.free_count == a.P).all()
    assert 7 not in a.decode_blocks
    a.check_invariants()


def test_alloc_decode_blocks_fragmented_returns_none():
    a = make_alloc(P=8)  # 2 aligned groups of hs=4 pages per (layer, shard)
    a.alloc_slot(1)
    # Occupy one page out of each aligned group in layer 0: head 0 grows by
    # 2 pages -> pops ids 7, 6 (LIFO top) ... need ids from BOTH groups.
    # LIFO pops high ids first: pages 7 and 6 are both in group 1; grow by 5
    # pages to cross into group 0 (ids 7,6,5,4,3).
    lens = np.zeros((a.L, a.H), np.int64)
    lens[0, 0] = 5 * a.page_size
    a.grow_per_head(1, lens)
    st = a.free_count.copy()
    blocks = a.alloc_decode_blocks(1, 1, (lens // a.page_size))
    assert blocks is None  # layer 0 has no fully-free aligned group left
    assert (a.free_count == st).all()  # no mutation on failure
    a.check_invariants()


def test_alloc_decode_blocks_rejects_overflow():
    a = make_alloc(maxp=4)
    a.alloc_slot(2)
    start = np.full((a.L, a.H), 3, np.int64)
    assert a.alloc_decode_blocks(2, 2, start) is None  # 3 + 2 > maxp


def test_store_decode_blocks_matches_row_scatter():
    """The window scatter writes byte-identical rows to the row scatter when
    the page table maps head h of block j to page p0 + h."""
    L, H, D, page, P = 2, 4, 16, 8, 32
    geom = KVCacheGeometry(
        num_layers=L, num_pages=P, page_size=page, num_kv_heads=H,
        head_dim=D, num_slots=4, max_pages_per_head=4, trash_pages=H,
    )
    assert geom.blocks_aligned
    rng = np.random.default_rng(0)
    Bd = 3
    slots = jnp.asarray([1, 2, 3], jnp.int32)
    valid = jnp.asarray([True, True, False])
    # Each live slot gets one decode block per layer (aligned run of H pages).
    p0 = np.array([[0, 8, 16], [8, 0, 16]], np.int32)  # [L, Bd]
    pt = np.zeros((L, 4, H, 4), np.int32)
    lens = np.zeros((L, 4, H), np.int32)
    for l in range(L):
        for i, s in enumerate([1, 2, 3]):
            pt[l, s, :, 0] = p0[l, i] + np.arange(H)
    state = init_kv_cache(geom, dtype=jnp.float32)._replace(
        page_table=jnp.asarray(pt), bh_lens=jnp.asarray(lens)
    )
    k = jnp.asarray(rng.normal(size=(L, Bd, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(L, Bd, H, D)), jnp.float32)

    ref = store_decode_all_layers(geom, state, k, v, slots, valid)
    vblk = jnp.asarray(
        p0 // H + np.arange(L, dtype=np.int32)[:, None] * (P // H)
    )
    out = store_decode_blocks(
        geom, state, k, v, slots, valid, vblk,
        jnp.zeros((Bd,), jnp.int32), state.bh_lens[:, slots],
    )
    np.testing.assert_array_equal(np.asarray(ref.kv_pages), np.asarray(out.kv_pages))
    np.testing.assert_array_equal(np.asarray(ref.bh_lens), np.asarray(out.bh_lens))

    # Second token: offset 1 within the block.
    ref2 = store_decode_all_layers(geom, ref, v, k, slots, valid)
    out2 = store_decode_blocks(
        geom, out, v, k, slots, valid, vblk,
        jnp.ones((Bd,), jnp.int32), out.bh_lens[:, slots],
    )
    np.testing.assert_array_equal(np.asarray(ref2.kv_pages), np.asarray(out2.kv_pages))


def test_engine_block_alloc_failure_falls_back_cleanly():
    """When alloc_decode_blocks declines (fragmentation), the engine must
    restore per-head headroom AND refresh the device table (the re-grown
    pages may be distributed differently than the rows the table held)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from tests.test_engine_e2e import make_engine
    from compactor_vllm_tpu import (
        BatchCompressionParams, CompressionMethod, SamplingParams, Sequence,
        SequenceCompressionParams,
    )

    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False, torch_dtype=torch.float32,
    )
    hf = transformers.AutoModelForCausalLM.from_config(cfg)
    hf.eval()
    rng = np.random.default_rng(9)
    prompt = rng.integers(1, 128, size=40).tolist()

    def gen(engine):
        seqs = [Sequence(
            prompt,
            sampling_params=SamplingParams(0.0, 8),
            compression_params=SequenceCompressionParams(
                compression_ratio=0.5, protected_first_tokens=2,
                protected_last_tokens=4,
            ),
        )]
        bp = BatchCompressionParams(
            compression_method=CompressionMethod.COMPACTOR, chunk_size=16
        )
        return engine.generate_from_sequences(seqs, batch_compression=bp)

    engine = make_engine((cfg, hf), decode_block_append=True)
    engine.runner.alloc.alloc_decode_blocks_batch = (
        lambda reqs: [None] * len(reqs)
    )
    outs = gen(engine)
    engine.runner.alloc.check_invariants()

    ref_engine = make_engine((cfg, hf), decode_block_append=False)
    ref = gen(ref_engine)
    assert outs[0].completion_token_ids == ref[0].completion_token_ids


@pytest.mark.parametrize("block_append", [True, False])
def test_engine_block_append_greedy_parity(block_append):
    """Compressed generate with pad_retained_to_page installs decode blocks;
    tokens must match the row-scatter fallback exactly."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from tests.test_engine_e2e import make_engine, tiny_model  # noqa: F401
    from compactor_vllm_tpu import (
        BatchCompressionParams, CompressionMethod, SamplingParams, Sequence,
        SequenceCompressionParams,
    )

    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False, torch_dtype=torch.float32,
    )
    hf = transformers.AutoModelForCausalLM.from_config(cfg)
    hf.eval()
    engine = make_engine((cfg, hf), decode_block_append=block_append)

    calls = {"installed": 0}
    orig = engine.runner.alloc.alloc_decode_blocks_batch

    def spy(reqs):
        outs = orig(reqs)
        calls["installed"] += sum(1 for o in outs if o is not None)
        return outs

    engine.runner.alloc.alloc_decode_blocks_batch = spy

    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (40, 33)]
    seqs = [
        Sequence(
            p,
            sampling_params=SamplingParams(temperature=0.0, max_new_tokens=10),
            compression_params=SequenceCompressionParams(
                compression_ratio=0.5, protected_first_tokens=2,
                protected_last_tokens=4,
            ),
        )
        for p in prompts
    ]
    bp = BatchCompressionParams(
        compression_method=CompressionMethod.COMPACTOR, chunk_size=16
    )
    outs = engine.generate_from_sequences(seqs, batch_compression=bp)
    if block_append:
        assert calls["installed"] >= 1, "block path never engaged"
    else:
        assert calls["installed"] == 0
    toks = [o.completion_token_ids for o in outs]

    # Reference: same engine with the opposite setting produces the same
    # greedy tokens (store layout differs; attention is layout-invariant).
    engine2 = make_engine((cfg, hf), decode_block_append=not block_append)
    seqs2 = [
        Sequence(
            p,
            sampling_params=SamplingParams(temperature=0.0, max_new_tokens=10),
            compression_params=SequenceCompressionParams(
                compression_ratio=0.5, protected_first_tokens=2,
                protected_last_tokens=4,
            ),
        )
        for p in prompts
    ]
    outs2 = engine2.generate_from_sequences(seqs2, batch_compression=bp)
    assert toks == [o.completion_token_ids for o in outs2]
    engine.runner.alloc.check_invariants()


def test_uncompressed_page_aligned_prompt_uses_blocks():
    """Uncompressed sequences with page-aligned prompts also enter decode
    through blocks (lens are uniform and known host-side); tokens match HF
    and the row-scatter fallback."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from tests.test_engine_e2e import make_engine, hf_greedy
    from compactor_vllm_tpu import SamplingParams, Sequence

    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False, torch_dtype=torch.float32,
    )
    hf = transformers.AutoModelForCausalLM.from_config(cfg)
    hf.eval()
    # Opt-in: decode_block_append defaults OFF since round 4 (the window
    # scatter forces a pool-sized XLA transpose copy; see config.py).
    engine = make_engine((cfg, hf), decode_block_append=True)
    installed = []
    orig = engine.runner.alloc.alloc_decode_blocks_batch

    def spy(reqs):
        outs = orig(reqs)
        installed.extend(1 for o in outs if o is not None)
        return outs

    engine.runner.alloc.alloc_decode_blocks_batch = spy
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, 128, size=n).tolist() for n in (24, 40)]
    seqs = [
        Sequence(p, sampling_params=SamplingParams(0.0, 8)) for p in prompts
    ]
    outs = engine.generate_from_sequences(seqs)
    assert installed, "uncompressed aligned prompts never installed blocks"
    for p, o in zip(prompts, outs):
        assert o.completion_token_ids == hf_greedy(hf, p, 8)
    engine.runner.alloc.check_invariants()
    assert engine.runner.alloc.num_free_slots == engine.cfg.max_num_seqs
