"""Pallas kernels vs the jnp paged-attention oracle (interpret mode on CPU).

Mirrors the reference kernel-test strategy (tests/test_triton_attention.py:
mock paged cache, dense oracle, atol 3e-3) including the edge cases: empty
cache, single appended token, ragged per-head cache lengths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactor_vllm_tpu.kv_cache.allocator import PageAllocator
from compactor_vllm_tpu.kv_cache.state import (
    KVCacheGeometry,
    init_kv_cache,
    store_decode,
    store_prefill_full,
)
from compactor_vllm_tpu.ops.attention_ref import (
    ref_decode_attention,
    ref_prefill_attention,
)
from compactor_vllm_tpu.ops.pallas_attention import (
    TOKEN_SLACK,
    _row_tile,
    paged_decode_attention,
    paged_prefill_attention,
)

PAGE = 8
GEOM = KVCacheGeometry(
    num_layers=1,
    num_pages=384,
    page_size=PAGE,
    num_kv_heads=4,
    head_dim=128,
    num_slots=5,
    max_pages_per_head=16,
)


def build_cache(rng, seq_lens, cache_lens_per_head, max_new=8, return_alloc=False):
    alloc = PageAllocator(
        num_layers=1, num_shards=1, pages_per_shard=GEOM.num_pages,
        num_kv_heads=GEOM.num_kv_heads, max_pages_per_head=GEOM.max_pages_per_head,
        num_slots=GEOM.num_slots, page_size=PAGE,
    )
    state = init_kv_cache(GEOM, dtype=jnp.float32)
    B = len(seq_lens)
    slots = []
    for i in range(B):
        alloc.alloc_slot(i)
        alloc.reserve(i, int(cache_lens_per_head[i].max()) + seq_lens[i] + max_new)
        slots.append(alloc.slot_of_seq[i])
    state = state._replace(page_table=jnp.asarray(alloc.page_table))
    H, D = GEOM.num_kv_heads, GEOM.head_dim
    max_c = int(cache_lens_per_head.max())
    kc = rng.normal(size=(B, H, max(max_c, 1), D)).astype(np.float32)
    vc = rng.normal(size=(B, H, max(max_c, 1), D)).astype(np.float32)
    if max_c > 0:
        for b in range(B):
            for pos in range(max_c):
                state = store_prefill_full(
                    GEOM, state, 0,
                    jnp.asarray(kc[b : b + 1, :, pos, :]),
                    jnp.asarray(vc[b : b + 1, :, pos, :]),
                    jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32),
                    jnp.ones(1, bool), jnp.asarray([slots[b]], jnp.int32),
                    jnp.full((1, H), pos, jnp.int32), jnp.ones(1, jnp.int32),
                    jnp.ones(1, bool),
                )
        lens = np.zeros((1, GEOM.num_slots, H), np.int32)
        for b in range(B):
            lens[0, slots[b]] = cache_lens_per_head[b]
        state = state._replace(bh_lens=jnp.asarray(lens))
    if return_alloc:
        return state, np.array(slots, np.int32), alloc
    return state, np.array(slots, np.int32)


def packed(rng, seq_lens, HQ, tile, align=8):
    starts = np.zeros(len(seq_lens), np.int32)
    off = 0
    for i, L in enumerate(seq_lens):
        starts[i] = off
        off = -(-(off + L) // align) * align  # aligned packing contract
    Tp = (-(-(off + tile) // tile)) * tile
    H, D = GEOM.num_kv_heads, GEOM.head_dim
    q = rng.normal(size=(Tp, HQ, D)).astype(np.float32)
    kn = rng.normal(size=(Tp, H, D)).astype(np.float32)
    vn = rng.normal(size=(Tp, H, D)).astype(np.float32)
    return Tp, starts, np.array(seq_lens, np.int32), q, kn, vn


@pytest.mark.parametrize(
    "seq_lens,cache_desc,HQ",
    [
        ([17, 33], "ragged", 8),       # GQA G=2, ragged per-head cache
        ([9, 5], "zero", 8),           # empty cache (engine prefill path)
        ([1, 1], "ragged", 4),         # single appended token, MHA
        ([64], "full", 16),            # G=4, page-aligned cache
        ([1], "zero", 8),              # minimal workload
        ([8, 8, 8], "ragged", 8),      # page-size-aligned lengths
        ([100, 3, 57], "ragged", 16),  # mixed lengths, bigger group
        ([90], "full", 32),            # G=8 (tp-sharded MHA shapes)
    ],
)
def test_prefill_kernel_vs_oracle(seq_lens, cache_desc, HQ):
    rng = np.random.default_rng(0)
    B, H = len(seq_lens), GEOM.num_kv_heads
    if cache_desc == "zero":
        cache_lens = np.zeros((B, H), np.int32)
    elif cache_desc == "full":
        cache_lens = np.full((B, H), 16, np.int32)
    else:
        cache_lens = rng.integers(0, 14, size=(B, H)).astype(np.int32)
    state, slots = build_cache(rng, seq_lens, cache_lens)
    G = HQ // H
    TM = _row_tile(G)
    Tp, starts, lens, q, kn, vn = packed(rng, seq_lens, HQ, max(TM, TOKEN_SLACK))
    max_q = (-(-max(seq_lens) // TM)) * TM
    sm = 1.0 / np.sqrt(GEOM.head_dim)

    pt = np.asarray(state.page_table)[0][slots]  # [B, H, maxp]
    got = paged_prefill_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        state.kv_pages, jnp.asarray(pt), jnp.asarray(cache_lens),
        jnp.asarray(starts), jnp.asarray(lens), 0,
        sm_scale=sm, page_size=PAGE, max_q=max_q, interpret=True,
    )
    want = ref_prefill_attention(
        GEOM, state, 0, jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(starts), jnp.asarray(lens), jnp.asarray(slots),
        max_q=max(seq_lens),
        max_cache_len=int(cache_lens.max()) if cache_lens.max() else 0,
        sm_scale=sm,
    )
    got, want = np.asarray(got), np.asarray(want)
    for b, L in enumerate(seq_lens):
        sl = slice(starts[b], starts[b] + L)
        np.testing.assert_allclose(got[sl], want[sl], atol=3e-3, rtol=1e-6)


@pytest.mark.parametrize(
    "seq_lens,HQ",
    [
        ([200, 131], 8),    # G=2, partial final chunks
        ([128, 256], 8),    # exact chunk multiples
        ([300], 4),         # G=1 (TM=256: two chunks per tile)
        ([70, 40, 129], 16),  # G=4 (tile raised to 128 tokens)
    ],
)
def test_prefill_fused_chunk_scores_vs_oracle(seq_lens, HQ):
    """score_chunks=True returns the postrope 128-chunk column mass equal to
    the jnp oracle (chunk_colmass), and leaves attention output unchanged."""
    from compactor_vllm_tpu.compression.chunking import make_chunk_meta_aligned
    from compactor_vllm_tpu.compression.compactor import chunk_colmass

    rng = np.random.default_rng(7)
    B, H = len(seq_lens), GEOM.num_kv_heads
    G = HQ // H
    TM = _row_tile(G, score_chunks=True)
    geom = GEOM._replace(num_pages=1024, max_pages_per_head=64)
    cache_lens = np.zeros((B, H), np.int32)  # engine prefills are fresh
    alloc = PageAllocator(
        num_layers=1, num_shards=1, pages_per_shard=geom.num_pages,
        num_kv_heads=H, max_pages_per_head=geom.max_pages_per_head,
        num_slots=geom.num_slots, page_size=PAGE,
    )
    state = init_kv_cache(geom, dtype=jnp.float32)
    slots = []
    for i, L in enumerate(seq_lens):
        alloc.alloc_slot(i)
        alloc.reserve(i, L + 8)
        slots.append(alloc.slot_of_seq[i])
    state = state._replace(page_table=jnp.asarray(alloc.page_table))
    slots = np.array(slots, np.int32)

    # Chunk-aligned packing (the engine's _start_align contract).
    starts = np.zeros(B, np.int32)
    off = 0
    for i, L in enumerate(seq_lens):
        starts[i] = off
        off = -(-(off + L) // TM) * TM
    Tp = (-(-(off + max(TM, TOKEN_SLACK)) // TM)) * TM
    D = GEOM.head_dim
    q = rng.normal(size=(Tp, HQ, D)).astype(np.float32)
    kn = rng.normal(size=(Tp, H, D)).astype(np.float32)
    vn = rng.normal(size=(Tp, H, D)).astype(np.float32)
    lens = np.array(seq_lens, np.int32)
    max_q = (-(-max(seq_lens) // TM)) * TM
    sm = 1.0 / np.sqrt(D)
    pt = np.asarray(state.page_table)[0][slots]

    o_plain = paged_prefill_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        state.kv_pages, jnp.asarray(pt), jnp.asarray(cache_lens),
        jnp.asarray(starts), jnp.asarray(lens), 0,
        sm_scale=sm, page_size=PAGE, max_q=max_q, interpret=True,
    )
    o_scored, colmass = paged_prefill_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        state.kv_pages, jnp.asarray(pt), jnp.asarray(cache_lens),
        jnp.asarray(starts), jnp.asarray(lens), 0,
        sm_scale=sm, page_size=PAGE, max_q=max_q, score_chunks=True,
        interpret=True,
    )
    # Oracle on the same packed layout.
    seq_idx = np.zeros(Tp, np.int32)
    valid = np.zeros(Tp, bool)
    for b, L in enumerate(seq_lens):
        seq_idx[starts[b]:starts[b] + L] = b
        valid[starts[b]:starts[b] + L] = True
    meta = make_chunk_meta_aligned(jnp.asarray(seq_idx), jnp.asarray(valid), 128)
    want = np.asarray(chunk_colmass(
        jnp.asarray(q), jnp.asarray(kn), meta, 128, 1.0, aligned=True
    ))
    got = np.asarray(colmass)
    for b, L in enumerate(seq_lens):
        sl = slice(starts[b], starts[b] + L)
        np.testing.assert_allclose(got[sl], want[sl], atol=3e-3, rtol=1e-5)
        # Attention output must be identical with and without fused scoring
        # (modulo the tile-size change, which only affects fp reassociation).
        np.testing.assert_allclose(
            np.asarray(o_scored)[sl], np.asarray(o_plain)[sl], atol=3e-3
        )


@pytest.mark.parametrize("HQ", [4, 8, 16])
@pytest.mark.parametrize("use_contig", [False, True])
@pytest.mark.parametrize("pairs", [1, 4])
def test_decode_kernel_vs_oracle(HQ, use_contig, pairs, monkeypatch):
    # Bd*H = 12 divides by 4, so pairs=4 exercises the multi-pair resident
    # kernel and pairs=1 forces the single-pair one — both vs the oracle.
    import compactor_vllm_tpu.ops.pallas_attention as pa

    monkeypatch.setattr(pa, "DECODE_PAIRS_PER_PROGRAM", pairs)
    rng = np.random.default_rng(1)
    B, H, D = 3, GEOM.num_kv_heads, GEOM.head_dim
    # Long enough that 8-page contiguous groups exist (page size 8 -> 64+).
    lo, hi = (70, 100) if use_contig else (1, 30)
    cache_lens = rng.integers(lo, hi, size=(B, H)).astype(np.int32)
    state, slots, alloc = build_cache(rng, [1] * B, cache_lens, return_alloc=True)
    q = rng.normal(size=(B, HQ, D)).astype(np.float32)
    kn = rng.normal(size=(B, H, D)).astype(np.float32)
    vn = rng.normal(size=(B, H, D)).astype(np.float32)
    sm = 1.0 / np.sqrt(D)
    pt = np.asarray(state.page_table)[0][slots]
    lens = np.asarray(state.bh_lens)[0][slots]
    contig = None
    if use_contig:
        contig = np.stack([alloc.contig_groups(s_, 8) for s_ in slots]).astype(np.int32)
        assert contig.any(), "test setup must exercise the run-DMA path"
    got = paged_decode_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        state.kv_pages,
        jnp.asarray(pt), jnp.asarray(lens), 0,
        None if contig is None else jnp.asarray(contig),
        sm_scale=sm, page_size=PAGE, interpret=True,
    )
    want = ref_decode_attention(
        GEOM, state, 0, jnp.asarray(q), jnp.asarray(slots),
        max_cache_len=int(cache_lens.max()), sm_scale=sm,
        k_new=jnp.asarray(kn), v_new=jnp.asarray(vn),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-3, rtol=1e-6)


def test_decode_kernel_empty_cache_attends_self_only():
    """A lane with an empty cached prefix attends only to its own (self)
    K/V: the output is exactly v_new."""
    rng = np.random.default_rng(2)
    B, H, D = 2, GEOM.num_kv_heads, GEOM.head_dim
    cache_lens = np.array([[4, 4, 4, 4], [0, 0, 0, 0]], np.int32)
    state, slots = build_cache(rng, [1, 1], cache_lens)
    q = rng.normal(size=(B, 8, D)).astype(np.float32)
    kn = rng.normal(size=(B, H, D)).astype(np.float32)
    vn = rng.normal(size=(B, H, D)).astype(np.float32)
    pt = np.asarray(state.page_table)[0][slots]
    lens = np.asarray(state.bh_lens)[0][slots]
    got = np.asarray(
        paged_decode_attention(
            jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
            state.kv_pages,
            jnp.asarray(pt), jnp.asarray(lens), 0,
            sm_scale=1.0, page_size=PAGE, interpret=True,
        )
    )
    assert np.isfinite(got).all()
    want_self = np.repeat(vn[1], 2, axis=0)  # G=2 query heads per kv head
    np.testing.assert_allclose(got[1], want_self, atol=3e-3)


def test_pallas_store_matches_jnp_store():
    """Pallas page-DMA store vs the jnp scatter store: same retained tokens
    (bh_lens-bounded reads; page-tail garbage beyond counts is allowed)."""
    from compactor_vllm_tpu.config import CompressionMethod
    from compactor_vllm_tpu.models.transformer import PrefillMeta
    from compactor_vllm_tpu.ops.pallas_attention import pallas_attention_impl
    from compactor_vllm_tpu.kv_cache.state import store_prefill_sel, store_prefill_full
    from compactor_vllm_tpu.ops.attention_ref import gather_cache_dense

    rng = np.random.default_rng(3)
    seq_lens = [24, 9]
    B, H, D = 2, GEOM.num_kv_heads, GEOM.head_dim
    cache_lens = np.zeros((B, H), np.int32)
    state, slots = build_cache(rng, seq_lens, cache_lens, max_new=4)
    state2 = state
    # The compact store streams COMPACT_TILE-token tiles, so the packed
    # arrays need >= one tile of slack past the last sequence (the engine's
    # TOKEN_SLACK covers this; mirror it here).
    Tp, starts, lens, q, kn, vn = packed(rng, seq_lens, 8, 512, align=256)
    impl = pallas_attention_impl(interpret=True)
    meta = PrefillMeta(
        input_ids=jnp.zeros(Tp, jnp.int32), positions=jnp.zeros(Tp, jnp.int32),
        token_seq_idx=jnp.zeros(Tp, jnp.int32), token_in_pos=jnp.zeros(Tp, jnp.int32),
        token_valid=jnp.zeros(Tp, bool),
        seq_starts=jnp.asarray(starts), seq_lens=jnp.asarray(lens),
        slots=jnp.asarray(slots), seq_valid=jnp.ones(B, bool),
        retain=jnp.zeros(B, jnp.int32), protected_first=jnp.zeros(B, jnp.int32),
        protected_last=jnp.zeros(B, jnp.int32), phi=jnp.zeros((D, 4)),
    )

    # --- full store parity
    got = impl.store_full(GEOM, state, 0, jnp.asarray(kn), jnp.asarray(vn), meta)
    seq_idx = np.zeros(Tp, np.int32); in_pos = np.zeros(Tp, np.int32); valid = np.zeros(Tp, bool)
    for b, L in enumerate(seq_lens):
        seq_idx[starts[b]:starts[b]+L] = b
        in_pos[starts[b]:starts[b]+L] = np.arange(L)
        valid[starts[b]:starts[b]+L] = True
    want = store_prefill_full(
        GEOM, state2, 0, jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(seq_idx), jnp.asarray(in_pos), jnp.asarray(valid),
        jnp.asarray(slots), jnp.zeros((B, H), jnp.int32), jnp.asarray(lens),
        jnp.ones(B, bool),
    )
    for st_name, st in (("pallas", got), ("jnp", want)):
        kd, vd, ln = gather_cache_dense(GEOM, st, 0, jnp.asarray(slots), 32)
        if st_name == "pallas":
            kd_p, ln_p = np.asarray(kd), np.asarray(ln)
        else:
            kd_j, ln_j = np.asarray(kd), np.asarray(ln)
    np.testing.assert_array_equal(ln_p, ln_j)
    for b, L in enumerate(seq_lens):
        np.testing.assert_allclose(kd_p[b, :, :L], kd_j[b, :, :L])

    # --- compact (selection) store parity (multiset per head)
    from compactor_vllm_tpu.compression.select import Selection

    K = 20
    sel = {}
    rank = np.full((Tp, H), -1, np.int32)
    counts = np.zeros((B, H), np.int32)
    for b, L in enumerate(seq_lens):
        n = min(K, L * H // 2)
        pairs = rng.choice(L * H, size=n, replace=False)
        sel[b] = [(p // H, p % H) for p in pairs]
        for h in range(H):
            toks = sorted(t for (t, hh) in sel[b] if hh == h)
            for r, t in enumerate(toks):
                rank[starts[b] + t, h] = r
            counts[b, h] = len(toks)
    state3, _ = build_cache(rng, seq_lens, cache_lens, max_new=4)
    selection = Selection(rank=jnp.asarray(rank), counts=jnp.asarray(counts))
    got = impl.store_sel(GEOM, state3, 0, jnp.asarray(kn), jnp.asarray(vn),
                         selection, meta)
    kd, vd, ln = gather_cache_dense(GEOM, got, 0, jnp.asarray(slots), 32)
    kd, ln = np.asarray(kd), np.asarray(ln)
    for b in range(B):
        for h in range(H):
            toks = sorted(t for (t, hh) in sel[b] if hh == h)
            assert ln[b, h] == len(toks)
            got_rows = kd[b, h, :ln[b, h]]
            want_rows = kn[starts[b] + np.array(toks, int), h]
            np.testing.assert_allclose(
                got_rows[np.lexsort(got_rows.T)], want_rows[np.lexsort(want_rows.T)],
                rtol=1e-6,
            )
    # jnp fallback agrees (token-order positions are identical, not just
    # multiset-equal, since both stores place rank r at position r)
    state4, _ = build_cache(rng, seq_lens, cache_lens, max_new=4)
    seq_idx4 = np.zeros(Tp, np.int32)
    for b, L in enumerate(seq_lens):
        seq_idx4[starts[b]:starts[b] + L] = b
    want = store_prefill_sel(
        GEOM, state4, 0, jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(rank), jnp.asarray(counts), jnp.asarray(seq_idx4),
        jnp.asarray(slots), jnp.zeros((B, H), jnp.int32), jnp.ones(B, bool),
    )
    kdw, _, lnw = gather_cache_dense(GEOM, want, 0, jnp.asarray(slots), 32)
    kdw, lnw = np.asarray(kdw), np.asarray(lnw)
    np.testing.assert_array_equal(ln, lnw)
    for b in range(B):
        for h in range(H):
            np.testing.assert_allclose(
                kd[b, h, :ln[b, h]], kdw[b, h, :ln[b, h]], rtol=1e-6
            )


def test_pad_to_page_topup_semantics():
    """VERDICT round-2 missing #2 (reference store_kv_cache.py:178-248):
    each head's retained count is its joint-selection count rounded UP to a
    page multiple, the extra entries are exactly the head's next-ranked
    (next-best-scored) tokens, and bh_lens reflects the padded count."""
    from compactor_vllm_tpu.compression.select import threshold_select

    rng = np.random.default_rng(9)
    T, H = 64, GEOM.num_kv_heads
    seq_lens_ = [40]
    starts_ = np.array([0], np.int32)
    scores = rng.normal(size=(T, H)).astype(np.float32)
    retain = np.array([61], np.int32)
    sel = threshold_select(
        jnp.asarray(scores), jnp.asarray(starts_),
        jnp.asarray(np.array(seq_lens_, np.int32)), jnp.asarray(retain),
        pad_to_page=PAGE,
    )
    counts = np.asarray(sel.counts)[0]
    rank = np.asarray(sel.rank)
    L = seq_lens_[0]
    # joint top-61 of the 40x4 scores
    flat = scores[:L].reshape(-1)
    order = np.argsort(-flat, kind="stable")
    base_sel = np.zeros(L * H, bool)
    base_sel[order[:61]] = True
    base_counts = base_sel.reshape(L, H).sum(0)
    for h in range(H):
        want = min(-(-int(base_counts[h]) // PAGE) * PAGE, L)
        assert counts[h] == want, (h, counts[h], want, base_counts[h])
        # the retained set must be exactly the head's top-counts[h] scores
        kept = np.nonzero(rank[:L, h] >= 0)[0]
        top = set(np.argsort(-scores[:L, h], kind="stable")[: counts[h]])
        assert set(kept.tolist()) == top


def test_decode_kernel_fp8_cache_matches_oracle():
    """fp8 (e4m3) KV cache: the kernel and the jnp oracle read the SAME
    quantized pages, so they must agree to normal fp tolerance — validates
    the in-kernel upcast path without accuracy entanglement."""
    rng = np.random.default_rng(6)
    B, H, D = 2, GEOM.num_kv_heads, GEOM.head_dim
    cache_lens = rng.integers(20, 60, size=(B, H)).astype(np.int32)
    state, slots = build_cache(rng, [1] * B, cache_lens)
    state = state._replace(
        kv_pages=state.kv_pages.astype(jnp.float8_e4m3fn),
    )
    q = rng.normal(size=(B, H * 2, D)).astype(np.float32)
    kn = rng.normal(size=(B, H, D)).astype(np.float32)
    vn = rng.normal(size=(B, H, D)).astype(np.float32)
    sm = 1.0 / np.sqrt(D)
    pt = np.asarray(state.page_table)[0][slots]
    lens = np.asarray(state.bh_lens)[0][slots]
    got = paged_decode_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        state.kv_pages,
        jnp.asarray(pt), jnp.asarray(lens), 0, None,
        sm_scale=sm, page_size=PAGE, interpret=True,
    )
    want = ref_decode_attention(
        GEOM, state, 0, jnp.asarray(q), jnp.asarray(slots),
        max_cache_len=int(cache_lens.max()), sm_scale=sm,
        k_new=jnp.asarray(kn), v_new=jnp.asarray(vn),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-3)


def test_decode_kernel_ring_path_matches_oracle(monkeypatch):
    """Force the ring-buffered (non-resident) decode kernel — the long-context
    fallback when per-head KV exceeds DECODE_RESIDENT_TOKENS."""
    import compactor_vllm_tpu.ops.pallas_attention as pa

    monkeypatch.setattr(pa, "DECODE_RESIDENT_TOKENS", 0)
    rng = np.random.default_rng(9)
    B, H, D = 2, GEOM.num_kv_heads, GEOM.head_dim
    cache_lens = rng.integers(40, 90, size=(B, H)).astype(np.int32)
    state, slots, alloc = build_cache(rng, [1] * B, cache_lens, return_alloc=True)
    q = rng.normal(size=(B, H * 2, D)).astype(np.float32)
    kn = rng.normal(size=(B, H, D)).astype(np.float32)
    vn = rng.normal(size=(B, H, D)).astype(np.float32)
    sm = 1.0 / np.sqrt(D)
    pt = np.asarray(state.page_table)[0][slots]
    lens = np.asarray(state.bh_lens)[0][slots]
    contig = np.stack([alloc.contig_groups(s_, 8) for s_ in slots]).astype(np.int32)
    got = pa.paged_decode_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        state.kv_pages,
        jnp.asarray(pt), jnp.asarray(lens), 0, jnp.asarray(contig),
        sm_scale=sm, page_size=PAGE, group_pages=8, interpret=True,
    )
    want = ref_decode_attention(
        GEOM, state, 0, jnp.asarray(q), jnp.asarray(slots),
        max_cache_len=int(cache_lens.max()), sm_scale=sm,
        k_new=jnp.asarray(kn), v_new=jnp.asarray(vn),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-3)


def test_decode_kernel_megacore_path_matches_oracle():
    """Megacore parts (v4/v5p): kernel selection must avoid the resident
    kernels (whose cross-program prefetch assumes sequential grid order) and
    take the self-contained ring kernel with explicit V masking + a
    `parallel` batch dim. Forced via the tuning override; verified vs the
    jnp oracle in interpret mode."""
    from compactor_vllm_tpu.ops import tuning

    import compactor_vllm_tpu.ops.pallas_attention as pa

    rng = np.random.default_rng(11)
    B, H, D = 2, GEOM.num_kv_heads, GEOM.head_dim
    cache_lens = rng.integers(40, 90, size=(B, H)).astype(np.int32)
    state, slots, alloc = build_cache(rng, [1] * B, cache_lens, return_alloc=True)
    q = rng.normal(size=(B, H * 2, D)).astype(np.float32)
    kn = rng.normal(size=(B, H, D)).astype(np.float32)
    vn = rng.normal(size=(B, H, D)).astype(np.float32)
    sm = 1.0 / np.sqrt(D)
    pt = np.asarray(state.page_table)[0][slots]
    lens = np.asarray(state.bh_lens)[0][slots]
    contig = np.stack([alloc.contig_groups(s_, 8) for s_ in slots]).astype(np.int32)
    with tuning.override(megacore=True):
        got = pa.paged_decode_attention(
            jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
            state.kv_pages,
            jnp.asarray(pt), jnp.asarray(lens), 0, jnp.asarray(contig),
            sm_scale=sm, page_size=PAGE, group_pages=8, interpret=True,
        )
    want = ref_decode_attention(
        GEOM, state, 0, jnp.asarray(q), jnp.asarray(slots),
        max_cache_len=int(cache_lens.max()), sm_scale=sm,
        k_new=jnp.asarray(kn), v_new=jnp.asarray(vn),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-3)


def test_decode_fp8_query_rounds_through_e4m3():
    """cfg.fp8_query: the impl's decode must equal the kernel fed a query
    explicitly saturated and rounded through e4m3 (the reference's fp8 q
    cast, sparse_decode_kernel.py:84,137-139)."""
    import compactor_vllm_tpu.ops.pallas_attention as pa

    rng = np.random.default_rng(13)
    B, H, D = 2, GEOM.num_kv_heads, GEOM.head_dim
    cache_lens = rng.integers(20, 60, size=(B, H)).astype(np.int32)
    state, slots = build_cache(rng, [1] * B, cache_lens)
    # Out-of-range values exercise the +-448 saturation.
    q = (rng.normal(size=(B, H * 2, D)) * 300).astype(np.float32)
    kn = rng.normal(size=(B, H, D)).astype(np.float32)
    vn = rng.normal(size=(B, H, D)).astype(np.float32)
    sm = 1.0 / np.sqrt(D)
    pt = np.asarray(state.page_table)[0][slots]
    lens = np.asarray(state.bh_lens)[0][slots]

    impl = pa.pallas_attention_impl(interpret=True, fp8_query=True)

    class MetaStub:
        contig8 = None

    got = impl.decode(
        GEOM, state, 0, jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        MetaStub(), sm, jnp.asarray(pt), jnp.asarray(lens),
    )
    q_r = (
        jnp.clip(jnp.asarray(q, jnp.float32), -448.0, 448.0)
        .astype(jnp.float8_e4m3fn)
        .astype(jnp.float32)
    )
    want = pa.paged_decode_attention(
        q_r, jnp.asarray(kn), jnp.asarray(vn), state.kv_pages,
        jnp.asarray(pt), jnp.asarray(lens), 0, None,
        sm_scale=sm, page_size=PAGE, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    assert np.isfinite(np.asarray(got)).all()


def test_tuning_table_resolution(monkeypatch):
    """Device-kind rows resolve in specificity order ("v5 lite" never hits
    the v5p megacore row) and env vars override table values."""
    from compactor_vllm_tpu.ops import tuning

    def pick(kind):
        low = kind.lower()
        return next(
            (v for k, v in tuning._TABLE if k in low), tuning._DEFAULT
        )

    assert pick("TPU v5 lite").megacore is False
    assert pick("TPU v5p").megacore is True
    assert pick("TPU v5").megacore is True
    assert pick("TPU v4").megacore is True
    assert pick("TPU v6 lite").decode_resident_tokens == 16384
    # CPU (interpret tests) keeps the measured sequential-grid row; genuinely
    # unknown kinds get the conservative megacore=True default.
    assert pick("cpu").megacore is False
    assert pick("TPU v9 hypothetical") == tuning._DEFAULT
    assert tuning._DEFAULT.megacore is True
    assert pick("TPU v5lite").megacore is False
    assert pick("TPU v6lite").decode_resident_tokens == 16384
    monkeypatch.setenv("CVT_DECODE_GROUP", "8")
    monkeypatch.setenv("CVT_MEGACORE", "1")
    t = tuning._apply_env(tuning.KernelTuning())
    assert t.decode_group_pages == 8 and t.megacore is True
    # override() restores the previous state on exit
    before = tuning.get_tuning()
    with tuning.override(decode_resident_tokens=256) as forced:
        assert forced.decode_resident_tokens == 256
        assert tuning.get_tuning().decode_resident_tokens == 256
    assert tuning.get_tuning() == before


def test_compact_store_fp8_saturates_no_nan():
    """ADVICE r3 (high): the fused compact+store kernel must saturate to
    +-448 before the e4m3fn cast, like cast_to_cache — otherwise one
    out-of-range retained value writes NaN bytes that the unmasked-V decode
    kernels then propagate."""
    from compactor_vllm_tpu.compression.select import Selection
    from compactor_vllm_tpu.config import CompressionMethod
    from compactor_vllm_tpu.models.transformer import PrefillMeta
    from compactor_vllm_tpu.ops.pallas_attention import pallas_attention_impl
    from compactor_vllm_tpu.ops.attention_ref import gather_cache_dense

    rng = np.random.default_rng(11)
    seq_lens = [24]
    B, H, D = 1, GEOM.num_kv_heads, GEOM.head_dim
    cache_lens = np.zeros((B, H), np.int32)
    state, slots = build_cache(rng, seq_lens, cache_lens, max_new=4)
    state = state._replace(kv_pages=state.kv_pages.astype(jnp.float8_e4m3fn))
    Tp, starts, lens, q, kn, vn = packed(rng, seq_lens, 8, 512, align=256)
    kn = kn * 1e4  # every value far beyond the e4m3fn max of 448
    vn = -np.abs(vn) * 1e4
    impl = pallas_attention_impl(interpret=True)
    meta = PrefillMeta(
        input_ids=jnp.zeros(Tp, jnp.int32), positions=jnp.zeros(Tp, jnp.int32),
        token_seq_idx=jnp.zeros(Tp, jnp.int32), token_in_pos=jnp.zeros(Tp, jnp.int32),
        token_valid=jnp.zeros(Tp, bool),
        seq_starts=jnp.asarray(starts), seq_lens=jnp.asarray(lens),
        slots=jnp.asarray(slots), seq_valid=jnp.ones(B, bool),
        retain=jnp.zeros(B, jnp.int32), protected_first=jnp.zeros(B, jnp.int32),
        protected_last=jnp.zeros(B, jnp.int32), phi=jnp.zeros((D, 4)),
    )
    rank = np.full((Tp, H), -1, np.int32)
    counts = np.zeros((B, H), np.int32)
    for h in range(H):
        toks = sorted(rng.choice(seq_lens[0], size=10, replace=False).tolist())
        for r, t in enumerate(toks):
            rank[starts[0] + t, h] = r
        counts[0, h] = len(toks)
    selection = Selection(rank=jnp.asarray(rank), counts=jnp.asarray(counts))
    got = impl.store_sel(GEOM, state, 0, jnp.asarray(kn), jnp.asarray(vn),
                         selection, meta)
    kd, vd, ln = gather_cache_dense(GEOM, got, 0, jnp.asarray(slots), 32)
    kd, vd, ln = np.asarray(kd, np.float32), np.asarray(vd, np.float32), np.asarray(ln)
    for h in range(H):
        n = ln[0, h]
        assert n == counts[0, h]
        assert np.isfinite(kd[0, h, :n]).all() and np.isfinite(vd[0, h, :n]).all()
        np.testing.assert_array_equal(kd[0, h, :n][np.abs(kd[0, h, :n]) > 0].clip(-448, 448), kd[0, h, :n][np.abs(kd[0, h, :n]) > 0])
        assert (vd[0, h, :n] >= -448.0).all()
        assert np.abs(kd[0, h, :n]).max() == 448.0  # saturated, not zeroed
