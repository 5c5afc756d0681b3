import jax.numpy as jnp
import numpy as np
import pytest

from compactor_vllm_tpu.kv_cache.allocator import PageAllocator
from compactor_vllm_tpu.kv_cache.state import (
    KVCacheGeometry,
    init_kv_cache,
    store_decode,
    store_prefill_full,
    store_prefill_sel,
)
from compactor_vllm_tpu.ops.attention_ref import gather_cache_dense

GEOM = KVCacheGeometry(
    num_layers=2,
    num_pages=64,
    page_size=8,
    num_kv_heads=4,
    head_dim=16,
    num_slots=5,
    max_pages_per_head=8,
)


def setup(seq_lens, max_new=0):
    rng = np.random.default_rng(0)
    alloc = PageAllocator(
        num_layers=GEOM.num_layers,
        num_shards=1,
        pages_per_shard=GEOM.num_pages,
        num_kv_heads=GEOM.num_kv_heads,
        max_pages_per_head=GEOM.max_pages_per_head,
        num_slots=GEOM.num_slots,
        page_size=GEOM.page_size,
    )
    state = init_kv_cache(GEOM, dtype=jnp.float32)
    slots = []
    for i, L in enumerate(seq_lens):
        alloc.alloc_slot(i)
        alloc.reserve(i, L + max_new)
        slots.append(alloc.slot_of_seq[i])
    state = state._replace(page_table=jnp.asarray(alloc.page_table))
    return rng, alloc, state, np.array(slots, np.int32)


def packed_meta(seq_lens, pad_to=None):
    T = sum(seq_lens)
    Tp = pad_to or T
    cu = np.zeros(len(seq_lens) + 1, np.int32)
    cu[1:] = np.cumsum(seq_lens)
    seq_idx = np.zeros(Tp, np.int32)
    in_pos = np.zeros(Tp, np.int32)
    valid = np.zeros(Tp, bool)
    for b, L in enumerate(seq_lens):
        seq_idx[cu[b] : cu[b + 1]] = b
        in_pos[cu[b] : cu[b + 1]] = np.arange(L)
        valid[cu[b] : cu[b + 1]] = True
    return T, Tp, cu, seq_idx, in_pos, valid


def test_store_full_roundtrip():
    seq_lens = [13, 7]
    rng, alloc, state, slots = setup(seq_lens)
    T, Tp, cu, seq_idx, in_pos, valid = packed_meta(seq_lens, pad_to=24)
    H, D = GEOM.num_kv_heads, GEOM.head_dim
    k = rng.normal(size=(Tp, H, D)).astype(np.float32)
    v = rng.normal(size=(Tp, H, D)).astype(np.float32)
    cached = jnp.zeros((2, H), jnp.int32)
    for layer in range(GEOM.num_layers):
        state = store_prefill_full(
            GEOM, state, layer, jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(seq_idx), jnp.asarray(in_pos), jnp.asarray(valid),
            jnp.asarray(slots), cached, jnp.asarray(np.array(seq_lens, np.int32)),
            jnp.ones(2, bool),
        )
    for layer in range(GEOM.num_layers):
        kd, vd, lens = gather_cache_dense(GEOM, state, layer, jnp.asarray(slots), 16)
        kd, vd, lens = np.asarray(kd), np.asarray(vd), np.asarray(lens)
        for b, L in enumerate(seq_lens):
            assert (lens[b] == L).all()
            for h in range(H):
                np.testing.assert_allclose(kd[b, h, :L], k[cu[b] : cu[b + 1], h])
                np.testing.assert_allclose(vd[b, h, :L], v[cu[b] : cu[b + 1], h])


def test_store_decode_appends():
    seq_lens = [5, 3]
    rng, alloc, state, slots = setup(seq_lens, max_new=4)
    T, Tp, cu, seq_idx, in_pos, valid = packed_meta(seq_lens)
    H, D = GEOM.num_kv_heads, GEOM.head_dim
    k = rng.normal(size=(Tp, H, D)).astype(np.float32)
    v = rng.normal(size=(Tp, H, D)).astype(np.float32)
    cached = jnp.zeros((2, H), jnp.int32)
    state = store_prefill_full(
        GEOM, state, 0, jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(seq_idx), jnp.asarray(in_pos), jnp.asarray(valid),
        jnp.asarray(slots), cached, jnp.asarray(np.array(seq_lens, np.int32)),
        jnp.ones(2, bool),
    )
    kd1 = rng.normal(size=(2, H, D)).astype(np.float32)
    vd1 = rng.normal(size=(2, H, D)).astype(np.float32)
    state = store_decode(
        GEOM, state, 0, jnp.asarray(kd1), jnp.asarray(vd1),
        jnp.asarray(slots), jnp.ones(2, bool),
    )
    kd, vd, lens = gather_cache_dense(GEOM, state, 0, jnp.asarray(slots), 16)
    lens = np.asarray(lens)
    for b, L in enumerate(seq_lens):
        assert (lens[b] == L + 1).all()
        for h in range(H):
            np.testing.assert_allclose(np.asarray(kd)[b, h, L], kd1[b, h])
            np.testing.assert_allclose(np.asarray(vd)[b, h, L], vd1[b, h])


def test_store_decode_respects_valid_mask():
    seq_lens = [5, 3]
    rng, alloc, state, slots = setup(seq_lens, max_new=4)
    T, Tp, cu, seq_idx, in_pos, valid = packed_meta(seq_lens)
    H, D = GEOM.num_kv_heads, GEOM.head_dim
    k = rng.normal(size=(Tp, H, D)).astype(np.float32)
    v = rng.normal(size=(Tp, H, D)).astype(np.float32)
    state = store_prefill_full(
        GEOM, state, 0, jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(seq_idx), jnp.asarray(in_pos), jnp.asarray(valid),
        jnp.asarray(slots), jnp.zeros((2, H), jnp.int32),
        jnp.asarray(np.array(seq_lens, np.int32)), jnp.ones(2, bool),
    )
    kd1 = rng.normal(size=(2, H, D)).astype(np.float32)
    state = store_decode(
        GEOM, state, 0, jnp.asarray(kd1), jnp.asarray(kd1),
        jnp.asarray(slots), jnp.asarray([True, False]),
    )
    _, _, lens = gather_cache_dense(GEOM, state, 0, jnp.asarray(slots), 16)
    assert (np.asarray(lens)[0] == 6).all()
    assert (np.asarray(lens)[1] == 3).all()


def _sel_from_pairs(seq_lens, cu, sel_pairs, Tp, H):
    """Build (rank [Tp, H], counts [B, H]) from per-seq (token, head) sets
    with token-order ranks (the Selection contract, compression/select.py)."""
    B = len(seq_lens)
    rank = np.full((Tp, H), -1, np.int32)
    counts = np.zeros((B, H), np.int32)
    for b in range(B):
        for h in range(H):
            toks = sorted(t for (t, hh) in sel_pairs[b] if hh == h)
            for r, t in enumerate(toks):
                rank[cu[b] + t, h] = r
            counts[b, h] = len(toks)
    return rank, counts


def test_store_sel_multiset():
    """Per-head retained counts match the selection's head distribution and
    stored K/V match as multisets (order within a head is unspecified) —
    same invariant as reference tests/test_store_kv.py:163-173."""
    seq_lens = [12, 9]
    rng, alloc, state, slots = setup(seq_lens)
    T, Tp, cu, seq_idx, in_pos, valid = packed_meta(seq_lens)
    H, D = GEOM.num_kv_heads, GEOM.head_dim
    k = rng.normal(size=(Tp, H, D)).astype(np.float32)
    v = rng.normal(size=(Tp, H, D)).astype(np.float32)

    retain = [20, 11]
    sel = {}
    for b, L in enumerate(seq_lens):
        pairs = rng.choice(L * H, size=retain[b], replace=False)
        sel[b] = [(p // H, p % H) for p in pairs]
    rank, counts = _sel_from_pairs(seq_lens, cu, sel, Tp, H)

    state = store_prefill_sel(
        GEOM, state, 0, jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(rank), jnp.asarray(counts), jnp.asarray(seq_idx),
        jnp.asarray(slots), jnp.zeros((2, H), jnp.int32), jnp.ones(2, bool),
    )
    kd, vd, lens = gather_cache_dense(GEOM, state, 0, jnp.asarray(slots), 16)
    kd, lens = np.asarray(kd), np.asarray(lens)
    for b in range(2):
        for h in range(H):
            expect_tokens = sorted(t for (t, hh) in sel[b] if hh == h)
            assert lens[b, h] == len(expect_tokens)
            got = kd[b, h, : lens[b, h]]
            want = k[cu[b] + np.array(expect_tokens, int), h]
            got_sorted = got[np.lexsort(got.T)]
            want_sorted = want[np.lexsort(want.T)]
            np.testing.assert_allclose(got_sorted, want_sorted, rtol=1e-6)


def test_store_sel_invalid_seq_untouched():
    seq_lens = [6, 6]
    rng, alloc, state, slots = setup(seq_lens)
    T, Tp, cu, seq_idx, in_pos, valid = packed_meta(seq_lens)
    H, D = GEOM.num_kv_heads, GEOM.head_dim
    k = rng.normal(size=(Tp, H, D)).astype(np.float32)
    sel = {b: [(t, 0) for t in range(4)] for b in range(2)}
    rank, counts = _sel_from_pairs(seq_lens, cu, sel, Tp, H)
    state = store_prefill_sel(
        GEOM, state, 0, jnp.asarray(k), jnp.asarray(k),
        jnp.asarray(rank), jnp.asarray(counts), jnp.asarray(seq_idx),
        jnp.asarray(slots), jnp.zeros((2, H), jnp.int32),
        jnp.asarray([True, False]),
    )
    _, _, lens = gather_cache_dense(GEOM, state, 0, jnp.asarray(slots), 16)
    assert np.asarray(lens)[1].sum() == 0


def test_fp8_store_saturates_no_nan():
    """fp8 (e4m3fn has no inf) stores must clamp: XLA maps |x| > 448 to NaN,
    and the decode kernels read V unmasked relying on every cached byte
    being finite (kv_cache.state.cast_to_cache)."""
    from compactor_vllm_tpu.kv_cache.state import (
        cast_to_cache, store_decode_all_layers,
    )

    x = jnp.asarray([500.0, -1e9, 448.0, 0.25, -500.0], jnp.float32)
    y = np.asarray(cast_to_cache(x, jnp.float8_e4m3fn).astype(jnp.float32))
    assert np.isfinite(y).all()
    np.testing.assert_array_equal(y, [448.0, -448.0, 448.0, 0.25, -448.0])

    # End-to-end through a store op on an fp8 cache.
    rng, alloc, state, slots = setup([3], max_new=4)
    state = init_kv_cache(GEOM, dtype=jnp.float8_e4m3fn)._replace(
        page_table=state.page_table
    )
    L, H, D = GEOM.num_layers, GEOM.num_kv_heads, GEOM.head_dim
    k = jnp.full((L, 1, H, D), 1e6, jnp.float32)  # would NaN without clamp
    v = -k
    out = store_decode_all_layers(
        GEOM, state, k, v, jnp.asarray(slots), jnp.asarray([True]),
    )
    pages = np.asarray(out.kv_pages.astype(jnp.float32))
    assert np.isfinite(pages).all()
    assert pages.max() == 448.0 and pages.min() == -448.0
