import numpy as np
import pytest

from compactor_vllm_tpu.kv_cache.allocator import PageAllocator


def make_alloc(**kw):
    defaults = dict(
        num_layers=2,
        num_shards=2,
        pages_per_shard=32,
        num_kv_heads=4,
        max_pages_per_head=8,
        num_slots=5,
        page_size=8,
    )
    defaults.update(kw)
    return PageAllocator(**defaults)


def test_reserve_assigns_disjoint_pages():
    a = make_alloc()
    a.alloc_slot(seq_id=0)
    a.alloc_slot(seq_id=1)
    u0 = a.reserve(0, num_tokens=20)  # 3 pages/head
    u1 = a.reserve(1, num_tokens=17)  # 3 pages/head
    assert u0.num_cols == 3 and u1.num_cols == 3
    assert (a.num_pages[:, u0.slot] == 3).all()
    a.check_invariants()
    # pages of the two slots never collide within a (layer, shard)
    for l in range(a.L):
        for s in range(a.S):
            hs = a.heads_per_shard
            p0 = a.page_table[l, u0.slot, s * hs : (s + 1) * hs, :3].ravel()
            p1 = a.page_table[l, u1.slot, s * hs : (s + 1) * hs, :3].ravel()
            assert not set(p0.tolist()) & set(p1.tolist())


def test_reserve_grows_only_missing_pages():
    a = make_alloc()
    a.alloc_slot(0)
    a.reserve(0, num_tokens=8)  # 1 page
    before = a.page_table[:, a.slot_of_seq[0], :, 0].copy()
    a.reserve(0, num_tokens=24)  # grow to 3 pages
    after = a.page_table[:, a.slot_of_seq[0], :, 0]
    np.testing.assert_array_equal(before, after)
    assert (a.num_pages[:, a.slot_of_seq[0]] == 3).all()
    a.check_invariants()


def test_shrink_returns_pages():
    a = make_alloc()
    a.alloc_slot(0)
    free0 = a.min_free_pages()
    a.reserve(0, num_tokens=32)  # 4 pages/head
    keep = np.full((a.L, a.H), 9, np.int32)  # keep 2 pages/head
    a.shrink(0, keep)
    assert (a.num_pages[:, a.slot_of_seq[0]] == 2).all()
    a.check_invariants()
    a.release_slot(0)
    assert a.min_free_pages() == free0
    a.check_invariants()


def test_head_sparse_shrink():
    a = make_alloc()
    a.alloc_slot(0)
    a.reserve(0, num_tokens=32)
    keep = np.zeros((a.L, a.H), np.int32)
    keep[:, 0] = 32  # head 0 keeps everything, others drop to 1 token
    keep[:, 1:] = 1
    a.shrink(0, keep)
    assert (a.num_pages[:, a.slot_of_seq[0], 0] == 4).all()
    assert (a.num_pages[:, a.slot_of_seq[0], 1:] == 1).all()
    a.check_invariants()


def test_capacity_gating():
    a = make_alloc()
    a.alloc_slot(0)
    assert a.can_reserve(num_tokens=8 * 8)  # 8 pages * 2 heads/shard = 16 <= 32
    assert not a.can_reserve(num_tokens=8 * 32)
    with pytest.raises(AssertionError):
        a.reserve(0, num_tokens=8 * 8 + 1)  # exceeds max_pages_per_head


def test_slot_reuse():
    a = make_alloc()
    s1 = a.alloc_slot(10)
    a.reserve(10, 16)
    a.release_slot(10)
    s2 = a.alloc_slot(11)
    assert s1 == s2
    assert (a.num_pages[:, s2] == 0).all()
    a.check_invariants()


def test_allocator_fuzz_invariants():
    """Randomized reserve/shrink/grow/block/release churn: after every
    operation each page id is either free or allocated exactly once, and
    decode blocks are aligned runs."""
    rng = np.random.default_rng(42)
    a = PageAllocator(
        num_layers=3, num_shards=2, pages_per_shard=64, num_kv_heads=4,
        max_pages_per_head=16, num_slots=5, page_size=8,
    )
    hs = a.heads_per_shard
    live: dict[int, int] = {}  # seq_id -> reserved tokens
    next_id = 0
    for step in range(200):
        op = rng.integers(0, 5)
        if op == 0 and len(live) < 4:  # reserve a new seq
            tokens = int(rng.integers(1, 100))
            need = -(-(tokens) // a.page_size) * a.H
            if a.num_free_slots and a.can_reserve(tokens):
                a.alloc_slot(next_id)
                a.reserve(next_id, tokens)
                live[next_id] = tokens
                next_id += 1
        elif op == 1 and live:  # shrink to random per-head lens
            sid = int(rng.choice(list(live)))
            keep = rng.integers(0, live[sid] + 1, size=(a.L, a.H))
            a.shrink(sid, keep)
            live[sid] = int(keep.max())
        elif op == 2 and live:  # grow per-head
            sid = int(rng.choice(list(live)))
            target = rng.integers(0, 100, size=(a.L, a.H))
            slot = a.slot_of_seq[sid]
            need = (
                -(-target // a.page_size) - a.num_pages[:, slot]
            ).clip(0).reshape(a.L, a.S, hs).sum(axis=2)
            if (need <= np.asarray(a.free_count)).all():
                a.grow_per_head(sid, target)
                live[sid] = max(live[sid], int(target.max()))
        elif op == 3 and live:  # decode blocks at page-aligned lens
            sid = int(rng.choice(list(live)))
            if sid in a.decode_blocks:
                continue
            slot = a.slot_of_seq[sid]
            start = a.num_pages[:, slot].astype(np.int64)
            nblk = int(rng.integers(1, 3))
            blocks = a.alloc_decode_blocks(sid, nblk, start)
            if blocks is not None:
                assert (blocks % hs == 0).all()
                assert blocks.shape == (a.L, a.S, nblk)
        elif op == 4 and live:  # release
            sid = int(rng.choice(list(live)))
            a.release_slot(sid)
            del live[sid]
        a.check_invariants()
    for sid in list(live):
        a.release_slot(sid)
    assert (a.free_count == a.P).all()
    a.check_invariants()
