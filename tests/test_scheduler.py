"""Scheduler budget/capacity tests (reference: core/scheduler.py:65-108 —
the reference ships no scheduler tests; SURVEY.md §4 calls for them)."""

import pytest

from compactor_vllm_tpu.config import LLMConfig, SamplingParams
from compactor_vllm_tpu.core.scheduler import Scheduler
from compactor_vllm_tpu.kv_cache.allocator import PageAllocator
from compactor_vllm_tpu.utils.sequence import Sequence


def make(num_pages=64, max_seqs=4, max_tokens=128, max_len=128, **kw):
    cfg = LLMConfig(
        max_num_seqs=max_seqs, max_model_len=max_len,
        max_num_batched_tokens=max_tokens, kvcache_page_size=8,
        num_kv_pages=num_pages, **kw,
    )
    # __post_init__ clamps the token budget up to max_model_len.
    alloc = PageAllocator(
        num_layers=2, num_shards=1, pages_per_shard=num_pages,
        num_kv_heads=2, max_pages_per_head=max_len // 8,
        num_slots=max_seqs + 1, page_size=8,
    )
    return Scheduler(cfg, alloc), alloc, cfg


def seq(n, new=8):
    return Sequence(list(range(1, n + 1)),
                    sampling_params=SamplingParams(0.0, new))


def test_token_budget_limits_batch():
    sched, alloc, cfg = make(max_tokens=128, max_len=128)
    sched.add([seq(100), seq(100), seq(20)])
    batch, _ = sched.schedule_prefill()
    # First seq always admitted; second would blow the 128-token budget.
    assert len(batch) == 1
    batch2, _ = sched.schedule_prefill()
    # FIFO: the second 100-token prompt plus the 20-token one fit the budget.
    assert [x.num_prompt_tokens for x in batch2] == [100, 20]


def test_page_capacity_gates_admission():
    sched, alloc, cfg = make(num_pages=40, max_tokens=4096, max_len=128)
    # Each seq: (100+8 tokens -> 14 pages/head-shard... ) 2 heads * 14 = 28 pages.
    sched.add([seq(100), seq(100)])
    batch, _ = sched.schedule_prefill()
    assert len(batch) == 1  # second doesn't fit the 40-page pool
    # Free it; the second can now be admitted.
    sched.finish(batch[0])
    batch2, _ = sched.schedule_prefill()
    assert len(batch2) == 1
    sched.finish(batch2[0])
    assert sched.is_finished()
    alloc.check_invariants()


def test_slot_capacity_gates_admission():
    sched, alloc, cfg = make(max_seqs=2, max_tokens=4096)
    sched.add([seq(10), seq(10), seq(10)])
    batch, _ = sched.schedule_prefill()
    assert len(batch) == 2
    assert sched.num_waiting == 1


def test_prompt_longer_than_model_len_rejected():
    sched, alloc, cfg = make(max_len=128)
    with pytest.raises(ValueError):
        sched.add([seq(129)])


def test_hol_blocked_prompt_does_not_starve_short_ones():
    """A head-of-queue prompt whose pages don't fit is bypassed (up to
    hol_skip_limit times) so admittable prompts behind it keep flowing —
    the reference breaks on the first unadmittable sequence
    (core/scheduler.py:104-105)."""
    # 34 pages/pool: big (100+8 tok -> 14 pages x 2 heads = 28) + small
    # (10+8 -> 3 x 2 = 6) fill the pool exactly; two bigs never fit at once.
    sched, alloc, cfg = make(num_pages=34, max_tokens=4096, max_len=128)
    big_a, big_b, s1, s2 = seq(100), seq(100), seq(10), seq(10)
    sched.add([big_a, big_b, s1, s2])
    batch, _ = sched.schedule_prefill()
    assert [x.seq_id for x in batch] == [big_a.seq_id, s1.seq_id]
    assert big_b.hol_skips == 1
    # Bypassed seqs keep their arrival order at the queue front.
    assert [x.seq_id for x in sched.waiting] == [big_b.seq_id, s2.seq_id]
    sched.finish(big_a)
    sched.finish(s1)
    batch2, _ = sched.schedule_prefill()
    assert [x.seq_id for x in batch2] == [big_b.seq_id, s2.seq_id]
    alloc.check_invariants()


def test_hol_skip_aging_becomes_barrier():
    """After hol_skip_limit bypasses the starved prompt blocks the queue, so
    it is guaranteed the next admission once capacity frees."""
    sched, alloc, cfg = make(
        num_pages=34, max_tokens=4096, max_len=128, hol_skip_limit=1
    )
    big_a, big_b, s1, s2 = seq(100), seq(100), seq(10), seq(10)
    sched.add([big_a, big_b, s1, s2])
    batch, _ = sched.schedule_prefill()
    assert [x.seq_id for x in batch] == [big_a.seq_id, s1.seq_id]
    # big_b reached the skip limit: now a barrier — nothing behind admits.
    batch2, _ = sched.schedule_prefill()
    assert batch2 == []
    assert [x.seq_id for x in sched.waiting] == [big_b.seq_id, s2.seq_id]
    sched.finish(big_a)
    sched.finish(s1)
    batch3, _ = sched.schedule_prefill()
    assert batch3[0].seq_id == big_b.seq_id
    alloc.check_invariants()


def test_hol_barrier_never_starves_chunk_continuation():
    """A bypassed sequence that ages into a barrier must not land in front
    of a mid-prefill (chunk-continuation) sequence: the continuation is
    already admitted and its pages never free unless it finishes, so
    shadowing it would deadlock the engine."""
    sched, alloc, cfg = make(
        num_pages=30, max_tokens=64, max_len=512, hol_skip_limit=1,
        enable_chunked_prefill=True,
    )
    sched.allow_chunking = True
    big = seq(200)    # 26 pages x 2 heads = 52 > 30: never admittable
    small = seq(100)  # 14 x 2 = 28 <= 30: fits, chunks at the 64 budget
    sched.add([big, small])
    batch1, _ = sched.schedule_prefill()
    assert [x.seq_id for x in batch1] == [small.seq_id]
    assert small.prefill_chunk == 64  # partial chunk: mid-prefill now
    small.num_prefilled_tokens = 64
    # The continuation must sit at the ABSOLUTE front, ahead of the
    # bypassed big sequence.
    assert sched.waiting[0] is small
    batch2, _ = sched.schedule_prefill()
    assert [x.seq_id for x in batch2] == [small.seq_id]  # no starvation
    assert small.prefill_chunk == 100 - 64
    small.num_prefilled_tokens = 100
    # Only the impossible sequence remains; the barrier halts admission
    # (the runner's pool-too-small error is the correct endpoint).
    batch3, _ = sched.schedule_prefill()
    assert batch3 == []
    assert [x.seq_id for x in sched.waiting] == [big.seq_id]


def test_cap_reservation_covers_pad_to_page_roundup():
    """With a head retention cap and pad_retained_to_page, admission must
    reserve the PAGE-ROUNDED cap: the store pads each head's retention up to
    the page boundary, which can exceed a non-aligned cap (review finding:
    the un-rounded reservation could exhaust the pool at full subscription)."""
    from compactor_vllm_tpu.config import SequenceCompressionParams

    sched, alloc, cfg = make(num_pages=64, max_tokens=4096, max_len=256)
    sched.compressing = True
    s = Sequence(
        list(range(1, 101)),
        sampling_params=SamplingParams(0.0, 8),
        compression_params=SequenceCompressionParams(
            compression_ratio=0.5, protected_first_tokens=2,
            protected_last_tokens=4, max_head_retention_factor=1.0,
        ),
    )
    cap = s.head_retention_cap(alloc.H)
    assert cap > 0 and cap % cfg.kvcache_page_size != 0, "test needs a non-aligned cap"
    sched.add([s])
    batch, _ = sched.schedule_prefill()
    assert batch == [s]
    page = cfg.kvcache_page_size
    cap_pages = -(-cap // page)  # page_ceil(cap): what pad-to-page can reach
    reserved = alloc.num_pages[0, alloc.slot_of_seq[s.seq_id], 0]
    # Every head's reservation covers page_ceil(cap) retention + max_new.
    assert reserved * page >= cap_pages * page + 8
    sched.finish(s)
    alloc.check_invariants()
