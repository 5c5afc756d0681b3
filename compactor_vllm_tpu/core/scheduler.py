"""Continuous-batching scheduler.

Greedy prefill batch selection under a token budget, free-slot and free-page
constraints (reference: core/scheduler.py:65-108). Page capacity is reserved
at schedule time for prompt + max_new tokens, so decode can never run out of
pages mid-flight; compression later returns the surplus via shrink.
"""

from __future__ import annotations

import logging
from collections import deque
from dataclasses import replace

from compactor_vllm_tpu.config import LLMConfig
from compactor_vllm_tpu.kv_cache.allocator import PageAllocator, SlotUpdate
from compactor_vllm_tpu.utils.sequence import Sequence, SequenceStatus

logger = logging.getLogger(__name__)


class Scheduler:
    def __init__(self, cfg: LLMConfig, alloc: PageAllocator):
        self.cfg = cfg
        self.alloc = alloc
        self.waiting: deque[Sequence] = deque()
        # Chunked prefill gate: set per generate() call by the runner
        # (runner.generate's chunk_ok). Chunking composes with CHUNK-LOCAL
        # compression (Compactor + pad_retained_to_page); only query-aware
        # methods (SnapKV) force whole-prompt batches and disable it.
        self.allow_chunking = cfg.enable_chunked_prefill
        # Set per generate() call: whether a compressing method is active
        # (gates the per-head retention-cap reservations).
        self.compressing = False
        self.running: dict[int, Sequence] = {}
        self.num_finished = 0
        self.total = 0

    def add(self, seqs: list[Sequence]) -> None:
        for s in seqs:
            if s.num_prompt_tokens >= self.cfg.max_model_len:
                raise ValueError(
                    f"prompt of {s.num_prompt_tokens} tokens leaves no room "
                    f"for generation under max_model_len="
                    f"{self.cfg.max_model_len}"
                )
            # Clamp generation so prompt + completions never exceeds
            # max_model_len: page reservations cover exactly that span, and
            # the fused decode loop's in-device `remaining` mask inherits the
            # clamped value — without this, bh_lens would grow past the
            # reserved pages (decode store would overwrite live KV).
            cap = self.cfg.max_model_len - s.num_prompt_tokens
            if s.sampling_params.max_new_tokens > cap:
                logger.warning(
                    "seq %d: max_new_tokens %d clamped to %d "
                    "(max_model_len %d - prompt %d)",
                    s.seq_id, s.sampling_params.max_new_tokens, cap,
                    self.cfg.max_model_len, s.num_prompt_tokens,
                )
                s.sampling_params = replace(s.sampling_params, max_new_tokens=cap)
            self.waiting.append(s)
        self.total += len(seqs)

    @property
    def num_waiting(self) -> int:
        return len(self.waiting)

    @property
    def num_running(self) -> int:
        return len(self.running)

    def is_finished(self) -> bool:
        return not self.waiting and not self.running

    def schedule_prefill(self) -> tuple[list[Sequence], list[SlotUpdate]]:
        """Pop a prefill batch; allocates slots + pages as it goes.

        With `enable_chunked_prefill`, a prompt longer than the remaining
        token budget is granted a page-aligned partial chunk
        (`seq.prefill_chunk`); the sequence stays at the head of the queue
        until its final chunk (slot + full page reservation happen at the
        first chunk, so later chunks can never fail admission)."""
        batch: list[Sequence] = []
        updates: list[SlotUpdate] = []
        budget = self.cfg.max_num_batched_tokens
        # Non-final chunks end on an 8-page boundary: whole pages for the
        # cached prefix AND group alignment for the store kernel's
        # contiguous-run DMAs (pallas_attention.STORE_GROUP).
        page = 8 * self.cfg.kvcache_page_size
        tokens = 0
        # Sequences whose page reservation did not fit, bypassed this round
        # (restored to the queue front afterwards). The reference breaks on
        # the first unadmittable sequence (core/scheduler.py:104-105) —
        # under per-head caps and mixed prompt lengths that lets one stuck
        # 131K head-of-queue starve short admittable prompts behind it.
        # Skipping is capacity-only and aged: after cfg.hol_skip_limit
        # bypasses the sequence becomes a barrier, bounding its starvation.
        skipped: list[Sequence] = []
        while self.waiting:
            seq = self.waiting[0]
            remaining = seq.num_prompt_tokens - seq.num_prefilled_tokens
            take = remaining
            if tokens + take > budget:
                if not self.allow_chunking:
                    if batch:
                        break
                    # Single-shot mode admits one whole prompt per batch even
                    # if it exceeds the budget (budget >= max_model_len by
                    # config, so this cannot happen in practice).
                else:
                    # Page-aligned partial chunk (non-final chunks must end on
                    # a page boundary so the cached prefix fills whole pages).
                    take = ((budget - tokens) // page) * page
                    if take <= 0:
                        break
            first_chunk = seq.num_prefilled_tokens == 0
            if first_chunk:
                # Reclaim-aware admission: with an opt-in per-head retention
                # cap, only cap + max_new tokens per head need pages — the
                # compressed store enforces the cap, so the reservation can
                # never overflow. Uncapped sequences reserve the full prompt
                # (the reference's reserve-then-reclaim model).
                reserve_tokens = seq.num_prompt_tokens
                if self.compressing:
                    cap = seq.head_retention_cap(self.alloc.H)
                    if cap:
                        if self.cfg.pad_retained_to_page:
                            # Pad-to-page may round each head's retention up
                            # to the page boundary past the cap — reserve
                            # the rounded amount or the store can outgrow
                            # the reservation (pool-exhaustion assert).
                            pg = self.cfg.kvcache_page_size
                            cap = -(-cap // pg) * pg
                        reserve_tokens = cap
                total_len = min(
                    reserve_tokens + seq.sampling_params.max_new_tokens,
                    self.cfg.max_model_len,
                )
                if len(batch) + 1 > self.cfg.max_num_seqs:
                    break
                if self.alloc.num_free_slots == 0:
                    break  # slots are uniform: nothing behind fits either
                if not self.alloc.can_reserve(total_len):
                    # Page capacity is length-dependent: shorter prompts
                    # behind may still fit. Bypass unless starved too long.
                    if seq.hol_skips >= self.cfg.hol_skip_limit:
                        break
                    seq.hol_skips += 1
                    skipped.append(seq)
                    self.waiting.popleft()
                    continue
                self.alloc.alloc_slot(seq.seq_id)
                updates.append(self.alloc.reserve(seq.seq_id, total_len))
                seq.status = SequenceStatus.RUNNING
                self.running[seq.seq_id] = seq
            seq.prefill_chunk = take
            batch.append(seq)
            tokens += take
            if take < remaining:
                break  # partial chunk exhausted the budget; seq stays queued
            self.waiting.popleft()
        # Bypassed sequences return to the queue FRONT in arrival order, so
        # they are re-examined first as soon as capacity frees up.
        for s in reversed(skipped):
            self.waiting.appendleft(s)
        # A mid-prefill (chunk-continuation) sequence must stay at the
        # ABSOLUTE front: it is already admitted (slot + full reservation)
        # and needs no capacity, but a bypassed sequence restored ahead of
        # it could age into a barrier that then starves the continuation
        # forever — its pages never free and the engine deadlocks.
        if skipped:
            # RUNNING-but-still-queued == mid-prefill (admitted at its first
            # chunk; num_prefilled_tokens lags until the chunk executes).
            cont = next(
                (
                    s for s in self.waiting
                    if s.status == SequenceStatus.RUNNING
                ),
                None,
            )
            if cont is not None and self.waiting[0] is not cont:
                self.waiting.remove(cont)
                self.waiting.appendleft(cont)
        return batch, updates

    def finish(self, seq: Sequence) -> None:
        seq.status = SequenceStatus.FINISHED
        del self.running[seq.seq_id]
        self.alloc.release_slot(seq.seq_id)
        self.num_finished += 1
