"""Continuous-batching scheduler.

Greedy prefill batch selection under a token budget, free-slot and free-page
constraints (reference: core/scheduler.py:65-108). Page capacity is reserved
at schedule time for prompt + max_new tokens, so decode can never run out of
pages mid-flight; compression later returns the surplus via shrink.
"""

from __future__ import annotations

from collections import deque
from dataclasses import replace

from compactor_vllm_tpu.config import LLMConfig
from compactor_vllm_tpu.kv_cache.allocator import PageAllocator, SlotUpdate
from compactor_vllm_tpu.utils.sequence import Sequence, SequenceStatus


class Scheduler:
    def __init__(self, cfg: LLMConfig, alloc: PageAllocator):
        self.cfg = cfg
        self.alloc = alloc
        self.waiting: deque[Sequence] = deque()
        self.running: dict[int, Sequence] = {}
        self.num_finished = 0
        self.total = 0

    def add(self, seqs: list[Sequence]) -> None:
        for s in seqs:
            assert s.num_prompt_tokens < self.cfg.max_model_len, (
                f"prompt of {s.num_prompt_tokens} tokens leaves no room for "
                f"generation under max_model_len={self.cfg.max_model_len}"
            )
            # Clamp generation so prompt + completions never exceeds
            # max_model_len: page reservations cover exactly that span, and
            # the fused decode loop's in-device `remaining` mask inherits the
            # clamped value — without this, bh_lens would grow past the
            # reserved pages (decode store would overwrite live KV).
            cap = self.cfg.max_model_len - s.num_prompt_tokens
            if s.sampling_params.max_new_tokens > cap:
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
        """Pop a prefill batch; allocates slots + pages as it goes."""
        batch: list[Sequence] = []
        updates: list[SlotUpdate] = []
        tokens = 0
        while self.waiting:
            seq = self.waiting[0]
            total_len = min(
                seq.num_prompt_tokens + seq.sampling_params.max_new_tokens,
                self.cfg.max_model_len,
            )
            if batch and tokens + seq.num_prompt_tokens > self.cfg.max_num_batched_tokens:
                break
            if len(batch) + 1 > self.cfg.max_num_seqs:
                break
            if self.alloc.num_free_slots == 0 or not self.alloc.can_reserve(total_len):
                break
            self.waiting.popleft()
            self.alloc.alloc_slot(seq.seq_id)
            updates.append(self.alloc.reserve(seq.seq_id, total_len))
            seq.status = SequenceStatus.RUNNING
            self.running[seq.seq_id] = seq
            batch.append(seq)
            tokens += seq.num_prompt_tokens
        return batch, updates

    def finish(self, seq: Sequence) -> None:
        seq.status = SequenceStatus.FINISHED
        del self.running[seq.seq_id]
        self.alloc.release_slot(seq.seq_id)
        self.num_finished += 1
