"""Request/sequence objects tracked by the engine.

Capability parity with reference utils/sequence.py:10-83: a Sequence carries
prompt and completion token ids, a status enum, per-sequence sampling and
compression params, and a monotonically increasing id.
"""

from __future__ import annotations

import enum
import itertools
from dataclasses import dataclass, field

from compactor_vllm_tpu.config import SamplingParams, SequenceCompressionParams


class SequenceStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    FINISHED = enum.auto()


_seq_counter = itertools.count()


@dataclass
class Sequence:
    prompt_token_ids: list[int]
    sampling_params: SamplingParams = field(default_factory=SamplingParams)
    compression_params: SequenceCompressionParams = field(
        default_factory=SequenceCompressionParams
    )
    seq_id: int = field(default_factory=lambda: next(_seq_counter))
    status: SequenceStatus = SequenceStatus.WAITING
    completion_token_ids: list[int] = field(default_factory=list)
    # Chunked prefill progress: prompt tokens whose KV is already cached, and
    # the chunk size the scheduler granted for the next prefill dispatch.
    num_prefilled_tokens: int = 0
    prefill_chunk: int = 0
    # Largest per-(layer, head) retained KV length after compression (set at
    # reclaim; 0 = uncompressed, i.e. the full prompt). Bounds the decode
    # kernels' resident context.
    max_head_len: int = 0
    # Times the scheduler admitted sequences from BEHIND this one while it
    # lacked page capacity (head-of-line skip aging; Scheduler.schedule_prefill).
    hol_skips: int = 0

    def __post_init__(self):
        assert len(self.prompt_token_ids) >= 1, "empty prompt"

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_completion_tokens(self) -> int:
        return len(self.completion_token_ids)

    @property
    def num_tokens(self) -> int:
        return self.num_prompt_tokens + self.num_completion_tokens

    @property
    def last_token(self) -> int:
        if self.completion_token_ids:
            return self.completion_token_ids[-1]
        return self.prompt_token_ids[-1]

    @property
    def is_finished(self) -> bool:
        return self.status == SequenceStatus.FINISHED

    def append_token(self, token_id: int) -> None:
        self.completion_token_ids.append(token_id)

    def effective_retain_budget(self, num_kv_heads: int) -> int:
        """Total (token, head) pairs to retain for this sequence's prompt.

        budget = round(ratio * (L - protected_first - protected_last) * H_kv),
        clamped to >= 1 (reference: utils/arguments.py:109-122).
        """
        p = self.compression_params
        span = self.num_prompt_tokens - p.protected_first_tokens - p.protected_last_tokens
        return max(int(round(p.compression_ratio * span * num_kv_heads)), 1)

    def chunk_protected(self, chunk_start: int, chunk_len: int) -> tuple[int, int]:
        """Chunk-relative (protected_first, protected_last) overlap of the
        sequence's protected head/tail spans with tokens
        [chunk_start, chunk_start + chunk_len) of the prompt."""
        p = self.compression_params
        L = self.num_prompt_tokens
        pf = max(0, min(p.protected_first_tokens - chunk_start, chunk_len))
        pl = max(
            0,
            min(chunk_start + chunk_len - (L - p.protected_last_tokens),
                chunk_len),
        )
        return pf, pl

    def chunk_retain_budget(
        self, num_kv_heads: int, chunk_start: int, chunk_len: int
    ) -> int:
        """Per-chunk (token, head) retention budget for chunked compressed
        prefill: protected pairs in the chunk always fit, plus ratio of the
        unprotected span. Summed over chunks this retains slightly MORE than
        the single-shot budget (protected pairs ride on top instead of
        inside), and per-chunk selection distributes the budget uniformly
        over chunks instead of globally — both documented deviations that
        trade a little extra retention for streaming prefill."""
        p = self.compression_params
        pf, pl = self.chunk_protected(chunk_start, chunk_len)
        span = max(chunk_len - pf - pl, 0)
        return max(
            int(round(p.compression_ratio * span * num_kv_heads))
            + (pf + pl) * num_kv_heads,
            1,
        )

    def head_retention_cap(self, num_kv_heads: int = 0) -> int:
        """Per-head retained-token cap (0 = uncapped): factor x the per-head
        budget average (ratio x unprotected span), plus the protected spans
        (which always survive selection and must fit under the cap). The
        formula is deliberately head-count-free so the scheduler's page
        reservation (global heads) and the store's enforcement (shard-local
        heads) agree exactly."""
        p = self.compression_params
        f = p.max_head_retention_factor
        if not f or p.compression_ratio >= 1.0:
            return 0
        span = max(
            self.num_prompt_tokens
            - p.protected_first_tokens
            - p.protected_last_tokens,
            0,
        )
        cap = (
            int(f * p.compression_ratio * span) + 1
            + p.protected_first_tokens + p.protected_last_tokens
        )
        return min(self.num_prompt_tokens, max(cap, 1))

    def clamp_compression_if_protected(self) -> None:
        """Disable compression when protected regions cover the whole prompt
        (reference: core/llm_engine.py:144-145)."""
        p = self.compression_params
        if p.protected_first_tokens + p.protected_last_tokens >= self.num_prompt_tokens:
            self.compression_params = SequenceCompressionParams(
                compression_ratio=1.0,
                protected_first_tokens=p.protected_first_tokens,
                protected_last_tokens=p.protected_last_tokens,
            )
