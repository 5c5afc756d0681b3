"""Host-side paged KV allocator.

The device KV cache is a pool of fixed-size pages per (layer, shard); each
page holds `page_size` tokens of ONE kv head (head_dim lanes), which is what
makes head-sparse (per-head compressed) caches representable — heads of the
same sequence can retain different numbers of tokens
(reference: kv_cache/page_table.py:93-119).

Unlike the reference (CPU min-heaps + Triton scatter into a device table,
page_table.py:112-198), allocation here is fully host-side vectorized numpy
over LIFO stacks, and the device page table is refreshed with one dense
`.at[...].set` per touched batch slot — XLA-friendly, no device atomics.

Shards: pools are partitioned into `num_shards` independent id spaces so the
device cache can be sharded over the tensor-parallel axis with *local* page
ids (kv head h lives in shard h // (H // S)). Every host runs the same
deterministic allocator, so SPMD programs agree on the table contents.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from compactor_vllm_tpu.config import cdiv


@dataclass
class SlotUpdate:
    """Pending device page-table update for one batch slot: columns
    [0, num_cols) of page_table[:, slot, :, :] must be refreshed."""

    slot: int
    num_cols: int


class PageAllocator:
    def __init__(
        self,
        *,
        num_layers: int,
        num_shards: int,
        pages_per_shard: int,
        num_kv_heads: int,
        max_pages_per_head: int,
        num_slots: int,
        page_size: int,
    ):
        assert num_kv_heads % num_shards == 0, "kv heads must divide evenly into shards"
        self.L = num_layers
        self.S = num_shards
        self.P = pages_per_shard
        self.H = num_kv_heads
        self.heads_per_shard = num_kv_heads // num_shards
        self.max_pages_per_head = max_pages_per_head
        self.num_slots = num_slots
        self.page_size = page_size

        # LIFO free stacks per (layer, shard). free[l, s, :count] are free ids.
        # Ascending initialization makes every fresh reservation a run of
        # CONSECUTIVE ascending page ids per head — the decode kernel then
        # fetches whole 8-page groups with one DMA (contig_groups below).
        ids = np.arange(pages_per_shard, dtype=np.int32)
        self.free = np.tile(ids, (num_layers, num_shards, 1))
        self.free_count = np.full((num_layers, num_shards), pages_per_shard, np.int64)

        # Host mirror of the device page table + per-row allocated page counts.
        self.page_table = np.zeros(
            (num_layers, num_slots, num_kv_heads, max_pages_per_head), np.int32
        )
        self.num_pages = np.zeros((num_layers, num_slots, num_kv_heads), np.int32)

        # Batch slots. Slot 0 is reserved as the padding target
        # (reference: kv_cache/page_table.py:117-119).
        self.free_slots = list(range(num_slots - 1, 0, -1))
        self.slot_of_seq: dict[int, int] = {}

        # Peak pages in use across any (layer, shard) pool — the engine's
        # peak-KV-memory observability (BASELINE.md headline metric).
        self.peak_used_pages = 0

        # Decode blocks per seq: [L, S, nblk] first-page ids of aligned
        # heads_per_shard-page runs (see alloc_decode_blocks).
        self.decode_blocks: dict[int, np.ndarray] = {}

    # ------------------------------------------------------------------ slots

    @property
    def num_free_slots(self) -> int:
        return len(self.free_slots)

    def alloc_slot(self, seq_id: int) -> int:
        slot = self.free_slots.pop()
        self.slot_of_seq[seq_id] = slot
        return slot

    def release_slot(self, seq_id: int) -> None:
        slot = self.slot_of_seq.pop(seq_id)
        self.decode_blocks.pop(seq_id, None)
        self._free_all_pages(slot)
        self.free_slots.append(slot)

    # ------------------------------------------------------------------ pages

    def min_free_pages(self) -> int:
        """Lower bound of free pages across all (layer, shard) pools."""
        return int(self.free_count.min())

    def pages_needed(self, num_tokens: int) -> int:
        """Pages a fresh sequence of `num_tokens` needs per (layer, shard)."""
        return cdiv(num_tokens, self.page_size) * self.heads_per_shard

    def can_reserve(self, num_tokens: int) -> bool:
        return self.pages_needed(num_tokens) <= self.min_free_pages()

    def reserve(self, seq_id: int, num_tokens: int) -> SlotUpdate:
        """Grow every (layer, head) row of this sequence's slot to cover
        `num_tokens` tokens. Returns the device update descriptor."""
        slot = self.slot_of_seq[seq_id]
        target = cdiv(num_tokens, self.page_size)
        assert target <= self.max_pages_per_head, (
            f"sequence of {num_tokens} tokens exceeds max_model_len capacity"
        )
        self.grow_per_head(
            seq_id, np.full((self.L, self.H), num_tokens, np.int64)
        )
        return SlotUpdate(slot=slot, num_cols=target)

    def grow_per_head(self, seq_id: int, target_tokens: np.ndarray) -> None:
        """Grow each (layer, head) row of this sequence's slot to cover
        `target_tokens[l, h]` tokens (per-head variant of `reserve`; used to
        restore decode headroom when aligned decode blocks are unavailable)."""
        slot = self.slot_of_seq[seq_id]
        target = -(-target_tokens // self.page_size)  # cdiv, [L, H]
        assert int(target.max()) <= self.max_pages_per_head
        hs = self.heads_per_shard
        for l in range(self.L):
            need = (target[l] - self.num_pages[l, slot]).astype(np.int64)
            np.maximum(need, 0, out=need)
            if not need.any():
                continue
            need_s = need.reshape(self.S, hs)
            for s in range(self.S):
                total = int(need_s[s].sum())
                if total == 0:
                    continue
                cnt = self.free_count[l, s]
                assert total <= cnt, "out of KV pages (scheduler must gate this)"
                popped = self.free[l, s, cnt - total : cnt]
                self.free_count[l, s] = cnt - total
                off = 0
                for hl in range(hs):
                    n = int(need_s[s, hl])
                    if n == 0:
                        continue
                    h = s * hs + hl
                    cur = self.num_pages[l, slot, h]
                    self.page_table[l, slot, h, cur : cur + n] = popped[off : off + n]
                    off += n
            self.num_pages[l, slot] = np.maximum(self.num_pages[l, slot], target[l])
        self.peak_used_pages = max(
            self.peak_used_pages, int(self.P - self.free_count.min())
        )

    def alloc_decode_blocks(
        self, seq_id: int, nblk: int, start_cols: np.ndarray
    ) -> np.ndarray | None:
        """Install `nblk` decode blocks for this sequence.

        A decode block is an ALIGNED run of `heads_per_shard` consecutive
        page ids (p0 % hs == 0): page p0+hl serves local head hl. Block j's
        pages are installed at page-table column `start_cols[l, h] + j`
        (start_cols = retained_lens // page_size; pad_retained_to_page makes
        retained lengths page-aligned, so every head's decode append lands at
        the same in-block offset — see kv_cache.state.store_decode_blocks).

        Returns [L, S, nblk] first-page ids, or None (no state mutated) when
        any (layer, shard) pool lacks nblk free aligned runs or a column
        would exceed max_pages_per_head — callers fall back to per-head pages
        + the row-scatter append.
        """
        return self.alloc_decode_blocks_batch([(seq_id, nblk, start_cols)])[0]

    def alloc_decode_blocks_batch(
        self, requests: list[tuple[int, int, np.ndarray]]
    ) -> list[np.ndarray | None]:
        """Batch form of `alloc_decode_blocks`: the free-id bitmap and
        aligned-group availability are built ONCE for the whole reclaim
        batch (the per-seq rebuild was ~3.5 ms of host time — it would have
        eaten the decode win at 32+ live sequences), claims update them
        incrementally, and each free stack is compacted once at the end."""
        if not requests:
            return []
        hs, L, S, P = self.heads_per_shard, self.L, self.S, self.P
        # Free-id bitmap + fully-free aligned hs-groups, built once.
        valid = np.arange(self.free.shape[-1]) < self.free_count[..., None]
        li, si, ii = np.nonzero(valid)
        bitmap = np.zeros((L, S, P), bool)
        bitmap[li, si, self.free[li, si, ii]] = True
        grp_ok = bitmap.reshape(L, S, P // hs, hs).all(axis=3)  # [L, S, NG]
        grp_free = grp_ok.sum(axis=2)  # [L, S] running availability
        results: list[np.ndarray | None] = []
        touched = False
        for seq_id, nblk, start_cols in requests:
            if nblk <= 0:
                results.append(np.zeros((L, S, 0), np.int32))
                continue
            if (
                int(start_cols.max()) + nblk > self.max_pages_per_head
                or int(grp_free.min()) < nblk
            ):
                results.append(None)
                continue
            slot = self.slot_of_seq[seq_id]
            # Prefer low ids: prefill reservations pop from the stack TOP
            # (high end / recently freed churn zone), so low groups survive
            # longest and taking them preserves the top-of-stack contiguous
            # runs that prefill's grouped DMAs rely on. Stable argsort of
            # ~grp_ok yields the ascending True positions first.
            order = np.argsort(~grp_ok, axis=2, kind="stable")[:, :, :nblk]
            cand = (order * hs).astype(np.int32)  # [L, S, nblk] first pages
            np.put_along_axis(grp_ok, order, False, axis=2)
            grp_free -= nblk
            bitmap[
                np.repeat(np.arange(L), S * nblk * hs),
                np.tile(np.repeat(np.arange(S), nblk * hs), L),
                (cand[..., None] + np.arange(hs)).reshape(L, S, -1).ravel(),
            ] = False
            touched = True
            # Install the page table for every (layer, head) at once.
            heads = np.arange(self.H)
            pages = cand[:, heads // hs] + (heads % hs)[None, :, None]
            cols = start_cols[:, :, None] + np.arange(nblk)  # [L, H, nblk]
            np.put_along_axis(self.page_table[:, slot], cols, pages, axis=2)
            # Contract: callers shrink to start_cols first; overwriting a
            # larger held count here would silently leak the tail pages.
            assert (self.num_pages[:, slot] <= start_cols).all(), (
                "alloc_decode_blocks_batch: slot holds pages beyond start_cols"
            )
            self.num_pages[:, slot] = start_cols + nblk
            self.decode_blocks[seq_id] = cand
            results.append(cand)
        if touched:
            # Compact each free stack once against the final bitmap (order
            # within each stack is preserved).
            for l in range(L):
                for s in range(S):
                    cnt = int(self.free_count[l, s])
                    ids = self.free[l, s, :cnt]
                    keep = ids[bitmap[l, s, ids]]
                    self.free[l, s, : keep.size] = keep
                    self.free_count[l, s] = keep.size
            self.peak_used_pages = max(
                self.peak_used_pages, int(self.P - self.free_count.min())
            )
        return results

    def shrink(self, seq_id: int, keep_tokens: np.ndarray) -> None:
        """Return surplus pages to the pools, keeping capacity for
        `keep_tokens[l, h]` tokens per (layer, head). Used after compression
        freed cache space (reference: kv_cache/page_table.py:200-267)."""
        slot = self.slot_of_seq[seq_id]
        keep_pages = -(-keep_tokens // self.page_size)  # cdiv, [L, H]
        self._shrink_slot(slot, keep_pages.astype(np.int32))

    def _shrink_slot(self, slot: int, keep_pages: np.ndarray) -> None:
        hs = self.heads_per_shard
        cols = np.arange(self.max_pages_per_head, dtype=np.int32)
        for l in range(self.L):
            cur = self.num_pages[l, slot]  # [H]
            keep = np.minimum(keep_pages[l], cur)
            if (keep == cur).all():
                continue
            mask = (cols[None, :] >= keep[:, None]) & (cols[None, :] < cur[:, None])
            for s in range(self.S):
                m = mask[s * hs : (s + 1) * hs]
                if not m.any():
                    continue
                freed = self.page_table[l, slot, s * hs : (s + 1) * hs][m]
                cnt = self.free_count[l, s]
                self.free[l, s, cnt : cnt + freed.size] = freed
                self.free_count[l, s] = cnt + freed.size
            self.num_pages[l, slot] = keep

    def _free_all_pages(self, slot: int) -> None:
        self._shrink_slot(slot, np.zeros((self.L, self.H), np.int32))

    # -------------------------------------------------------------- contiguity

    def contig_groups(self, slot: int, group: int = 8) -> np.ndarray:
        """[H, ceil(maxp/group)] bool: group g of this slot's pages is a run
        of consecutive ascending ids, fully allocated, in EVERY layer — the
        decode kernel can then fetch the whole group with a single DMA."""
        maxp = self.max_pages_per_head
        ng = -(-maxp // group)
        pt = self.page_table[:, slot]  # [L, H, maxp]
        np_alloc = self.num_pages[:, slot]  # [L, H]
        ok = np.ones((self.H, ng), bool)
        for g in range(ng):
            lo, hi = g * group, g * group + group
            if hi > maxp:
                ok[:, g] = False
                continue
            blk = pt[:, :, lo:hi]  # [L, H, group]
            consec = (np.diff(blk, axis=2) == 1).all(axis=2)  # [L, H]
            allocated = np_alloc >= hi
            ok[:, g] = (consec & allocated).all(axis=0)
        return ok

    # ------------------------------------------------------------------ debug

    def check_invariants(self) -> None:
        """Every page id is either free or allocated exactly once (tests)."""
        for l in range(self.L):
            for s in range(self.S):
                seen = set(self.free[l, s, : self.free_count[l, s]].tolist())
                assert len(seen) == int(self.free_count[l, s]), "duplicate free page"
                for slot in range(self.num_slots):
                    for hl in range(self.heads_per_shard):
                        h = s * self.heads_per_shard + hl
                        n = int(self.num_pages[l, slot, h])
                        for p in self.page_table[l, slot, h, :n].tolist():
                            assert p not in seen, "page both free and allocated"
                            seen.add(p)
                assert len(seen) <= self.P
