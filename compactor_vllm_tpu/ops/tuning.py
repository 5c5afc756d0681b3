"""Per-device-kind kernel tuning table.

TPU analog of the reference's per-hardware autotuning: the reference caches
tuned Triton configs per CUDA compute capability on disk
(reference: attention/sparse_varlen_kernel.py:200-276) and picks decode
split factors from an occupancy heuristic
(reference: attention/sparse_decode_kernel.py:169-192). TPU generations are
a small closed set with known VMEM sizes and core topologies, so a static
table keyed by `device_kind` — plus env-var overrides for on-chip A/B —
replaces runtime autotuning. Only the v5e row is measured (NOTES.md
rounds 1-4); other rows scale the v5e constants by the part's VMEM and mark
megacore (two TensorCores behind one device: v4/v5p) so kernel selection
avoids structures whose correctness assumes sequential grid execution
(cross-program prefetch rings, zero-scratch-once-at-program-0).

Env overrides (all optional):
  CVT_DECODE_PAIRS     pairs per grid program for the multi-pair resident
                       decode kernel (0/1 selects the single-pair kernel)
  CVT_DECODE_GROUP     pages fetched + reduced per decode flash step
  CVT_RESIDENT_TOKENS  max per-head context for the resident decode kernel
  CVT_PREFILL_TN       prefill key-tile size
  CVT_RING_MB          VMEM ring budget (MiB) for decode prefetch rings
  CVT_MEGACORE         force megacore handling on (1) or off (0)
"""

from __future__ import annotations

import dataclasses
import logging
import os


@dataclasses.dataclass(frozen=True)
class KernelTuning:
    # Prefill flash key-tile: big tiles amortize loop/DMA overhead over MXU
    # work (v5e-measured; NOTES.md round 1).
    prefill_tn: int = 512
    # Pages fetched + reduced per decode flash step (one dot per
    # group_pages*page_size-token superchunk).
    decode_group_pages: int = 16
    # Max per-head context (tokens) for the RESIDENT decode kernel (whole
    # per-(b, h) KV resident in VMEM, cross-program prefetch). Above this,
    # the double-buffered ring kernel walks page groups.
    decode_resident_tokens: int = 8192
    # (b, h) pairs per grid program for the multi-pair resident kernel.
    # Round-5 on-chip sweep (benchmarks/mb_decode_pairs.py, v5e): pairs>1
    # never consistently beats single-pair — 2048x16 (the headline decode
    # shape) regresses 5% at pairs=4, other shapes are within the ~2%
    # wobble, and at ctx>=4096 the VMEM ring budget forces fallback to the
    # single-pair kernel anyway (raising the budget to 12MB made pairs=2
    # 5% WORSE). The round-4 2048x16 improvement attributed to "V-select
    # removal + multi-pair" was all V-select removal. The multi-pair
    # kernel stays selectable (CVT_DECODE_PAIRS / this table) for parts
    # where the tradeoff may differ.
    decode_pairs: int = 1
    # VMEM budget for decode prefetch rings (bounds ring depth / pair count).
    ring_budget_bytes: int = 8 << 20
    # Two TensorCores behind one device (v4/v5p "megacore"). Mosaic may
    # partition `parallel` grid dims across cores, and each core owns its
    # own scratch VMEM — so kernels relying on sequential grid order
    # (resident kernels' cross-program prefetch, zero-scratch-at-program-0)
    # are invalid. Selection falls back to the self-contained ring kernel
    # with per-group V masking and a parallel batch dim (both cores work).
    megacore: bool = False


# Ordered (device_kind substring, tuning): first match wins, so the more
# specific names come first ("TPU v5 lite" must not match the "TPU v5"
# megacore row). Substrings are matched case-insensitively.
_TABLE: tuple[tuple[str, KernelTuning], ...] = (
    # v5e — the measured row (single TensorCore, 16 MiB VMEM). Some stacks
    # report the no-space kind "TPU v5lite".
    ("v5 lite", KernelTuning()),
    ("v5lite", KernelTuning()),
    ("v5e", KernelTuning()),
    # v6e (Trillium): single TensorCore like v5e but 2x VMEM — double the
    # resident cutoff and ring budget; untuned estimate.
    ("v6 lite", KernelTuning(
        decode_resident_tokens=16384, ring_budget_bytes=16 << 20)),
    ("v6lite", KernelTuning(
        decode_resident_tokens=16384, ring_budget_bytes=16 << 20)),
    ("v6e", KernelTuning(
        decode_resident_tokens=16384, ring_budget_bytes=16 << 20)),
    # v4 / v5p: megacore parts. Constants untuned (no such hardware here);
    # megacore=True is the correctness-critical bit.
    ("v4", KernelTuning(megacore=True)),
    ("v5p", KernelTuning(megacore=True)),
    ("v5", KernelTuning(megacore=True)),  # bare "TPU v5" reports are v5p
    # v2/v3 expose each TensorCore as its own JAX device — no megacore.
    ("v3", KernelTuning(decode_resident_tokens=4096)),
    ("v2", KernelTuning(decode_resident_tokens=4096)),
    # CPU (interpret-mode tests): grid execution is sequential, so the
    # measured v5e row applies — keeps test coverage on the resident kernels.
    ("cpu", KernelTuning()),
)

# Unknown device kinds get the conservative row: megacore=True disables the
# resident kernels (whose correctness assumes sequential grid execution and
# shared scratch), which is always safe — just slower — on any future part.
_DEFAULT = KernelTuning(megacore=True)

# Test/benchmark override installed by `override(...)`; checked first.
_FORCED: KernelTuning | None = None

_cache: dict[str, KernelTuning] = {}


def _device_kind() -> str:
    try:
        import jax

        return jax.local_devices()[0].device_kind
    except Exception:  # pragma: no cover - backend init failure
        return "unknown"


def _apply_env(t: KernelTuning) -> KernelTuning:
    def _int(name, cur):
        v = os.environ.get(name)
        return cur if v is None else int(v)

    return dataclasses.replace(
        t,
        prefill_tn=_int("CVT_PREFILL_TN", t.prefill_tn),
        decode_group_pages=_int("CVT_DECODE_GROUP", t.decode_group_pages),
        decode_resident_tokens=_int(
            "CVT_RESIDENT_TOKENS", t.decode_resident_tokens),
        decode_pairs=_int("CVT_DECODE_PAIRS", t.decode_pairs),
        ring_budget_bytes=(
            int(os.environ["CVT_RING_MB"]) << 20
            if "CVT_RING_MB" in os.environ else t.ring_budget_bytes),
        megacore=(
            bool(int(os.environ["CVT_MEGACORE"]))
            if "CVT_MEGACORE" in os.environ else t.megacore),
    )


def get_tuning() -> KernelTuning:
    """Tuning constants for the local default device (memoized per kind)."""
    if _FORCED is not None:
        return _FORCED
    kind = _device_kind()
    hit = _cache.get(kind)
    if hit is not None:
        return hit
    low = kind.lower()
    t = next((v for k, v in _TABLE if k in low), None)
    if t is None:
        logging.getLogger(__name__).warning(
            "unknown TPU device_kind %r: using conservative tuning "
            "(megacore=True disables resident decode kernels); add a row to "
            "ops/tuning.py or set CVT_* env overrides", kind)
        t = _DEFAULT
    if t.megacore:
        logging.getLogger(__name__).info(
            "megacore handling active for device_kind %r: ring decode kernel "
            "with parallel batch dim (EXPERIMENTAL — interpret-validated "
            "only, no dual-TensorCore hardware run exists)", kind)
    t = _apply_env(t)
    _cache[kind] = t
    return t


class override:
    """Context manager forcing specific tuning fields (tests / smoke / A-B).

    with tuning.override(decode_resident_tokens=256):
        ...  # kernel selection sees the forced value
    """

    def __init__(self, **fields):
        self._fields = fields
        self._saved: KernelTuning | None = None

    def __enter__(self):
        global _FORCED
        self._saved = _FORCED
        base = _FORCED if _FORCED is not None else get_tuning()
        _FORCED = dataclasses.replace(base, **self._fields)
        return _FORCED

    def __exit__(self, *exc):
        global _FORCED
        _FORCED = self._saved
        return False
