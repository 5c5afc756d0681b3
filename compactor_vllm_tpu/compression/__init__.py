"""Training-free KV-compression methods: scoring registry and extension API.

Mirrors the reference's extension surface (reference:
compression/__init__.py:13-29 COMPRESSION_REGISTRY, compression/common.py:9-101
BaseCompressionMethod, README.md:244-267 extension recipe), re-expressed for
the functional TPU engine: a method is a `ScoringMethod` whose `score` hook
returns per-(token, head) selection scores `[T, H]` for a prefill batch; the
engine then runs the shared joint (token, head) top-k and the page-granular
compressed store. Protected head/tail ranges must be +inf and padding -inf —
use `apply_protection`.

To add a method:

    from compactor_vllm_tpu.compression import ScoringMethod, register_method

    def my_scores(q, k_prerope, k_postrope, meta, comp, *, t_pad, b_pad):
        scores = ...  # [T, H] jnp, higher = keep
        return apply_protection(scores, meta.seq_lens, meta.token_seq_idx,
                                meta.token_in_pos, meta.token_valid,
                                meta.protected_first, meta.protected_last)

    register_method("my_method", ScoringMethod(score=my_scores))

and select it with `BatchCompressionParams(compression_method="my_method")`
(enum members and registered string names are both accepted).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax

from compactor_vllm_tpu.compression.compactor import (
    apply_protection,
    compactor_scores,
)
from compactor_vllm_tpu.compression.select import (
    Selection,
    threshold_select,
    topk_retain_indices,
)
from compactor_vllm_tpu.compression.snapkv import snapkv_scores
from compactor_vllm_tpu.config import CompressionMethod

__all__ = [
    "ScoringMethod",
    "COMPRESSION_REGISTRY",
    "register_method",
    "get_method",
    "apply_protection",
    "Selection",
    "threshold_select",
    "topk_retain_indices",
    "compactor_scores",
    "snapkv_scores",
]


@dataclass(frozen=True)
class ScoringMethod:
    """A KV-compression scoring method.

    score(q, k_prerope, k_postrope, meta, comp, *, t_pad, b_pad,
          postrope_colmass=None) -> [T, H]
    runs inside the jitted prefill step; it must be pure jnp/Pallas with
    static shapes. `meta` is the PrefillMeta batch descriptor and `comp` the
    CompressionStatic trace-time config.

    `wants_postrope_colmass`: when True AND the attention backend supports
    fused chunk scoring (Pallas prefill kernel), the engine passes the raw
    per-(token, head) 128-chunk non-causal column mass it computed for free
    during attention; score() must then skip its own postrope pass. When the
    backend cannot fuse, postrope_colmass is None and score() computes it.
    """

    score: Callable[..., jax.Array]
    wants_postrope_colmass: bool = False
    # True when score() is CHUNK-LOCAL: the scores of a prompt span depend
    # only on that span's q/k (Compactor: pre-RoPE leverage is 512-chunk
    # local and post-RoPE colmass 128-chunk local by construction). Such
    # methods compose with chunked prefill — each chunk is scored, selected
    # under its own pro-rated budget, and stored compactly before the next
    # chunk runs. Query-aware methods (SnapKV needs the prompt-tail window)
    # are not chunk-local and require whole-prompt prefill.
    chunk_local: bool = False


def _compactor_score(q, k_pre, k_post, meta, comp, *, t_pad, b_pad,
                     postrope_colmass=None):
    chunk = comp.chunk_size if comp.chunked else t_pad
    return compactor_scores(
        q, k_pre, k_post, meta.phi, meta.seq_lens,
        meta.token_seq_idx, meta.token_in_pos, meta.token_valid,
        meta.protected_first, meta.protected_last,
        score_chunk_size=chunk, t_pad=t_pad, b_pad=b_pad,
        aligned=comp.aligned and comp.chunked,
        postrope_colmass=postrope_colmass,
    )


def _snapkv_score(q, k_pre, k_post, meta, comp, *, t_pad, b_pad,
                  postrope_colmass=None):
    return snapkv_scores(
        q, k_post, meta.seq_starts, meta.seq_lens, meta.token_seq_idx,
        meta.token_in_pos, meta.token_valid, meta.protected_first,
        meta.protected_last, max_q=t_pad,
    )


COMPRESSION_REGISTRY: dict[str, ScoringMethod] = {
    CompressionMethod.COMPACTOR.value: ScoringMethod(
        score=_compactor_score, wants_postrope_colmass=True, chunk_local=True
    ),
    CompressionMethod.SNAPKV.value: ScoringMethod(score=_snapkv_score),
}


def register_method(name: str, method: ScoringMethod) -> None:
    if name in COMPRESSION_REGISTRY:
        raise ValueError(f"compression method {name!r} already registered")
    COMPRESSION_REGISTRY[name] = method


def get_method(method: "CompressionMethod | str") -> ScoringMethod:
    name = method.value if isinstance(method, CompressionMethod) else method
    if name not in COMPRESSION_REGISTRY:
        raise KeyError(
            f"unknown compression method {name!r}; registered: "
            f"{sorted(COMPRESSION_REGISTRY)}"
        )
    return COMPRESSION_REGISTRY[name]
