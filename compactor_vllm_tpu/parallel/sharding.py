"""Sharding rules: model/cache partition specs and shard-blocked weight layout.

Replaces the reference's per-module TP weight loaders
(reference: layers/linear.py:12-153, layers/embed_head.py:8-69) with data
layout + PartitionSpec rules:

- Column-parallel (qkv_proj, gate_up_proj): output-feature axis sharded on
  "tp". Because these store *fused* projections ([q|k|v], [gate|up]), the
  columns are first permuted into a SHARD-BLOCKED layout — shard s's block is
  `[q_s | k_s | v_s]` (resp. `[gate_s | up_s]`) — so each device's block is
  exactly its local fused projection and the in-kernel `jnp.split` with
  *local* sizes is correct. This is the TPU analog of the reference's
  shard-aware packed weight_loader (linear.py:60-129).
- Row-parallel (o_proj, down_proj): input-feature axis sharded on "tp";
  callers `psum` the partial output (linear.py:149-153).
- Vocab-parallel: embedding rows and lm_head columns sharded on "tp"
  (embed_head.py:34-68).
- MoE: experts sharded on "tp" (expert-parallel); router replicated.
- KV cache: page pools concatenated on the rows axis over ("dp","tp");
  page table / lens shard batch slots on "dp" and kv heads on "tp".
"""

from __future__ import annotations

from dataclasses import replace
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from compactor_vllm_tpu.kv_cache.state import KVCacheState
from compactor_vllm_tpu.parallel.mesh import AXIS_DP, AXIS_TP

if TYPE_CHECKING:  # avoid a models <-> parallel import cycle at runtime
    from compactor_vllm_tpu.models.transformer import ModelSpec


def local_spec(spec: ModelSpec, tp: int) -> ModelSpec:
    """The per-device model spec under `tp`-way tensor parallelism."""
    if tp == 1:
        return spec
    assert spec.num_q_heads % tp == 0, "q heads must divide tp"
    assert spec.num_kv_heads % tp == 0, (
        "kv heads must divide tp (reference: core/memory_manager.py:29-31)"
    )
    assert spec.vocab_size % tp == 0, "vocab must divide tp"
    kw = dict(
        num_q_heads=spec.num_q_heads // tp,
        num_kv_heads=spec.num_kv_heads // tp,
    )
    if spec.is_moe:
        assert spec.num_experts % tp == 0, "experts must divide tp"
        kw["num_experts"] = spec.num_experts // tp
    if not spec.is_moe or spec.is_mixed:
        # Dense MLP layers (all layers, or the mlp_only_layers of a mixed
        # stack) are channel-sharded.
        assert spec.intermediate_size % tp == 0
        kw["intermediate_size"] = spec.intermediate_size // tp
    return replace(spec, **kw)


def param_pspecs(spec: ModelSpec, quantized: bool = False) -> dict:
    """PartitionSpec tree matching the parameter pytree of init_params/
    load_params (plus the `*_scale` siblings of layers/quant.py when
    `quantized`: scales shard with the weight's OUTPUT axis — weights
    sharded on the contracted axis keep replicated scales)."""
    layers = {
        "input_norm": P(),
        "qkv_proj": P(None, None, AXIS_TP),
        "o_proj": P(None, AXIS_TP, None),
        "post_norm": P(),
    }
    if spec.use_qk_norm:
        layers["q_norm"] = P()
        layers["k_norm"] = P()
    if spec.is_moe:
        layers["router"] = P()
        layers["gate_up_proj"] = P(None, AXIS_TP, None, None)
        layers["down_proj"] = P(None, AXIS_TP, None, None)
        if spec.is_mixed:
            layers["dense_gate_up_proj"] = P(None, None, AXIS_TP)
            layers["dense_down_proj"] = P(None, AXIS_TP, None)
    else:
        layers["gate_up_proj"] = P(None, None, AXIS_TP)
        layers["down_proj"] = P(None, AXIS_TP, None)
    specs = {
        "embed": P(AXIS_TP, None),
        "layers": layers,
        "final_norm": P(),
    }
    if not spec.tie_word_embeddings:
        specs["lm_head"] = P(None, AXIS_TP)
    if quantized:
        layers["qkv_proj_scale"] = P(None, None, AXIS_TP)
        layers["o_proj_scale"] = P()
        if not spec.is_moe:
            layers["gate_up_proj_scale"] = P(None, None, AXIS_TP)
            layers["down_proj_scale"] = P()
        elif spec.is_mixed:
            layers["dense_gate_up_proj_scale"] = P(None, None, AXIS_TP)
            layers["dense_down_proj_scale"] = P()
        specs["embed_scale"] = P(AXIS_TP, None)
        if not spec.tie_word_embeddings:
            specs["lm_head_scale"] = P(None, AXIS_TP)
    return specs


def _blocked_cols(blocks: list[jax.Array], tp: int) -> jax.Array:
    """Interleave per-projection column blocks into shard-major order:
    out columns = [b0_s0 | b1_s0 | ... | b0_s1 | b1_s1 | ...]."""
    pieces = []
    for s in range(tp):
        for b in blocks:
            w = b.shape[-1] // tp
            pieces.append(b[..., s * w : (s + 1) * w])
    return jnp.concatenate(pieces, axis=-1)


def shard_blocked_params(params: dict, spec: ModelSpec, tp: int) -> dict:
    """Permute fused projection columns into the shard-blocked layout.

    No-op for tp == 1. Head-granular: q columns are grouped per head
    (head-major layout, matching init_params/load_params), so slicing by
    equal column counts keeps whole heads together.
    """
    if tp == 1:
        return params
    out = dict(params)
    layers = dict(params["layers"])
    qs, kvs = spec.q_size, spec.kv_size

    def permute(key, bounds):
        for k in (key, key + "_scale"):
            if k in layers:
                w = layers[k]
                blocks = [
                    w[..., a:b] for a, b in zip((0,) + bounds, bounds + (None,))
                ]
                layers[k] = _blocked_cols(blocks, tp)

    permute("qkv_proj", (qs, qs + kvs))
    I = spec.intermediate_size
    if not spec.is_moe:
        permute("gate_up_proj", (I,))
    elif spec.is_mixed:
        permute("dense_gate_up_proj", (I,))
    out["layers"] = layers
    return out


def cache_pspecs() -> KVCacheState:
    """PartitionSpecs for the KV cache pytree: per-device page pools are
    concatenated along the rows axis; the device order (dp-major, tp-minor)
    must match how the runner replicates the allocator's pools."""
    return KVCacheState(
        kv_pages=P((AXIS_DP, AXIS_TP), None),
        page_table=P(None, AXIS_DP, AXIS_TP, None),
        bh_lens=P(None, AXIS_DP, AXIS_TP),
    )


def shard_params(params: dict, spec: ModelSpec, mesh, tp: int) -> dict:
    """Host-side: block-permute fused weights and place them on the mesh."""
    from jax.sharding import NamedSharding

    params = shard_blocked_params(params, spec, tp)
    pspecs = param_pspecs(spec, quantized="embed_scale" in params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, pspecs
    )
