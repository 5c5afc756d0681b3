"""Int8 weight-only quantization (per-output-channel symmetric scales).

Decode at small live batches is weight-read bandwidth bound (NOTES.md:
the bf16 weight stream is a multi-ms/step floor); storing GEMM weights as
int8 with per-output-channel f32 scales halves the bytes every decode step
reads from HBM. The int8->bf16 cast fuses into the dot's operand stream
(XLA elementwise-producer fusion), so no dequantized weight copy is ever
materialized. This is the TPU-native counterpart of the reference's
vendored low-precision matmul numerics (triton_kernels/numerics_details/
flexpoint.py — global-scale fp8 matmuls); per-output-channel int8 is the
standard near-lossless choice for inference-time weight-only quantization.

Quantized tree layout: each 2-D+ GEMM weight `k` is replaced in place by an
int8 array, and a sibling key `k + "_scale"` holds the f32 scales shaped
like the weight with the contraction axis collapsed to 1 (so lax.scan
unstacking and column permutations treat both identically). MoE expert
stacks stay bf16 (jax.lax.ragged_dot has no int8 path worth using yet);
norm vectors and the tiny router table are never quantized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_tensor(w, axis: int):
    """Symmetric int8 quantization of `w` along contraction axis `axis`
    (scales are per-slice of the remaining axes). Returns (w8, scale) with
    scale.shape == w.shape except axis collapsed to 1."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    unit = jnp.where(amax > 0, amax / 127.0, 1.0)
    w8 = jnp.clip(jnp.round(wf / unit), -127, 127).astype(jnp.int8)
    return w8, unit.astype(jnp.float32)


# layers-dict GEMM weights and their contraction axis (post-stacking: the
# leading axis is the layer stack). MoE expert stacks are intentionally
# absent.
_LAYER_GEMMS = {
    "qkv_proj": -2,
    "o_proj": -2,
    "gate_up_proj": -2,
    "down_proj": -2,
    "dense_gate_up_proj": -2,
    "dense_down_proj": -2,
}


def quantize_params_int8(params: dict, spec) -> dict:
    """Return a new param tree with dense GEMM weights int8-quantized.
    Idempotent on already-quantized trees."""
    out = dict(params)
    layers = dict(params["layers"])
    for key, axis in _LAYER_GEMMS.items():
        w = layers.get(key)
        if w is None or w.dtype == jnp.int8:
            continue
        if spec.is_moe and key in ("gate_up_proj", "down_proj"):
            continue  # expert stacks ride ragged_dot in bf16
        layers[key], layers[key + "_scale"] = quantize_tensor(w, axis)
    out["layers"] = layers
    embed = params["embed"]
    if embed.dtype != jnp.int8:
        # Per-vocab-row scales serve both the embedding lookup and (tied)
        # the lm_head's per-output-column scales after transpose.
        out["embed"], out["embed_scale"] = quantize_tensor(embed, -1)
    head = params.get("lm_head")
    if head is not None and head.dtype != jnp.int8:
        out["lm_head"], out["lm_head_scale"] = quantize_tensor(head, -2)
    return out


def quant_act(x):
    """Dynamic per-token symmetric int8 quantization of activations.
    Returns (x8, unit) with unit f32 shaped like x with the last axis
    collapsed to 1."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    unit = jnp.where(amax > 0, amax / 127.0, 1.0)
    x8 = jnp.clip(jnp.round(xf / unit), -127, 127).astype(jnp.int8)
    return x8, unit


def wdot(x, lp: dict, key: str, a8: bool = False):
    """x @ lp[key], transparently dequantizing int8 weights: the bf16 cast
    fuses into the dot; the per-output-channel scale applies to the
    product.

    a8 (weight_dtype="w8a8"): additionally quantize the ACTIVATIONS
    per-token and run a native int8 x int8 `dot_general` with int32
    accumulation — the MXU's 2x int8 rate path (TPU analog of the
    reference's vendored low-precision matmuls,
    triton_kernels/numerics_details/flexpoint.py). Dequantization applies
    act_unit x weight_scale to the int32 product."""
    w = lp[key]
    if w.dtype == jnp.int8 and a8:
        x8, unit = quant_act(x)
        y = jax.lax.dot_general(
            x8, w, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (
            y.astype(jnp.float32) * unit * lp[key + "_scale"]
        ).astype(x.dtype)
    if w.dtype == jnp.int8:
        y = x @ w.astype(x.dtype)
        return y * lp[key + "_scale"].astype(x.dtype)
    return x @ w


def wdot_row(x, lp: dict, key: str, psum_partial, tp_axis, a8: bool = False):
    """Row-parallel (contraction-sharded) x @ lp[key] reduced over tp.
    For int8 weights the per-output-channel scale is applied AFTER the psum:
    scales are replicated across shards, so dequantizing first would round
    each shard's partial product separately and break exact tp-vs-1 token
    parity; scaling the reduced sum keeps the arithmetic identical to tp=1.

    With a8, each shard quantizes its activation SLICE independently (the
    per-token amax is shard-local), so its int32 partial carries its own
    unit and must be dequantized before the psum; w8a8 under tp therefore
    differs from tp=1 by quantization granularity — documented, since the
    path is already lossy by construction."""
    w = lp[key]
    if w.dtype == jnp.int8 and a8:
        x8, unit = quant_act(x)
        y = jax.lax.dot_general(
            x8, w, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = psum_partial(y.astype(jnp.float32) * unit, tp_axis)
        return (y * lp[key + "_scale"]).astype(x.dtype)
    if w.dtype == jnp.int8:
        y = psum_partial(x @ w.astype(x.dtype), tp_axis)
        return y * lp[key + "_scale"].astype(x.dtype)
    return psum_partial(x @ w, tp_axis)
