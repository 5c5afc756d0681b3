"""HF safetensors checkpoint loading into layer-stacked JAX parameter trees.

Replaces the reference's per-module weight_loader indirection
(models/llama3.py:214-281, qwen3_moe.py:322-378) with a single streaming pass:
torch-layout [out, in] matrices are transposed, q/k/v and gate/up are packed
(same packed_modules_mapping as the reference), per-layer tensors are stacked
into one leading layer axis for `lax.scan`, and MoE expert tensors are stacked
into a leading expert axis for `ragged_dot`.
"""

from __future__ import annotations

import json
import os
import re

import jax.numpy as jnp
import numpy as np

from compactor_vllm_tpu.models.transformer import ModelSpec

_LAYER_RE = re.compile(r"^model\.layers\.(\d+)\.(.+)$")
_EXPERT_RE = re.compile(r"^mlp\.experts\.(\d+)\.(.+)$")


def _to_numpy(t) -> np.ndarray:
    """torch tensor -> numpy, dtype-preserving (bf16 via a bit-pattern view
    — no f32 intermediate; ml_dtypes gives numpy a real bfloat16)."""
    import ml_dtypes
    import torch

    t = t.detach().cpu()
    if t.dtype == torch.bfloat16:
        return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
    if t.dtype == torch.float16:
        t = t.to(torch.float32)
    return t.numpy()


def iter_checkpoint_tensors(path: str):
    """Yield (name, torch_tensor) over all safetensors shards in `path`."""
    from safetensors import safe_open

    index_file = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index_file):
        with open(index_file) as f:
            index = json.load(f)
        shards = sorted(set(index["weight_map"].values()))
    else:
        shards = [
            f for f in sorted(os.listdir(path)) if f.endswith(".safetensors")
        ]
    for shard in shards:
        with safe_open(os.path.join(path, shard), framework="pt") as fh:
            for name in fh.keys():
                yield name, fh.get_tensor(name)


def load_params(
    spec: ModelSpec, source, dtype=jnp.bfloat16, device_put=True
) -> dict:
    """Build the parameter pytree from a checkpoint.

    `source` is either a directory path (safetensors shards) or a mapping of
    name -> torch tensor (e.g. an HF model's state_dict, used by tests).
    """
    if isinstance(source, str):
        tensors = iter_checkpoint_tensors(source)
    else:
        tensors = source.items()

    L, Hd, D = spec.num_layers, spec.hidden_size, spec.head_dim
    qs, kvs = spec.q_size, spec.kv_size
    # Stage directly in the TARGET dtype: an 8B checkpoint then peaks at
    # ~16 GB host RAM (bf16) instead of ~32 GB f32 staging + a second full
    # f32->bf16 cast copy (the reference likewise keeps the checkpoint dtype
    # end to end, models/llama3.py:243-281). Assignments cast per-tensor.
    np_dtype = np.dtype(jnp.dtype(dtype).name)

    layers: dict[str, np.ndarray] = {
        "input_norm": np.zeros((L, Hd), np_dtype),
        "qkv_proj": np.zeros((L, Hd, qs + 2 * kvs), np_dtype),
        "o_proj": np.zeros((L, qs, Hd), np_dtype),
        "post_norm": np.zeros((L, Hd), np_dtype),
    }
    if spec.use_qk_norm:
        layers["q_norm"] = np.zeros((L, D), np_dtype)
        layers["k_norm"] = np.zeros((L, D), np_dtype)
    # Mixed dense/MoE stacks keep a separate (smaller) stack per kind;
    # `moe_pos`/`dense_pos` map a global layer index into its kind's stack
    # (reference: models/qwen3_moe.py:214-230 chooses the block per layer).
    moe_pos = {l: i for i, l in enumerate(spec.moe_layer_ids)}
    dense_pos = {l: i for i, l in enumerate(spec.dense_layer_ids)}
    if spec.is_moe:
        E, I = spec.num_experts, spec.moe_intermediate_size
        Lm = len(spec.moe_layer_ids)
        layers["router"] = np.zeros((Lm, Hd, E), np_dtype)
        layers["gate_up_proj"] = np.zeros((Lm, E, Hd, 2 * I), np_dtype)
        layers["down_proj"] = np.zeros((Lm, E, I, Hd), np_dtype)
        if spec.is_mixed:
            Id, Ld = spec.intermediate_size, len(spec.dense_layer_ids)
            layers["dense_gate_up_proj"] = np.zeros((Ld, Hd, 2 * Id), np_dtype)
            layers["dense_down_proj"] = np.zeros((Ld, Id, Hd), np_dtype)
    else:
        I = spec.intermediate_size
        layers["gate_up_proj"] = np.zeros((L, Hd, 2 * I), np_dtype)
        layers["down_proj"] = np.zeros((L, I, Hd), np_dtype)

    top: dict[str, np.ndarray] = {}

    def assign_layer(i: int, sub: str, w: np.ndarray):
        moe_i = spec.moe_intermediate_size if spec.is_moe else spec.intermediate_size
        if sub == "input_layernorm.weight":
            layers["input_norm"][i] = w
        elif sub == "post_attention_layernorm.weight":
            layers["post_norm"][i] = w
        elif sub == "self_attn.q_proj.weight":
            layers["qkv_proj"][i, :, :qs] = w.T
        elif sub == "self_attn.k_proj.weight":
            layers["qkv_proj"][i, :, qs : qs + kvs] = w.T
        elif sub == "self_attn.v_proj.weight":
            layers["qkv_proj"][i, :, qs + kvs :] = w.T
        elif sub == "self_attn.o_proj.weight":
            layers["o_proj"][i] = w.T
        elif sub == "self_attn.q_norm.weight":
            layers["q_norm"][i] = w
        elif sub == "self_attn.k_norm.weight":
            layers["k_norm"][i] = w
        elif sub == "mlp.gate_proj.weight":
            if spec.is_mixed:
                layers["dense_gate_up_proj"][dense_pos[i], :, : spec.intermediate_size] = w.T
            else:
                layers["gate_up_proj"][i, :, :I] = w.T
        elif sub == "mlp.up_proj.weight":
            if spec.is_mixed:
                layers["dense_gate_up_proj"][dense_pos[i], :, spec.intermediate_size :] = w.T
            else:
                layers["gate_up_proj"][i, :, I:] = w.T
        elif sub == "mlp.down_proj.weight":
            if spec.is_mixed:
                layers["dense_down_proj"][dense_pos[i]] = w.T
            else:
                layers["down_proj"][i] = w.T
        elif sub == "mlp.gate.weight":
            layers["router"][moe_pos[i]] = w.T
        elif (m := _EXPERT_RE.match(sub)) is not None:
            e = int(m.group(1))
            esub = m.group(2)
            li = moe_pos[i]
            if esub == "gate_proj.weight":
                layers["gate_up_proj"][li, e, :, :moe_i] = w.T
            elif esub == "up_proj.weight":
                layers["gate_up_proj"][li, e, :, moe_i:] = w.T
            elif esub == "down_proj.weight":
                layers["down_proj"][li, e] = w.T

    seen_layers: set[tuple[int, str]] = set()

    for name, t in tensors:
        w = _to_numpy(t)
        if (m := _LAYER_RE.match(name)) is not None:
            assign_layer(int(m.group(1)), m.group(2), w)
            seen_layers.add((int(m.group(1)), m.group(2).split(".")[0]))
        elif name == "model.embed_tokens.weight":
            top["embed"] = w
        elif name == "model.norm.weight":
            top["final_norm"] = w
        elif name == "lm_head.weight":
            top["lm_head"] = w.T

    # A missing tensor would otherwise silently stay zero-initialized.
    for req in ("embed", "final_norm"):
        if req not in top:
            raise ValueError(f"checkpoint missing model.{req} weight")
    missing = [
        (i, part)
        for i in range(L)
        for part in ("self_attn", "mlp", "input_layernorm", "post_attention_layernorm")
        if (i, part) not in seen_layers
    ]
    if missing:
        raise ValueError(f"checkpoint missing layer weights: {missing[:8]}...")

    params = {
        "embed": top["embed"],
        "layers": layers,
        "final_norm": top["final_norm"],
    }
    if not spec.tie_word_embeddings:
        if "lm_head" not in top:
            raise ValueError("checkpoint missing lm_head but embeddings not tied")
        params["lm_head"] = top["lm_head"]

    def cast(x):
        # Staging arrays are already in `dtype` — this is a transfer, not a
        # second full-tree cast copy.
        return jnp.asarray(x, dtype=dtype) if device_put else np.asarray(x, np_dtype)

    import jax

    return jax.tree.map(cast, params)
