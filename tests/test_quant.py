"""Int8 weight-only quantization (layers/quant.py).

The quantized tree must (a) be numerically close to bf16 (per-output-channel
symmetric int8 is near-lossless for inference GEMMs), (b) round-trip the
sharding machinery (scale siblings follow their weight's column permutation
and partition spec), and (c) run the full engine path end-to-end.
Reference analog: the vendored low-precision matmul numerics
(triton_kernels/numerics_details/flexpoint.py) — here weight-only via XLA
cast fusion rather than custom kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compactor_vllm_tpu import (
    BatchCompressionParams,
    CompressionMethod,
    LLMConfig,
    SamplingParams,
    SequenceCompressionParams,
)
from compactor_vllm_tpu.core.engine import LLMEngine
from compactor_vllm_tpu.layers.quant import (
    quantize_params_int8,
    quantize_tensor,
    wdot,
)
from compactor_vllm_tpu.models.transformer import ModelSpec, init_params
from compactor_vllm_tpu.utils.sequence import Sequence


def small_spec(moe=False):
    return ModelSpec(
        model_type="qwen3_moe" if moe else "qwen3",
        num_layers=2,
        num_q_heads=4,
        num_kv_heads=2,
        head_dim=16,
        hidden_size=64,
        intermediate_size=128,
        vocab_size=128,
        rope_theta=10000.0,
        use_qk_norm=True,
        tie_word_embeddings=False,
        num_experts=4 if moe else 0,
        num_experts_per_tok=2 if moe else 0,
        moe_intermediate_size=64 if moe else 0,
    )


def test_quantize_tensor_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    w8, scale = quantize_tensor(w, axis=-2)
    assert w8.dtype == jnp.int8 and scale.shape == (1, 96)
    deq = w8.astype(jnp.float32) * scale
    # max error <= half a quantization step per column
    step = scale[0]
    err = jnp.max(jnp.abs(deq - w), axis=0)
    assert bool(jnp.all(err <= step * 0.5 + 1e-7))
    # zero column -> scale 1, no NaN
    wz = w.at[:, 0].set(0.0)
    w8z, sz = quantize_tensor(wz, axis=-2)
    assert float(sz[0, 0]) == 1.0 and int(jnp.abs(w8z[:, 0]).max()) == 0


def test_wdot_matches_dequantized():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    w8, s = quantize_tensor(w, -2)
    lp = {"w": w8, "w_scale": s}
    got = wdot(x, lp, "w")
    want = x @ (w8.astype(jnp.float32) * s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2,
                               atol=1e-3)
    # unquantized passthrough
    np.testing.assert_allclose(
        np.asarray(wdot(x, {"w": w}, "w")), np.asarray(x @ w), rtol=1e-6
    )


def test_int8_matches_dequantized_engine():
    """Greedy tokens of the int8 engine match an engine run on the explicitly
    dequantized f32 weights: per-output-channel scales commute with the dot
    (sum_k x_k w8_kj * s_j == sum_k x_k (w8_kj s_j)), so the two paths differ
    only by f32 rounding of the final scale multiply."""
    spec = small_spec()
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_params_int8(params, spec)

    def deq_tree(p):
        out = dict(p)
        layers = dict(p["layers"])
        for k in list(layers):
            if k in layers and layers[k].dtype == jnp.int8:
                layers[k] = (
                    layers[k].astype(jnp.float32) * layers[k + "_scale"]
                )
                del layers[k + "_scale"]
        out["layers"] = layers
        for k in ("embed", "lm_head"):
            if k in out and out[k].dtype == jnp.int8:
                out[k] = out[k].astype(jnp.float32) * out[k + "_scale"]
                del out[k + "_scale"]
        return out

    def run(p, weight_dtype):
        cfg = LLMConfig(
            max_num_seqs=4, max_model_len=64, kvcache_page_size=8,
            num_kv_pages=64, eos=-2, seed=0, weight_dtype=weight_dtype,
            dtype="float32",
        )
        eng = LLMEngine(cfg, spec=spec, params=p, tokenizer=None)
        seqs = [
            Sequence(
                prompt_token_ids=list(range(1, 33)),
                sampling_params=SamplingParams(
                    temperature=0.0, max_new_tokens=8
                ),
            )
            for _ in range(2)
        ]
        eng.generate_from_sequences(seqs)
        return [s.completion_token_ids for s in seqs]

    # quantize_params_int8 is idempotent, so passing the pre-quantized tree
    # through weight_dtype="int8" exercises the engine-init hook too.
    assert run(qparams, "int8") == run(deq_tree(qparams), "auto")


@pytest.mark.parametrize("moe", [False, True])
def test_int8_engine_e2e(moe):
    """Full engine path (compression + decode) runs with int8 weights; for
    MoE the expert stacks stay bf16 (ragged_dot) while dense GEMMs quantize."""
    spec = small_spec(moe)
    params = init_params(spec, jax.random.PRNGKey(2), dtype=jnp.bfloat16)
    cfg = LLMConfig(
        max_num_seqs=4, max_model_len=128, kvcache_page_size=8,
        num_kv_pages=128, eos=-2, seed=0, weight_dtype="int8",
    )
    eng = LLMEngine(cfg, spec=spec, params=params, tokenizer=None)
    seqs = [
        Sequence(
            prompt_token_ids=np.random.default_rng(7).integers(
                0, spec.vocab_size, size=40
            ).tolist(),
            sampling_params=SamplingParams(temperature=0.0, max_new_tokens=6),
            compression_params=SequenceCompressionParams(
                compression_ratio=0.5
            ),
        )
        for _ in range(2)
    ]
    eng.generate_from_sequences(
        seqs,
        BatchCompressionParams(compression_method=CompressionMethod.COMPACTOR),
    )
    for s in seqs:
        assert len(s.completion_token_ids) == 6


def test_quant_act_roundtrip_error():
    from compactor_vllm_tpu.layers.quant import quant_act

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(6, 96)).astype(np.float32)) * 13.0
    x8, unit = quant_act(x)
    assert x8.dtype == jnp.int8 and unit.shape == (6, 1)
    err = jnp.abs(x8.astype(jnp.float32) * unit - x)
    assert bool(jnp.all(err <= unit * 0.5 + 1e-6))
    # all-zero row -> unit 1, zeros, no NaN
    xz = x.at[2].set(0.0)
    x8z, uz = quant_act(xz)
    assert float(uz[2, 0]) == 1.0 and int(jnp.abs(x8z[2]).max()) == 0


def test_wdot_a8_matches_fake_quant():
    """The w8a8 path must equal the explicit int32 fake-quant computation:
    int8 x int8 dot is exact in int32; dequant = act_unit x weight_scale."""
    rng = np.random.default_rng(12)
    w = jnp.asarray(rng.normal(size=(32, 48)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32)) * 5.0
    w8, s = quantize_tensor(w, -2)
    lp = {"w": w8, "w_scale": s}
    got = wdot(x, lp, "w", a8=True)
    from compactor_vllm_tpu.layers.quant import quant_act

    x8, unit = quant_act(x)
    want = (
        x8.astype(jnp.int32) @ w8.astype(jnp.int32)
    ).astype(jnp.float32) * unit * s
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )
    # and it is numerically close to the unquantized product (error grows
    # ~sqrt(K) x quant step; loose bound — the strict check is above)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(x @ w), rtol=0.2, atol=1.0
    )


@pytest.mark.parametrize("moe", [False, True])
def test_w8a8_engine_e2e(moe):
    """weight_dtype="w8a8": native int8 x int8 GEMMs with dynamic per-token
    activation quantization run the full engine path (compression + decode).
    Reference analog: triton_kernels' low-precision matmuls (flexpoint.py),
    here as the MXU's 2x-rate int8 dot."""
    spec = small_spec(moe)
    params = init_params(spec, jax.random.PRNGKey(2), dtype=jnp.bfloat16)
    cfg = LLMConfig(
        max_num_seqs=4, max_model_len=128, kvcache_page_size=8,
        num_kv_pages=128, eos=-2, seed=0, weight_dtype="w8a8",
    )
    eng = LLMEngine(cfg, spec=spec, params=params, tokenizer=None)
    assert eng.runner.lspec.act_quant
    seqs = [
        Sequence(
            prompt_token_ids=np.random.default_rng(7).integers(
                0, spec.vocab_size, size=40
            ).tolist(),
            sampling_params=SamplingParams(temperature=0.0, max_new_tokens=6),
            compression_params=SequenceCompressionParams(
                compression_ratio=0.5
            ),
        )
        for _ in range(2)
    ]
    eng.generate_from_sequences(
        seqs,
        BatchCompressionParams(compression_method=CompressionMethod.COMPACTOR),
    )
    for s in seqs:
        assert len(s.completion_token_ids) == 6
        assert all(0 <= t < spec.vocab_size for t in s.completion_token_ids)


def test_w8a8_tp2_runs():
    """w8a8 under tp=2: per-shard activation quantization (documented
    granularity difference vs tp=1) still runs end-to-end."""
    spec = small_spec()
    params = init_params(spec, jax.random.PRNGKey(3), dtype=jnp.float32)
    cfg = LLMConfig(
        max_num_seqs=4, max_model_len=128, kvcache_page_size=8,
        num_kv_pages=128, eos=-2, seed=0, weight_dtype="w8a8",
        tensor_parallel_size=2, dtype="float32",
    )
    eng = LLMEngine(cfg, spec=spec, params=params, tokenizer=None)
    seqs = [
        Sequence(
            prompt_token_ids=list(range(2, 30)),
            sampling_params=SamplingParams(temperature=0.0, max_new_tokens=8),
        )
    ]
    eng.generate_from_sequences(seqs)
    assert len(seqs[0].completion_token_ids) == 8


def test_int8_tp2_matches_tp1():
    """Sharding correctness: the blocked-column permutation + scale specs
    reproduce tp=1 int8 tokens exactly under tp=2."""
    spec = small_spec()
    params = init_params(spec, jax.random.PRNGKey(3), dtype=jnp.float32)

    def run(tp):
        cfg = LLMConfig(
            max_num_seqs=4, max_model_len=128, kvcache_page_size=8,
            num_kv_pages=128, eos=-2, seed=0, weight_dtype="int8",
            tensor_parallel_size=tp, dtype="float32",
        )
        eng = LLMEngine(cfg, spec=spec, params=params, tokenizer=None)
        seqs = [
            Sequence(
                prompt_token_ids=list(range(2, 30)),
                sampling_params=SamplingParams(
                    temperature=0.0, max_new_tokens=8
                ),
            )
        ]
        eng.generate_from_sequences(seqs)
        return seqs[0].completion_token_ids

    assert run(1) == run(2)
