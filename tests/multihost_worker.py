"""Worker for the 2-process multihost test (launched by test_multihost.py).

Each process owns 2 virtual CPU devices; together they form a 4-device
(dp=2, tp=2) mesh spanning two JAX processes. Host 0 broadcasts the request
payload; both hosts run the SPMD engine end-to-end and print their sampled
tokens — the launcher asserts byte-identical outputs.
"""

import json
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from compactor_vllm_tpu.parallel import multihost  # noqa: E402

multihost.initialize(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 2 * nproc, jax.device_count()
assert len(jax.local_devices()) == 2

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from compactor_vllm_tpu import (  # noqa: E402
    BatchCompressionParams,
    CompressionMethod,
    LLMConfig,
    LLMEngine,
    SamplingParams,
    Sequence,
    SequenceCompressionParams,
)
from compactor_vllm_tpu.models.transformer import ModelSpec, init_params  # noqa: E402

# --- control-plane broadcast: host 0 is the source of the request stream
if pid == 0:
    rng = np.random.default_rng(3)
    payload = {
        "prompts": [rng.integers(1, 512, size=n).tolist() for n in (48, 33, 56, 25)],
    }
else:
    payload = None
payload = multihost.broadcast_requests(payload)
assert payload is not None and len(payload["prompts"]) == 4

spec = ModelSpec(
    model_type="llama", num_layers=2, num_q_heads=4, num_kv_heads=2,
    head_dim=64, hidden_size=128, intermediate_size=256, vocab_size=512,
)
params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
cfg = LLMConfig(
    max_num_seqs=4, max_model_len=128, max_num_batched_tokens=256,
    kvcache_page_size=8, num_kv_pages=256, eos=-1, seed=0,
    tensor_parallel_size=2, data_parallel_size=2,
    prefill_token_buckets=(256,), decode_batch_buckets=(2,),
    decode_loop_steps=4,
)
eng = LLMEngine(cfg, spec=spec, params=params, tokenizer=None)
seqs = [
    Sequence(
        p,
        sampling_params=SamplingParams(temperature=0.0, max_new_tokens=6),
        compression_params=SequenceCompressionParams(compression_ratio=0.5),
    )
    for p in payload["prompts"]
]
outs = eng.generate_from_sequences(
    seqs, BatchCompressionParams(compression_method=CompressionMethod.COMPACTOR)
)
result = [o.completion_token_ids for o in outs]
print("RESULT " + json.dumps({"pid": pid, "tokens": result}), flush=True)
