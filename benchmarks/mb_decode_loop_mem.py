"""AOT static-memory probe for the fused decode loop.

bench.py OOM'd at the decode-loop COMPILE ("Used 18.10G of 15.75G hbm") at
the round-2 geometry that used to fit — a round-3 memory regression. This
lowers `_decode_loop_fn` with ShapeDtypeStructs (no device arrays, no
execution) at a scaled-down geometry and prints
`memory_analysis()` for each suspect variant:

  blocks+cond   current default (decode-block append + early-exit cond)
  blocks only   CVT_DECODE_EARLY_EXIT=0 analog
  cond only     row-scatter append
  neither       the round-2 configuration

If a variant's temp size tracks the POOL size (pass a second pool-pages arg
to confirm scaling), that variant copies the cache somewhere (broken
donation / cond pass-through copy / scatter-through-reshape copy).

Usage: python benchmarks/mb_decode_loop_mem.py [pool_pages] [layers]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from compactor_vllm_tpu.config import AttentionBackend, LLMConfig
from compactor_vllm_tpu.core import runner as runner_mod
from compactor_vllm_tpu.core.runner import ModelRunner, cdiv
from compactor_vllm_tpu.models.transformer import DecodeMeta, ModelSpec, init_params


def main():
    pool = int(sys.argv[1]) if len(sys.argv) > 1 else 8704
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    print("device:", jax.devices()[0].device_kind, flush=True)
    spec = ModelSpec(
        model_type="qwen3", num_layers=layers, num_q_heads=16, num_kv_heads=8,
        head_dim=128, hidden_size=2048, intermediate_size=6144,
        vocab_size=151936, use_qk_norm=True, tie_word_embeddings=True,
        rope_theta=1000000.0,
    )
    cfg = LLMConfig(
        max_num_seqs=64,
        max_model_len=4288,
        max_num_batched_tokens=16384,
        kvcache_page_size=64,
        num_kv_pages=pool,
        eos=-1,
        seed=0,
        prefill_token_buckets=(16384,),
        decode_batch_buckets=(16, 32, 64),
        attention_backend=AttentionBackend.PALLAS,
    )
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    runner = ModelRunner(cfg, spec=spec, params=params)
    geom = runner.geom
    sds = jax.ShapeDtypeStruct
    i32, f32, b1 = jnp.int32, jnp.float32, jnp.bool_
    b_pad, n_steps, maxp = 64, 16, min(geom.max_pages_per_head, 48)
    pshapes = jax.tree.map(lambda x: sds(x.shape, x.dtype), runner.params)
    cache = jax.tree.map(lambda x: sds(x.shape, x.dtype), runner.cache)
    from compactor_vllm_tpu.ops.pallas_attention import decode_group_pages

    ng = cdiv(geom.max_pages_per_head, decode_group_pages())
    key = jax.eval_shape(lambda: jax.random.PRNGKey(0))

    def probe(use_blocks, early_exit, label, use_window=False):
        runner_mod.os.environ["CVT_DECODE_EARLY_EXIT"] = "1" if early_exit else "0"
        meta = DecodeMeta(
            input_ids=sds((b_pad,), i32), positions=sds((b_pad,), i32),
            slots=sds((b_pad,), i32), valid=sds((b_pad,), b1),
            contig8=sds((b_pad, geom.num_kv_heads, ng), i32),
            dec_blk=(
                sds((geom.num_layers, b_pad, 1, 2), i32) if use_blocks else None
            ),
            dec_pos=sds((b_pad,), i32) if use_blocks else None,
        )
        runner._fn_cache.clear()
        fn = runner._decode_loop_fn(
            b_pad, n_steps, maxp, use_blocks, use_window
        )
        try:
            c = fn.lower(
                pshapes, cache, meta, sds((b_pad,), f32), sds((b_pad,), i32),
                sds((), i32), key,
            ).compile()
            ma = c.memory_analysis()
            print(
                f"{label:14s} temp {ma.temp_size_in_bytes/2**30:7.3f} GiB  "
                f"out {ma.output_size_in_bytes/2**30:7.3f} GiB  "
                f"args {ma.argument_size_in_bytes/2**30:7.3f} GiB  "
                f"alias {ma.alias_size_in_bytes/2**30:7.3f} GiB",
                flush=True,
            )
        except Exception as e:
            print(f"{label:14s} FAILED: {str(e)[:300]}", flush=True)

    kv_gib = (
        geom.num_layers * geom.total_rows * 2 * geom.head_dim * 2 / 2**30
    )
    print(f"pool: {kv_gib:.2f} GiB ({geom.num_pages} pages x {geom.num_layers} layers)")
    probe(True, True, "blocks+cond")
    probe(True, False, "blocks only")
    probe(False, True, "cond only")
    probe(False, False, "neither")
    # Deferred-window append (round 5): the flush's gather/scatter temps
    # must stay window-sized, never pool-sized.
    probe(False, True, "window+cond", use_window=True)
    probe(False, False, "window only", use_window=True)


if __name__ == "__main__":
    main()
