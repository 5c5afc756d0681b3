"""ModelRunner: compiled prefill/decode steps + the continuous-batching loop.

TPU execution model (vs reference core/model_runner.py:29-555):
- CUDA-graph capture is replaced by XLA compilation over *static shape
  buckets*: prefill steps compile per (padded-token, padded-batch) bucket and
  decode steps per padded-batch bucket; the compile cache plays the role of
  the reference's graph table (model_runner.py:493-545).
- The cache pytree is donated to every step, so page/lens updates are
  in-place in HBM.
- The master/peer NCCL broadcast choreography disappears: the engine is SPMD;
  sampling uses a deterministic PRNG so every process computes identical
  tokens (SURVEY.md §2.8 TPU-native equivalent).
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from compactor_vllm_tpu.compression.compactor import make_phi
from compactor_vllm_tpu.config import (
    AttentionBackend,
    BatchCompressionParams,
    CompressionMethod,
    LLMConfig,
    cdiv,
    is_none_method,
    method_name,
)
from compactor_vllm_tpu.core.scheduler import Scheduler
from compactor_vllm_tpu.kv_cache.allocator import PageAllocator, SlotUpdate
from compactor_vllm_tpu.kv_cache.state import (
    KVCacheGeometry,
    KVCacheState,
    cast_to_cache,
    flush_decode_window,
    init_kv_cache,
    kv_cache_hbm_bytes,
)
from compactor_vllm_tpu.layers.ops import sample_tokens_sharded
from compactor_vllm_tpu.models.transformer import (
    AttentionImpl,
    CompressionStatic,
    DecodeMeta,
    ModelSpec,
    PrefillMeta,
    forward,
    compute_local_logits,
    prefill_local_logits,
    reference_attention_impl,
)
from compactor_vllm_tpu.parallel import (
    AXIS_DP,
    AXIS_TP,
    cache_pspecs,
    local_spec,
    make_mesh,
    param_pspecs,
    shard_params,
)
from compactor_vllm_tpu.utils.sequence import Sequence

logger = logging.getLogger(__name__)

# Refill trigger: re-enter prefill when the decode batch drains below this
# fraction of its target occupancy (reference: model_runner.py:297-315).
DECODE_OCCUPANCY = 0.66

# Out-of-range view-block id: marks decode lanes without a block — the
# block-append scatter drops them (kv_cache.state.store_decode_blocks).
OOB_BLOCK = np.int32(2**30)


def _store_group() -> int:
    # Lazy import: pallas_attention imports are deferred so CPU-only paths
    # never pull in Pallas at module import time.
    from compactor_vllm_tpu.ops.pallas_attention import STORE_GROUP

    return STORE_GROUP


def _decode_loop_early_exit() -> bool:
    """Early-exit cond in the fused decode loop (skips dead iterations on
    EOS-heavy workloads). Env-gated so its static-memory cost can be
    A/B-probed on chip (CVT_DECODE_EARLY_EXIT=0 disables)."""
    return os.environ.get("CVT_DECODE_EARLY_EXIT", "1") != "0"


def _bucket(n: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _pow2_bucket(n: int, lo: int = 8) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


@dataclass
class EngineStats:
    """Per-generate-call phase accounting (the reference reports live
    throughput via a tqdm bar, core/scheduler.py:190-205; we also keep
    machine-readable totals)."""

    prefill_tokens: int = 0
    decode_tokens: int = 0
    prefill_time: float = 0.0
    decode_time: float = 0.0
    num_prefill_batches: int = 0
    num_decode_dispatches: int = 0

    def summary(self) -> str:
        pf = self.prefill_tokens / self.prefill_time if self.prefill_time else 0.0
        dc = self.decode_tokens / self.decode_time if self.decode_time else 0.0
        return (
            f"prefill {self.prefill_tokens} tok in {self.prefill_time:.2f}s "
            f"({pf:.0f} tok/s, {self.num_prefill_batches} batches); "
            f"decode {self.decode_tokens} tok in {self.decode_time:.2f}s "
            f"({dc:.0f} tok/s, {self.num_decode_dispatches} dispatches)"
        )


class ModelRunner:
    def __init__(
        self,
        cfg: LLMConfig,
        spec: ModelSpec,
        params,
        *,
        cache_dtype=None,
        attention_impl: AttentionImpl | None = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.spec = spec
        if cfg.compilation_cache_dir is not None:
            path = cfg.compilation_cache_dir or os.path.expanduser(
                "~/.cache/compactor_vllm_tpu/xla"
            )
            try:
                os.makedirs(path, exist_ok=True)
                jax.config.update("jax_compilation_cache_dir", path)
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            except Exception as e:  # pragma: no cover - best effort
                logger.warning("compilation cache unavailable: %s", e)
        self.tp = cfg.tensor_parallel_size
        self.dp = cfg.data_parallel_size
        if (self.tp > 1 or self.dp > 1) and mesh is None:
            mesh = make_mesh(tp=self.tp, dp=self.dp)
        self.mesh = mesh
        # Per-device shard of the model (heads/experts/vocab divided by tp).
        self.lspec = local_spec(spec, self.tp)
        if cfg.weight_dtype in ("int8", "w8a8"):
            from compactor_vllm_tpu.layers.quant import quantize_params_int8

            params = quantize_params_int8(params, spec)
        if cfg.weight_dtype == "w8a8":
            # Native int8 x int8 GEMMs with dynamic per-token activation
            # quantization (layers/quant.py wdot a8 path).
            from dataclasses import replace as _dc_replace

            self.lspec = _dc_replace(self.lspec, act_quant=True)
        if cache_dtype is None:
            # Direct-runner callers (benchmarks) get the config's KV dtype;
            # LLMEngine passes the mapped dtype explicitly.
            cache_dtype = {
                "auto": jnp.dtype(cfg.dtype),
                "fp8": jnp.float8_e4m3fn,
                "float8_e4m3": jnp.float8_e4m3fn,
            }[cfg.kv_cache_dtype]
        self._cache_dtype = cache_dtype
        # Attention backend is chosen before the pool derivation so the
        # measured-memory probe compiles the production kernels.
        if attention_impl is None:
            if cfg.attention_backend == AttentionBackend.PALLAS:
                from compactor_vllm_tpu.ops.pallas_attention import (
                    pallas_attention_impl,
                )

                attention_impl = pallas_attention_impl(
                    interpret=jax.default_backend() != "tpu",
                    fp8_query=cfg.fp8_query,
                )
            else:
                max_cache = cfg.max_pages_per_head * cfg.kvcache_page_size
                # The oracle's prefill gathers the cached prefix densely only
                # when chunked prefill can leave one behind.
                pre_cache = max_cache if cfg.enable_chunked_prefill else 0
                attention_impl = reference_attention_impl(pre_cache, max_cache)
        self.attn = attention_impl
        self._fn_cache: dict = {}
        num_pages = cfg.num_kv_pages or self._derive_num_pages(
            cache_dtype, params
        )
        # Geometry is shard-local: each tp device owns its kv-head shard and
        # its own page pool (reference analog: each rank's private cache,
        # core/memory_manager.py:29-31). Pool and trash sizes are rounded so
        # the rows buffer bitcasts to [NB, H, page_size, 2D] — the view the
        # decode-block append scatters through (store_decode_blocks).
        hs = self.lspec.num_kv_heads
        self.geom = KVCacheGeometry(
            num_layers=spec.num_layers,
            num_pages=num_pages - num_pages % hs,
            page_size=cfg.kvcache_page_size,
            num_kv_heads=hs,
            head_dim=spec.head_dim,
            num_slots=cfg.max_num_seqs + 1,
            max_pages_per_head=cfg.max_pages_per_head,
            trash_pages=hs,
        )
        if self.mesh is None:
            self.cache = init_kv_cache(self.geom, dtype=cache_dtype)
        else:
            self.params = params = shard_params(params, spec, self.mesh, self.tp)
            self.cache = self._init_sharded_cache(cache_dtype)
        self.params = params
        # One allocator + scheduler per data-parallel group: each group owns
        # its own batch slots and page pools (the cache shards the slot axis
        # over "dp"), so admission decisions never cross groups — the TPU
        # analog of the reference's per-worker engine state
        # (core/llm_engine.py:52-70).
        self.allocs = [
            PageAllocator(
                num_layers=self.geom.num_layers,
                num_shards=self.tp,
                pages_per_shard=self.geom.num_pages,
                num_kv_heads=spec.num_kv_heads,
                max_pages_per_head=self.geom.max_pages_per_head,
                num_slots=self.geom.num_slots,
                page_size=self.geom.page_size,
            )
            for _ in range(self.dp)
        ]
        self.scheds = [Scheduler(cfg, a) for a in self.allocs]
        self.alloc = self.allocs[0]
        self.scheduler = self.scheds[0]
        self.phi = make_phi(spec.head_dim, cfg.leverage_sketch_size)
        self._base_key = jax.random.PRNGKey(cfg.seed)
        self._step = 0

    def _init_sharded_cache(self, cache_dtype) -> KVCacheState:
        """Global cache: per-device page pools concatenated on the rows axis,
        kv heads sharded over tp, batch slots over dp; allocated directly
        sharded on the mesh."""
        geom, S, G = self.geom, self.tp, self.dp
        cspecs = cache_pspecs()
        shardings = jax.tree.map(lambda s: NamedSharding(self.mesh, s), cspecs,
                                 is_leaf=lambda x: isinstance(x, P))

        @partial(jax.jit, out_shardings=shardings)
        def mk():
            return KVCacheState(
                kv_pages=jnp.zeros(
                    (G * S * geom.total_rows, 2 * geom.head_dim), cache_dtype),
                page_table=jnp.zeros(
                    (geom.num_layers, G * geom.num_slots,
                     S * geom.num_kv_heads, geom.max_pages_per_head), jnp.int32),
                bh_lens=jnp.zeros(
                    (geom.num_layers, G * geom.num_slots, S * geom.num_kv_heads),
                    jnp.int32),
            )

        return mk()

    # -------------------------------------------------------------- geometry

    # Total HBM per chip by device kind, used when the platform does not
    # report memory_stats (the axon relay returns None, NOTES.md). Ordered:
    # first substring match wins.
    _HBM_BY_KIND = (
        ("v5 lite", 16), ("v5e", 16), ("v5p", 95), ("v5", 95),
        ("v6 lite", 32), ("v6e", 32), ("v4", 32), ("v3", 16), ("v2", 8),
    )

    def _derive_num_pages(self, cache_dtype, params) -> int:
        """Derive the page-pool size from HBM minus params and the measured
        activation watermark (reference: core/memory_manager.py:92-161 runs a
        warmup forward and reads the peak; under XLA activations are allocated
        *statically*, so we AOT-compile the largest prefill bucket and read
        `memory_analysis().temp_size_in_bytes` — exact, with no execution;
        under a mesh the shard_map'd step is lowered with its production
        shardings and the PER-DEVICE temp size is read). Falls back to an
        analytic activation model when compilation analysis is unavailable
        (CPU tests)."""
        if jax.default_backend() != "tpu":
            return 4096  # CPU/test fallback
        dev = jax.devices()[0]
        try:
            stats = dev.memory_stats() or {}
        except Exception:
            stats = {}
        limit = stats.get("bytes_limit")
        in_use = int(stats.get("bytes_in_use", 0))
        if limit is None:
            kind = getattr(dev, "device_kind", "").lower()
            for sub, gib in self._HBM_BY_KIND:
                if sub in kind:
                    limit = gib << 30
                    break
        if limit is None:
            return 4096  # CPU/test fallback
        budget = int(limit * self.cfg.hbm_utilization)
        param_bytes = sum(
            x.size * jnp.dtype(x.dtype).itemsize for x in jax.tree.leaves(params)
        )
        # Under tp the big weights shard over the mesh: each device holds
        # ~1/tp of them (norm vectors replicate but are negligible).
        param_bytes //= self.tp
        # bytes_in_use already covers params committed to the device; when
        # params are still host-side (or stats are absent) reserve them here.
        reserved = max(in_use, param_bytes) if in_use else param_bytes
        probe = KVCacheGeometry(
            num_layers=self.lspec.num_layers,
            num_pages=1,
            page_size=self.cfg.kvcache_page_size,
            num_kv_heads=self.lspec.num_kv_heads,
            head_dim=self.lspec.head_dim,
            num_slots=self.cfg.max_num_seqs + 1,
            max_pages_per_head=self.cfg.max_pages_per_head,
        )
        fixed = kv_cache_hbm_bytes(probe, cache_dtype)
        per_page = (
            2
            * self.lspec.num_layers
            * self.cfg.kvcache_page_size
            * self.lspec.head_dim
            * jnp.dtype(cache_dtype).itemsize
        )
        act = self._measure_activation_bytes(cache_dtype, probe, params)
        if act is None:
            act = self._activation_model_bytes()
            logger.info("activation watermark (analytic): %.2f GiB", act / 2**30)
        else:
            logger.info("activation watermark (measured): %.2f GiB", act / 2**30)
        n = (budget - reserved - fixed - act) // per_page
        if n < 64:
            raise ValueError(
                f"KV pool under-provisioned: {n} pages from {budget/2**30:.1f} "
                f"GiB budget (params {param_bytes/2**30:.1f} GiB, activations "
                f"{act/2**30:.1f} GiB); lower max_num_batched_tokens or raise "
                "hbm_utilization"
            )
        logger.info("derived KV pool: %d pages/(layer,shard)", n)
        return int(n)

    def _measure_activation_bytes(
        self, cache_dtype, probe, params, allow_cpu: bool = False
    ):
        """AOT-compile the largest prefill bucket against a 1-page probe cache
        and return XLA's statically allocated temp size (the true activation
        watermark; pool size does not change temps). Under a (dp, tp) mesh the
        shard_map'd step is lowered with the production NamedShardings and
        `memory_analysis()` reports the PER-DEVICE temp size — exactly the
        configurations with the least memory slack get the measured probe
        (VERDICT r3 #7). Returns None when the backend cannot
        compile-and-analyze (CPU interpret mode, unless `allow_cpu` — used by
        the mesh dryrun to validate this machinery without TPUs)."""
        if jax.default_backend() != "tpu" and not allow_cpu:
            return None
        t_pad = self.cfg.prefill_token_buckets[-1]
        from compactor_vllm_tpu.ops.pallas_attention import TOKEN_SLACK

        t_pad = cdiv(t_pad + TOKEN_SLACK, 512) * 512
        b_pad = _pow2_bucket(min(self.cfg.max_num_seqs, 8), 4)
        H = self.lspec.num_kv_heads
        # Worst-case compression shapes: full-ratio retain budget at the
        # longest admissible prompt.
        comp = CompressionStatic(
            method=CompressionMethod.COMPACTOR,
            chunked=True,
            chunk_size=512,
            aligned=True,
            fused_postrope=self.attn.prefill_scored is not None,
            pad_to_page=(
                self.cfg.kvcache_page_size
                if self.cfg.pad_retained_to_page else 0
            ),
            use_head_cap=True,  # worst-case shapes: refinement pass on
        )
        sds = jax.ShapeDtypeStruct
        i32, f32, b1 = jnp.int32, jnp.float32, jnp.bool_
        meta = PrefillMeta(
            input_ids=sds((t_pad,), i32), positions=sds((t_pad,), i32),
            token_seq_idx=sds((t_pad,), i32), token_in_pos=sds((t_pad,), i32),
            token_valid=sds((t_pad,), b1), seq_starts=sds((b_pad,), i32),
            seq_lens=sds((b_pad,), i32), slots=sds((b_pad,), i32),
            seq_valid=sds((b_pad,), b1), retain=sds((b_pad,), i32),
            protected_first=sds((b_pad,), i32), protected_last=sds((b_pad,), i32),
            phi=sds((self.lspec.head_dim, self.cfg.leverage_sketch_size), f32),
            # The engine always packs these (run_prefill group arrays):
            cached_lens=sds((b_pad,), i32),
            store_contig=sds(
                (b_pad, H, cdiv(probe.max_pages_per_head, _store_group())),
                i32),
            head_cap=sds((b_pad,), i32),
        )
        if self.mesh is None:
            cache = KVCacheState(
                kv_pages=sds((probe.total_rows, 2 * probe.head_dim), cache_dtype),
                page_table=sds(
                    (probe.num_layers, probe.num_slots, probe.num_kv_heads,
                     probe.max_pages_per_head), i32),
                bh_lens=sds((probe.num_layers, probe.num_slots,
                             probe.num_kv_heads), i32),
            )
            pshapes = jax.tree.map(lambda x: sds(x.shape, x.dtype), params)
            temps = sds((b_pad,), f32)
            key = jax.eval_shape(lambda: jax.random.PRNGKey(0))
        else:
            # Global (mesh-wide) avals with the production NamedShardings:
            # dp-stacked metadata, tp/dp-sharded cache, sharded params —
            # mirrors exactly what _shard_step's jit receives at runtime.
            S, G = self.tp, self.dp

            def ns(spec):
                return NamedSharding(self.mesh, spec)

            meta_specs = self._dp_meta_specs(PrefillMeta)

            def stack_field(f):
                x, spec = getattr(meta, f), getattr(meta_specs, f)
                if x is None:  # optional meta fields (e.g. cached_lens)
                    return None
                if f == "store_contig":
                    # kv-head axis is GLOBAL (sharded over tp).
                    shape = (G, x.shape[0], S * x.shape[1], x.shape[2])
                elif f == "phi":
                    shape = x.shape
                else:
                    shape = (G,) + x.shape
                return sds(shape, x.dtype, sharding=ns(spec))

            meta = PrefillMeta(
                **{f: stack_field(f) for f in PrefillMeta._fields}
            )
            cspecs = cache_pspecs()
            cache = KVCacheState(
                kv_pages=sds(
                    (G * S * probe.total_rows, 2 * probe.head_dim),
                    cache_dtype, sharding=ns(cspecs.kv_pages)),
                page_table=sds(
                    (probe.num_layers, G * probe.num_slots,
                     S * probe.num_kv_heads, probe.max_pages_per_head),
                    i32, sharding=ns(cspecs.page_table)),
                bh_lens=sds(
                    (probe.num_layers, G * probe.num_slots,
                     S * probe.num_kv_heads),
                    i32, sharding=ns(cspecs.bh_lens)),
            )
            pspecs = param_pspecs(
                self.spec, quantized=self.cfg.weight_dtype in ("int8", "w8a8")
            )
            pshapes = jax.tree.map(
                lambda x, s: sds(x.shape, x.dtype, sharding=ns(s)),
                params, pspecs,
            )
            temps = sds((G, b_pad), f32, sharding=ns(P(AXIS_DP)))
            k0 = jax.eval_shape(lambda: jax.random.PRNGKey(0))
            key = sds(k0.shape, k0.dtype, sharding=ns(P()))
        saved_geom = getattr(self, "geom", None)
        self.geom = probe
        try:
            fn = self._prefill_fn(t_pad, b_pad, comp)
            compiled = fn.lower(pshapes, cache, meta, temps, key).compile()
            ma = compiled.memory_analysis()
            temp = int(ma.temp_size_in_bytes)
            logger.info(
                "memory probe (t_pad=%d%s): per-device temp %.2f GiB, "
                "out %.2f GiB",
                t_pad,
                "" if self.mesh is None else f", mesh dp={self.dp} tp={self.tp}",
                temp / 2**30, ma.output_size_in_bytes / 2**30,
            )
            return temp
        except Exception as e:  # pragma: no cover - backend specific
            logger.warning("activation measurement failed: %s", e)
            return None
        finally:
            self._fn_cache.pop(("prefill", t_pad, b_pad, comp), None)
            if saved_geom is None:
                del self.geom
            else:
                self.geom = saved_geom

    def _activation_model_bytes(self) -> int:
        """Analytic activation watermark for the largest prefill bucket:
        residual streams + qkv (pre/post-RoPE) + MLP intermediates in bf16,
        f32 compression scoring buffers, plus logits and slack."""
        s = self.lspec
        t = self.cfg.max_num_batched_tokens
        inter = s.moe_intermediate_size if s.is_moe else s.intermediate_size
        per_token = (
            2 * (6 * s.hidden_size + 3 * inter + 6 * s.q_size + 4 * s.kv_size)
            + 4 * (2 * s.num_kv_heads * self.cfg.leverage_sketch_size
                   + 6 * s.num_kv_heads)
        )
        logits = 4 * (self.cfg.max_num_seqs + 8) * s.vocab_size
        return t * per_token + logits + (256 << 20)

    # -------------------------------------------------------- compiled steps

    def _comp_static(self, bp: BatchCompressionParams, seqs) -> CompressionStatic:
        if is_none_method(bp.compression_method):
            return CompressionStatic(method=CompressionMethod.NONE)
        from compactor_vllm_tpu.compression import get_method
        from compactor_vllm_tpu.ops.pallas_attention import _row_tile

        # Fused in-kernel postrope scoring requires chunk-aligned packing
        # whose alignment also covers the (scoring-sized) query tile.
        group = self.lspec.num_q_heads // self.lspec.num_kv_heads
        fused = (
            get_method(bp.compression_method).wants_postrope_colmass
            and bp.do_chunked_compression
            and self.attn.prefill_scored is not None
            and self._start_align(bp) % _row_tile(group, True) == 0
        )
        H = self.lspec.num_kv_heads
        use_cap = any(s.head_retention_cap(H) > 0 for s in seqs)
        return CompressionStatic(
            method=bp.compression_method,
            chunked=bp.do_chunked_compression,
            chunk_size=bp.chunk_size,
            aligned=True,  # run_prefill aligns starts to _start_align(bp)
            fused_postrope=fused,
            pad_to_page=(
                self.cfg.kvcache_page_size
                if self.cfg.pad_retained_to_page else 0
            ),
            use_head_cap=use_cap,
        )

    @staticmethod
    def _start_align(bp: BatchCompressionParams) -> int:
        """Packed-start alignment: 8 tokens for kernel DMA tiling, raised to
        the scoring-chunk LCM so chunked compression can use reshape views,
        and to COMPACT_TILE for any compressing method (the fused compact
        store's rank tiles are absolute-row tiles — pallas_attention.py
        paged_compact_store contract).

        Method names are canonicalized so registered string names behave
        identically to enum members (the CompressionStatic built by
        `_comp_static` sets aligned=True for every chunked method)."""
        import math

        from compactor_vllm_tpu.compression.compactor import POSTROPE_CHUNK
        from compactor_vllm_tpu.ops.pallas_attention import COMPACT_TILE

        if is_none_method(bp.compression_method):
            return 8
        if not bp.do_chunked_compression:
            return COMPACT_TILE
        if method_name(bp.compression_method) == CompressionMethod.COMPACTOR.value:
            a, b = bp.chunk_size, POSTROPE_CHUNK
            lcm = a * b // math.gcd(a, b)
        else:
            # Custom chunked methods: align starts to their chunk size so
            # the aligned reshape views in chunking.py stay scatter-free.
            lcm = max(8, bp.chunk_size)
        return lcm * COMPACT_TILE // math.gcd(lcm, COMPACT_TILE)

    @staticmethod
    def _dp_meta_specs(meta_type):
        """PartitionSpecs for dp-stacked batch metadata: every per-batch
        array carries a leading dp-group axis sharded over "dp"; phi is
        replicated; contig8 additionally shards its kv-head axis over "tp"."""
        def spec_for(f):
            if f == "phi":
                return P()
            if f in ("contig8", "store_contig"):
                return P(AXIS_DP, None, AXIS_TP, None)
            if f == "dec_blk":  # [G, L, Bd, S, NBLK]: shard axis over tp
                return P(AXIS_DP, None, None, AXIS_TP, None)
            return P(AXIS_DP)

        return meta_type(**{f: spec_for(f) for f in meta_type._fields})

    @staticmethod
    def _dp_local_meta(meta):
        """Drop the leading (local size 1) dp axis of a sharded meta.
        Optional fields may be None (replicated phi passes through whole)."""
        t = type(meta)
        return t(**{
            f: (
                getattr(meta, f)
                if f == "phi" or getattr(meta, f) is None
                else getattr(meta, f)[0]
            )
            for f in t._fields
        })

    def _shard_step(self, inner, meta_type, prefill: bool = False):
        """Wrap a per-device step in shard_map over the (dp, tp) mesh.

        Batch metadata is dp-stacked (leading [dp] axis; each group runs its
        own batch over its own slots/pools) and the cache/params pytrees
        carry their shardings; collectives inside `forward` ride the tp axis
        and nothing crosses dp (reference analog: independent workers,
        core/llm_engine.py:52-70)."""
        def wrapped(params, cache, meta, temps, rng):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(AXIS_DP))
            cache, out = inner(
                params, cache, self._dp_local_meta(meta), temps[0], rng
            )
            # Outputs are REPLICATED via tiny in-program all-gathers (tokens
            # are [b] i32, retained [L, b, H] i32): under multi-process
            # execution a host cannot np.asarray another process's dp shard,
            # and every host's deterministic scheduler needs all results.
            if prefill:
                tokens, retained = out
                tokens = jax.lax.all_gather(tokens, AXIS_DP, axis=0)
                retained = jax.lax.all_gather(
                    retained, AXIS_TP, axis=2, tiled=True
                )
                retained = jax.lax.all_gather(retained, AXIS_DP, axis=0)
                return cache, (tokens, retained)
            return cache, jax.lax.all_gather(out, AXIS_DP, axis=0)

        out_spec = (P(), P()) if prefill else P()
        return jax.shard_map(
            wrapped,
            mesh=self.mesh,
            in_specs=(param_pspecs(self.spec, quantized=self.cfg.weight_dtype in ("int8", "w8a8")), cache_pspecs(),
                      self._dp_meta_specs(meta_type), P(AXIS_DP), P()),
            out_specs=(cache_pspecs(), out_spec),
            check_vma=False,
        )

    def _prefill_fn(self, t_pad: int, b_pad: int, comp: CompressionStatic):
        key = ("prefill", t_pad, b_pad, comp)
        if key not in self._fn_cache:
            tp_axis = AXIS_TP if self.mesh is not None else None

            def step(params, cache, meta: PrefillMeta, temps, rng):
                cache, hidden = forward(
                    params, cache, meta, spec=self.lspec, geom=self.geom,
                    comp=comp, attn=self.attn, is_prefill=True, max_q=t_pad,
                    tp_axis=tp_axis,
                )
                logits = prefill_local_logits(
                    params, self.lspec, hidden, meta.seq_starts, meta.seq_lens,
                )
                tokens = sample_tokens_sharded(logits, temps, rng, tp_axis)
                # Retained per-head lengths ride along with the tokens so the
                # host reclaim needs no second device round-trip.
                retained = cache.bh_lens[:, meta.slots]  # [L, b_pad, H]
                return cache, (tokens, retained)

            if self.mesh is not None:
                step = self._shard_step(step, PrefillMeta, prefill=True)
            self._fn_cache[key] = jax.jit(step, donate_argnums=(1,))
        return self._fn_cache[key]

    def _decode_fn(self, b_pad: int, max_pages: int = 0, use_blocks: bool = False):
        key = ("decode", b_pad, max_pages, use_blocks)
        if key not in self._fn_cache:
            tp_axis = AXIS_TP if self.mesh is not None else None

            def step(params, cache, meta: DecodeMeta, temps, rng):
                cache, hidden = forward(
                    params, cache, meta, spec=self.lspec, geom=self.geom,
                    comp=CompressionStatic(method=CompressionMethod.NONE),
                    attn=self.attn, is_prefill=False, tp_axis=tp_axis,
                    max_pages=max_pages, dec_blocks=use_blocks,
                )
                logits = compute_local_logits(params, self.lspec, hidden)
                tokens = sample_tokens_sharded(logits, temps, rng, tp_axis)
                return cache, tokens

            if self.mesh is not None:
                step = self._shard_step(step, DecodeMeta)
            self._fn_cache[key] = jax.jit(step, donate_argnums=(1,))
        return self._fn_cache[key]

    def _decode_loop_fn(
        self, b_pad: int, n_steps: int, max_pages: int = 0,
        use_blocks: bool = False, use_window: bool = False,
    ):
        """n_steps decode iterations in ONE compiled program with in-device
        termination masking — the TPU analog of the reference's CUDA-graph
        decode loop (core/model_runner.py:391-491): finished lanes stop
        sampling/storing but stay in the batch until the host re-packs.
        Amortizes the dispatch round-trip and per-step host work.

        `use_window`: deferred decode append — each step's K/V accumulates in
        a recent-window buffer read by the attention kernels (window operand)
        and the whole window lands in the paged cache ONCE per loop
        (flush_decode_window), replacing n_steps row scatters (~2.95 ms/step
        at B=64, bench_decode_parts). Reference appends per token in-kernel
        (kv_cache/store_kv_cache.py:374-466)."""
        key = ("decode_loop", b_pad, n_steps, max_pages, use_blocks,
               use_window)
        if key not in self._fn_cache:
            tp_axis = AXIS_TP if self.mesh is not None else None

            def loop(params, cache, meta: DecodeMeta, temps, remaining, eos, rng):
                # Hoist the slot gathers out of the step scan: pages never
                # change mid-decode and lengths advance by exactly the alive
                # mask, so lens at step i = lens0 + appended (per-step
                # gathers on a 7 GB cache cost ~2 ms, bench_decode_parts).
                pt_sel = cache.page_table[:, meta.slots]
                if max_pages:
                    pt_sel = pt_sel[..., :max_pages]
                lens0 = cache.bh_lens[:, meta.slots]  # [L, Bd, H]
                L = lens0.shape[0]
                Bd = meta.slots.shape[0]
                H = lens0.shape[2]
                D = self.lspec.head_dim
                mdtype = params["final_norm"].dtype
                fp8 = cache.kv_pages.dtype == jnp.float8_e4m3fn
                recent0 = (
                    jnp.zeros((L, Bd, H, n_steps, 2 * D), mdtype)
                    if use_window else None
                )

                def live_step(carry, i):
                    (cache, ids, positions, remaining, alive, appended,
                     recent) = carry
                    dmeta = DecodeMeta(
                        input_ids=ids, positions=positions,
                        slots=meta.slots, valid=alive, contig8=meta.contig8,
                        dec_blk=meta.dec_blk,
                        dec_pos=None if meta.dec_pos is None
                        else meta.dec_pos + appended,
                    )
                    # With the window, the cache never grows mid-loop: the
                    # kernels see the FIXED pre-loop lens plus the window.
                    lens_sel = (
                        lens0 if use_window
                        else lens0 + appended[None, :, None]
                    )
                    out = forward(
                        params, cache, dmeta, spec=self.lspec, geom=self.geom,
                        comp=CompressionStatic(method=CompressionMethod.NONE),
                        attn=self.attn, is_prefill=False, tp_axis=tp_axis,
                        max_pages=max_pages, pt_sel=pt_sel, lens_sel=lens_sel,
                        dec_blocks=use_blocks,
                        dec_window=(recent, appended) if use_window else None,
                    )
                    if use_window:
                        cache, hidden, (k_all, v_all) = out
                        kv = jnp.concatenate([k_all, v_all], axis=-1)
                        if fp8:
                            # Quantize-at-append parity with the row-scatter
                            # path: attention must read the same values the
                            # flush will store (e4m3 -> bf16 is exact, and
                            # the flush round-trips to identical bytes).
                            kv = cast_to_cache(
                                kv, jnp.float8_e4m3fn
                            ).astype(mdtype)
                        # Alive lanes all have appended == i (alive is
                        # monotone), so one static-index update covers them;
                        # dead lanes write garbage that stays masked (their
                        # window count froze below i).
                        recent = jax.lax.dynamic_update_slice_in_dim(
                            recent, kv[:, :, :, None, :], i, axis=3
                        )
                    else:
                        cache, hidden = out
                    logits = compute_local_logits(params, self.lspec, hidden)
                    tokens = sample_tokens_sharded(
                        logits, temps, jax.random.fold_in(rng, i), tp_axis
                    )
                    appended = appended + alive.astype(jnp.int32)
                    tokens = jnp.where(alive, tokens, -1)
                    remaining = remaining - alive.astype(jnp.int32)
                    alive = alive & (tokens != eos) & (remaining > 0)
                    return (
                        cache, tokens, positions + 1, remaining, alive,
                        appended, recent,
                    ), tokens

                def step(carry, i):
                    if not _decode_loop_early_exit():
                        return live_step(carry, i)
                    # Early exit once every lane has terminated mid-chunk:
                    # skip the whole forward (EOS-heavy workloads otherwise
                    # pay for up to n_steps-1 dead iterations).
                    alive = carry[4]
                    return jax.lax.cond(
                        jnp.any(alive),
                        lambda c: live_step(c, i),
                        lambda c: (c, jnp.full_like(c[1], -1)),
                        carry,
                    )

                (cache, _, _, _, _, appended, recent), toks = jax.lax.scan(
                    step,
                    (cache, meta.input_ids, meta.positions, remaining,
                     meta.valid, jnp.zeros_like(meta.slots), recent0),
                    jnp.arange(n_steps, dtype=jnp.int32),
                )
                if use_window:
                    cache = flush_decode_window(
                        self.geom, cache, recent, lens0, appended,
                        meta.slots, meta.valid, pt_sel,
                    )
                return cache, toks  # [n_steps, b_pad]

            if self.mesh is not None:
                inner_loop = loop

                def loop(params, cache, meta, temps, remaining, eos, rng):
                    rng = jax.random.fold_in(
                        rng, jax.lax.axis_index(AXIS_DP)
                    )
                    cache, toks = inner_loop(
                        params, cache, self._dp_local_meta(meta),
                        temps[0], remaining[0], eos, rng,
                    )
                    # Replicated output (see _shard_step): hosts in a
                    # multi-process run need every group's tokens.
                    toks = jax.lax.all_gather(
                        toks[:, None], AXIS_DP, axis=1, tiled=True
                    )
                    return cache, toks

                loop = jax.shard_map(
                    loop,
                    mesh=self.mesh,
                    in_specs=(param_pspecs(self.spec, quantized=self.cfg.weight_dtype in ("int8", "w8a8")), cache_pspecs(),
                              self._dp_meta_specs(DecodeMeta),
                              P(AXIS_DP), P(AXIS_DP), P(), P()),
                    out_specs=(cache_pspecs(), P()),
                    check_vma=False,
                )
            self._fn_cache[key] = jax.jit(loop, donate_argnums=(1,))
        return self._fn_cache[key]

    def _next_key(self):
        self._step += 1
        return jax.random.fold_in(self._base_key, self._step)

    # ------------------------------------------------------------ page table

    def sync_page_table(self, updates: list[SlotUpdate], group: int = 0) -> None:
        """Push freshly allocated page-table rows to the device. `group`
        selects the dp group: its slots live at a group offset in the global
        slot axis (sharded over "dp")."""
        if not updates:
            return
        slots = np.array([u.slot for u in updates], np.int32)
        rows = self.allocs[group].page_table[:, slots]  # [L, n, H, maxp]
        gslots = slots + group * self.geom.num_slots
        self.cache = self.cache._replace(
            page_table=self.cache.page_table.at[:, gslots].set(jnp.asarray(rows))
        )

    # ------------------------------------------------------------- execution

    @staticmethod
    def _chunk_len(s: Sequence) -> int:
        """Tokens this prefill dispatch covers for `s`: the scheduler-granted
        chunk, or the whole un-prefilled prompt (direct callers)."""
        return s.prefill_chunk or (s.num_prompt_tokens - s.num_prefilled_tokens)

    def _prefill_group_arrays(self, seqs, group, t_pad, b_pad, starts, off):
        """Host-side packed arrays for one dp group's prefill batch."""
        B = len(seqs)
        lens = [self._chunk_len(s) for s in seqs]
        cached = [s.num_prefilled_tokens for s in seqs]
        a = {}
        a["seq_starts"] = np.full(b_pad, off, np.int32)
        a["seq_starts"][:B] = starts
        a["seq_lens"] = np.zeros(b_pad, np.int32)
        a["seq_lens"][:B] = lens
        a["cached_lens"] = np.zeros(b_pad, np.int32)
        a["cached_lens"][:B] = cached
        ids = np.zeros(t_pad, np.int32)
        seq_idx = np.zeros(t_pad, np.int32)
        in_pos = np.zeros(t_pad, np.int32)
        rope_pos = np.zeros(t_pad, np.int32)
        valid = np.zeros(t_pad, bool)
        for i, s in enumerate(seqs):
            sl = slice(starts[i], starts[i] + lens[i])
            ids[sl] = s.prompt_token_ids[cached[i] : cached[i] + lens[i]]
            seq_idx[sl] = i
            # Chunk-relative positions drive the store/scoring layout; RoPE
            # positions are absolute within the sequence.
            in_pos[sl] = np.arange(lens[i])
            rope_pos[sl] = cached[i] + np.arange(lens[i])
            valid[sl] = True
        a["input_ids"], a["token_seq_idx"] = ids, seq_idx
        a["positions"], a["token_in_pos"] = rope_pos, in_pos
        a["token_valid"] = valid
        slots = np.zeros(b_pad, np.int32)
        retain = np.ones(b_pad, np.int32)
        pf = np.zeros(b_pad, np.int32)
        pl = np.zeros(b_pad, np.int32)
        hcap = np.zeros(b_pad, np.int32)
        temps = np.zeros(b_pad, np.float32)
        H = self.lspec.num_kv_heads
        for i, s in enumerate(seqs):
            slots[i] = self.allocs[group].slot_of_seq[s.seq_id]
            cs, cl = cached[i], lens[i]
            if cs > 0 or cl < s.num_prompt_tokens:
                # Chunked compressed prefill: pro-rated per-chunk budget and
                # chunk-relative protected spans (head caps are rejected up
                # front in generate()).
                retain[i] = s.chunk_retain_budget(H, cs, cl)
                pf[i], pl[i] = s.chunk_protected(cs, cl)
            else:
                retain[i] = s.effective_retain_budget(H)
                pf[i] = s.compression_params.protected_first_tokens
                pl[i] = s.compression_params.protected_last_tokens
            hcap[i] = s.head_retention_cap(H)
            temps[i] = s.sampling_params.temperature
        a["slots"], a["retain"] = slots, retain
        a["protected_first"], a["protected_last"] = pf, pl
        a["head_cap"] = hcap
        a["seq_valid"] = np.arange(b_pad) < B
        from compactor_vllm_tpu.ops.pallas_attention import STORE_GROUP

        ng = cdiv(self.geom.max_pages_per_head, STORE_GROUP)
        contig = np.zeros((b_pad, self.spec.num_kv_heads, ng), np.int32)
        for i, s in enumerate(seqs):
            contig[i] = self.allocs[group].contig_groups(
                self.allocs[group].slot_of_seq[s.seq_id], STORE_GROUP
            )
        a["store_contig"] = contig
        return a, temps

    def run_prefill(self, seqs, bp: BatchCompressionParams):
        """Run one prefill dispatch. `seqs` is a flat list (single group) or
        a per-dp-group list of lists (one batch per group, run in lockstep in
        the same compiled program). Returns sampled tokens per group (flat
        array for flat input)."""
        flat = not (seqs and isinstance(seqs[0], list))
        groups = [seqs] if flat else list(seqs)
        groups += [[] for _ in range(self.dp - len(groups))]
        all_seqs = [s for g in groups for s in g]
        # Pack sequences at aligned starts: 8 tokens minimum (Pallas DMA
        # tiling contract, ops/pallas_attention.py), or the scoring-chunk
        # LCM when compressing so chunked scoring is scatter-free.
        align = self._start_align(bp)
        g_starts, g_offs = [], []
        for g in groups:
            starts = np.zeros(len(g), np.int32)
            off = 0
            for i, s in enumerate(g):
                starts[i] = off
                off = cdiv(off + self._chunk_len(s), align) * align
            g_starts.append(starts)
            g_offs.append(off)
        t_pad = _bucket(max(g_offs), self.cfg.prefill_token_buckets)
        # Tile-aligned slack past the last token (TOKEN_SLACK contract);
        # t_pad itself must stay a multiple of the alignment.
        from compactor_vllm_tpu.ops.pallas_attention import TOKEN_SLACK

        round_to = max(256, align)
        t_pad = cdiv(max(t_pad, max(g_offs)), round_to) * round_to
        t_pad += cdiv(TOKEN_SLACK, round_to) * round_to
        # Prefill batches hold few (long) sequences — pad to their own small
        # bucket, NOT the decode batch bucket: the joint top-k, head-grouping
        # sort, and scoring all scale with the padded row count.
        b_pad = _pow2_bucket(max(len(g) for g in groups), 4)
        comp = self._comp_static(bp, all_seqs)

        packs = [
            self._prefill_group_arrays(g, gi, t_pad, b_pad, g_starts[gi], g_offs[gi])
            for gi, g in enumerate(groups)
        ]
        if self.mesh is None:
            arrays, temps = packs[0]
            meta = PrefillMeta(
                **{f: jnp.asarray(arrays[f]) for f in arrays}, phi=self.phi
            )
            temps = jnp.asarray(temps)
        else:
            meta = PrefillMeta(
                **{
                    f: jnp.asarray(np.stack([p[0][f] for p in packs]))
                    for f in packs[0][0]
                },
                phi=self.phi,
            )
            temps = jnp.asarray(np.stack([p[1] for p in packs]))
        fn = self._prefill_fn(t_pad, b_pad, comp)
        self.cache, (tokens, retained) = fn(
            self.params, self.cache, meta, temps, self._next_key()
        )
        # Device array kept for reclaim_after_compression — converted there
        # (rides the same result fetch as the tokens; no extra round-trip).
        # seq_ids recorded per group so reclaim can detect a mismatched batch
        # (different order/subset) and fall back to the slot-indexed readback.
        self._last_retained = retained
        self._last_retained_ids = [tuple(s.seq_id for s in g) for g in groups]
        # Advance chunked-prefill progress (full-prompt dispatches land
        # exactly at the prompt end).
        for g in groups:
            for s in g:
                s.num_prefilled_tokens += self._chunk_len(s)
                s.prefill_chunk = 0
        tokens = np.asarray(tokens)
        if self.mesh is None:
            return tokens[: len(groups[0])]
        out = [tokens[gi, : len(g)] for gi, g in enumerate(groups)]
        return out[0] if flat else out

    def reclaim_after_compression(self, seqs: list[Sequence], group: int = 0) -> None:
        """Return surplus pages from the per-head retained lengths the prefill
        step emitted alongside its tokens (reference:
        core/model_runner.py:288-291, memory_manager.py:171-182)."""
        if not seqs:
            return
        alloc = self.allocs[group]
        r = getattr(self, "_last_retained", None)
        ids = getattr(self, "_last_retained_ids", None)
        batch_matches = (
            r is not None
            and ids is not None
            and group < len(ids)
            and ids[group] == tuple(s.seq_id for s in seqs)
        )
        if batch_matches:
            lens = np.asarray(r[group] if self.mesh is not None else r)
        else:
            # Direct callers that bypassed run_prefill, or a seqs list that
            # does not match the last prefill batch (order/subset): the
            # positional _last_retained rows would be wrong — read the
            # slot-indexed bh_lens instead (order-robust).
            slots = np.array(
                [alloc.slot_of_seq[s.seq_id] for s in seqs], np.int32
            )
            gslots = slots + group * self.geom.num_slots
            lens = np.asarray(self.cache.bh_lens[:, gslots])
        page = self.geom.page_size
        updates = []
        # Phase 1: shrink every sequence (freeing ALL reclaimed + headroom
        # pages first maximizes the aligned runs available to phase 2), and
        # collect decode-block requests: when every retained length is
        # page-aligned (pad_retained_to_page), the generic headroom pages
        # are swapped for aligned decode blocks — the fused decode loop then
        # appends via L*Bd [H, 2D] windows instead of L*Bd*H row scatters
        # (store_decode_blocks). Page count is unchanged.
        requests = []
        req_meta = []  # (seq, sl, headroom) parallel to requests
        for i, s in enumerate(seqs):
            # Mid-prompt chunks keep headroom for the REST of the prompt on
            # top of generation (progressive reclaim: pages already saved by
            # earlier chunks' compression are returned immediately).
            remaining_prompt = s.num_prompt_tokens - s.num_prefilled_tokens
            headroom = s.sampling_params.max_new_tokens + remaining_prompt
            sl = lens[:, i, :]
            if (
                remaining_prompt == 0
                and self.cfg.decode_block_append
                and self.geom.blocks_aligned
                and not (sl % page).any()
            ):
                alloc.shrink(s.seq_id, sl)
                nblk = cdiv(s.sampling_params.max_new_tokens, page)
                requests.append(
                    (s.seq_id, nblk, (sl // page).astype(np.int64))
                )
                req_meta.append((s, sl, headroom))
            else:
                alloc.shrink(s.seq_id, sl + headroom)
            if remaining_prompt == 0:
                s.max_head_len = int(sl.max())
        # Phase 2: one batched block allocation (bitmap built once).
        updates += self._install_blocks(alloc, requests, req_meta)
        # Freshly installed block pages must reach the device table before
        # the next decode dispatch reads/appends through them.
        self.sync_page_table(updates, group=group)

    def _install_blocks(self, alloc, requests, req_meta) -> list[SlotUpdate]:
        """Batched decode-block install + per-seq fallback: sequences whose
        pools lack aligned runs get their headroom pages re-grown (the
        re-grown pages may be distributed differently than the rows the
        device table holds — LIFO churn — so the fallback also needs a
        device-table refresh)."""
        page = self.geom.page_size
        updates: list[SlotUpdate] = []
        for (blocks, (seq_id, nblk, _), (_s, sl, headroom)) in zip(
            alloc.alloc_decode_blocks_batch(requests), requests, req_meta
        ):
            if blocks is None:  # fragmented/over-wide: restore headroom.
                alloc.grow_per_head(seq_id, sl + headroom)
                updates.append(SlotUpdate(
                    slot=alloc.slot_of_seq[seq_id],
                    num_cols=cdiv(int(sl.max()) + headroom, page),
                ))
            else:
                updates.append(SlotUpdate(
                    slot=alloc.slot_of_seq[seq_id],
                    num_cols=int(sl.max()) // page + nblk,
                ))
        return updates

    def install_decode_blocks_uncompressed(self, seqs, group: int = 0) -> None:
        """Decode-entry block install for UNCOMPRESSED sequences: their
        cached lengths are uniform (= prompt length, known host-side — no
        device readback), so when the prompt is page-aligned the same swap
        of headroom pages for aligned decode blocks applies (see
        reclaim_after_compression) and the fused decode loop gets the
        window-scatter append."""
        if not (self.cfg.decode_block_append and self.geom.blocks_aligned):
            return
        alloc = self.allocs[group]
        page = self.geom.page_size
        requests, req_meta = [], []
        for s in seqs:
            if (
                s.num_prefilled_tokens < s.num_prompt_tokens
                or s.num_prompt_tokens % page != 0
            ):
                continue
            sl = np.full(
                (self.geom.num_layers, self.geom.num_kv_heads),
                s.num_prompt_tokens, np.int64,
            )
            alloc.shrink(s.seq_id, sl)
            nblk = cdiv(s.sampling_params.max_new_tokens, page)
            requests.append((s.seq_id, nblk, sl // page))
            req_meta.append((s, sl, s.sampling_params.max_new_tokens))
        self.sync_page_table(
            self._install_blocks(alloc, requests, req_meta), group=group
        )

    def _decode_group_arrays(self, seqs, group, b_pad, nblk_pad):
        alloc = self.allocs[group]
        geom = self.geom
        ids = np.zeros(b_pad, np.int32)
        pos = np.zeros(b_pad, np.int32)
        slots = np.zeros(b_pad, np.int32)
        temps = np.zeros(b_pad, np.float32)
        # Decode-block ids: OOB-filled lanes (padding, or seqs without
        # blocks) are dropped by the append scatter.
        L, S = geom.num_layers, self.tp
        dec_blk = np.full((L, b_pad, S, nblk_pad), OOB_BLOCK, np.int32)
        dec_pos = np.zeros(b_pad, np.int32)
        layer_base = (
            np.arange(L, dtype=np.int32)[:, None, None]
            * (geom.num_pages // geom.num_kv_heads)
        )
        for i, s in enumerate(seqs):
            ids[i] = s.last_token
            pos[i] = s.num_tokens - 1
            slots[i] = alloc.slot_of_seq[s.seq_id]
            temps[i] = s.sampling_params.temperature
            blocks = alloc.decode_blocks.get(s.seq_id)
            if blocks is not None and blocks.shape[-1]:
                nb = blocks.shape[-1]
                dec_blk[:, i, :, :nb] = layer_base + blocks // geom.num_kv_heads
            # Appends since decode entry: every completion token except the
            # newest has been processed (appended) by a decode step.
            dec_pos[i] = s.num_completion_tokens - 1
        valid = np.arange(b_pad) < len(seqs)
        from compactor_vllm_tpu.ops.pallas_attention import decode_group_pages

        gp = decode_group_pages()
        ng = cdiv(self.geom.max_pages_per_head, gp)
        contig8 = np.zeros((b_pad, self.spec.num_kv_heads, ng), np.int32)
        for i, s in enumerate(seqs):
            contig8[i] = alloc.contig_groups(
                alloc.slot_of_seq[s.seq_id], gp
            )
        return {
            "input_ids": ids, "positions": pos, "slots": slots,
            "valid": valid, "contig8": contig8,
            "dec_blk": dec_blk, "dec_pos": dec_pos,
        }, temps

    def _decode_meta(self, groups: list[list[Sequence]]):
        b_pad = _bucket(
            max(len(g) for g in groups), self.cfg.decode_batch_buckets
        )
        # Block-append path: every live sequence must own decode blocks
        # (installed by reclaim_after_compression when its retained lengths
        # were page-aligned) — mixed batches fall back to the row scatter.
        live = [s for g in groups for s in g]
        use_blocks = (
            self.cfg.decode_block_append
            and self.geom.blocks_aligned
            and bool(live)
            and all(
                self.allocs[gi].decode_blocks.get(s.seq_id) is not None
                for gi, g in enumerate(groups)
                for s in g
            )
        )
        nblk_pad = 1
        if use_blocks:
            nblk_pad = _pow2_bucket(
                max(
                    self.allocs[gi].decode_blocks[s.seq_id].shape[-1]
                    for gi, g in enumerate(groups)
                    for s in g
                ),
                1,
            )
        packs = [
            self._decode_group_arrays(g, gi, b_pad, nblk_pad)
            for gi, g in enumerate(groups)
        ]
        if self.mesh is None:
            arrays, temps = packs[0]
            meta = DecodeMeta(**{f: jnp.asarray(v) for f, v in arrays.items()})
            return b_pad, meta, jnp.asarray(temps), use_blocks
        meta = DecodeMeta(**{
            f: jnp.asarray(np.stack([p[0][f] for p in packs]))
            for f in packs[0][0]
        })
        return (
            b_pad, meta, jnp.asarray(np.stack([p[1] for p in packs])),
            use_blocks,
        )

    @staticmethod
    def _as_groups(seqs):
        return ([seqs], True) if not (seqs and isinstance(seqs[0], list)) \
            else (list(seqs), False)

    def _decode_max_pages(self, groups, horizon: int) -> int:
        """Static page-table width bound for this decode dispatch: bucketed
        max(context) + generation horizon. Sizes the resident decode kernel's
        VMEM context to the batch instead of max_model_len (1024-token
        buckets bound recompiles)."""
        mx = max(
            (
                (s.max_head_len or s.num_prompt_tokens)
                + s.num_completion_tokens
                for g in groups
                for s in g
            ),
            default=1,
        )
        tokens = cdiv(mx + horizon, 1024) * 1024
        return min(self.geom.max_pages_per_head,
                   cdiv(tokens, self.geom.page_size))

    def run_decode_step(self, seqs) -> np.ndarray:
        groups, flat = self._as_groups(seqs)
        groups += [[] for _ in range(self.dp - len(groups))]
        b_pad, meta, temps, use_blocks = self._decode_meta(groups)
        fn = self._decode_fn(
            b_pad, self._decode_max_pages(groups, 1), use_blocks
        )
        self.cache, tokens = fn(self.params, self.cache, meta, temps, self._next_key())
        tokens = np.asarray(tokens)
        if self.mesh is None:
            return tokens[: len(groups[0])]
        out = [tokens[gi, : len(g)] for gi, g in enumerate(groups)]
        return out[0] if flat else out

    def run_decode_loop(self, seqs, n_steps: int):
        """Run up to n_steps decode iterations in one dispatch; returns the
        sampled tokens [n_steps, B] per group (-1 marks post-termination
        lanes). `seqs` is flat (single group) or per-dp-group lists."""
        groups, flat = self._as_groups(seqs)
        groups += [[] for _ in range(self.dp - len(groups))]
        b_pad, meta, temps, use_blocks = self._decode_meta(groups)
        remaining = np.ones((len(groups), b_pad), np.int32)
        for gi, g in enumerate(groups):
            for i, s in enumerate(g):
                remaining[gi, i] = (
                    s.sampling_params.max_new_tokens - s.num_completion_tokens
                )
        use_window = (
            self.cfg.decode_window_append and not use_blocks and n_steps > 1
        )
        fn = self._decode_loop_fn(
            b_pad, n_steps, self._decode_max_pages(groups, n_steps),
            use_blocks, use_window,
        )
        rem = jnp.asarray(remaining if self.mesh is not None else remaining[0])
        self.cache, tokens = fn(
            self.params, self.cache, meta, temps,
            rem, jnp.asarray(self.cfg.eos, jnp.int32),
            self._next_key(),
        )
        tokens = np.asarray(tokens)
        if self.mesh is None:
            return tokens[:, : len(groups[0])]
        out = [tokens[:, gi, : len(g)] for gi, g in enumerate(groups)]
        return out[0] if flat else out

    # ------------------------------------------------------------- main loop

    def generate(
        self,
        seqs: list[Sequence],
        bp: BatchCompressionParams,
        progress: bool = False,
    ) -> EngineStats:
        """Continuous-batching master loop (reference:
        core/model_runner.py:246-338): interleave greedy prefill batches with
        decode runs, refilling when occupancy drops. Under dp > 1, requests
        are partitioned round-robin over groups and every dispatch runs the
        groups' batches in lockstep in one compiled program."""
        dp = self.dp
        compressing_m = not is_none_method(bp.compression_method)
        # Chunked prefill composes with compression when the method is
        # CHUNK-LOCAL (Compactor): each chunk is scored, selected under its
        # pro-rated budget, and stored compactly (pad-to-page keeps the
        # per-head cached boundaries page-aligned for the next chunk).
        # Query-aware methods (SnapKV) need the whole prompt in one batch.
        chunk_ok = True
        if compressing_m:
            from compactor_vllm_tpu.compression import get_method

            chunk_ok = (
                get_method(bp.compression_method).chunk_local
                and self.cfg.pad_retained_to_page
            )
        chunking = self.cfg.enable_chunked_prefill and chunk_ok
        if chunking and compressing_m:
            for s in seqs:
                if s.head_retention_cap(self.lspec.num_kv_heads):
                    raise ValueError(
                        "max_head_retention_factor is incompatible with "
                        "chunked compressed prefill (the cap is defined over "
                        "the whole prompt; disable enable_chunked_prefill "
                        "or the cap)"
                    )
        if not chunking:
            for s in seqs:
                if s.num_prompt_tokens > self.cfg.max_num_batched_tokens:
                    raise ValueError(
                        f"prompt of {s.num_prompt_tokens} tokens exceeds "
                        f"max_num_batched_tokens="
                        f"{self.cfg.max_num_batched_tokens}; this "
                        "compression method requires whole-prompt prefill "
                        "(chunked prefill composes only with chunk-local "
                        "methods like Compactor, with pad_retained_to_page)"
                    )
        for gi in range(dp):
            self.scheds[gi].allow_chunking = chunking
            self.scheds[gi].compressing = not is_none_method(
                bp.compression_method
            )
            self.scheds[gi].add(seqs[gi::dp])
        active: list[list[Sequence]] = [[] for _ in range(dp)]
        eos = self.cfg.eos
        compressing = not is_none_method(bp.compression_method)
        stats = EngineStats()
        pbar = None
        if progress:
            from tqdm.auto import tqdm

            pbar = tqdm(total=len(seqs), desc="generate", unit="seq")

        def is_done(s: Sequence, token: int) -> bool:
            return token == eos or s.num_completion_tokens >= s.sampling_params.max_new_tokens

        def finish(gi: int, s: Sequence):
            self.scheds[gi].finish(s)
            if pbar is not None:
                tput = (
                    (stats.prefill_tokens + stats.decode_tokens)
                    / max(stats.prefill_time + stats.decode_time, 1e-9)
                )
                pbar.set_description(f"generate ({tput:.0f} tok/s)")
                pbar.update(1)

        def can_stack_more(gi: int) -> bool:
            sched, alloc = self.scheds[gi], self.allocs[gi]
            if not sched.waiting:
                return False
            if sched.waiting[0].num_prefilled_tokens > 0:
                return True  # mid-prompt chunk: slot + pages already held
            if alloc.num_free_slots == 0:
                return False
            s = sched.waiting[0]
            reserve_tokens = s.num_prompt_tokens
            if sched.compressing:
                cap = s.head_retention_cap(alloc.H)
                if cap:
                    if self.cfg.pad_retained_to_page:
                        # Match schedule_prefill: pad-to-page can round
                        # retention up past the cap.
                        page = self.cfg.kvcache_page_size
                        cap = -(-cap // page) * page
                    reserve_tokens = cap
            return alloc.can_reserve(
                min(
                    reserve_tokens + s.sampling_params.max_new_tokens,
                    self.cfg.max_model_len,
                )
            )

        while not all(g.is_finished() for g in self.scheds):
            batches, updates = zip(
                *(g.schedule_prefill() for g in self.scheds)
            )
            any_active = any(active)
            if not any(batches) and not any_active and any(
                g.waiting for g in self.scheds
            ):
                raise RuntimeError(
                    "scheduler stuck: waiting sequences cannot be admitted "
                    "(KV pool too small for prompt + max_new_tokens?)"
                )
            if any(batches):
                t0 = time.perf_counter()
                chunk_tokens = sum(
                    self._chunk_len(s) for b in batches for s in b
                )
                for gi, upd in enumerate(updates):
                    self.sync_page_table(upd, group=gi)
                if dp == 1:
                    g_tokens = [self.run_prefill(batches[0], bp)]
                else:
                    g_tokens = self.run_prefill(list(batches), bp)
                for gi, batch in enumerate(batches):
                    if compressing:
                        self.reclaim_after_compression(batch, group=gi)
                    else:
                        self.install_decode_blocks_uncompressed(batch, group=gi)
                    for s, t in zip(batch, g_tokens[gi]):
                        if s.num_prefilled_tokens < s.num_prompt_tokens:
                            continue  # mid-prompt chunk: no token sampled yet
                        s.append_token(int(t))
                        if is_done(s, int(t)):
                            finish(gi, s)
                        else:
                            active[gi].append(s)
                stats.prefill_time += time.perf_counter() - t0
                stats.prefill_tokens += chunk_tokens
                stats.num_prefill_batches += 1
                if any(can_stack_more(gi) for gi in range(dp)):
                    # Stack more prefill while there is capacity
                    # (reference: model_runner.py:306,320-321).
                    continue

            refill_at = int(
                DECODE_OCCUPANCY * max(sum(len(a) for a in active), 1)
            )
            while any(active):
                alive = [s for a in active for s in a]
                chunk = min(
                    self.cfg.decode_loop_steps,
                    max(max(s.sampling_params.max_new_tokens
                            - s.num_completion_tokens for s in alive), 1),
                )
                t0 = time.perf_counter()
                if dp == 1:
                    g_tokens = [self.run_decode_loop(active[0], chunk)]
                else:
                    g_tokens = self.run_decode_loop(list(active), chunk)
                stats.decode_time += time.perf_counter() - t0
                stats.num_decode_dispatches += 1
                for gi in range(dp):
                    still = []
                    for i, s in enumerate(active[gi]):
                        done = False
                        for k in range(chunk):
                            t = int(g_tokens[gi][k, i])
                            if t == -1:
                                break
                            s.append_token(t)
                            stats.decode_tokens += 1
                            if is_done(s, t):
                                done = True
                                break
                        if done:
                            finish(gi, s)
                        else:
                            still.append(s)
                    active[gi] = still
                if any(g.waiting for g in self.scheds) and (
                    sum(len(a) for a in active) <= refill_at
                ):
                    break
        if pbar is not None:
            pbar.close()
        logger.info("generate: %s", stats.summary())
        return stats
