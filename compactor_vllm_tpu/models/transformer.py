"""Functional decoder-only transformer with paged KV cache and fused,
training-free KV compression.

TPU-native design notes (vs reference models/llama3.py:28-281, qwen3.py:28-272):
- Parameters are a pytree of arrays *stacked over layers*; the decoder runs as
  one `lax.scan`, so the program compiles once regardless of depth and XLA
  pipelines weight prefetch across layers.
- The paged cache flows through the scan carry and is updated in place
  (donated buffers); attention kernels index it by a traced layer id, so no
  per-layer cache slices are materialized.
- Compression scoring, (token, head) top-k and the compressed store form a
  dataflow branch that is independent of the attention output (which always
  uses this step's raw K/V — exact prefill, compressed cache), mirroring the
  reference's side-stream overlap (models/llama3.py:90-112,
  layers/attention.py:51-126) in XLA's async scheduling model.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from compactor_vllm_tpu.compression.select import threshold_select
from compactor_vllm_tpu.config import CompressionMethod
from compactor_vllm_tpu.kv_cache.state import (
    KVCacheGeometry,
    KVCacheState,
    store_decode_all_layers,
    store_decode_blocks,
    store_prefill_full,
    store_prefill_sel,
)
from compactor_vllm_tpu.layers.quant import wdot, wdot_row
from compactor_vllm_tpu.layers.ops import (
    apply_rope,
    make_inv_freq,
    rms_norm,
    rms_norm_fused_add,
    silu_and_mul,
)
from compactor_vllm_tpu.ops.attention_ref import (
    ref_decode_attention,
    ref_prefill_attention,
)
from compactor_vllm_tpu.parallel.tp import (
    gather_logits,
    psum_partial,
    vocab_parallel_embed,
)


@dataclass(frozen=True)
class ModelSpec:
    model_type: str
    num_layers: int
    num_q_heads: int
    num_kv_heads: int
    head_dim: int
    hidden_size: int
    intermediate_size: int
    vocab_size: int
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: tuple = ()  # frozen (key, value) pairs; empty = none
    use_qk_norm: bool = False  # Qwen3 per-head q/k RMSNorm (qwen3.py:79-97)
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    # MoE (Qwen3-MoE); num_experts == 0 means dense MLP.
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    norm_topk_prob: bool = True
    # Mixed dense/MoE stacks (reference models/qwen3_moe.py:214-230): layer l
    # is MoE iff num_experts > 0, l not in mlp_only_layers, and
    # (l + 1) % decoder_sparse_step == 0.
    mlp_only_layers: tuple = ()
    decoder_sparse_step: int = 1
    # weight_dtype="w8a8": dense GEMMs run native int8 x int8 dot_general
    # with dynamic per-token activation quantization (layers/quant.py wdot).
    # Set by the runner, not by model configs.
    act_quant: bool = False

    @property
    def q_size(self) -> int:
        return self.num_q_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def rope_scaling_dict(self) -> dict:
        return dict(self.rope_scaling)

    @property
    def sm_scale(self) -> float:
        return self.head_dim**-0.5

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0

    def layer_is_moe(self, l: int) -> bool:
        return (
            self.num_experts > 0
            and l not in self.mlp_only_layers
            and (l + 1) % self.decoder_sparse_step == 0
        )

    @property
    def moe_layer_ids(self) -> tuple:
        return tuple(
            l for l in range(self.num_layers) if self.layer_is_moe(l)
        )

    @property
    def dense_layer_ids(self) -> tuple:
        return tuple(
            l for l in range(self.num_layers) if not self.layer_is_moe(l)
        )

    @property
    def is_mixed(self) -> bool:
        """Both dense-MLP and MoE layers present (mixed stack)."""
        return self.is_moe and len(self.dense_layer_ids) > 0

    @property
    def segments(self) -> tuple:
        """Contiguous (start, stop, is_moe) layer runs — the decoder scans
        each run separately over its own stacked weights."""
        segs = []
        start = 0
        for l in range(1, self.num_layers + 1):
            if l == self.num_layers or (
                self.layer_is_moe(l) != self.layer_is_moe(start)
            ):
                segs.append((start, l, self.layer_is_moe(start)))
                start = l
        return tuple(segs)


class PrefillMeta(NamedTuple):
    """Device-side batch descriptor for a prefill step (replaces the
    reference's broadcast PackedTensorArguments, utils/arguments.py:43-327)."""

    input_ids: jax.Array  # [Tp] i32
    positions: jax.Array  # [Tp] i32
    token_seq_idx: jax.Array  # [Tp] i32
    token_in_pos: jax.Array  # [Tp] i32
    token_valid: jax.Array  # [Tp] bool
    # Packed layout: sequence b occupies rows [seq_starts[b], +seq_lens[b]).
    # Starts are 8-token aligned (Pallas DMA tiling contract) so the packing
    # may have small gaps — which plain cu_seqlens could not express.
    seq_starts: jax.Array  # [Bp] i32
    seq_lens: jax.Array  # [Bp] i32
    slots: jax.Array  # [Bp] i32
    seq_valid: jax.Array  # [Bp] bool
    # Compression (ignored when method is NONE):
    retain: jax.Array  # [Bp] i32 (token, head) budget
    protected_first: jax.Array  # [Bp] i32
    protected_last: jax.Array  # [Bp] i32
    phi: jax.Array  # [D, sketch]
    # Chunked prefill: per-sequence count of already-cached prompt tokens
    # (page-aligned; uniform across heads since chunked prefill is
    # uncompressed). None => fresh prefill.
    cached_lens: jax.Array | None = None  # [Bp] i32
    # [Bp, H, ceil(maxp/STORE_GROUP)] i32: consecutive-ascending-run flags of
    # each slot's reserved pages (PageAllocator.contig_groups) — the Pallas
    # store moves a whole group per DMA when set. None => per-page DMAs.
    store_contig: jax.Array | None = None
    # [Bp] i32 opt-in per-head retained-token cap (0 = uncapped): the
    # compressed store drops selection ranks >= cap so admission can reserve
    # only cap + max_new pages per head (reclaim-aware admission).
    head_cap: jax.Array | None = None


class DecodeMeta(NamedTuple):
    input_ids: jax.Array  # [Bd] i32
    positions: jax.Array  # [Bd] i32
    slots: jax.Array  # [Bd] i32
    valid: jax.Array  # [Bd] bool
    # [Bd, H, ceil(maxp/8)] i32: 8-page group is a consecutive ascending run
    # in every layer -> decode kernel fetches it with one DMA (allocator
    # hands out consecutive runs; see PageAllocator.contig_groups).
    contig8: jax.Array
    # Decode-block append metadata (kv_cache.state.store_decode_blocks; read
    # only when the runner compiles the block-append path). dec_blk
    # [L, Bd, S, NBLK] i32: view-block ids of each lane's decode blocks (S =
    # tp-shard axis; out-of-range id marks a lane without blocks -> the
    # append drops it). dec_pos [Bd] i32: tokens appended since decode entry
    # — the in-block position, uniform over layers/heads because
    # pad_retained_to_page makes retained lengths page-aligned.
    dec_blk: jax.Array | None = None
    dec_pos: jax.Array | None = None


@dataclass(frozen=True)
class CompressionStatic:
    """Trace-time compression configuration.

    `method` is a CompressionMethod enum member or a registered method name
    (compactor_vllm_tpu.compression.COMPRESSION_REGISTRY)."""

    method: CompressionMethod | str = CompressionMethod.NONE
    chunked: bool = True
    chunk_size: int = 512
    # Page size to round each head's retained count up to (pad-to-page
    # top-up, reference store_kv_cache.py:178-248); 0 disables.
    pad_to_page: int = 0
    # Whether any sequence in the batch sets a per-head retention cap —
    # lets threshold_select skip the per-head refinement pass when neither
    # the cap nor pad_to_page is active.
    use_head_cap: bool = False
    # Sequence starts in the packed layout are aligned to the score chunk, so
    # chunked scoring uses reshape views instead of scatters (chunking.py).
    aligned: bool = False
    # Postrope chunk scoring fused into the Pallas prefill attention kernel
    # (requires aligned packing + a backend with prefill_scored).
    fused_postrope: bool = False

    @property
    def is_none(self) -> bool:
        return self.method in (CompressionMethod.NONE, CompressionMethod.NONE.value)


@dataclass(frozen=True)
class AttentionImpl:
    """Pluggable attention backend: the jnp oracle or Pallas kernels.

    store_full/store_sel override the jnp cache stores (XLA row scatters
    serialize on TPU; the Pallas backend stores page-granular DMAs instead).
    prefill_scored, when present, additionally returns the raw postrope
    128-chunk column mass [T, H] computed off the key tiles the attention
    kernel already streams (the TPU analog of the reference's side-stream
    scoring overlap, utils/helpers.py:6-28 — here the cost is ~zero because
    the data never leaves VMEM).
    """

    prefill: Callable[..., jax.Array]
    decode: Callable[..., jax.Array]
    store_full: Callable[..., KVCacheState] | None = None
    store_sel: Callable[..., KVCacheState] | None = None
    prefill_scored: Callable[..., tuple] | None = None


def prefill_cached_lens(meta: PrefillMeta, num_kv_heads: int) -> jax.Array:
    """Pre-store cached-length snapshot [Bp, H]: zero for fresh prefills, the
    already-prefilled prefix for chunked-prefill continuations (uniform
    across heads — chunked prefill is uncompressed)."""
    Bp = meta.slots.shape[0]
    if meta.cached_lens is None:
        return jnp.zeros((Bp, num_kv_heads), jnp.int32)
    return jnp.broadcast_to(
        meta.cached_lens.astype(jnp.int32)[:, None], (Bp, num_kv_heads)
    )


def reference_attention_impl(max_cache_len_prefill: int, max_cache_len_decode: int):
    def prefill(geom, cache, layer, q, k, v, meta: PrefillMeta, sm_scale, max_q,
                clens=None):
        if clens is None and max_cache_len_prefill > 0:
            # Pre-store snapshot: chunked-prefill continuations must not see
            # this chunk's freshly stored rows in the cached phase. The
            # compressed path passes per-head (ragged) lens explicitly.
            clens = prefill_cached_lens(meta, geom.num_kv_heads)
        return ref_prefill_attention(
            geom, cache, layer, q, k, v, meta.seq_starts, meta.seq_lens,
            meta.slots, max_q=max_q, max_cache_len=max_cache_len_prefill,
            sm_scale=sm_scale,
            cached_lens=clens if max_cache_len_prefill > 0 else None,
        )

    def decode(geom, cache, layer, q, k_new, v_new, meta: DecodeMeta, sm_scale,
               pt_l=None, lens_l=None, win_kv=None, win_cnt=None):
        return ref_decode_attention(
            geom, cache, layer, q, meta.slots,
            max_cache_len=max_cache_len_decode, sm_scale=sm_scale,
            k_new=k_new, v_new=v_new, pt_l=pt_l, lens_l=lens_l,
            win_kv=win_kv, win_cnt=win_cnt,
        )

    return AttentionImpl(prefill=prefill, decode=decode)


# --------------------------------------------------------------------- params


def init_params(spec: ModelSpec, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    """Random-init parameter pytree (layer-stacked) for tests and benchmarks."""
    ks = jax.random.split(key, 12)
    L, Hd = spec.num_layers, spec.hidden_size
    qkv_out = spec.q_size + 2 * spec.kv_size
    scale = Hd**-0.5

    def init(k, shape, s=scale):
        return (jax.random.normal(k, shape, jnp.float32) * s).astype(dtype)

    layers = {
        "input_norm": jnp.ones((L, Hd), dtype),
        "qkv_proj": init(ks[0], (L, Hd, qkv_out)),
        "o_proj": init(ks[1], (L, spec.q_size, Hd), s=spec.q_size**-0.5),
        "post_norm": jnp.ones((L, Hd), dtype),
    }
    if spec.use_qk_norm:
        layers["q_norm"] = jnp.ones((L, spec.head_dim), dtype)
        layers["k_norm"] = jnp.ones((L, spec.head_dim), dtype)
    if spec.is_moe:
        E, I = spec.num_experts, spec.moe_intermediate_size
        Lm = len(spec.moe_layer_ids)
        layers["router"] = init(ks[2], (Lm, Hd, E))
        layers["gate_up_proj"] = init(ks[3], (Lm, E, Hd, 2 * I))
        layers["down_proj"] = init(ks[4], (Lm, E, I, Hd), s=I**-0.5)
        if spec.is_mixed:
            Id, Ld = spec.intermediate_size, len(spec.dense_layer_ids)
            layers["dense_gate_up_proj"] = init(ks[7], (Ld, Hd, 2 * Id))
            layers["dense_down_proj"] = init(ks[8], (Ld, Id, Hd), s=Id**-0.5)
    else:
        I = spec.intermediate_size
        layers["gate_up_proj"] = init(ks[3], (L, Hd, 2 * I))
        layers["down_proj"] = init(ks[4], (L, I, Hd), s=I**-0.5)
    params = {
        "embed": init(ks[5], (spec.vocab_size, Hd), s=1.0),
        "layers": layers,
        "final_norm": jnp.ones((Hd,), dtype),
    }
    if not spec.tie_word_embeddings:
        params["lm_head"] = init(ks[6], (Hd, spec.vocab_size))
    return params


# -------------------------------------------------------------------- forward


def _attention_block(
    spec: ModelSpec,
    geom: KVCacheGeometry,
    lp: dict,
    layer: jax.Array,
    cache: KVCacheState,
    normed: jax.Array,  # [N, hidden]
    positions: jax.Array,  # [N]
    *,
    is_prefill: bool,
    meta,
    comp: CompressionStatic,
    attn: AttentionImpl,
    max_q: int,
    inv_freq: jax.Array,
    tp_axis: str | None,
    pt_l=None,  # [Bd, H, maxp] this layer's page-table rows (decode)
    lens_l=None,  # [Bd, H] this layer's cached lengths (decode)
    win_l=None,  # [Bd, H, W, 2D] this layer's unflushed loop window (decode)
    win_cnt=None,  # [Bd] valid window entries
):
    N = normed.shape[0]
    qkv = wdot(normed, lp, "qkv_proj", a8=spec.act_quant)
    q, k, v = jnp.split(qkv, [spec.q_size, spec.q_size + spec.kv_size], axis=-1)
    q = q.reshape(N, spec.num_q_heads, spec.head_dim)
    k = k.reshape(N, spec.num_kv_heads, spec.head_dim)
    v = v.reshape(N, spec.num_kv_heads, spec.head_dim)
    if spec.use_qk_norm:
        q = rms_norm(q, lp["q_norm"], spec.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], spec.rms_norm_eps)
    k_prerope = k
    q, k = apply_rope(q, k, positions, inv_freq)

    if is_prefill:
        m: PrefillMeta = meta
        cached_lens = prefill_cached_lens(m, spec.num_kv_heads)
        if comp.is_none:
            if attn.store_full is not None:
                cache = attn.store_full(geom, cache, layer, k, v, m)
            else:
                cache = store_prefill_full(
                    geom, cache, layer, k, v,
                    m.token_seq_idx, m.token_in_pos, m.token_valid,
                    m.slots, cached_lens, m.seq_lens, m.seq_valid,
                )
            # Attention is exact: it attends over this step's raw K/V
            # regardless of the store (reference layers/attention.py:51-126).
            o = attn.prefill(geom, cache, layer, q, k, v, m, spec.sm_scale,
                             max_q)
        else:
            from compactor_vllm_tpu.compression import get_method

            method = get_method(comp.method)
            # Per-head cached lengths: zero for fresh prefills, the RAGGED
            # per-(head) retained counts of earlier compressed chunks for
            # chunked-prefill continuations (read pre-store — attention runs
            # before the compressed store in this branch). MASKED by the
            # host's cached_lens signal: device bh_lens can be STALE for a
            # fresh prefill (slots are reused after release without a device
            # lens reset), and stale lens here once drove the compressed
            # store past the slot's page reservation — OOB page-table reads
            # feeding wild DMAs (the round-3/4 16K-bench TPU fault; NOTES.md
            # round 5 post-mortem).
            cached_ph = jax.lax.dynamic_index_in_dim(
                cache.bh_lens, layer, 0, keepdims=False
            )[m.slots]  # [Bp, H]
            cached_ph = jnp.where(m.cached_lens[:, None] > 0, cached_ph, 0)
            colmass = None
            if comp.fused_postrope and attn.prefill_scored is not None:
                o, colmass = attn.prefill_scored(
                    geom, cache, layer, q, k, v, m, spec.sm_scale, max_q,
                    clens=cached_ph,
                )
            else:
                o = attn.prefill(geom, cache, layer, q, k, v, m,
                                 spec.sm_scale, max_q, clens=cached_ph)
            b_pad = m.slots.shape[0]
            # Only methods that opted in receive the fused colmass — custom
            # registered methods keep the documented 5-arg signature.
            kw = (
                {"postrope_colmass": colmass}
                if method.wants_postrope_colmass else {}
            )
            scores = method.score(
                q, k_prerope, k, m, comp, t_pad=N, b_pad=b_pad, **kw
            )
            sel = threshold_select(
                scores, m.seq_starts, m.seq_lens, m.retain,
                head_cap=m.head_cap if comp.use_head_cap else None,
                pad_to_page=comp.pad_to_page,
            )
            if attn.store_sel is not None:
                cache = attn.store_sel(
                    geom, cache, layer, k, v, sel, m, cached_ph
                )
            else:
                cache = store_prefill_sel(
                    geom, cache, layer, k, v, sel.rank, sel.counts,
                    m.token_seq_idx, m.slots, cached_ph, m.seq_valid,
                )
        kv_out = None
    else:
        # Decode: the step's K/V is merged in-register (self-key) and the
        # cache append is deferred out of the layer scan — one batched
        # scatter for all layers (store_decode_all_layers) replaces L
        # per-layer scatters (reference appends in-kernel per layer,
        # kv_cache/store_kv_cache.py:374-466; XLA scatters carry a fixed
        # cost that would serialize the scan).
        m: DecodeMeta = meta
        o = attn.decode(geom, cache, layer, q, k, v, m, spec.sm_scale,
                        pt_l, lens_l, win_kv=win_l, win_cnt=win_cnt)
        kv_out = (k, v)

    # Row-parallel output projection: partial products reduced over the tp
    # axis (reference: layers/linear.py:149-153 all_reduce).
    out = wdot_row(o.reshape(N, spec.q_size), lp, "o_proj", psum_partial,
                   tp_axis, a8=spec.act_quant)
    return cache, out, kv_out


def _mlp_block(
    spec: ModelSpec, lp: dict, x: jax.Array, tp_axis: str | None, moe: bool
) -> jax.Array:
    if moe:
        from compactor_vllm_tpu.layers.moe import moe_block

        return moe_block(spec, lp, x, tp_axis)
    return wdot_row(
        silu_and_mul(wdot(x, lp, "gate_up_proj", a8=spec.act_quant)),
        lp, "down_proj", psum_partial, tp_axis, a8=spec.act_quant,
    )


_ATTN_KEYS = (
    "input_norm", "qkv_proj", "qkv_proj_scale", "o_proj", "o_proj_scale",
    "post_norm", "q_norm", "k_norm",
)


def _segment_layers(layers: dict, spec: ModelSpec, a: int, b: int, moe: bool):
    """Stacked weights for the contiguous layer run [a, b): attention stacks
    are sliced from the full-depth arrays; MLP stacks come from the kind's own
    stack (mixed models keep separate dense_/moe stacks, so no layer wastes
    memory on the other kind's weights)."""
    lp = {k: layers[k][a:b] for k in _ATTN_KEYS if k in layers}
    if not spec.is_mixed:
        for k in ("router", "gate_up_proj", "gate_up_proj_scale",
                  "down_proj", "down_proj_scale"):
            if k in layers:
                lp[k] = layers[k][a:b]
        return lp
    ids = spec.moe_layer_ids if moe else spec.dense_layer_ids
    off = ids.index(a)
    n = b - a
    if moe:
        lp["router"] = layers["router"][off : off + n]
        lp["gate_up_proj"] = layers["gate_up_proj"][off : off + n]
        lp["down_proj"] = layers["down_proj"][off : off + n]
    else:
        lp["gate_up_proj"] = layers["dense_gate_up_proj"][off : off + n]
        lp["down_proj"] = layers["dense_down_proj"][off : off + n]
        for k in ("gate_up_proj", "down_proj"):
            sk = f"dense_{k}_scale"
            if sk in layers:
                lp[k + "_scale"] = layers[sk][off : off + n]
    return lp


def forward(
    params: dict,
    cache: KVCacheState,
    meta,
    *,
    spec: ModelSpec,
    geom: KVCacheGeometry,
    comp: CompressionStatic,
    attn: AttentionImpl,
    is_prefill: bool,
    max_q: int = 0,
    tp_axis: str | None = None,
    max_pages: int = 0,
    pt_sel=None,
    lens_sel=None,
    dec_blocks: bool = False,
    dec_window=None,  # (recent [L, Bd, H, W, 2D], cnt [Bd]): deferred append
):
    """Run the full decoder; returns (cache, final hidden states [N, hidden]).

    When `tp_axis` is set the function runs SPMD inside a shard_map: `spec`
    and `geom` describe the per-device shard (local heads/experts/vocab) and
    collectives over `tp_axis` reduce row-parallel partials.

    `max_pages` (> 0, decode only) statically bounds the page-table width
    this batch can reach — the host knows max(tokens)+steps at dispatch, so
    the decode kernels size their resident context to the batch instead of
    the engine-wide max_model_len.

    `pt_sel`/`lens_sel` (decode) let the multi-step decode loop hoist the
    page-table/length slot gathers out of its step scan (pages never change
    mid-decode and lengths advance deterministically) — the per-step gathers
    cost ~2 ms on a 7 GB cache.

    `dec_window` (decode) defers the cache append entirely: attention reads
    the loop's unflushed recent tokens from the window operand, the store is
    SKIPPED, and forward returns (cache, hidden, (k_all, v_all)) so the loop
    can accumulate the step into its window (flush_decode_window lands the
    whole window once per loop).
    """
    x = vocab_parallel_embed(
        params["embed"], meta.input_ids, tp_axis,
        scale=params.get("embed_scale"),
        dtype=params["final_norm"].dtype,
    )
    inv_freq = make_inv_freq(spec.head_dim, spec.rope_theta, spec.rope_scaling_dict)
    residual = jnp.zeros_like(x)

    if is_prefill:
        pt_sel = lens_sel = None
    else:
        # Hoist the slot gathers out of the layer scan: ONE gather over all
        # layers, sliced per scan step (per-layer gathers around the decode
        # kernel cost ~0.9 ms/layer in XLA ops on v5e).
        if pt_sel is None:
            pt_sel = cache.page_table[:, meta.slots]  # [L, Bd, H, maxp]
            if max_pages:
                pt_sel = pt_sel[..., :max_pages]
        if lens_sel is None:
            lens_sel = cache.bh_lens[:, meta.slots]  # [L, Bd, H]

    def make_layer_fn(moe: bool):
        def layer_fn(carry, xs):
            x, residual, cache = carry
            win_l = None
            if is_prefill:
                lp, layer = xs
                pt_l = lens_l = None
            elif dec_window is not None:
                lp, layer, pt_l, lens_l, win_l = xs
            else:
                lp, layer, pt_l, lens_l = xs
            normed, residual = rms_norm_fused_add(
                x, residual, lp["input_norm"], spec.rms_norm_eps
            )
            cache, attn_out, kv = _attention_block(
                spec, geom, lp, layer, cache, normed, meta.positions,
                is_prefill=is_prefill, meta=meta, comp=comp, attn=attn,
                max_q=max_q, inv_freq=inv_freq, tp_axis=tp_axis,
                pt_l=pt_l, lens_l=lens_l, win_l=win_l,
                win_cnt=None if dec_window is None else dec_window[1],
            )
            normed, residual = rms_norm_fused_add(
                attn_out, residual, lp["post_norm"], spec.rms_norm_eps
            )
            x = _mlp_block(spec, lp, normed, tp_axis, moe)
            return (x, residual, cache), kv

        return layer_fn

    # One lax.scan per contiguous same-kind layer run (a single run for
    # uniform models); mixed dense/MoE stacks (qwen3_moe.py:214-230) thread
    # the carry across segments.
    carry = (x, residual, cache)
    kv_segs = []
    for a, b, kind in spec.segments:
        lp_seg = _segment_layers(params["layers"], spec, a, b, kind)
        layer_ids = jnp.arange(a, b, dtype=jnp.int32)
        if is_prefill:
            xs = (lp_seg, layer_ids)
        elif dec_window is not None:
            xs = (lp_seg, layer_ids, pt_sel[a:b], lens_sel[a:b],
                  dec_window[0][a:b])
        else:
            xs = (lp_seg, layer_ids, pt_sel[a:b], lens_sel[a:b])
        carry, kv_seg = jax.lax.scan(make_layer_fn(kind), carry, xs)
        kv_segs.append(kv_seg)
    x, residual, cache = carry
    if not is_prefill:
        k_all = jnp.concatenate([kv[0] for kv in kv_segs], axis=0)
        v_all = jnp.concatenate([kv[1] for kv in kv_segs], axis=0)  # [L, Bd, H, D]
        if dec_window is not None:
            # Deferred append: the loop owns the window + flush; no store.
            hidden, _ = rms_norm_fused_add(
                x, residual, params["final_norm"], spec.rms_norm_eps
            )
            return cache, hidden, (k_all, v_all)
        if dec_blocks:
            # Aligned decode blocks: the step's L*Bd*H rows collapse to
            # L*Bd [H, 2D] windows (see store_decode_blocks). dec_blk's
            # tp-shard axis is size 1 inside shard_map.
            t = meta.dec_pos  # [Bd]
            blk_tbl = meta.dec_blk[:, :, 0, :]  # [L, Bd, NBLK]
            vblk = jnp.take_along_axis(
                blk_tbl, (t // geom.page_size)[None, :, None], axis=2
            )[..., 0]  # [L, Bd]
            cur = lens_sel if lens_sel is not None else cache.bh_lens[:, meta.slots]
            cache = store_decode_blocks(
                geom, cache, k_all, v_all, meta.slots, meta.valid,
                vblk, t % geom.page_size, cur,
            )
        else:
            cache = store_decode_all_layers(
                geom, cache, k_all, v_all, meta.slots, meta.valid,
                pt=pt_sel, cur=lens_sel,
            )
    hidden, _ = rms_norm_fused_add(x, residual, params["final_norm"], spec.rms_norm_eps)
    return cache, hidden


def compute_local_logits(
    params: dict, spec: ModelSpec, hidden: jax.Array
) -> jax.Array:
    """This shard's [N, V_local] logit columns (no collective) — consumed by
    layers.ops.sample_tokens_sharded, which reduces (score, index) pairs
    instead of gathering full logits (reference gathers to rank 0 only,
    layers/embed_head.py:61-68)."""
    head = params.get("lm_head")
    if head is None:
        head, scale = params["embed"].T, params.get("embed_scale")
        scale = None if scale is None else scale.T  # [1, V_local]
    else:
        scale = params.get("lm_head_scale")
    if head.dtype == jnp.int8:
        logits = (hidden @ head.astype(hidden.dtype)).astype(jnp.float32)
        return logits * scale
    return (hidden @ head).astype(jnp.float32)


def compute_logits(
    params: dict, spec: ModelSpec, hidden: jax.Array, tp_axis: str | None = None
) -> jax.Array:
    """Full [N, V] logits on every device (all-gather) — kept for logit-level
    parity tests and direct API users; the engine's sampling path uses
    compute_local_logits + sharded sampling instead."""
    return gather_logits(compute_local_logits(params, spec, hidden), tp_axis)


def prefill_logits(
    params: dict, spec: ModelSpec, hidden: jax.Array, seq_starts: jax.Array,
    seq_lens: jax.Array, tp_axis: str | None = None,
) -> jax.Array:
    """Select each sequence's last-token hidden state before projecting
    (reference: layers/embed_head.py:55-59)."""
    last = jnp.clip(seq_starts + seq_lens - 1, 0, hidden.shape[0] - 1)
    return compute_logits(params, spec, hidden[last], tp_axis)


def prefill_local_logits(
    params: dict, spec: ModelSpec, hidden: jax.Array, seq_starts: jax.Array,
    seq_lens: jax.Array,
) -> jax.Array:
    """Last-token selection + shard-local logits (sharded-sampling path)."""
    last = jnp.clip(seq_starts + seq_lens - 1, 0, hidden.shape[0] - 1)
    return compute_local_logits(params, spec, hidden[last])
