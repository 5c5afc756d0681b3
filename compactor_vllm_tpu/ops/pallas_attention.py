"""Pallas TPU attention kernels over the paged, head-sparse KV cache.

TPU-native re-design of the reference Triton kernels:

- `paged_prefill_attention` <- `causal_sparse_varlen_with_cache`
  (reference: attention/sparse_varlen_kernel.py:11-519): packed varlen
  queries attend causally over [per-head ragged paged cache prefix ‖ this
  step's packed new K/V]. GQA is handled by flattening (token-tile x group)
  query rows into one MXU matmul operand, the exact trick the reference uses
  (sparse_varlen_kernel.py:315-352). Phase 1 walks logical pages through the
  page table with double-buffered HBM->VMEM DMA; phase 2 streams the new-token
  tiles with an on-band causal mask. Online softmax runs in the exp2 domain
  (matching sparse_varlen_kernel.py's exp2 math).
- `paged_decode_attention` <- `head_sparse_decode_attention`
  (reference: attention/sparse_decode_kernel.py:10-435): one query token per
  (slot, kv-head), page walk with double-buffered DMA. The reference's
  split-KV stages exist to fill idle GPU SMs; a TPU core executes the grid
  sequentially, so the analog is megacore partitioning via
  `dimension_semantics` rather than an LSE-merge stage.

Layout: the wrappers transpose packed activations into HEAD-MAJOR layouts
(q: [H, T*G, D] with row t*G+g, k/v: [H, T, D]) so that every in-kernel DMA
slices only leading (untiled) dims — Mosaic requires VMEM-view slices on the
sublane dim to be 8-aligned, which per-group head slices of a token-major
array are not. Page tables and per-(b,h) lengths arrive in SMEM via
`PrefetchScalarGridSpec` so page-indexed DMA addresses are known before the
body runs (the pattern of jax-ml's TPU paged attention).

Grid-order contract (prefill): query tiles are addressed relative to each
sequence's `cu_seqlens` start, so a sequence's last tile may overhang into
the next sequence's rows; the grid iterates sequences in ascending order and
every sequence rewrites its own rows, so overhang writes are always
overwritten — except past the final sequence, which is why callers must leave
`TOKEN_SLACK` padded rows at the end of the packed arrays.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from compactor_vllm_tpu.ops.tuning import get_tuning

LOG2E = 1.4426950408889634
NEG_INF = -1.0e30
# Padded rows callers must leave after the last packed token (>= the key
# tile TN) so tile DMAs never run out of bounds.
TOKEN_SLACK = 512


def _row_tile(group: int, score_chunks: bool = False) -> int:
    """Query-token tile: (tokens x group) rows = 256 fills two MXU passes and
    halves the key-loop trip count vs 128-row tiles.

    With fused chunk scoring the tile must cover whole 128-token scoring
    chunks (reference postrope chunk, compression/compactor.py:17), so it is
    raised to 128 tokens minimum."""
    tm = max(16, 256 // group)
    return max(tm, 128) if score_chunks else tm




def _upcast_tile(x, dtype):
    """Upcast a cache tile to the compute dtype.

    Mosaic's float8_e4m3 -> bf16 convert lowers catastrophically slowly on
    the v5e (measured 4x on the whole decode step), so fp8 tiles are
    converted with exact integer bit manipulation instead: normals remap the
    exponent bias (7 -> 127), subnormals (m * 2^-9) convert via an exact
    small-integer multiply."""
    if x.dtype == jnp.float8_e4m3fn and dtype == jnp.bfloat16:
        # All arithmetic in i32/f32 (Mosaic cannot legalize 16-bit vector
        # shifts): an e4m3 normal maps to f32 bits as sign<<24 |
        # (exp+120)<<23 | mantissa<<20, i.e. (em + 960) << 20 over the
        # combined 7 exp+mantissa bits.
        u = pltpu.bitcast(x, jnp.uint8).astype(jnp.int32)
        sign = (u & 0x80) << 24
        em = u & 0x7F
        normal = pltpu.bitcast(sign | ((em + 960) << 20), jnp.float32)
        sub_mag = em.astype(jnp.float32) * (2.0 ** -9)
        sub = jnp.where(sign != 0, -sub_mag, sub_mag)
        out = jnp.where(em >= 8, normal, sub)
        # e4m3fn em==0x7F encodes NaN — propagate it instead of silently
        # mapping corrupted cache bytes to +/-480 finite logits.
        return jnp.where(em == 0x7F, jnp.float32(jnp.nan), out).astype(dtype)
    return x.astype(dtype)


# ----------------------------------------------------------------- prefill


def _prefill_kernel(
    # scalar prefetch
    starts_ref,  # [Bp] i32 packed row offset per sequence (8-aligned)
    lens_ref,  # [Bp] i32 true sequence lengths
    clen_ref,  # [Bp, H] i32 cached (pre-store) lengths
    pt_ref,  # [Bp, H, maxp] i32 page ids
    base_ref,  # [1] i32 row offset of this layer's pool
    # tensor inputs (HBM)
    q_hbm,  # [H, Tpad*G, D] head-major, row = token*G + group
    kn_hbm,  # [H, Tpad, D]
    vn_hbm,  # [H, Tpad, D]
    kvp_hbm,  # [rows, 2D] cache pages (K lanes [0,D), V lanes [D,2D))
    # outputs: o_hbm [H, Tpad*G, D]; with fused scoring also sc_hbm, an
    # [H, Tpad/128, 1, 128] f32 HBM array of raw chunk column mass — the
    # dynamic (head, chunk) indices land on untiled leading dims, so the
    # in-kernel DMA needs no 8-aligned dynamic offsets (NOTES.md Mosaic rule).
    o_hbm,
    *refs,
    sm_scale: float,
    page_size: int,
    tile_m: int,
    tile_n: int,
    group: int,
    score_chunks: bool,
):
    if score_chunks:
        sc_hbm, *refs = refs
        *refs, sc_buf = refs
    (q_buf, o_buf, kvc_buf, kn_buf, vn_buf, acc_ref, m_ref, l_ref,
     sems) = refs
    b = pl.program_id(0)
    h = pl.program_id(1)
    m = pl.program_id(2)
    TM, TN, G = tile_m, tile_n, group
    R = TM * G

    seq_start = starts_ref[b]
    seq_len = lens_ref[b]
    q0 = m * TM  # first query token of this tile, sequence-relative

    @pl.when(q0 < seq_len)
    def _run():
        clen = clen_ref[b, h]
        base = base_ref[0]
        # seq_start is 8-aligned and TM*G is a multiple of 128, so row0 is
        # tile-aligned — the hint lets Mosaic prove the DMA slice is legal.
        row0 = pl.multiple_of((seq_start + q0) * G, 8)

        q_dma = pltpu.make_async_copy(
            q_hbm.at[h, pl.ds(row0, R), :], q_buf, sems.at[0]
        )
        q_dma.start()

        scale = sm_scale * LOG2E
        num_pages = pl.cdiv(clen, page_size)
        n_end = pl.cdiv(jnp.minimum(q0 + TM, seq_len), TN)

        def kc_dma(slot, i):
            # Interleaved cache rows: ONE DMA moves both K and V for a page.
            row = pl.multiple_of(base + pt_ref[b, h, i] * page_size, page_size)
            return pltpu.make_async_copy(
                kvp_hbm.at[pl.ds(row, page_size), :], kvc_buf.at[slot],
                sems.at[1 + slot],
            )

        def kn_dma(slot, n):
            row = pl.multiple_of(seq_start + n * TN, 8)
            return (
                pltpu.make_async_copy(
                    kn_hbm.at[h, pl.ds(row, TN), :], kn_buf.at[slot], sems.at[5 + slot]
                ),
                pltpu.make_async_copy(
                    vn_hbm.at[h, pl.ds(row, TN), :], vn_buf.at[slot], sems.at[7 + slot]
                ),
            )

        @pl.when(num_pages > 0)
        def _():
            kc_dma(0, 0).start()

        @pl.when(num_pages == 0)
        def _():
            k0, v0 = kn_dma(0, 0)
            k0.start()
            v0.start()

        q_dma.wait()
        q = q_buf[...]

        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

        def flash_update(s, v_tile):
            """s: [R, Tk] exp2-domain logits (already masked), v: [Tk, D]."""
            m_prev = m_ref[...]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp2(s - m_new)
            corr = jnp.exp2(m_prev - m_new)
            l_ref[...] = l_ref[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_ref[...] = acc_ref[...] * corr + jax.lax.dot(
                p.astype(v_tile.dtype), v_tile, preferred_element_type=jnp.float32
            )
            m_ref[...] = m_new

        # ---- phase 1: cached pages (all keys precede all new tokens).
        def page_body(i, _):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < num_pages)
            def _():
                kc_dma(nxt, i + 1).start()

            @pl.when(jnp.logical_and(i + 1 >= num_pages, n_end > 0))
            def _():
                kd, vd = kn_dma(nxt, 0)
                kd.start()
                vd.start()

            kc_dma(slot, i).wait()
            # Cache tiles may be lower precision (fp8 KV): VPU-upcast to the
            # query dtype before the MXU dots. K = lanes [0, D).
            D_ = q_buf.shape[-1]
            k = _upcast_tile(kvc_buf[slot, :, pl.ds(0, D_)], q.dtype)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            kpos = i * page_size + jax.lax.broadcasted_iota(
                jnp.int32, (R, page_size), 1
            )
            s = jnp.where(kpos < clen, s, NEG_INF)
            # Zero masked V rows: a masked probability is 0, but 0 * NaN from
            # stale rows would still poison the accumulator.
            vrow = i * page_size + jax.lax.broadcasted_iota(
                jnp.int32, (page_size, 1), 0
            )
            v_tile = jnp.where(
                vrow < clen,
                _upcast_tile(kvc_buf[slot, :, pl.ds(D_, D_)], q.dtype),
                0,
            )
            flash_update(s, v_tile)
            return 0

        jax.lax.fori_loop(0, num_pages, page_body, 0)

        # ---- phase 2: this step's packed new K/V, causal on the band.
        def new_body(n, _):
            # Continue the double-buffer parity from phase 1.
            slot = jax.lax.rem(num_pages + n, 2)
            nxt = jax.lax.rem(num_pages + n + 1, 2)

            @pl.when(n + 1 < n_end)
            def _():
                kd, vd = kn_dma(nxt, n + 1)
                kd.start()
                vd.start()

            kd, vd = kn_dma(slot, n)
            kd.wait()
            vd.wait()
            k = kn_buf[slot]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            rows = jax.lax.broadcasted_iota(jnp.int32, (R, TN), 0)
            qpos = q0 + rows // G
            kpos = n * TN + jax.lax.broadcasted_iota(jnp.int32, (R, TN), 1)
            mask = (kpos <= qpos) & (kpos < seq_len)
            s = jnp.where(mask, s, NEG_INF)
            # Zero V rows past the sequence: padded packed rows can hold NaN
            # (unwritten output rows of the previous layer), and 0 * NaN = NaN.
            vrow = n * TN + jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0)
            v_tile = jnp.where(vrow < seq_len, vn_buf[slot], 0)
            flash_update(s, v_tile)
            return 0

        jax.lax.fori_loop(0, n_end, new_body, 0)

        if score_chunks:
            # ---- fused postrope chunk scoring (reference non_causal_attn
            # column mass, compression/compactor.py:489-599, sm_scale=1.0):
            # each 128-token scoring chunk of this tile attends non-causally
            # within itself. The chunk's keys are ALWAYS resident in the key
            # tile of the final phase-2 iteration (the causal on-band end is
            # the chunk), so no extra HBM traffic is needed. The score DMAs
            # start here but are only awaited at program end, overlapped with
            # the epilogue + output DMA (an inline wait costs a round-trip
            # per program — measured to cancel the fused-scoring win).
            CHUNK = 128
            last_slot = jax.lax.rem(num_pages + n_end - 1, 2)
            tile_k0 = (n_end - 1) * TN  # sequence-relative first key of tile
            for c in range(TM // CHUNK):
                qc0 = q0 + c * CHUNK  # chunk's first token, sequence-relative
                q_c = q_buf[pl.ds(c * CHUNK * G, CHUNK * G), :]
                off = pl.multiple_of(qc0 - tile_k0, CHUNK)
                k_c = kn_buf[last_slot, pl.ds(off, CHUNK), :]
                s2 = jax.lax.dot_general(
                    q_c, k_c, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * LOG2E  # sm_scale = 1.0 in the exp2 domain
                cols = qc0 + jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK * G, CHUNK), 1
                )
                col_ok = cols < seq_len
                s2 = jnp.where(col_ok, s2, NEG_INF)
                m2 = jnp.maximum(
                    jnp.max(s2, axis=-1, keepdims=True), NEG_INF / 2
                )
                p2 = jnp.exp2(s2 - m2)
                p2 = p2 / jnp.maximum(
                    jnp.sum(p2, axis=-1, keepdims=True), 1e-30
                )
                # Padded query rows contribute uniform mass to valid keys
                # (reference quirk, compactor.py:447-452).
                qrow = qc0 + jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK * G, CHUNK), 0
                ) // G
                p2 = jnp.where(qrow < seq_len, p2, 1.0 / CHUNK)
                p2 = jnp.where(col_ok, p2, 0.0)
                sc_buf[c, 0, :] = jnp.sum(p2, axis=0)
                # seq_start is a multiple of the (>=128) query tile, so the
                # packed chunk index is exact.
                cidx = (seq_start + qc0) // CHUNK
                pltpu.make_async_copy(
                    sc_buf.at[c], sc_hbm.at[h, cidx], sems.at[9 + c]
                ).start()

        l = l_ref[...]
        out = acc_ref[...] / jnp.where(l > 0, l, 1.0)
        o_buf[...] = out.astype(o_buf.dtype)
        o_dma = pltpu.make_async_copy(
            o_buf, o_hbm.at[h, pl.ds(row0, R), :], sems.at[0]
        )
        o_dma.start()
        if score_chunks:
            for c in range(TM // CHUNK):
                qc0 = q0 + c * CHUNK
                cidx = (seq_start + qc0) // CHUNK
                pltpu.make_async_copy(
                    sc_buf.at[c], sc_hbm.at[h, cidx], sems.at[9 + c]
                ).wait()
        o_dma.wait()


def paged_prefill_attention(
    q: jax.Array,  # [Tpad, HQ, D] packed varlen (Tpad >= packed end + TOKEN_SLACK)
    k_new: jax.Array,  # [Tpad, H, D]
    v_new: jax.Array,
    kv_pages: jax.Array,  # [rows, 2D] interleaved cache
    page_table: jax.Array,  # [Bp, H, maxp] i32 (layer slice, slot-gathered)
    cached_lens: jax.Array,  # [Bp, H] i32 pre-store snapshot
    seq_starts: jax.Array,  # [Bp] i32, 8-token-aligned packed offsets
    seq_lens: jax.Array,  # [Bp] i32
    row_base: jax.Array,  # [] or [1] i32: layer * rows_per_layer
    *,
    sm_scale: float,
    page_size: int,
    max_q: int,
    score_chunks: bool = False,
    interpret: bool = False,
):
    """Paged varlen prefill attention; with `score_chunks` additionally
    returns the fused postrope chunk-scoring column mass as a second array
    [T, H] f32 (raw, un-z-scored; garbage on padding rows — callers mask).

    Fused-scoring contract: sequence starts must be multiples of the query
    tile (128 tokens x LCM with the scoring chunk), guaranteed by the
    engine's chunk-aligned packing (ModelRunner._start_align).
    """
    T, HQ, D = q.shape
    H = k_new.shape[1]
    G = HQ // H
    Bp = seq_starts.shape[0]
    TM = _row_tile(G, score_chunks)
    # Big key tiles amortize loop/DMA overhead over MXU work (per-device
    # table; 512 measured on v5e).
    TN = get_tuning().prefill_tn
    assert T % TM == 0 and max_q % TM == 0
    num_m = pl.cdiv(max_q, TM)
    grid = (Bp, H, num_m)

    # Head-major layouts so in-kernel DMA slices hit only untiled dims.
    q_hm = q.reshape(T, H, G, D).transpose(1, 0, 2, 3).reshape(H, T * G, D)
    kn_hm = k_new.transpose(1, 0, 2)
    vn_hm = v_new.transpose(1, 0, 2)

    kernel = functools.partial(
        _prefill_kernel,
        sm_scale=sm_scale,
        page_size=page_size,
        tile_m=TM,
        tile_n=TN,
        group=G,
        score_chunks=score_chunks,
    )
    out_shape = [jax.ShapeDtypeStruct((H, T * G, D), q.dtype)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
    if score_chunks:
        # Raw chunk column mass, written by in-kernel DMA. 4D layout keeps
        # the dynamic (head, chunk) indices on untiled leading dims.
        # Never-written regions (padding rows past every sequence) hold
        # garbage — consumers must mask by token validity.
        assert T % 128 == 0
        out_shape.append(
            jax.ShapeDtypeStruct((H, T // 128, 1, 128), jnp.float32)
        )
        out_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 4,
        out_specs=tuple(out_specs) if score_chunks else out_specs[0],
        scratch_shapes=[
            pltpu.VMEM((TM * G, D), q.dtype),
            pltpu.VMEM((TM * G, D), q.dtype),
            pltpu.VMEM((2, page_size, 2 * D), kv_pages.dtype),
            pltpu.VMEM((2, TN, D), k_new.dtype),
            pltpu.VMEM((2, TN, D), v_new.dtype),
            pltpu.VMEM((TM * G, D), jnp.float32),
            pltpu.VMEM((TM * G, 1), jnp.float32),
            pltpu.VMEM((TM * G, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((9 + max(2, TM // 128),)),
        ]
        + ([pltpu.VMEM((TM // 128, 1, 128), jnp.float32)] if score_chunks else []),
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape) if score_chunks else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        seq_starts.astype(jnp.int32),
        seq_lens.astype(jnp.int32),
        cached_lens.astype(jnp.int32),
        page_table.astype(jnp.int32),
        jnp.asarray(row_base, jnp.int32).reshape(1),
        q_hm, kn_hm, vn_hm, kv_pages,
    )
    o_hm = outs[0] if score_chunks else outs
    o = o_hm.reshape(H, T, G, D).transpose(1, 0, 2, 3).reshape(T, HQ, D)
    if score_chunks:
        return o, outs[1].reshape(H, T).T  # [T, H] raw column mass
    return o


# ------------------------------------------------------------------ decode


# Tuning constants live in ops/tuning.py (per-device-kind table). The module
# globals below are OVERRIDES: None means "use the table"; tests and smoke
# benchmarks monkeypatch them to force specific kernel paths.
DECODE_GROUP: int | None = None  # pages fetched + reduced per flash step
# Max per-head context (tokens) for the RESIDENT decode kernel: the whole
# per-(b, h) KV fits VMEM (2 ring slots x K+V x bf16: tokens x 1KB), the next
# program's pages prefetch during this program's compute, and attention runs
# as two full-width dots with a single softmax — no per-group flash chain.
DECODE_RESIDENT_TOKENS: int | None = None


def decode_group_pages() -> int:
    """Pages per decode flash group (module override, else tuning table).
    Callers building contig-run flag arrays must use this exact value so the
    flag width matches the kernel's group walk."""
    return DECODE_GROUP if DECODE_GROUP is not None else get_tuning().decode_group_pages


def _window_logits(q, wkv, cnt, scale):
    """Recent-window QK logits for the deferred decode append: `wkv`
    [W, 2D] holds the K/V of tokens appended during the current fused decode
    loop but not yet flushed to the paged cache (runner flush_decode_window);
    entries >= `cnt` are garbage and masked. Returns (s_w [G, W] NEG_INF-
    masked, v_w [W, D] zero-masked — window rows can hold NaN from dead
    lanes' garbage compute, and 0 x NaN = NaN in the PV dot)."""
    W = wkv.shape[0]
    D = wkv.shape[1] // 2
    k_w = wkv[:, :D]
    v_w = wkv[:, D:].astype(jnp.float32)
    if W == 1:
        # VPU mul+reduce (a [G, 1] matvec trips a Mosaic broadcast bug).
        s_w = jnp.sum(
            q.astype(jnp.float32) * k_w.astype(jnp.float32),
            axis=-1, keepdims=True,
        ) * scale
    else:
        s_w = jax.lax.dot_general(
            q, k_w.astype(q.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [G, W]
    wpos_row = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], W), 1)
    s_w = jnp.where(wpos_row < cnt, s_w, NEG_INF)
    wpos_col = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    v_w = jnp.where(wpos_col < cnt, v_w, 0.0)
    return s_w, v_w


def _decode_kernel_resident(
    lens_ref,  # [Bd, H] i32 cached (pre-append) lengths
    pt_ref,  # [Bd, H, maxp] i32
    contig_ref,  # [Bd, H, ceil(maxp/GROUP)] i32 contiguous-run group flags
    wcnt_ref,  # [Bd] i32 valid recent-window entries per lane
    base_ref,  # [1] i32
    q_ref,  # [Bd, H, G, D] VMEM
    kn_ref,  # [Bd, H, 1, D] VMEM — this step's key (merged in-register)
    vn_ref,  # [Bd, H, 1, D] VMEM
    wkv_ref,  # [Bd, H, W, 2D] VMEM — unflushed loop window (K | V lanes)
    kvp_hbm,
    o_ref,  # [Bd, H, G, D] VMEM
    kv_buf,  # [NS, CTX, 2D] whole per-(b,h) interleaved K/V ring
    s_buf,  # [G, CTX] f32 QK logits scratch
    sems,  # DMA [NS, NG, 2]
    *,
    sm_scale: float,
    page_size: int,
    group: int,
    group_pages: int,
):
    """Decode attention with whole-context VMEM residency.

    Grid programs run sequentially on a TPU core, so program (b, h) prefetches
    program (b, h)+1's pages while IT computes — the DMA latency that the
    ring-buffered kernel exposes at every program start (measured ~4 µs of a
    ~9 µs program) hides behind compute. With all keys resident, QK and PV
    are two full-width dots whose MXU passes pipeline internally, replacing
    the serial per-group flash chain (NOTES.md round-1: pass-latency floor).
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    Bd = pl.num_programs(0)
    H = pl.num_programs(1)
    G, GP = group, group_pages
    D = q_ref.shape[-1]
    CTX = kv_buf.shape[1]
    base = base_ref[0]
    scale = sm_scale * LOG2E

    def fetch(bb, hh, slot, wait):
        """Start (or wait for) the page-group DMAs of (bb, hh) into `slot`.
        Waits recreate the identical copy descriptors (standard Pallas
        cross-program prefetch pattern)."""
        length = lens_ref[bb, hh]
        npages = pl.cdiv(length, page_size)
        ngroups = pl.cdiv(npages, GP)

        def run_copies(g):
            row = pl.multiple_of(
                base + pt_ref[bb, hh, g * GP] * page_size, page_size
            )
            off = g * GP * page_size
            return pltpu.make_async_copy(
                kvp_hbm.at[pl.ds(row, GP * page_size), :],
                kv_buf.at[slot, pl.ds(off, GP * page_size), :],
                sems.at[slot, g, 0],
            )

        def page_copies(g, j):
            row = pl.multiple_of(
                base + pt_ref[bb, hh, g * GP + j] * page_size, page_size
            )
            off = (g * GP + j) * page_size
            return pltpu.make_async_copy(
                kvp_hbm.at[pl.ds(row, page_size), :],
                kv_buf.at[slot, pl.ds(off, page_size), :],
                sems.at[slot, g, 0],
            )

        def body(g, _):
            is_run = (contig_ref[bb, hh, g] != 0) & ((g + 1) * GP <= npages)

            @pl.when(is_run)
            def _():
                d = run_copies(g)
                if wait:
                    d.wait()
                else:
                    d.start()

            @pl.when(jnp.logical_not(is_run))
            def _():
                for j in range(GP):
                    @pl.when(g * GP + j < npages)
                    def _():
                        d = page_copies(g, j)
                        if wait:
                            # Per-page copies in a group share its semaphore;
                            # one wait per started copy.
                            d.wait()
                        else:
                            d.start()

            return 0

        jax.lax.fori_loop(0, ngroups, body, 0)

    idx = b * H + h
    NS = kv_buf.shape[0]  # ring slots; prefetch depth = NS - 1
    slot = jax.lax.rem(idx, NS)

    @pl.when(idx == 0)
    def _():
        # Zero every ring slot ONCE per dispatch (scratch VMEM is undefined
        # at entry): every later slot content is fetched cache rows — finite
        # by construction (cache pools are zeros-initialized and stores mask
        # NaN pad rows) — so per-program V masking is unnecessary (p is
        # exactly 0 past `length` because s is NEG_INF-masked there, and
        # 0 x finite = 0; only 0 x NaN would poison the PV dot).
        kv_buf[...] = jnp.zeros_like(kv_buf)
        # Prime the pipeline: own fetch + the first NS-2 lookaheads (the
        # steady-state lookahead of idx + NS - 1 is issued below). NS and
        # the grid are static, so the loop and bound resolve at trace time.
        fetch(b, h, slot, wait=False)
        for d in range(1, NS - 1):
            if d < Bd * H:
                fetch(d // H, d % H, d % NS, wait=False)

    # Prefetch a LATER program's context while this one computes: depth
    # NS - 1 keeps that many page fetches in flight, covering DMA issue
    # latency when per-program compute is shorter than its fetch.
    @pl.when(idx + NS - 1 < Bd * H)
    def _():
        nxt = idx + NS - 1
        nb = nxt // H
        nh = jax.lax.rem(nxt, H)
        fetch(nb, nh, jax.lax.rem(nxt, NS), wait=False)

    fetch(b, h, slot, wait=True)

    q = q_ref[b, h]  # [G, D]
    length = lens_ref[b, h]
    # Group-guarded QK dots: only the groups covering the ACTUAL context run
    # (per-head lengths are ragged after compression; a fixed full-width dot
    # wastes MXU passes on the longest head's worth of padding for every
    # head). Results land in an s scratch; the softmax runs once at the end.
    GSZ = GP * page_size
    NGR = CTX // GSZ
    # No NEG_INF prefill: rows < length are always written by the guarded
    # dots below (the guard is group-granular), and the kpos mask replaces
    # everything >= length with NEG_INF regardless of scratch contents.
    for g in range(NGR):
        @pl.when(g * GSZ < length)
        def _():
            k_g = _upcast_tile(kv_buf[slot, pl.ds(g * GSZ, GSZ), pl.ds(0, D)], q.dtype)
            s_buf[:, pl.ds(g * GSZ, GSZ)] = jax.lax.dot_general(
                q, k_g, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [G, GSZ]

    s = s_buf[...]  # [G, CTX]
    kpos = jax.lax.broadcasted_iota(jnp.int32, (G, CTX), 1)
    s = jnp.where(kpos < length, s, NEG_INF)

    # Single softmax (no online chain): include the step's own key and the
    # unflushed loop window (deferred decode append).
    k_self = kn_ref[b, h]  # [1, D]
    v_self = vn_ref[b, h]
    s_self = jnp.sum(
        q.astype(jnp.float32) * k_self.astype(jnp.float32),
        axis=-1, keepdims=True,
    ) * scale  # [G, 1] (VPU: a [G,1] MXU matvec trips a Mosaic verifier bug)
    s_w, v_w = _window_logits(q, wkv_ref[b, h], wcnt_ref[b], scale)
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_self)
    m = jnp.maximum(m, jnp.max(s_w, axis=-1, keepdims=True))
    p = jnp.exp2(s - m)
    p_self = jnp.exp2(s_self - m)
    p_w = jnp.exp2(s_w - m)  # [G, W]
    l = (
        jnp.sum(p, axis=-1, keepdims=True) + p_self
        + jnp.sum(p_w, axis=-1, keepdims=True)
    )
    # V is used UNMASKED: p is exactly 0 for every row >= length, and ring
    # contents are finite (zeroed at program 0; afterwards always fetched
    # cache rows) — dropping the [CTX, D] select saves a full V copy through
    # the VPU per program.
    v_tile = _upcast_tile(kv_buf[slot, :, pl.ds(D, D)], q.dtype)
    acc = jax.lax.dot(
        p.astype(v_tile.dtype), v_tile, preferred_element_type=jnp.float32
    )  # [G, D] — contraction-dim streaming pipelines
    acc = acc + p_self * v_self.astype(jnp.float32)
    if wkv_ref.shape[2] == 1:
        acc = acc + p_w * v_w
    else:
        acc = acc + jax.lax.dot(
            p_w.astype(jnp.float32), v_w, preferred_element_type=jnp.float32
        )
    out = acc / jnp.where(l > 0, l, 1.0)
    o_ref[b, h] = out.astype(o_ref.dtype)


# Pairs per grid program for the multi-pair resident kernel: amortizes
# per-program sequencing overhead and keeps PP page fetches in flight at
# once. 0/1 selects the single-pair kernel. None -> tuning table (which the
# CVT_DECODE_PAIRS env var overrides for on-chip A/B).
DECODE_PAIRS_PER_PROGRAM: int | None = None


def _decode_kernel_resident_multi(
    lens_ref,  # [Bd, H] i32 cached (pre-append) lengths
    pt_ref,  # [Bd, H, maxp] i32
    contig_ref,  # [Bd, H, NG] i32 contiguous-run group flags
    wcnt_ref,  # [Bd] i32 valid recent-window entries per lane
    base_ref,  # [1] i32
    q_ref,  # [Bd, H, G, D] VMEM
    kn_ref,  # [Bd, H, 1, D] VMEM
    vn_ref,  # [Bd, H, 1, D] VMEM
    wkv_ref,  # [Bd, H, W, 2D] VMEM — unflushed loop window (K | V lanes)
    kvp_hbm,
    o_ref,  # [Bd, H, G, D] VMEM
    kv_buf,  # [2, PP, CTX, 2D] ring: PP pairs per program, double-buffered
    s_buf,  # [G, CTX] f32 QK logits scratch (reused across pairs)
    sems,  # DMA [2, PP, NG]
    *,
    sm_scale: float,
    page_size: int,
    group: int,
    group_pages: int,
    pairs: int,
):
    """Multi-pair variant of `_decode_kernel_resident`: each grid program
    owns PP consecutive (b, h) pairs — one program-sequencing overhead and
    PP parallel context fetches per PP attention computations, instead of
    per one. Identical math per pair."""
    prog = pl.program_id(0)
    NPROG = pl.num_programs(0)
    Bd, H = lens_ref.shape
    G, GP, PP = group, group_pages, pairs
    D = q_ref.shape[-1]
    CTX = kv_buf.shape[2]
    base = base_ref[0]
    scale = sm_scale * LOG2E

    def fetch(pair, slot, wait):
        """Start (or wait for) the page-group DMAs of global pair index
        `pair` into (slot, pair % PP). Waits recreate identical descriptors
        (standard Pallas cross-program prefetch pattern)."""
        bb = pair // H
        hh = jax.lax.rem(pair, H)
        pp = jax.lax.rem(pair, PP)  # pairs are consecutive per program
        length = lens_ref[bb, hh]
        npages = pl.cdiv(length, page_size)
        ngroups = pl.cdiv(npages, GP)

        def run_copies(g):
            row = pl.multiple_of(
                base + pt_ref[bb, hh, g * GP] * page_size, page_size
            )
            return pltpu.make_async_copy(
                kvp_hbm.at[pl.ds(row, GP * page_size), :],
                kv_buf.at[slot, pp, pl.ds(g * GP * page_size, GP * page_size), :],
                sems.at[slot, pp, g],
            )

        def page_copies(g, j):
            row = pl.multiple_of(
                base + pt_ref[bb, hh, g * GP + j] * page_size, page_size
            )
            return pltpu.make_async_copy(
                kvp_hbm.at[pl.ds(row, page_size), :],
                kv_buf.at[slot, pp, pl.ds((g * GP + j) * page_size, page_size), :],
                sems.at[slot, pp, g],
            )

        def body(g, _):
            is_run = (contig_ref[bb, hh, g] != 0) & ((g + 1) * GP <= npages)

            @pl.when(is_run)
            def _():
                d = run_copies(g)
                d.wait() if wait else d.start()

            @pl.when(jnp.logical_not(is_run))
            def _():
                for j in range(GP):
                    @pl.when(g * GP + j < npages)
                    def _():
                        d = page_copies(g, j)
                        d.wait() if wait else d.start()

            return 0

        jax.lax.fori_loop(0, ngroups, body, 0)

    slot = jax.lax.rem(prog, 2)

    @pl.when(prog == 0)
    def _():
        # Zero the ring once per dispatch — see _decode_kernel_resident.
        kv_buf[...] = jnp.zeros_like(kv_buf)
        for p in range(PP):
            fetch(p, slot, wait=False)

    @pl.when(prog + 1 < NPROG)
    def _():
        for p in range(PP):
            fetch((prog + 1) * PP + p, 1 - slot, wait=False)

    for p in range(PP):
        fetch(prog * PP + p, slot, wait=True)

    GSZ = GP * page_size
    NGR = CTX // GSZ
    for p in range(PP):
        pair = prog * PP + p
        b = pair // H
        h = jax.lax.rem(pair, H)
        q = q_ref[b, h]  # [G, D]
        length = lens_ref[b, h]
        for g in range(NGR):
            @pl.when(g * GSZ < length)
            def _(g=g):
                k_g = _upcast_tile(
                    kv_buf[slot, p, pl.ds(g * GSZ, GSZ), pl.ds(0, D)], q.dtype
                )
                s_buf[:, pl.ds(g * GSZ, GSZ)] = jax.lax.dot_general(
                    q, k_g, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale

        s = s_buf[...]  # [G, CTX]
        kpos = jax.lax.broadcasted_iota(jnp.int32, (G, CTX), 1)
        s = jnp.where(kpos < length, s, NEG_INF)
        k_self = kn_ref[b, h]
        v_self = vn_ref[b, h]
        s_self = jnp.sum(
            q.astype(jnp.float32) * k_self.astype(jnp.float32),
            axis=-1, keepdims=True,
        ) * scale
        s_w, v_w = _window_logits(q, wkv_ref[b, h], wcnt_ref[b], scale)
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_self)
        m = jnp.maximum(m, jnp.max(s_w, axis=-1, keepdims=True))
        pw = jnp.exp2(s - m)
        p_self = jnp.exp2(s_self - m)
        p_w = jnp.exp2(s_w - m)
        l = (
            jnp.sum(pw, axis=-1, keepdims=True) + p_self
            + jnp.sum(p_w, axis=-1, keepdims=True)
        )
        v_tile = _upcast_tile(kv_buf[slot, p, :, pl.ds(D, D)], q.dtype)
        acc = jax.lax.dot(
            pw.astype(v_tile.dtype), v_tile, preferred_element_type=jnp.float32
        )
        acc = acc + p_self * v_self.astype(jnp.float32)
        if wkv_ref.shape[2] == 1:
            acc = acc + p_w * v_w
        else:
            acc = acc + jax.lax.dot(
                p_w.astype(jnp.float32), v_w,
                preferred_element_type=jnp.float32,
            )
        out = acc / jnp.where(l > 0, l, 1.0)
        o_ref[b, h] = out.astype(o_ref.dtype)


def _decode_kernel(
    lens_ref,  # [Bd, H] i32 cached (pre-append) lengths
    pt_ref,  # [Bd, H, maxp] i32
    contig_ref,  # [Bd, H, ceil(maxp/GROUP)] i32 contiguous-run group flags
    wcnt_ref,  # [Bd] i32 valid recent-window entries per lane
    base_ref,  # [1] i32
    q_ref,  # [Bd, H, G, D] VMEM (free reshape of [Bd, HQ, D])
    kn_ref,  # [Bd, H, 1, D] VMEM — this step's key (merged in-register)
    vn_ref,  # [Bd, H, 1, D] VMEM
    wkv_ref,  # [Bd, H, W, 2D] VMEM — unflushed loop window (K | V lanes)
    kvp_hbm,
    o_ref,  # [Bd, H, G, D] VMEM
    kv_buf,  # [2, GROUP*page, 2D] interleaved K/V
    sems,  # DMA [2, GROUP, 2]
    *,
    sm_scale: float,
    page_size: int,
    group: int,
    group_pages: int,
    megacore: bool = False,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    G, GP = group, group_pages
    D = q_ref.shape[-1]
    base = base_ref[0]
    length = lens_ref[b, h]
    num_pages = pl.cdiv(length, page_size)
    num_groups = pl.cdiv(num_pages, GP)
    scale = sm_scale * LOG2E

    if True:
        q = q_ref[b, h]  # [G, D]

        def page_dma(slot, i, j):
            """Fetch page (g*GP + j) into lane j of ring slot `slot`."""
            row = pl.multiple_of(
                base + pt_ref[b, h, i * GP + j] * page_size, page_size
            )
            return pltpu.make_async_copy(
                kvp_hbm.at[pl.ds(row, page_size), :],
                kv_buf.at[slot, pl.ds(j * page_size, page_size), :],
                sems.at[slot, j, 0],
            )

        def run_dma(slot, i):
            """Whole-group DMA when the allocator handed out a consecutive
            ascending page run (PageAllocator.contig_groups)."""
            row = pl.multiple_of(
                base + pt_ref[b, h, i * GP] * page_size, page_size
            )
            return pltpu.make_async_copy(
                kvp_hbm.at[pl.ds(row, GP * page_size), :],
                kv_buf.at[slot], sems.at[slot, 0, 0],
            )

        def is_run(i):
            return (contig_ref[b, h, i] != 0) & ((i + 1) * GP <= num_pages)

        def start_group(slot, i):
            @pl.when(is_run(i))
            def _():
                run_dma(slot, i).start()

            @pl.when(jnp.logical_not(is_run(i)))
            def _():
                for j in range(GP):
                    @pl.when(i * GP + j < num_pages)
                    def _():
                        page_dma(slot, i, j).start()

        def wait_group(slot, i):
            @pl.when(is_run(i))
            def _():
                run_dma(slot, i).wait()

            @pl.when(jnp.logical_not(is_run(i)))
            def _():
                for j in range(GP):
                    @pl.when(i * GP + j < num_pages)
                    def _():
                        page_dma(slot, i, j).wait()

        if not megacore:
            # Zero the ring once per dispatch: scratch VMEM is undefined at
            # entry; afterwards every slot row is either a fetched cache row
            # (finite by construction) or a stale one from a previous group —
            # so the V tile needs no per-group mask (p is 0 past `length`).
            # NOT valid under megacore: each TensorCore owns its own scratch
            # instance and program 0 runs on only one of them — the megacore
            # path masks V instead.
            @pl.when(b * pl.num_programs(1) + h == 0)
            def _():
                kv_buf[...] = jnp.zeros_like(kv_buf)

        start_group(0, 0)

        def body(i, carry):
            m_prev, l_prev, acc = carry
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < num_groups)
            def _():
                start_group(nxt, i + 1)

            wait_group(slot, i)
            # fp8 KV tiles are VPU-upcast to the query dtype before the dot.
            k = _upcast_tile(kv_buf[slot, :, pl.ds(0, D)], q.dtype)  # [GP*page, D]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # [G, GP*page]
            kpos = i * GP * page_size + jax.lax.broadcasted_iota(
                jnp.int32, (G, GP * page_size), 1
            )
            s = jnp.where(kpos < length, s, NEG_INF)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp2(s - m_new)
            corr = jnp.exp2(m_prev - m_new)
            l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
            # Un-fetched V lanes need no mask: their probability is exactly 0
            # (s NEG_INF-masked) and ring contents are always finite (zeroed
            # at program 0; afterwards fetched cache rows). Under megacore
            # the zero-once trick is invalid (per-core scratch), so unfetched
            # rows may hold garbage/NaN and 0 x NaN = NaN — mask V explicitly.
            v_tile = _upcast_tile(kv_buf[slot, :, pl.ds(D, D)], q.dtype)
            if megacore:
                vpos = i * GP * page_size + jax.lax.broadcasted_iota(
                    jnp.int32, (GP * page_size, 1), 0
                )
                v_tile = jnp.where(vpos < length, v_tile, 0)
            acc = acc * corr + jax.lax.dot(
                p.astype(v_tile.dtype), v_tile, preferred_element_type=jnp.float32
            )
            return m_new, l_new, acc

        m0 = jnp.full((G, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((G, 1), jnp.float32)
        acc0 = jnp.zeros((G, D), jnp.float32)
        m_f, l, acc = jax.lax.fori_loop(0, num_groups, body, (m0, l0, acc0))

        # Merge the step's own (query-position) key/value — the cache append
        # is deferred and batched outside the layer scan — plus the unflushed
        # loop window (deferred decode append, flush_decode_window).
        k_self = kn_ref[b, h]  # [1, D]
        v_self = vn_ref[b, h]
        # VPU mul+reduce (a [G,1] matvec trips a Mosaic broadcast bug on MXU).
        s_self = jnp.sum(
            q.astype(jnp.float32) * k_self.astype(jnp.float32),
            axis=-1, keepdims=True,
        ) * scale  # [G, 1]
        s_w, v_w = _window_logits(q, wkv_ref[b, h], wcnt_ref[b], scale)
        m_new = jnp.maximum(m_f, s_self)
        m_new = jnp.maximum(m_new, jnp.max(s_w, axis=-1, keepdims=True))
        corr = jnp.exp2(m_f - m_new)
        p_self = jnp.exp2(s_self - m_new)
        p_w = jnp.exp2(s_w - m_new)
        l = l * corr + p_self + jnp.sum(p_w, axis=-1, keepdims=True)
        acc = acc * corr + p_self * v_self.astype(jnp.float32)
        if wkv_ref.shape[2] == 1:
            acc = acc + p_w * v_w
        else:
            acc = acc + jax.lax.dot(
                p_w.astype(jnp.float32), v_w,
                preferred_element_type=jnp.float32,
            )

        out = acc / jnp.where(l > 0, l, 1.0)
        o_ref[b, h] = out.astype(o_ref.dtype)


def paged_decode_attention(
    q: jax.Array,  # [Bd, HQ, D]
    k_new: jax.Array,  # [Bd, H, D] this step's key (self, not yet in cache)
    v_new: jax.Array,
    kv_pages: jax.Array,  # [rows, 2D] interleaved cache
    page_table: jax.Array,  # [Bd, H, maxp]
    lens: jax.Array,  # [Bd, H] cached (pre-append) lengths
    row_base: jax.Array,
    contig8: jax.Array | None = None,  # [Bd, H, ceil(maxp/GROUP)] run flags
    *,
    sm_scale: float,
    page_size: int,
    group_pages: int | None = None,
    win_kv: jax.Array | None = None,  # [Bd, H, W, 2D] unflushed loop window
    win_cnt: jax.Array | None = None,  # [Bd] valid window entries
    interpret: bool = False,
) -> jax.Array:
    tune = get_tuning()
    if group_pages is None:
        group_pages = decode_group_pages()
    resident_tokens = (
        DECODE_RESIDENT_TOKENS if DECODE_RESIDENT_TOKENS is not None
        else tune.decode_resident_tokens
    )
    Bd, HQ, D = q.shape
    H = page_table.shape[1]
    G = HQ // H
    maxp = page_table.shape[2]
    # Kernel trip counts derive from lens alone (npages = cdiv(len, page));
    # clamp against the page-table width so a caller bookkeeping bug can
    # never walk pt_ref / kv_buf out of bounds (host invariants are the
    # primary guarantee; this makes kernel-level OOB impossible).
    lens = jnp.minimum(lens, maxp * page_size)
    ng = -(-maxp // group_pages)
    if contig8 is None:
        contig8 = jnp.zeros((Bd, H, ng), jnp.int32)
    else:
        contig8 = contig8[:, :, :ng]
    # Free reshapes only — (b, h) index untiled dims of 4D views, so no
    # head-major transposes are needed (they cost ~0.9 ms/layer in XLA ops
    # around the kernel, 2x the kernel itself).
    q_hm = q.reshape(Bd, H, G, D)
    kn_hm = k_new[:, :, None, :]  # [Bd, H, 1, D]
    vn_hm = v_new[:, :, None, :]
    # Deferred-append window: tokens sampled by earlier iterations of the
    # current fused decode loop, not yet flushed to the paged cache. Without
    # a window, a 1-wide dummy with count 0 keeps one kernel signature (the
    # masked merge is a handful of VPU ops).
    if win_kv is None:
        win_kv = jnp.zeros((Bd, H, 1, 2 * D), q.dtype)
        win_cnt = jnp.zeros((Bd,), jnp.int32)
    assert win_cnt is not None and win_kv.shape[:2] == (Bd, H)
    # Resident kernels rely on sequential grid execution (cross-program
    # prefetch, zero-scratch-once) — invalid on megacore parts (v4/v5p),
    # which instead run the self-contained ring kernel with a `parallel`
    # batch dim so both TensorCores contribute.
    resident = maxp * page_size <= resident_tokens and not tune.megacore
    grid = (Bd, H)
    if resident:
        ctx = ng * group_pages * page_size
        slot_bytes = ctx * 2 * D * jnp.dtype(kv_pages.dtype).itemsize
        pp = (
            DECODE_PAIRS_PER_PROGRAM if DECODE_PAIRS_PER_PROGRAM is not None
            else tune.decode_pairs
        )
        if (
            pp > 1
            and (Bd * H) % pp == 0
            and 2 * pp * slot_bytes <= tune.ring_budget_bytes
        ):
            grid = ((Bd * H) // pp,)
            kernel = functools.partial(
                _decode_kernel_resident_multi, sm_scale=sm_scale,
                page_size=page_size, group=G, group_pages=group_pages,
                pairs=pp,
            )
            scratch = [
                pltpu.VMEM((2, pp, ctx, 2 * D), kv_pages.dtype),
                pltpu.VMEM((G, ctx), jnp.float32),
                pltpu.SemaphoreType.DMA((2, pp, ng)),
            ]
        else:
            # Ring depth: keep NS - 1 programs' page fetches in flight (DMA
            # issue latency cover), bounded by the VMEM ring budget.
            ns = int(max(2, min(4, tune.ring_budget_bytes // max(slot_bytes, 1))))
            kernel = functools.partial(
                _decode_kernel_resident, sm_scale=sm_scale,
                page_size=page_size, group=G, group_pages=group_pages,
            )
            scratch = [
                pltpu.VMEM((ns, ctx, 2 * D), kv_pages.dtype),
                pltpu.VMEM((G, ctx), jnp.float32),
                pltpu.SemaphoreType.DMA((ns, ng, 2)),
            ]
    else:
        kernel = functools.partial(
            _decode_kernel, sm_scale=sm_scale, page_size=page_size, group=G,
            group_pages=group_pages, megacore=tune.megacore,
        )
        scratch = [
            pltpu.VMEM((2, group_pages * page_size, 2 * D), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((2, group_pages, 2)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    o_hm = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bd, H, G, D), q.dtype),
        # Measured on v5e (single TensorCore): "parallel" on the batch dim
        # is slightly SLOWER (1.25 -> 1.73 ms/layer at ctx2048 b16) and would
        # race the resident kernel's cross-program prefetch — keep sequential
        # semantics (NOTES.md round 2). On megacore parts (v4/v5p) the grid
        # is the self-contained ring kernel, whose batch dim is marked
        # `parallel` so Mosaic can split it across both TensorCores.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("parallel",) + ("arbitrary",) * (len(grid) - 1)
                if tune.megacore else ("arbitrary",) * len(grid)
            ),
        ),
        interpret=interpret,
    )(
        lens.astype(jnp.int32),
        page_table.astype(jnp.int32),
        contig8.astype(jnp.int32),
        win_cnt.astype(jnp.int32),
        jnp.asarray(row_base, jnp.int32).reshape(1),
        q_hm, kn_hm, vn_hm, win_kv, kv_pages,
    )
    return o_hm.reshape(Bd, HQ, D)


# ------------------------------------------------------------------- store


STORE_GROUP = 8  # pages per store DMA group (allocator contig-run granularity)


def _store_kernel(
    srow_ref,  # [Bp, H] i32: first src row of (b, h)'s segment
    cnt_ref,  # [Bp, H] i32: tokens to store for (b, h)
    pt_ref,  # [Bp, H, maxp] i32
    page0_ref,  # [Bp, H] i32: first destination page column (chunked prefill)
    contig_ref,  # [Bp, H, ceil(maxp/GROUP)] i32 consecutive-run flags
    base_ref,  # [1] i32
    kvs_hbm,  # [N, 2D] interleaved source rows (segment-contiguous per (b,h))
    kvp_in,  # [rows, 2D] (aliased to the output)
    kvp_out,  # == kvp_in
    sems,  # DMA [RING, GROUP]
    *,
    page_size: int,
):
    """Page-group-granular HBM->HBM cache store.

    Replaces XLA row scatters (which serialize at ~175ns/row on TPU) with
    DMAs: when the allocator handed out a consecutive ascending page run
    (PageAllocator.contig_groups — the common case for fresh reservations),
    a whole STORE_GROUP-page group moves in ONE DMA; otherwise one DMA per
    page. Per-page DMA latency made the all-pages version ~28 GB/s; grouped
    runs cut the DMA count 8x. Sources must be segment-contiguous per (b, h)
    with 8-row-aligned segment starts; whole pages are copied, so the tail of
    the last page carries garbage rows — harmless, since bh_lens bounds every
    reader, and the page is owned by this head. Destination positions start
    at page column page0 (0 for fresh prefill; the cached-prefix page count
    for chunked-prefill continuations, whose chunks are 8-page-aligned).
    Reference stores into freshly reserved pages too
    (store_kv_cache.py:81-175, 252-371).
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    GP = STORE_GROUP
    base = base_ref[0]
    n = cnt_ref[b, h]
    p0 = page0_ref[b, h]
    npages = pl.cdiv(n, page_size)
    ngroups = pl.cdiv(npages, GP)
    # Contig flags index absolute page columns; they only line up when the
    # destination offset is group-aligned (guaranteed: chunked-prefill chunks
    # are multiples of GROUP pages, fresh prefills start at 0).
    RING = 4

    def page_dma(slot, g, j):
        src = pl.multiple_of(srow_ref[b, h] + (g * GP + j) * page_size, 8)
        dst = pl.multiple_of(
            base + pt_ref[b, h, p0 + g * GP + j] * page_size, page_size
        )
        return pltpu.make_async_copy(
            kvs_hbm.at[pl.ds(src, page_size), :],
            kvp_out.at[pl.ds(dst, page_size), :],
            sems.at[slot, j],
        )

    def run_dma(slot, g):
        src = pl.multiple_of(srow_ref[b, h] + g * GP * page_size, 8)
        dst = pl.multiple_of(
            base + pt_ref[b, h, p0 + g * GP] * page_size, page_size
        )
        return pltpu.make_async_copy(
            kvs_hbm.at[pl.ds(src, GP * page_size), :],
            kvp_out.at[pl.ds(dst, GP * page_size), :],
            sems.at[slot, 0],
        )

    def is_run(g):
        return (
            (contig_ref[b, h, (p0 // GP) + g] != 0)
            & ((g + 1) * GP <= npages)
            & (jax.lax.rem(p0, GP) == 0)
        )

    def start_group(slot, g):
        @pl.when(is_run(g))
        def _():
            run_dma(slot, g).start()

        @pl.when(jnp.logical_not(is_run(g)))
        def _():
            for j in range(GP):
                @pl.when(g * GP + j < npages)
                def _():
                    page_dma(slot, g, j).start()

    def wait_group(slot, g):
        @pl.when(is_run(g))
        def _():
            run_dma(slot, g).wait()

        @pl.when(jnp.logical_not(is_run(g)))
        def _():
            for j in range(GP):
                @pl.when(g * GP + j < npages)
                def _():
                    page_dma(slot, g, j).wait()

    def body(g, _):
        # Drain the ring slot before reusing its semaphores.
        @pl.when(g >= RING)
        def _():
            wait_group(jax.lax.rem(g, RING), g - RING)

        @pl.when(g < ngroups)
        def _():
            start_group(jax.lax.rem(g, RING), g)

        return 0

    jax.lax.fori_loop(0, ngroups + RING, body, 0)


def paged_store_prefill(
    kv_src: jax.Array,  # [N, 2D] interleaved segment-contiguous source rows
    kv_pages: jax.Array,  # [rows, 2D]
    src_row_start: jax.Array,  # [Bp, H] i32 (8-aligned)
    counts: jax.Array,  # [Bp, H] i32
    page_table: jax.Array,  # [Bp, H, maxp]
    row_base: jax.Array,
    *,
    page_size: int,
    dst_page0: jax.Array | None = None,  # [Bp, H] first dest page column
    store_contig: jax.Array | None = None,  # [Bp, H, ceil(maxp/GROUP)] run flags
    interpret: bool = False,
):
    """Returns the updated kv_pages; the cache buffer is aliased in-place.
    K occupies source/destination lanes [0, D), V [D, 2D) — each DMA moves
    both."""
    Bp, H = counts.shape
    maxp = page_table.shape[2]
    if dst_page0 is None:
        dst_page0 = jnp.zeros((Bp, H), jnp.int32)
    # Clamp the destination span to the page-table width: a caller
    # bookkeeping bug (e.g. stale cached lens) must truncate the store, not
    # walk pt_ref out of bounds into wild DMAs (same contract as the decode
    # kernels' lens clamp).
    dst_page0 = jnp.minimum(dst_page0.astype(jnp.int32), maxp)
    counts = jnp.minimum(
        counts.astype(jnp.int32), (maxp - dst_page0) * page_size
    )
    ng = -(-maxp // STORE_GROUP)
    if store_contig is None:
        store_contig = jnp.zeros((Bp, H, ng), jnp.int32)
    else:
        store_contig = store_contig[:, :, :ng]
    kernel = functools.partial(_store_kernel, page_size=page_size)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(Bp, H),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((4, STORE_GROUP))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_pages.shape, kv_pages.dtype),
        # kv_pages input follows the 6 scalars + source.
        input_output_aliases={7: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        src_row_start.astype(jnp.int32),
        counts.astype(jnp.int32),
        page_table.astype(jnp.int32),
        dst_page0.astype(jnp.int32),
        store_contig.astype(jnp.int32),
        jnp.asarray(row_base, jnp.int32).reshape(1),
        kv_src, kv_pages,
    )


# ------------------------------------------------- fused compact + store


# Source-token tile width for the compressed compact+store kernel.
COMPACT_TILE = 256
# Output ring: 2 flush blocks. A flush block is FLUSH_PAGES pages.
FLUSH_PAGES = 4


def _compact_store_kernel(
    starts_ref,  # [Bp] i32 packed row offset per sequence (TILE-aligned)
    lens_ref,  # [Bp] i32 true sequence lengths
    counts_ref,  # [Bp, H] i32 retained per (seq, head)
    tcum_ref,  # [Bp, H, NT+1] i32 selected-token count before each tile
    pt_ref,  # [Bp, H, maxp] i32
    page0_ref,  # [Bp, H] i32 first destination page column
    contig_ref,  # [Bp, H, ceil(maxp/STORE_GROUP)] i32 run flags (8-page)
    base_ref,  # [1] i32
    k_hbm,  # [Tpad, H*D] model-dtype new keys (packed varlen, lane-major)
    v_hbm,  # [Tpad, H*D]
    rank_hbm,  # [NT, H, TILE] i32 in-head token-order rank; -1 unselected
    kvp_in,  # [rows, 2D] (aliased to the output)
    kvp_out,  # == kvp_in
    kv_buf,  # [2, TILE, 2D] VMEM source tiles (K lanes | V lanes)
    rk_buf,  # [2, H, TILE] VMEM rank tiles
    ring,  # [RING, 2D] f32 compacted-output ring
    stage,  # [2, BLOCK, 2D] cache-dtype flush staging
    in_sems,  # DMA [2, 3]
    out_sems,  # DMA [2, FLUSH_PAGES]
    *,
    page_size: int,
):
    """Fused selection-gather + cache store for compressed prefill.

    Replaces the round-2 chain (joint `lax.top_k` + packed head sort +
    inverse-map gather of every retained row + a second store kernel —
    ~5.6 ms/layer of selection machinery, NOTES.md round-2 ledger) with ONE
    streaming pass per (sequence, head): source K/V tiles are DMA'd once,
    the retained rows are compacted ON THE MXU via a one-hot matmul against
    the in-head token-order ranks (ranks are monotone in token position, so
    each tile's outputs land in a sliding window of the ring), and completed
    page groups DMA straight into the paged cache — no packed intermediate,
    no gather, no sort. Reference semantics: store_kv_cache.py:81-175 (same
    retained multiset; within-head order is a permutation and attention is
    permutation-invariant).
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    H = rk_buf.shape[1]
    TILE = kv_buf.shape[1]
    RING = ring.shape[0]
    BLOCK = stage.shape[1]
    D = kv_buf.shape[2] // 2
    base = base_ref[0]
    start = starts_ref[b]
    length = lens_ref[b]
    count = counts_ref[b, h]
    p0 = page0_ref[b, h]
    GP = BLOCK // page_size
    nt = pl.cdiv(length, TILE)
    tile0 = start // TILE  # starts are TILE-aligned (COMPACT_ALIGN contract)

    def tile_dmas(slot, tt):
        t0 = pl.multiple_of(start + tt * TILE, TILE)
        # Lane-sliced strided reads of head h's columns (a [TILE, 1, D]
        # slice of the [Tpad, H, D] view would cut the packed sublane dim,
        # which Mosaic DMA rejects; lane slices at D-multiples are legal).
        return (
            pltpu.make_async_copy(
                k_hbm.at[pl.ds(t0, TILE), pl.ds(h * D, D)],
                kv_buf.at[slot, :, pl.ds(0, D)], in_sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(t0, TILE), pl.ds(h * D, D)],
                kv_buf.at[slot, :, pl.ds(D, D)], in_sems.at[slot, 1],
            ),
            pltpu.make_async_copy(
                rank_hbm.at[tile0 + tt],
                rk_buf.at[slot], in_sems.at[slot, 2],
            ),
        )

    def start_tile(slot, tt):
        for d in tile_dmas(slot, tt):
            d.start()

    def wait_tile(slot, tt):
        for d in tile_dmas(slot, tt):
            d.wait()

    def flush_block(bi):
        """Copy ring block bi (global output rows [bi*B, bi*B+B)) to staging,
        zero it for reuse, and DMA whole pages to the cache. Tail rows past
        `count` carry garbage — whole pages are moved, and bh_lens bounds
        every reader (same contract as the round-2 store kernel)."""
        slot = jax.lax.rem(bi, 2)
        r0 = pl.multiple_of(jax.lax.rem(bi * BLOCK, RING), BLOCK)
        # Reuse of this staging slot: previous flush (bi - 2) must be done.
        @pl.when(bi >= 2)
        def _():
            wait_flush(jax.lax.rem(bi - 2, 2), bi - 2)

        vals = ring[pl.ds(r0, BLOCK)]
        if stage.dtype == jnp.float8_e4m3fn:
            # Same contract as cast_to_cache (kv_cache/state.py:91): e4m3fn
            # overflow converts to NaN bytes, and the decode kernels read V
            # unmasked / upcast 0x7F to NaN — saturate before the cast.
            vals = jnp.clip(vals, -448.0, 448.0)
        stage[slot] = vals.astype(stage.dtype)
        ring[pl.ds(r0, BLOCK)] = jnp.zeros((BLOCK, 2 * D), jnp.float32)
        start_flush(slot, bi)

    def _flush_copies(slot, bi):
        pcol = p0 + bi * GP
        # A FLUSH_PAGES run is consecutive when it lies inside a consecutive
        # STORE_GROUP (8-page) allocator run (contig flags are 8-granular).
        # Requires p0 GP-aligned so the GP-page run never straddles two
        # groups — compressed chunked-prefill continuations can start at any
        # page column, which falls back to per-page DMAs.
        is_run = (contig_ref[b, h, pcol // STORE_GROUP] != 0) & (
            jax.lax.rem(p0, GP) == 0
        )

        def one(j):
            dst = pl.multiple_of(
                base + pt_ref[b, h, pcol + j] * page_size, page_size
            )
            return pltpu.make_async_copy(
                stage.at[slot, pl.ds(j * page_size, page_size), :],
                kvp_out.at[pl.ds(dst, page_size), :],
                out_sems.at[slot, j],
            )

        def run():
            dst = pl.multiple_of(
                base + pt_ref[b, h, pcol] * page_size, page_size
            )
            return pltpu.make_async_copy(
                stage.at[slot],
                kvp_out.at[pl.ds(dst, BLOCK), :],
                out_sems.at[slot, 0],
            )

        # Grouped flush only when the whole block lies within the retained
        # count (the final partial block takes the per-page path).
        return is_run & ((bi * GP + GP) * page_size <= count), one, run

    def start_flush(slot, bi):
        is_run, one, run = _flush_copies(slot, bi)

        @pl.when(is_run)
        def _():
            run().start()

        @pl.when(jnp.logical_not(is_run))
        def _():
            for j in range(FLUSH_PAGES):
                @pl.when((bi * GP + j) * page_size < count)
                def _():
                    one(j).start()

    def wait_flush(slot, bi):
        is_run, one, run = _flush_copies(slot, bi)

        @pl.when(is_run)
        def _():
            run().wait()

        @pl.when(jnp.logical_not(is_run))
        def _():
            for j in range(FLUSH_PAGES):
                @pl.when((bi * GP + j) * page_size < count)
                def _():
                    one(j).wait()

    @pl.when(count > 0)
    def _():
        ring[...] = jnp.zeros_like(ring)
        start_tile(0, 0)

        def body(tt, nflushed):
            slot = jax.lax.rem(tt, 2)

            @pl.when(tt + 1 < nt)
            def _():
                start_tile(1 - slot, tt + 1)

            wait_tile(slot, tt)
            w0 = tcum_ref[b, h, tt]
            w1 = tcum_ref[b, h, tt + 1]
            # Row h of the [H, TILE] rank tile via a one-hot matvec (a
            # dynamic sublane extract needs a Mosaic relayout; the 1xH dot
            # is a single cheap MXU pass and exact for ranks < 2^24).
            eh = (
                jax.lax.broadcasted_iota(jnp.int32, (1, H), 1) == h
            ).astype(jnp.float32)
            rk = jax.lax.dot(
                eh, rk_buf[slot].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ).astype(jnp.int32)  # [1, TILE]
            # Mask tokens past the sequence end (the tile may overhang into
            # the next sequence's rows, whose ranks belong to THAT sequence).
            tpos = tt * TILE + jax.lax.broadcasted_iota(
                jnp.int32, (1, TILE), 1
            )
            valid = (rk >= 0) & (tpos < length)
            ring_pos = jnp.where(valid, rk & (RING - 1), RING)
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (RING, TILE), 0)
                == ring_pos
            )
            # Zero rows past the sequence end BEFORE the dot: pad rows can
            # legitimately hold NaN (attention output of tokens attending
            # nothing feeds the next layer's K/V at pad rows), and a NaN
            # source row contaminates EVERY output row through the matmul
            # (0 * NaN = NaN). In-seq unselected rows are finite, so their
            # zero one-hot columns are safe unmasked.
            tpos_col = tt * TILE + jax.lax.broadcasted_iota(
                jnp.int32, (TILE, 1), 0
            )
            src = jnp.where(
                tpos_col < length, kv_buf[slot], 0
            )  # [TILE, 2D] model dtype
            res = jax.lax.dot(
                oh.astype(src.dtype), src, preferred_element_type=jnp.float32
            )  # [RING, 2D]
            ring[...] = ring[...] + res
            # Flush every completed BLOCK (ranks are monotone in t, so rows
            # [0, w1) are final once their source tiles are done).
            def fl(bi, _):
                flush_block(bi)
                return 0

            ncomplete = jnp.minimum(w1, count) // BLOCK
            jax.lax.fori_loop(nflushed, ncomplete, fl, 0)
            return ncomplete

        nflushed = jax.lax.fori_loop(0, nt, body, jnp.int32(0))
        # Final partial block: whole pages covering [nflushed*B, count).
        @pl.when(nflushed * BLOCK < count)
        def _():
            flush_block(nflushed)

        # Drain outstanding flush DMAs before the program ends.
        last = jnp.maximum(pl.cdiv(count, BLOCK), 1)

        def drain(bi, _):
            wait_flush(jax.lax.rem(bi, 2), bi)
            return 0

        jax.lax.fori_loop(jnp.maximum(last - 2, 0), last, drain, 0)


def paged_compact_store(
    k_new: jax.Array,  # [Tpad, H, D] packed varlen new keys (model dtype)
    v_new: jax.Array,
    sel_rank: jax.Array,  # [Tpad, H] i32 token-order in-head rank; -1 unsel
    counts: jax.Array,  # [Bp, H] i32
    kv_pages: jax.Array,  # [rows, 2D]
    seq_starts: jax.Array,  # [Bp]
    seq_lens: jax.Array,  # [Bp]
    page_table: jax.Array,  # [Bp, H, maxp]
    row_base: jax.Array,
    *,
    page_size: int,
    dst_page0: jax.Array | None = None,  # [Bp, H]
    store_contig: jax.Array | None = None,  # [Bp, H, ceil(maxp/8)]
    interpret: bool = False,
) -> jax.Array:
    """Fused compressed selection-gather + paged store; returns the updated
    (aliased) kv_pages.

    Contract: packed sequence starts must be COMPACT_TILE-aligned (the rank
    tiles are absolute-row tiles), and the packed arrays must extend at
    least one tile past the last sequence's end (TOKEN_SLACK covers this).
    """
    Tpad, H, D = k_new.shape
    Bp = seq_starts.shape[0]
    maxp = page_table.shape[2]
    # Destination-span clamp: see paged_store_prefill — stale cached lens
    # must truncate, never drive pt_ref reads past the table (the round-3/4
    # compressed-prefill TPU fault: slot reuse left stale bh_lens, dst_page0
    # + counts overran max_pages_per_head, and the OOB scalar reads fed
    # garbage page ids to the flush DMAs).
    if dst_page0 is not None:
        dst_page0 = jnp.minimum(dst_page0.astype(jnp.int32), maxp)
        counts = jnp.minimum(
            counts.astype(jnp.int32), (maxp - dst_page0) * page_size
        )
    else:
        counts = jnp.minimum(counts.astype(jnp.int32), maxp * page_size)
    TILE = COMPACT_TILE
    BLOCK = FLUSH_PAGES * page_size
    RING = 2 * max(TILE, BLOCK)
    assert BLOCK % page_size == 0 and RING % BLOCK == 0
    assert Tpad % TILE == 0, f"packed width {Tpad} not a COMPACT_TILE multiple"
    NT = Tpad // TILE
    ng = -(-maxp // STORE_GROUP)
    if dst_page0 is None:
        dst_page0 = jnp.zeros((Bp, H), jnp.int32)
    if store_contig is None:
        store_contig = jnp.zeros((Bp, H, ng), jnp.int32)
    else:
        store_contig = store_contig[:, :, :ng]

    # Per-tile cumulative selected counts: tcum[b, h, i] = number of seq b's
    # selected tokens of head h in tiles [0, i) — gives each tile's output
    # window without any in-kernel reductions.
    sel = (sel_rank >= 0).astype(jnp.int32)  # [Tpad, H]
    csum = jnp.concatenate(
        [jnp.zeros((1, H), jnp.int32), jnp.cumsum(sel, axis=0)], axis=0
    )  # [Tpad+1, H]
    tile_rows = (
        seq_starts[:, None] + jnp.arange(NT + 1, dtype=jnp.int32)[None, :] * TILE
    )  # [Bp, NT+1]
    tile_rows = jnp.clip(tile_rows, 0, Tpad)
    tcum = csum[tile_rows] - csum[jnp.clip(seq_starts, 0, Tpad)][:, None]
    tcum = jnp.transpose(tcum, (0, 2, 1)).astype(jnp.int32)  # [Bp, H, NT+1]

    kernel = functools.partial(_compact_store_kernel, page_size=page_size)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(Bp, H),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, TILE, 2 * D), k_new.dtype),
            pltpu.VMEM((2, H, TILE), jnp.int32),
            pltpu.VMEM((RING, 2 * D), jnp.float32),
            pltpu.VMEM((2, BLOCK, 2 * D), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, FLUSH_PAGES)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_pages.shape, kv_pages.dtype),
        # kv_pages input follows the 8 scalars + k, v, rank.
        input_output_aliases={11: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        seq_starts.astype(jnp.int32),
        seq_lens.astype(jnp.int32),
        counts.astype(jnp.int32),
        tcum,
        page_table.astype(jnp.int32),
        dst_page0.astype(jnp.int32),
        store_contig.astype(jnp.int32),
        jnp.asarray(row_base, jnp.int32).reshape(1),
        # Lane-major views: a [TILE, 1, D] DMA slice of [Tpad, H, D] would
        # cut the packed sublane dim (illegal); [Tpad, H*D] lane slices at
        # h*D are legal. Free reshapes (row-major contiguous).
        k_new.reshape(Tpad, H * D),
        v_new.reshape(Tpad, H * D),
        # Rank tiles [NT, H, TILE]: integer-indexing the untiled leading dim
        # gives a whole legal [H, TILE] DMA block per tile.
        jnp.transpose(
            sel_rank.astype(jnp.int32).reshape(NT, TILE, H), (0, 2, 1)
        ),
        kv_pages,
    )


# --------------------------------------------------------------- engine glue


def pallas_attention_impl(interpret: bool = False, fp8_query: bool = False):
    """AttentionImpl backed by the Pallas kernels (AttentionBackend.PALLAS).

    The cached-length snapshot (meta.cached_lens) is zero for fresh prefills
    — phase 1 is skipped dynamically — and the page-aligned prefix length for
    chunked-prefill continuations, which walk the cached pages in phase 1
    (reference analog: layers/attention.py:45-52 snapshots pre-store lens).

    fp8_query: round the DECODE query through e4m3 before the QK dot — the
    numerics analog of the reference's fp8 q cast alongside its fp8 KV cache
    (reference: attention/sparse_decode_kernel.py:84,137-139). On TPU this is
    an ACCURACY knob, not a speed lever: the v5e MXU has no fp8 rate
    advantage, and the decode pipeline is element-rate bound (NOTES.md
    round 4), so the rounded q is carried in the compute dtype.
    """
    from compactor_vllm_tpu.models.transformer import AttentionImpl

    def _round_q_e4m3(q):
        # Saturate like cast_to_cache: e4m3fn overflow encodes NaN.
        q32 = jnp.clip(q.astype(jnp.float32), -448.0, 448.0)
        return q32.astype(jnp.float8_e4m3fn).astype(q.dtype)

    def _prefill(geom, cache, layer, q, k, v, meta, sm_scale, max_q,
                 score_chunks=False, clens=None):
        from compactor_vllm_tpu.models.transformer import prefill_cached_lens

        pt_l = jax.lax.dynamic_index_in_dim(cache.page_table, layer, 0, keepdims=False)
        pt = pt_l[meta.slots]  # [Bp, H, maxp]
        # Pre-store snapshot: zero for fresh prefills; the previous chunks'
        # cached length for chunked-prefill continuations (phase 1 of the
        # kernel walks exactly those pages). The compressed path passes the
        # per-head RAGGED retained lens explicitly.
        if clens is None:
            clens = prefill_cached_lens(meta, geom.num_kv_heads)
        return paged_prefill_attention(
            q, k, v, cache.kv_pages, pt, clens,
            meta.seq_starts, meta.seq_lens,
            layer * geom.rows_per_layer,
            sm_scale=sm_scale, page_size=geom.page_size, max_q=max_q,
            score_chunks=score_chunks, interpret=interpret,
        )

    def prefill(geom, cache, layer, q, k, v, meta, sm_scale, max_q, clens=None):
        return _prefill(geom, cache, layer, q, k, v, meta, sm_scale, max_q,
                        clens=clens)

    def prefill_scored(geom, cache, layer, q, k, v, meta, sm_scale, max_q,
                       clens=None):
        return _prefill(geom, cache, layer, q, k, v, meta, sm_scale, max_q,
                        score_chunks=True, clens=clens)

    def decode(geom, cache, layer, q, k_new, v_new, meta, sm_scale, pt_l,
               lens_l, win_kv=None, win_cnt=None):
        if fp8_query:
            q = _round_q_e4m3(q)
        return paged_decode_attention(
            q, k_new, v_new, cache.kv_pages, pt_l, lens_l,
            layer * geom.rows_per_layer, meta.contig8,
            win_kv=win_kv, win_cnt=win_cnt,
            sm_scale=sm_scale, page_size=geom.page_size, interpret=interpret,
        )

    def _finish_store(geom, cache, layer, kvp, slots, new_lens, seq_valid):
        from compactor_vllm_tpu.kv_cache.state import _update_lens

        bh_lens = _update_lens(cache.bh_lens, layer, slots, new_lens, seq_valid)
        return cache._replace(kv_pages=kvp, bh_lens=bh_lens)

    def store_full(geom, cache, layer, k, v, meta):
        """Uncompressed prefill store: per (seq, head) the source tokens are
        contiguous in the head-major view, one DMA per destination page.
        Chunked-prefill continuations append at the cached page boundary
        (chunks are page-aligned)."""
        from compactor_vllm_tpu.models.transformer import prefill_cached_lens

        T, H, D = k.shape
        Bp = meta.slots.shape[0]
        pt = jax.lax.dynamic_index_in_dim(
            cache.page_table, layer, 0, keepdims=False
        )[meta.slots]
        # Quantize to the cache dtype before the DMA source build (DMAs
        # cannot convert; no-op when the cache matches the model dtype), and
        # interleave K|V lanes to match the cache rows.
        from compactor_vllm_tpu.kv_cache.state import cast_to_cache

        kv_hm = (
            cast_to_cache(jnp.concatenate([k, v], axis=-1), cache.kv_pages.dtype)
            .transpose(1, 0, 2)
            .reshape(H * T, 2 * D)
        )
        heads = jnp.arange(H, dtype=jnp.int32)[None, :]
        src_start = heads * T + meta.seq_starts[:, None]  # [Bp, H], 8-aligned
        counts = jnp.where(meta.seq_valid, meta.seq_lens, 0)[:, None] * jnp.ones(
            (1, H), jnp.int32
        )
        cached = prefill_cached_lens(meta, H)
        kvp = paged_store_prefill(
            kv_hm, cache.kv_pages, src_start, counts, pt,
            layer * geom.rows_per_layer, page_size=geom.page_size,
            dst_page0=cached // geom.page_size,
            store_contig=meta.store_contig, interpret=interpret,
        )
        return _finish_store(geom, cache, layer, kvp, meta.slots,
                             cached + counts, meta.seq_valid)

    def store_sel(geom, cache, layer, k, v, sel, meta, cached_ph=None):
        """Compressed store from a threshold Selection (compression/select):
        ONE fused Pallas pass streams each head's new K/V, compacts the
        selected rows on the MXU, and DMAs completed page groups straight
        into the cache (no top-k, no sort, no gather, no packed
        intermediate). `cached_ph` [Bp, H] holds earlier compressed chunks'
        retained lens (page multiples by pad-to-page for non-final chunks);
        the store appends at those page boundaries."""
        pt = jax.lax.dynamic_index_in_dim(
            cache.page_table, layer, 0, keepdims=False
        )[meta.slots]
        counts = sel.counts * meta.seq_valid[:, None]
        if cached_ph is None:
            cached_ph = jnp.zeros_like(counts)
        kvp = paged_compact_store(
            k, v, sel.rank, counts, cache.kv_pages,
            meta.seq_starts, meta.seq_lens, pt,
            layer * geom.rows_per_layer, page_size=geom.page_size,
            dst_page0=cached_ph // geom.page_size,
            store_contig=meta.store_contig, interpret=interpret,
        )
        return _finish_store(geom, cache, layer, kvp, meta.slots,
                             cached_ph + counts, meta.seq_valid)

    return AttentionImpl(
        prefill=prefill, decode=decode, store_full=store_full,
        store_sel=store_sel, prefill_scored=prefill_scored,
    )
