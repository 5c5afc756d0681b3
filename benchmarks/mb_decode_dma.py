"""Manual page-walk DMA bandwidth probe (no attention math).

Replicates the resident decode kernel's fetch structure exactly — per-(b,h)
page-table walk, contig-run vs per-page DMAs, cross-program prefetch ring of
depth NS-1 — but the compute per program is a trivial row reduce. Separates
the fetch pipeline's achievable bandwidth from the attention compute at the
engine's decode shapes, and sweeps ring depth and page layout:

  layout=contig : each (b,h) holds one ascending run (the engine's common
                  case: reserve hands ascending runs, shrink keeps a prefix)
  layout=random : shuffled pages (per-page 32KB DMAs, worst case)

Usage: python benchmarks/mb_decode_dma.py [ctx] [nprog]
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 128
PAGE = 64
GP = 16  # pages per group (matches DECODE_GROUP)


def kernel(lens_ref, pt_ref, contig_ref, base_ref, q_ref, kvp_hbm, o_ref,
           kv_buf, sems, *, page_size, group_pages):
    b = pl.program_id(0)
    Bd = pl.num_programs(0)
    GPp = group_pages
    base = base_ref[0]
    NS = kv_buf.shape[0]

    def fetch(bb, slot, wait):
        length = lens_ref[bb, 0]
        npages = pl.cdiv(length, page_size)
        ngroups = pl.cdiv(npages, GPp)

        def run_copies(g):
            row = pl.multiple_of(
                base + pt_ref[bb, 0, g * GPp] * page_size, page_size
            )
            return pltpu.make_async_copy(
                kvp_hbm.at[pl.ds(row, GPp * page_size), :],
                kv_buf.at[slot, pl.ds(g * GPp * page_size, GPp * page_size), :],
                sems.at[slot, g],
            )

        def page_copies(g, j):
            row = pl.multiple_of(
                base + pt_ref[bb, 0, g * GPp + j] * page_size, page_size
            )
            return pltpu.make_async_copy(
                kvp_hbm.at[pl.ds(row, page_size), :],
                kv_buf.at[slot, pl.ds((g * GPp + j) * page_size, page_size), :],
                sems.at[slot, g],
            )

        def body(g, _):
            is_run = (contig_ref[bb, 0, g] != 0) & ((g + 1) * GPp <= npages)

            @pl.when(is_run)
            def _():
                d = run_copies(g)
                d.wait() if wait else d.start()

            @pl.when(jnp.logical_not(is_run))
            def _():
                for j in range(GPp):
                    @pl.when(g * GPp + j < npages)
                    def _():
                        d = page_copies(g, j)
                        d.wait() if wait else d.start()

            return 0

        jax.lax.fori_loop(0, ngroups, body, 0)

    slot = jax.lax.rem(b, NS)

    @pl.when(b == 0)
    def _():
        fetch(b, slot, wait=False)
        for d in range(1, NS - 1):
            if d < Bd:
                fetch(d, d % NS, wait=False)

    @pl.when(b + NS - 1 < Bd)
    def _():
        nxt = b + NS - 1
        fetch(nxt, jax.lax.rem(nxt, NS), wait=False)

    fetch(b, slot, wait=True)
    # Whole-block write via the out BlockSpec (a dynamic o_ref[b] row store
    # is not provably 8-aligned for Mosaic; and the block's last two dims
    # must be (8k, 128m)-divisible — write an [8, 2D] tile).
    o_ref[...] = kv_buf[slot, 0:8, :][None].astype(o_ref.dtype)


def run(nprog, ctx, ns, layout):
    npages_per = ctx // PAGE
    P = nprog * npages_per  # exactly enough pages
    # 64 spare pages: the timed calls shift the row base by whole pages to
    # defeat the relay's identical-dispatch memoization.
    rows = (P + 64) * PAGE
    rng = np.random.default_rng(0)
    if layout == "contig":
        pt = np.arange(P, dtype=np.int32).reshape(nprog, 1, npages_per)
        contig = np.ones((nprog, 1, -(-npages_per // GP)), np.int32)
    else:
        perm = rng.permutation(P).astype(np.int32)
        pt = perm.reshape(nprog, 1, npages_per)
        contig = np.zeros((nprog, 1, -(-npages_per // GP)), np.int32)
    lens = np.full((nprog, 1), ctx, np.int32)
    kvp = jnp.asarray(rng.normal(size=(rows, 2 * D)), jnp.bfloat16)
    q = jnp.zeros((nprog, 1, D), jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, 8, 2 * D), lambda i, *_: (i, 0, 0)),
        # Scratch rows rounded up to whole groups: the traced run-DMA branch
        # slices GP*PAGE rows even when the dynamic guard rejects it.
        scratch_shapes=[
            pltpu.VMEM((ns, -(-npages_per // GP) * GP * PAGE, 2 * D),
                       jnp.bfloat16),
            pltpu.SemaphoreType.DMA((ns, -(-npages_per // GP))),
        ],
    )
    fn = pl.pallas_call(
        functools.partial(kernel, page_size=PAGE, group_pages=GP),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nprog, 8, 2 * D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )
    REPS = 28

    @jax.jit
    def chain(lens, pt, contig, q, kvp, deltas):
        def step(c, d):
            o = fn(lens, pt, contig, jnp.zeros((1,), jnp.int32) + d, q, kvp)
            return c + jnp.sum(o.astype(jnp.float32)), None
        s, _ = jax.lax.scan(step, jnp.float32(0), deltas)
        return s

    # Per-step AND per-call varied page-aligned base offsets: per-step so XLA
    # cannot hoist the loop-invariant pallas_call out of the scan, per-call
    # so the relay cannot memoize the dispatch. Offsets stay within the 64
    # spare pages and remain PAGE-multiples (the kernel's multiple_of hint).
    def mk_deltas(j):
        return ((np.arange(REPS) % 4) + 4 * (j % 4)).astype(np.int32) * PAGE

    fixed = (jnp.asarray(lens), jnp.asarray(pt), jnp.asarray(contig), q, kvp)
    float(chain(*fixed, jnp.asarray(mk_deltas(0))))
    ts = []
    for j in range(1, 5):
        deltas = jnp.asarray(mk_deltas(j))
        t0 = time.perf_counter()
        float(chain(*fixed, deltas))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts)) / REPS
    gb = nprog * ctx * 2 * D * 2 / 1e9
    print(f"ctx={ctx:5d} nprog={nprog:4d} ns={ns} {layout:6s}  "
          f"{dt*1e3:7.3f} ms  {gb/dt:7.1f} GB/s", flush=True)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    ctx = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    nprog = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    for layout in ("contig", "random"):
        for ns in (2, 3, 4):
            run(nprog, ctx, ns, layout)


if __name__ == "__main__":
    main()
