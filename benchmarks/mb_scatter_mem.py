"""Minimal repro: does a window scatter through a reshape view of a donated
scan carry copy the whole buffer?

mb_decode_loop_mem attributed the decode-loop OOM to the decode-block append
(temp ~= pool size when dec_blk is present). This isolates the pattern:

  A  carry [rows, 2D];      body: reshape -> window scatter -> reshape back
  B  carry [NB, H, pg, 2D]; body: window scatter directly on the carry
  C  carry [rows, 2D];      body: row scatter (the fallback path)
  D  like A, but the body ALSO reads the buffer before scattering
     (the decode loop reads kv_pages in attention before the append)

Prints memory_analysis() per pattern. Run on TPU:
python benchmarks/mb_scatter_mem.py [pool_mib]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

D, H, PAGE = 128, 8, 64
L, Bd, STEPS = 4, 64, 16


def probe(name, fn, shape):
    sds = jax.ShapeDtypeStruct
    try:
        c = (
            jax.jit(fn, donate_argnums=(0,))
            .lower(sds(shape, jnp.bfloat16))
            .compile()
        )
        ma = c.memory_analysis()
        print(
            f"{name:10s} temp {ma.temp_size_in_bytes/2**30:7.3f} GiB  "
            f"out {ma.output_size_in_bytes/2**30:7.3f} GiB  "
            f"alias {ma.alias_size_in_bytes/2**30:7.3f} GiB",
            flush=True,
        )
    except Exception as e:
        print(f"{name:10s} FAILED: {str(e)[:200]}", flush=True)


def main():
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rows = mib * (1 << 20) // (2 * D * 2)
    rows -= rows % (H * PAGE)
    NB = rows // (H * PAGE)
    print(f"device: {jax.devices()[0].device_kind}; buffer {rows*2*D*2/2**30:.2f} GiB")
    kv = jnp.ones((L, Bd, H, 2 * D), jnp.bfloat16)
    vblk = jnp.arange(L * Bd, dtype=jnp.int32).reshape(L, Bd) % (NB - 1)
    offs = jnp.arange(Bd, dtype=jnp.int32) % PAGE

    def a(pages):
        def body(c, i):
            view = c.reshape(NB, H, PAGE, 2 * D)
            view = view.at[vblk, :, (offs + i)[None, :] % PAGE, :].set(
                kv, unique_indices=True, mode="drop"
            )
            return view.reshape(rows, 2 * D), ()

        c, _ = jax.lax.scan(body, pages, jnp.arange(STEPS))
        return c

    def b(view):
        def body(c, i):
            c = c.at[vblk, :, (offs + i)[None, :] % PAGE, :].set(
                kv, unique_indices=True, mode="drop"
            )
            return c, ()

        c, _ = jax.lax.scan(body, view, jnp.arange(STEPS))
        return c

    rowidx = jnp.arange(L * Bd * H, dtype=jnp.int32) % (rows - 1)

    def c_fn(pages):
        def body(c, i):
            c = c.at[rowidx + i].set(
                kv.reshape(L * Bd * H, 2 * D), unique_indices=True, mode="drop"
            )
            return c, ()

        c, _ = jax.lax.scan(body, pages, jnp.arange(STEPS))
        return c

    def d(pages):
        def body(c, i):
            r = c[i * PAGE, 0].astype(jnp.float32)  # read before write
            view = c.reshape(NB, H, PAGE, 2 * D)
            view = view.at[vblk, :, (offs + i)[None, :] % PAGE, :].set(
                (kv + r.astype(kv.dtype)), unique_indices=True, mode="drop"
            )
            return view.reshape(rows, 2 * D), ()

        c, _ = jax.lax.scan(body, pages, jnp.arange(STEPS))
        return c

    # E: deferred-flush pattern — ONE index per (l, b, h), each writing a
    # CONTIGUOUS [W, 2D] window of rows (a head's decode page is contiguous,
    # so `W` accumulated steps flush as one window). Copy-free iff scatter
    # windows with a leading index dim and trailing contiguous dims avoid
    # the transpose that kills A/B.
    W = 8
    pstart = (jnp.arange(L * Bd * H, dtype=jnp.int32) * PAGE) % (rows - PAGE)
    updates = jnp.ones((L * Bd * H, W, 2 * D), jnp.bfloat16)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,),
    )

    def e(pages):
        def body(c, i):
            c = jax.lax.scatter(
                c, (pstart + i)[:, None], updates, dnums,
                indices_are_sorted=False, unique_indices=True,
                mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
            )
            return c, ()

        c, _ = jax.lax.scan(body, pages, jnp.arange(STEPS))
        return c

    probe("A reshape", a, (rows, 2 * D))
    probe("B direct", b, (NB, H, PAGE, 2 * D))
    probe("C rows", c_fn, (rows, 2 * D))
    probe("D r+w", d, (rows, 2 * D))
    probe("E window", e, (rows, 2 * D))


if __name__ == "__main__":
    main()
