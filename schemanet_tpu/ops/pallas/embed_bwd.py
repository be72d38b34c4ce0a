"""Pallas embedding-gradient kernel: VMEM-accumulated dynamic histogram.

The instance-path embedding backward (schema/gnn.py `_embed_lookup_bwd`,
large-vocabulary branch) is a dynamic scatter-add of ~200k cotangent rows
into the [M+1, D] ingredient table (ImageNet scale: [8001, 1024]). XLA
serialises TPU scatters row by row through HBM — profiled at ~3% of the
ImageNet step (PERFORMANCE.md, ROADMAP round-5 candidate #2). The sorted
alternative loses its win to the on-device argsort (round-2 data), and the
one-hot MXU contraction costs rows*M*D FLOPs (~3e12 here — worse).

This kernel instead accumulates the gradient table directly in VMEM:

* grid = (D/Db, R/C): the fp32 [M+1, Db] output block stays resident across
  the whole row-chunk axis (output revisiting — the same mechanism as a
  matmul K-loop), zeroed on the first chunk and flushed to HBM once per
  D-block when the grid moves on;
* each step streams a [C, Db] cotangent chunk into VMEM plus its C int32
  ids into SMEM, then serially does ``out[id, :] += row`` — a VMEM
  read-modify-write per row, never touching HBM;
* duplicate ids are handled by the serial in-kernel loop order (the same
  semantics the XLA scatter-add provides), and accumulation is fp32 like
  both existing branches.

The total HBM traffic drops to one read of g + one write of the table per
D-block — the lower bound — and the cost moves to the serial VMEM
read-modify-write chain, which is the thing being measured (ROADMAP calls
this arm "revisit only with a Pallas multi-pass histogram").

Opt-in via the kernel policy (``embed_bwd: pallas|pallas2`` /
SCHEMANET_EMBED_BWD); numerics pinned against the scatter path by
tests/test_embed_bwd.py in interpret mode, Mosaic MLIR lowering gated
off-chip.

STATUS (r05, 2026-08-21): the real remote Mosaic compile CRASHES
(`tpu_compile_helper exit code 1`). On-chip bisect: a dynamic-index VMEM
store inside `fori_loop` is the trigger — write-only stores and plain
loop-variable indices crash too; the identical store outside a loop and
in-loop dynamic READS compile fine. That construct is the essence of this
kernel, so it stays opt-in awaiting a toolchain fix; the `xla` scatter-add
remains the shipped default (PERFORMANCE.md #24).

Reference semantics anchor: /root/reference/schema_inference/graph/gnn.py:49-98
(the embedding whose autodiff emits the scatter).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ids_ref, g_ref, out_ref, *, rows: int):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(r, _):
        idx = ids_ref[r]
        row = g_ref[r, :].astype(jnp.float32)
        cur = out_ref[pl.ds(idx, 1), :]
        out_ref[pl.ds(idx, 1), :] = cur + row[None, :]
        return 0

    jax.lax.fori_loop(0, rows, body, 0)


def _kernel_ilp2(ids_ref, g_ref, out_ref, acc_ref, *, rows: int):
    """2-way variant: even rows accumulate into the out block, odd rows into
    a VMEM shadow accumulator. Consecutive loop iterations touch statically
    DISTINCT buffers, so Mosaic can overlap their read-modify-writes (the
    single-accumulator kernel serialises on the compiler's inability to
    disambiguate dynamic row indices). The shadow is folded in on the last
    chunk — one extra [M, Db] VMEM add per feature block."""
    first = pl.program_id(1) == 0

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    half = rows // 2

    def body(r, _):
        i0 = ids_ref[2 * r]
        row0 = g_ref[2 * r, :].astype(jnp.float32)
        out_ref[pl.ds(i0, 1), :] = out_ref[pl.ds(i0, 1), :] + row0[None, :]
        i1 = ids_ref[2 * r + 1]
        row1 = g_ref[2 * r + 1, :].astype(jnp.float32)
        acc_ref[pl.ds(i1, 1), :] = acc_ref[pl.ds(i1, 1), :] + row1[None, :]
        return 0

    jax.lax.fori_loop(0, half, body, 0)

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        out_ref[...] = out_ref[...] + acc_ref[...]


def _pick_blocks(
    rows: int, num_rows: int, d: int, ilp: int = 1
) -> tuple[int, int] | None:
    """(C row-chunk, Db feature-block) fitting the VMEM budget, or None.

    The out block is fp32 [num_rows, Db] (x2 for the ilp2 shadow); prefer the
    widest Db (fewest passes over g) that keeps out + g-chunk + headroom
    under the scoped-VMEM budget.
    """
    # prefer the widest Db (fewest serial passes over the rows — the RMW
    # chain is the cost), then the largest chunk (fewest grid steps); the
    # g chunk is double-buffered by the pipeline, hence the 2x
    for db in (512, 256, 128):
        if d % db:
            continue
        for c in (4096, 2048, 1024):
            cc = min(rows, c)
            if ilp == 2 and cc % 2:
                cc += 1  # the interleaved loop consumes row pairs
            vmem = ilp * num_rows * db * 4 + 2 * cc * db * 2 + 4 * cc
            if vmem <= 11 * 1024 * 1024:
                return cc, db
    return None


def shape_fits_kernel(rows: int, num_rows: int, d: int, ilp: int = 1) -> bool:
    """Static gate: table block must fit VMEM and the work must be scatter-
    scale (the small-vocabulary one-hot branch already wins below the
    `_EMBED_ONEHOT_MAX_FLOPS` crossover — see schema/gnn.py)."""
    return d % 128 == 0 and _pick_blocks(rows, num_rows, d, ilp) is not None


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def embed_grad(
    ids: jnp.ndarray,
    g: jnp.ndarray,
    num_rows: int,
    interpret: bool = False,
    ilp: int = 1,
) -> jnp.ndarray:
    """fp32 [num_rows, D] table gradient: ``out[m] = sum over r with
    ids[r]==m of g[r]`` — the embedding-lookup cotangent."""
    assert ilp in (1, 2), ilp
    ids = ids.reshape(-1).astype(jnp.int32)
    g2 = g.reshape(ids.size, g.shape[-1])
    rows, d = g2.shape
    blocks = _pick_blocks(rows, num_rows, d, ilp)
    assert blocks is not None, (rows, num_rows, d)
    c, db = blocks
    pad = -rows % c
    if pad:
        # padded ids hit row 0 with zero cotangents — a no-op add
        ids = jnp.concatenate([ids, jnp.zeros(pad, jnp.int32)])
        g2 = jnp.concatenate([g2, jnp.zeros((pad, d), g2.dtype)], axis=0)
    grid = (d // db, (rows + pad) // c)
    kernel = functools.partial(
        _kernel if ilp == 1 else _kernel_ilp2, rows=c
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((c,), lambda j, i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((c, db), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (num_rows, db), lambda j, i: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_rows, d), jnp.float32),
        scratch_shapes=(
            [] if ilp == 1 else [pltpu.VMEM((num_rows, db), jnp.float32)]
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * d,
            bytes_accessed=(rows * d + num_rows * d) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ids, g2)
