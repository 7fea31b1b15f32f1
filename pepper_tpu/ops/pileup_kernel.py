"""TPU scatter-accumulate kernels for the pileup image matrix.

The pileup is a histogram workload: millions of (row=expanded position,
col=feature, delta=+-1) events accumulate into a (region_size, features)
matrix (region_summary.cpp populate_summary_matrix — HOT LOOP 2 in
SURVEY.md §3.2).  A naive scatter serializes on TPU, so the Pallas kernel
re-expresses the histogram as MXU one-hot matmuls:

  host: sort events by row, bin them into TILE_R-row tiles, pad each tile
        to a fixed event capacity (sentinel row -1 contributes nothing);
  kernel grid (tile, chunk): for each CHUNK_E-event block build
        A[r, e] = (event_row[e] == tile_base + r)      (TILE_R x CHUNK_E)
        B[e, c] = (event_col[e] == c) * delta[e]       (CHUNK_E x COLS)
        acc += A @ B                                    (MXU)
  so each grid step is one (TILE_R x CHUNK_E) x (CHUNK_E x COLS) matmul —
  conflict-free by construction because a tile owns its rows.

Three interchangeable backends (all return int32 (rows, cols)):
  accumulate_numpy  — np.add.at golden
  accumulate_jax    — jnp .at[].add scatter (XLA)
  accumulate_pallas — the kernel above (interpret mode off-TPU)
"""

from __future__ import annotations

from functools import partial

import numpy as np

TILE_R = 256
CHUNK_E = 2048
COL_PAD = 64  # feature columns padded to a lane-friendly width (26/48 -> 64)


def accumulate_numpy(rows, cols, deltas, shape):
    out = np.zeros(shape, np.int64)
    np.add.at(out, (rows, cols), deltas)
    return out


def accumulate_jax(rows, cols, deltas, shape):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("shape",))
    def scatter(rows, cols, deltas, shape):
        out = jnp.zeros(shape, jnp.int32)
        return out.at[rows, cols].add(deltas)

    if len(rows) == 0:
        return np.zeros(shape, np.int64)
    return np.asarray(scatter(rows, cols, deltas, tuple(shape))) \
        .astype(np.int64)


def _bin_events(rows, cols, deltas, n_rows, round_capacity_pow2=False):
    """Sort events by row and bin into TILE_R tiles padded to a common
    capacity (multiple of CHUNK_E). Returns (rel_rows, cols, deltas) each
    shaped (n_tiles, capacity) with sentinel rel_row = -1.

    round_capacity_pow2 buckets the capacity to a power-of-two multiple of
    CHUNK_E so repeated fused dispatches share a compilation."""
    n_tiles = max(1, -(-n_rows // TILE_R))
    order = np.argsort(rows, kind="stable")
    rows = rows[order]
    cols = cols[order]
    deltas = deltas[order]
    tile_of = rows // TILE_R
    counts = np.bincount(tile_of, minlength=n_tiles)
    capacity = max(CHUNK_E, int(-(-counts.max() // CHUNK_E) * CHUNK_E))
    if round_capacity_pow2:
        chunks = capacity // CHUNK_E
        capacity = CHUNK_E * (1 << (chunks - 1).bit_length())

    rel = np.full((n_tiles, capacity), -1, np.int32)
    out_cols = np.zeros((n_tiles, capacity), np.int32)
    out_deltas = np.zeros((n_tiles, capacity), np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    # vectorized fill: event i goes to (tile_of[i], i - starts[tile_of[i]])
    slot = np.arange(len(rows)) - starts[tile_of]
    rel[tile_of, slot] = rows - tile_of * TILE_R
    out_cols[tile_of, slot] = cols
    out_deltas[tile_of, slot] = deltas
    return rel, out_cols, out_deltas, n_tiles, capacity


_SUBCHUNKS = 8
_SUBCHUNK_E = CHUNK_E // _SUBCHUNKS  # 256, lane-aligned


def _histogram_kernel(rows_ref, cols_ref, deltas_ref, out_ref):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl

    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rows2 = rows_ref[0]      # (8, 256)
    cols2 = cols_ref[0]
    deltas2 = deltas_ref[0]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, _SUBCHUNK_E), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (_SUBCHUNK_E, COL_PAD), 1)
    acc = jnp.zeros((TILE_R, COL_PAD), jnp.float32)
    for s in range(_SUBCHUNKS):
        a = (rows2[s][None, :] == row_ids).astype(jnp.float32)
        b = ((cols2[s][:, None] == col_ids).astype(jnp.float32)
             * deltas2[s][:, None].astype(jnp.float32))
        acc += jnp.dot(a, b, preferred_element_type=jnp.float32)
    out_ref[:] += acc


def accumulate_pallas(rows, cols, deltas, shape, interpret=None):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl

    if len(rows) == 0:
        return np.zeros(shape, np.int64)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n_rows, n_cols = shape
    rel, binned_cols, binned_deltas, n_tiles, capacity = _bin_events(
        np.asarray(rows, np.int32), np.asarray(cols, np.int32),
        np.asarray(deltas, np.int32), n_rows)
    n_chunks = capacity // CHUNK_E

    # TPU blocks need (8, 128)-aligned trailing dims: present each chunk as
    # an (8, 256) sub-block.
    def to_blocks(a):
        return a.reshape(n_tiles * n_chunks, _SUBCHUNKS, _SUBCHUNK_E)

    spec = pl.BlockSpec(
        (1, _SUBCHUNKS, _SUBCHUNK_E),
        lambda t, k, n_chunks=n_chunks: (t * n_chunks + k, 0, 0))
    out = pl.pallas_call(
        _histogram_kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((TILE_R, COL_PAD), lambda t, k: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE_R, COL_PAD),
                                       jnp.float32),
        interpret=interpret,
    )(to_blocks(rel), to_blocks(binned_cols), to_blocks(binned_deltas))

    out = np.asarray(out[:n_rows, :n_cols]).astype(np.int64)
    return out


BACKENDS = {
    "numpy": accumulate_numpy,
    "jax": accumulate_jax,
    "pallas": accumulate_pallas,
}


def get_backend(name: str):
    return BACKENDS[name]
