"""Device-side candidate-window extraction + feature injection.

Completes the north-star on-device region flow: the region image (built by
the Pallas histogram kernel from the host event stream) never leaves HBM —
windows are gathered with vmapped dynamic slices and the per-candidate
type-specific features (region_summary.cpp:848-904: type/length columns,
fwd/rev support, sign flips, delete-span fill) are injected with one-hot
masks, then fed straight to the classifier.

Host-side prep is tiny: per candidate, a dozen scalars
(CandidateDescriptors).  Golden-tested against the host windows from
RegionalSummary.generate_summary.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..options import ImageOptions

MAX_COLOR = ImageOptions.MAX_COLOR_VALUE


@dataclass
class CandidateDescriptors:
    """Per-candidate injection scalars, all (K,) int32."""

    base_index: np.ndarray      # expanded row of the candidate
    type_digit: np.ndarray      # 1 snp / 2 insert / 3 delete
    type_value: np.ndarray      # col1 alt value (snp) or len-1 (indel)
    depth_fwd: np.ndarray       # clamped fwd support
    depth_rev: np.ndarray
    flip_fwd_col: np.ndarray    # supporting-observation column to sign-flip
    flip_rev_col: np.ndarray
    star_fwd_col: np.ndarray    # '*' columns for the delete span fill
    star_rev_col: np.ndarray
    del_len: np.ndarray         # candidate length - 1 (0 for snp)


@dataclass
class RegionPackage:
    """One region's fused-flow payload: window metadata (image=None) plus
    the native int8 region image and injection descriptors.  Produced by
    the summarizer under --device_pileup, consumed by
    infer.device_runner.DeviceRegionRunner."""

    windows: list
    image: np.ndarray
    region_rows: int
    descriptors: "CandidateDescriptors"


def descriptors_from_candidates(candidates, summary):
    """Build CandidateDescriptors from (position, candidate_string,
    allele_fwd, allele_rev) tuples + a RegionalSummary (for ref bases)."""
    from .pileup_ref import get_feature_index, get_reference_feature_value

    rows = {name: [] for name in ("base_index", "type_digit", "type_value",
                                  "depth_fwd", "depth_rev", "flip_fwd_col",
                                  "flip_rev_col", "star_fwd_col",
                                  "star_rev_col", "del_len")}
    for position, candidate, fwd, rev in candidates:
        ref_base = summary.reference_sequence[position - summary.ref_start]
        type_digit = int(candidate[0])
        if type_digit == 1:
            type_value = get_reference_feature_value(candidate[1])
            flip_f = get_feature_index(ref_base, candidate[1], False)
            flip_r = get_feature_index(ref_base, candidate[1], True)
        elif type_digit == 2:
            type_value = min(len(candidate) - 1, MAX_COLOR)
            flip_f = get_feature_index(ref_base, "I", False)
            flip_r = get_feature_index(ref_base, "I", True)
        else:
            type_value = min(len(candidate) - 1, MAX_COLOR)
            flip_f = get_feature_index(ref_base, "D", False)
            flip_r = get_feature_index(ref_base, "D", True)
        rows["base_index"].append(summary._base_index(position))
        rows["type_digit"].append(type_digit)
        rows["type_value"].append(type_value)
        rows["depth_fwd"].append(min(fwd, MAX_COLOR))
        rows["depth_rev"].append(min(rev, MAX_COLOR))
        rows["flip_fwd_col"].append(flip_f)
        rows["flip_rev_col"].append(flip_r)
        rows["star_fwd_col"].append(get_feature_index(ref_base, "*", False))
        rows["star_rev_col"].append(get_feature_index(ref_base, "*", True))
        rows["del_len"].append(len(candidate) - 1 if type_digit == 3 else 0)
    return CandidateDescriptors(**{
        name: np.asarray(values, np.int32) for name, values in rows.items()
    })


@partial(jax.jit, static_argnames=("window_size",))
def extract_windows_device(image, descriptors, window_size=32):
    """image: (R, F) int32 region matrix (already clamped).  Returns
    (K, window_size+1, F) float32 candidate windows with injections."""
    F = image.shape[1]
    half = window_size // 2
    padded = jnp.pad(image, ((half, half), (0, 0)))

    def one(base_index, type_digit, type_value, depth_fwd, depth_rev,
            flip_fwd, flip_rev, star_fwd, star_rev, del_len):
        window = jax.lax.dynamic_slice(
            padded, (base_index, 0), (window_size + 1, F)).astype(jnp.int32)
        rows = jnp.arange(window_size + 1)[:, None]
        cols = jnp.arange(F)[None, :]
        mid = half

        is_mid = rows == mid
        # type column: 1 for snp, 2 insert, 3 delete
        type_col = jnp.where(type_digit == 1, 1,
                             jnp.where(type_digit == 2, 2, 3))
        fwd_col = jnp.where(type_digit == 1, 5,
                            jnp.where(type_digit == 2, 6, 7))
        rev_col = jnp.where(type_digit == 1, 16,
                            jnp.where(type_digit == 2, 17, 18))

        window = jnp.where(is_mid & (cols == type_col), type_value, window)
        window = jnp.where(is_mid & (cols == fwd_col), depth_fwd, window)
        window = jnp.where(is_mid & (cols == rev_col), depth_rev, window)
        flip_mid = is_mid & ((cols == flip_fwd) | (cols == flip_rev))
        window = jnp.where(flip_mid, -window, window)

        # delete span fill (region_summary.cpp:895-904)
        end_index = jnp.minimum(mid + del_len - 1, window_size - 1)
        in_span = (type_digit == 3) & (rows > mid) & (rows <= end_index)
        window = jnp.where(in_span & (cols == 3), type_value, window)
        window = jnp.where(in_span & (cols == 7), depth_fwd, window)
        window = jnp.where(in_span & (cols == 18), depth_rev, window)
        span_flip = in_span & ((cols == star_fwd) | (cols == star_rev))
        window = jnp.where(span_flip, -window, window)
        # int8 wrap: the host pipeline casts the region image to int8 and
        # negates in int8, so -(-128) stays -128 (pileup_ref.py int8-cast
        # note); emulate the wrap so device windows match bit-for-bit
        window = ((window + 128) % 256) - 128
        return window

    windows = jax.vmap(one)(
        descriptors["base_index"], descriptors["type_digit"],
        descriptors["type_value"], descriptors["depth_fwd"],
        descriptors["depth_rev"], descriptors["flip_fwd_col"],
        descriptors["flip_rev_col"], descriptors["star_fwd_col"],
        descriptors["star_rev_col"], descriptors["del_len"])
    return windows.astype(jnp.float32)


def descriptors_to_tree(descriptors: CandidateDescriptors) -> dict:
    return {name: jnp.asarray(getattr(descriptors, name))
            for name in ("base_index", "type_digit", "type_value",
                         "depth_fwd", "depth_rev", "flip_fwd_col",
                         "flip_rev_col", "star_fwd_col", "star_rev_col",
                         "del_len")}


# ---------------- fused single-dispatch region flows ----------------
#
# Two production-shaped entries, both jitted end-to-end (ONE device
# dispatch per batch of regions) over a strided layout: region r occupies
# rows [r*stride + HALF, r*stride + HALF + n_rows_r) of the concatenated
# image, so window gathers can never bleed across regions (the margins
# are zero, matching the host's zero padding at region edges).
#
#   fused_images_classify:  host-native dense region images (int8) ->
#       window extraction + injection -> classifier.  This is the
#       practical fused path: the native C++ accumulator already builds
#       the dense image at ~60M bases/s, so the device skips only the
#       host per-window assembly.
#   fused_events_classify:  raw event stream -> Pallas MXU histogram ->
#       ref channel + clamp + extraction -> classifier.  The all-device
#       variant (north-star §2.1); host prep is binning only.

HALF = 16  # candidate_window_size // 2


@partial(jax.jit, static_argnames=("compute_dtype",))
def _fused_images_classify(params, images, descriptors,
                           compute_dtype=jnp.float32):
    from ..models.transducer import transducer_apply

    windows = extract_windows_device(images.astype(jnp.int32), descriptors)
    return transducer_apply(
        jax.tree_util.tree_map(lambda p: p.astype(compute_dtype), params),
        windows.astype(compute_dtype), train=False)


@partial(jax.jit, static_argnames=("n_tiles", "n_chunks", "total_rows",
                                   "compute_dtype", "interpret"))
def _fused_events_classify(params, rel_blocks, col_blocks, delta_blocks,
                           ref_col, clamp_mask, descriptors, n_tiles,
                           n_chunks, total_rows, compute_dtype=jnp.float32,
                           interpret=False):
    import jax.experimental.pallas as pl

    from ..models.transducer import transducer_apply
    from .pileup_kernel import (COL_PAD, TILE_R, _SUBCHUNKS, _SUBCHUNK_E,
                                _histogram_kernel)

    spec = pl.BlockSpec(
        (1, _SUBCHUNKS, _SUBCHUNK_E),
        lambda t, k, n_chunks=n_chunks: (t * n_chunks + k, 0, 0))
    hist = pl.pallas_call(
        _histogram_kernel,
        grid=(n_tiles, n_chunks),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((TILE_R, COL_PAD), lambda t, k: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE_R, COL_PAD),
                                       jnp.float32),
        interpret=interpret,
    )(rel_blocks, col_blocks, delta_blocks)
    image = hist[:total_rows, :26].astype(jnp.int32)
    image = image.at[:, 0].add(ref_col)
    cs, ce = ImageOptions.CLAMP_COL_START, ImageOptions.CLAMP_COL_END
    clamped = jnp.clip(image[:, cs:ce], ImageOptions.MIN_COLOR_VALUE,
                       MAX_COLOR)
    image = image.at[:, cs:ce].set(
        jnp.where(clamp_mask[:, None], clamped, image[:, cs:ce]))
    windows = extract_windows_device(image, descriptors)
    return transducer_apply(
        jax.tree_util.tree_map(lambda p: p.astype(compute_dtype), params),
        windows.astype(compute_dtype), train=False)


def pack_regions(region_sizes):
    """Strided offsets for a batch of regions: returns (stride, offsets)
    where region r's expanded row 0 lands at offsets[r] and windows stay
    inside [r*stride, (r+1)*stride).  The stride is bucketed to a multiple
    of 256 so same-sized batches share one compilation."""
    region_rows_max = max(int(s) for s in region_sizes)
    stride = -(-(region_rows_max + 2 * HALF) // 256) * 256
    offsets = np.arange(len(region_sizes), dtype=np.int64) * stride + HALF
    return stride, offsets


def classify_regions_images(params, images, descriptor_list, region_sizes,
                            compute_dtype=jnp.float32, pad_regions: int = 0):
    """Fused image flow over a batch of regions.

    images: list of (n_rows_r, F) int8 host-native region images (already
    clamped + int8-cast by generate_summary); descriptor_list: one
    CandidateDescriptors per region (base_index region-local);
    region_sizes: rows per region.  pad_regions pads the stacked image to
    a fixed region count so repeated dispatches share a compilation.
    Returns (K_total, 3) probabilities in region-major window order."""
    stride, offsets = pack_regions(region_sizes)
    n_regions = max(len(images), pad_regions)
    F = images[0].shape[1]
    stacked = np.zeros((n_regions * stride, F), np.int8)
    for r, image in enumerate(images):
        stacked[offsets[r]:offsets[r] + image.shape[0]] = image
    merged, k_total = _merge_descriptors(descriptor_list, offsets)
    return _fused_images_classify(params, stacked, merged,
                                  compute_dtype=compute_dtype)[:k_total]


def classify_regions_events(params, event_list, ref_channels,
                            descriptor_list, region_sizes,
                            compute_dtype=jnp.float32, interpret=None):
    """Fused event flow over a batch of regions: events are shifted into
    the strided layout, binned once, and the whole histogram -> windows ->
    classifier graph runs as one dispatch.

    event_list: per region (rows, cols, deltas); ref_channels: per region
    expanded reference channel values; region_sizes: expanded rows per
    region (region_size + 1, i.e. including the stop row)."""
    import jax as _jax

    from .pileup_kernel import CHUNK_E, _SUBCHUNKS, _SUBCHUNK_E, _bin_events

    if interpret is None:
        interpret = _jax.default_backend() != "tpu"
    stride, offsets = pack_regions(region_sizes)
    n_regions = len(event_list)
    total_rows = n_regions * stride
    rows = np.concatenate([np.asarray(e[0], np.int64) + offsets[r]
                           for r, e in enumerate(event_list)])
    cols = np.concatenate([np.asarray(e[1], np.int32)
                           for e in event_list])
    deltas = np.concatenate([np.asarray(e[2], np.int32)
                             for e in event_list])
    ref_col = np.zeros(total_rows, np.int32)
    clamp_mask = np.zeros(total_rows, bool)
    for r, channel in enumerate(ref_channels):
        ref_col[offsets[r]:offsets[r] + len(channel)] = channel
        # clamp covers expanded rows [0, region_size) = all but the stop row
        clamp_mask[offsets[r]:offsets[r] + int(region_sizes[r]) - 1] = True
    rel, binned_cols, binned_deltas, n_tiles, capacity = _bin_events(
        rows.astype(np.int32), cols, deltas, total_rows,
        round_capacity_pow2=True)
    n_chunks = capacity // CHUNK_E

    def to_blocks(a):
        return a.reshape(n_tiles * n_chunks, _SUBCHUNKS, _SUBCHUNK_E)

    merged, k_total = _merge_descriptors(descriptor_list, offsets)
    probs = _fused_events_classify(
        params, to_blocks(rel), to_blocks(binned_cols),
        to_blocks(binned_deltas), ref_col, clamp_mask, merged,
        n_tiles=n_tiles, n_chunks=n_chunks, total_rows=total_rows,
        compute_dtype=compute_dtype, interpret=interpret)
    return probs[:k_total]


def _merge_descriptors(descriptor_list, offsets, pad_to: int = 128):
    """Concatenate per-region descriptors with base offsets applied;
    windows are padded to a multiple of `pad_to` (snp-shaped dummies) so
    repeated dispatches share a compilation.  Returns (tree, k_total)."""
    merged = {}
    names = ("base_index", "type_digit", "type_value", "depth_fwd",
             "depth_rev", "flip_fwd_col", "flip_rev_col", "star_fwd_col",
             "star_rev_col", "del_len")
    k_total = sum(len(np.asarray(d.base_index)) for d in descriptor_list)
    k_padded = max(pad_to, -(-k_total // pad_to) * pad_to)
    for name in names:
        parts = []
        for r, descriptors in enumerate(descriptor_list):
            values = np.asarray(getattr(descriptors, name), np.int32)
            if name == "base_index":
                values = values + np.int32(offsets[r])
            parts.append(values)
        column = np.zeros(k_padded, np.int32)
        if name == "type_digit":
            column[k_total:] = 1
        if parts:
            column[:k_total] = np.concatenate(parts)
        merged[name] = jnp.asarray(column)
    return merged, k_total


def classify_region_device(params, rows, cols, deltas, ref_values,
                           descriptors: CandidateDescriptors,
                           region_rows: int, compute_dtype=jnp.float32):
    """The fused on-device region flow:
    event stream -> Pallas histogram -> clamp -> window gather + injection
    -> window classifier.  Returns (K, 3) probabilities.

    rows/cols/deltas: pileup events; ref_values: (region_rows,) col-0
    encoding; region_rows = region_size + 1."""
    from ..models.transducer import transducer_apply
    from .pileup_kernel import accumulate_pallas

    image = accumulate_pallas(rows, cols, deltas, (region_rows, 26))
    image = jnp.asarray(image, jnp.int32)
    image = image.at[:ref_values.shape[0], 0].add(
        jnp.asarray(ref_values, jnp.int32))
    cs, ce = ImageOptions.CLAMP_COL_START, ImageOptions.CLAMP_COL_END
    clamped = jnp.clip(image[:region_rows - 1, cs:ce],
                       ImageOptions.MIN_COLOR_VALUE, MAX_COLOR)
    image = image.at[:region_rows - 1, cs:ce].set(clamped)

    windows = extract_windows_device(image, descriptors_to_tree(descriptors))
    return transducer_apply(
        jax.tree_util.tree_map(lambda p: p.astype(compute_dtype), params),
        windows.astype(compute_dtype), train=False)
