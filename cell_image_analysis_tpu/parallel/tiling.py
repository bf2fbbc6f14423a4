"""Spatial frame tiling with halo exchange — the context-parallel analog.

SURVEY.md section 2.4: large frames (2048^2-4096^2) are this workload's
"long context".  The frame's rows shard across the mesh's 'data' axis; each
device exchanges `halo` boundary rows with its neighbors over ICI
(`jax.lax.ppermute`), segments and extracts cells on its haloed tile, and
keeps exactly the cells whose centroid falls in its owned span (the
ownership rule that dedups instances visible to two tiles).  Anomaly counts
reduce with psum; per-cell outputs stay sharded.

Correctness contract (tested on the virtual 8-device CPU mesh): tiled
results equal the single-device pipeline bit-for-bit given halo >= the
largest cell bbox — global percentile normalization (XLA inserts the
collectives for the sharded sort), global border QC against the true frame
edges, identical CLAHE/resize per cell.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from cell_image_analysis_tpu.ops.cc import label_components
from cell_image_analysis_tpu.ops.clahe import clahe_cells
from cell_image_analysis_tpu.ops.percentile import normalize_percentile, percentile
from cell_image_analysis_tpu.ops.regionprops import regionprops
from cell_image_analysis_tpu.ops.resize import resize_cells


class TiledCells(NamedTuple):
    cells: jax.Array            # (n_dev * cap, out, out) — sharded over 'data'
    valid: jax.Array            # (n_dev * cap,)
    area: jax.Array
    eccentricity: jax.Array
    mean_intensity: jax.Array
    std_intensity: jax.Array
    n_cells: jax.Array          # () — global count (psum)
    # () bool — StarDist tiled rasterizer dropped polygons in some tile
    # (per-tile m_cap overflow; repo rule: overflow -> exact fallback, never
    # silent loss).  None on the threshold backend.  Callers re-run with
    # raster_mode="scatter" when set.
    raster_overflow: jax.Array | None = None
    # () bool — some tile had more QC-passing cells than cell_capacity, so
    # the fixed-size nonzero selection TRUNCATED (silent cell loss without
    # this flag — the same class as the r4s3 max_candidates bind).  Callers
    # re-run with a larger cell_capacity when set.
    cell_overflow: jax.Array | None = None


def _halo_exchange(tile: jax.Array, halo: int, axis: str) -> jax.Array:
    """Pad a (rows, W) shard to (rows + 2*halo, W) with neighbor rows
    (zeros at the frame edges)."""
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    top = tile[:halo]      # my top rows -> previous device's bottom halo
    bot = tile[-halo:]     # my bottom rows -> next device's top halo
    # receive from previous device (their bottom rows) as my top halo
    from_prev = jax.lax.ppermute(bot, axis, [(i, (i + 1) % n) for i in range(n)])
    from_next = jax.lax.ppermute(top, axis, [(i, (i - 1) % n) for i in range(n)])
    zeros = jnp.zeros_like(top)
    from_prev = jnp.where(idx == 0, zeros, from_prev)          # no wraparound
    from_next = jnp.where(idx == n - 1, zeros, from_next)
    return jnp.concatenate([from_prev, tile, from_next], axis=0)


def _cells_from_tile_labels(
    labels: jax.Array,
    g: jax.Array,
    *,
    axis: str,
    halo: int,
    rows: int,
    H: int,
    W: int,
    cell_capacity: int,
    crop_capacity: int,
    label_capacity: int,
    out_size: int,
    border_margin: int,
    min_area: int,
    max_area: int,
    max_eccentricity: float,
    min_mean_intensity: float,
    min_std_intensity: float,
):
    """Shared per-tile tail: haloed-tile label map -> QC'd, owned, CLAHE'd,
    resized cell tensors (runs inside shard_map; both segmentation backends
    route through it).  `labels`/`g` are (rows + 2*halo, W); QC gates apply
    in GLOBAL frame coordinates, ownership dedups instances visible to two
    tiles by centroid row."""
    idx = jax.lax.axis_index(axis)
    row0 = idx * rows  # global row of local row `halo`

    props = regionprops(labels, capacity=label_capacity)

    # global-coordinate QC gates (border vs the true frame edges)
    g_minr = props.min_r + row0 - halo
    g_maxr = props.max_r + row0 - halo
    border_ok = (
        (g_minr >= border_margin)
        & (props.min_c >= border_margin)
        & (g_maxr <= H - border_margin)
        & (props.max_c <= W - border_margin)
    )
    area_ok = (props.area >= min_area) & (props.area <= max_area)
    ecc_ok = props.eccentricity <= max_eccentricity
    # ownership: centroid's global row in my span
    own = (props.centroid_r >= halo) & (props.centroid_r < halo + rows)
    # drop components touching the haloed tile's row edges: they may be
    # truncations of larger components.  With halo >= crop_capacity this
    # is exact — any component that large is dropped by the bbox-fits
    # gate in the single-device path too; with smaller halos it trades a
    # bounded approximation for less ICI traffic.
    untruncated = (props.min_r > 0) & (props.max_r < rows + 2 * halo)
    geo = props.valid & border_ok & area_ok & ecc_ok & own & untruncated

    sel = jnp.nonzero(geo, size=cell_capacity, fill_value=label_capacity)[0]
    ok = sel < label_capacity
    sc = jnp.minimum(sel, label_capacity - 1)
    minr = props.min_r[sc]
    minc = props.min_c[sc]
    ch = jnp.clip(props.max_r[sc] - minr, 1, crop_capacity)
    cw = jnp.clip(props.max_c[sc] - minc, 1, crop_capacity)
    fits = (props.max_r[sc] - minr <= crop_capacity) & (props.max_c[sc] - minc <= crop_capacity)
    ok = ok & fits

    padded = jnp.pad(g, ((0, crop_capacity), (0, crop_capacity)))
    crops = jax.vmap(
        lambda r0, c0: jax.lax.dynamic_slice(padded, (r0, c0), (crop_capacity, crop_capacity))
    )(minr, minc)

    ar = jnp.arange(crop_capacity)
    rect = (ar[None, :, None] < ch[:, None, None]) & (ar[None, None, :] < cw[:, None, None])
    arect = jnp.maximum((ch * cw).astype(jnp.float32), 1.0)
    mean = jnp.sum(jnp.where(rect, crops, 0.0), axis=(1, 2)) / arect
    cen = jnp.where(rect, crops - mean[:, None, None], 0.0)
    std = jnp.sqrt(jnp.maximum(jnp.sum(cen * cen, axis=(1, 2)) / arect, 0.0))
    valid = ok & (mean >= min_mean_intensity) & (std >= min_std_intensity)

    eq = clahe_cells(crops, ch, cw)
    cells = resize_cells(eq, ch, cw, out_size=out_size)
    cells = jnp.where(valid[:, None, None], cells, 0.0)

    n_total = jax.lax.psum(jnp.sum(valid.astype(jnp.int32)), axis)
    # capacity guard: more geo-passing instances than cell_capacity means
    # the fixed-size nonzero selection above dropped cells on this tile
    cap_ovf = (
        jax.lax.psum(
            (jnp.sum(geo.astype(jnp.int32)) > cell_capacity).astype(jnp.int32),
            axis,
        )
        > 0
    )
    out = (
        cells[None], valid[None],
        jnp.where(valid, props.area[sc], 0)[None],
        jnp.where(valid, props.eccentricity[sc], 0.0)[None],
        jnp.where(valid, mean, 0.0)[None],
        jnp.where(valid, std, 0.0)[None],
    )
    return out + (n_total, cap_ovf)


def _shard_map_kwargs():
    import inspect

    kwargs = {}
    sig = inspect.signature(_shard_map)
    if "check_vma" in sig.parameters:
        kwargs["check_vma"] = False
    elif "check_rep" in sig.parameters:
        kwargs["check_rep"] = False
    return kwargs


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "halo", "cell_capacity", "crop_capacity", "label_capacity",
        "out_size", "threshold_percentile", "border_margin", "min_area",
        "max_area", "connectivity", "opening",
        # norm_pmin/norm_pmax MUST be static: percentile_select computes its
        # rank arithmetic in host python-f64 (ops/percentile.py — the traced
        # version was vulnerable to XLA refolding).  jit does not trace
        # UNPROVIDED defaults, which masked this for every caller that
        # relied on the 3.0/99.8 defaults; the screening tiled route passes
        # them explicitly and crashed until r5
        # (tests/test_screening_tiled_route.py).
        "norm_pmin", "norm_pmax",
    ),
)
def tiled_extract_cells(
    seg_channel: jax.Array,
    green: jax.Array,
    mesh: Mesh,
    halo: int = 96,
    cell_capacity: int = 128,
    crop_capacity: int = 192,
    label_capacity: int = 512,
    out_size: int = 64,
    threshold_percentile: float = 90.0,
    border_margin: int = 10,
    min_area: int = 200,
    max_area: int = 8000,
    max_eccentricity: float = 0.95,
    min_mean_intensity: float = 0.5,
    min_std_intensity: float = 0.1,
    connectivity: int = 1,
    opening: bool = True,
    norm_pmin: float = 3.0,
    norm_pmax: float = 99.8,
) -> TiledCells:
    """Threshold-backend segmentation + extraction over row-sharded tiles.

    seg_channel/green: (H, W) with H divisible by the mesh 'data' size and
    rows-per-tile >= halo.
    """
    axis = "data"
    n_dev = mesh.shape[axis]
    H, W = seg_channel.shape
    rows = H // n_dev
    assert rows * n_dev == H, "H must divide evenly across the mesh"
    assert rows >= halo, "halo must not exceed rows per tile"

    # global percentile normalization + threshold + denoise (collectives over
    # the sharded frame are inserted by XLA; the 3x3 opening's 1-px halo is
    # handled by jit's automatic partitioner, not the explicit exchange)
    from cell_image_analysis_tpu.models.segmentation import binary_opening

    norm = normalize_percentile(seg_channel, pmin=norm_pmin, pmax=norm_pmax)
    thresh = percentile(norm, threshold_percentile)
    mask = norm > thresh
    if opening:
        mask = binary_opening(mask)

    def tile_fn(mask_tile, green_tile):
        # (rows, W) shards -> haloed (rows + 2*halo, W)
        m = _halo_exchange(mask_tile, halo, axis)
        g = _halo_exchange(green_tile, halo, axis)
        labels, _ = label_components(m, connectivity=connectivity)
        return _cells_from_tile_labels(
            labels, g, axis=axis, halo=halo, rows=rows, H=H, W=W,
            cell_capacity=cell_capacity, crop_capacity=crop_capacity,
            label_capacity=label_capacity, out_size=out_size,
            border_margin=border_margin, min_area=min_area, max_area=max_area,
            max_eccentricity=max_eccentricity,
            min_mean_intensity=min_mean_intensity,
            min_std_intensity=min_std_intensity,
        )

    fn = _shard_map(
        tile_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                   P(), P()),
        **_shard_map_kwargs(),
    )
    cells, valid, area, ecc, mean, std, n, cap_ovf = fn(
        mask, green.astype(jnp.float32))
    return TiledCells(
        cells=cells.reshape(-1, out_size, out_size),
        valid=valid.reshape(-1),
        area=area.reshape(-1),
        eccentricity=ecc.reshape(-1),
        mean_intensity=mean.reshape(-1),
        std_intensity=std.reshape(-1),
        n_cells=n,
        cell_overflow=cap_ovf,
    )


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "seg_cfg", "halo", "cell_capacity", "crop_capacity",
        "out_size", "border_margin", "min_area", "max_area",
        "max_eccentricity", "min_mean_intensity", "min_std_intensity",
    ),
)
def tiled_extract_cells_stardist(
    seg_channel: jax.Array,
    green: jax.Array,
    mesh: Mesh,
    unet_variables: dict,
    seg_cfg=None,
    halo: int = 160,
    cell_capacity: int = 128,
    crop_capacity: int = 192,
    out_size: int = 64,
    border_margin: int = 10,
    min_area: int = 200,
    max_area: int = 8000,
    max_eccentricity: float = 0.95,
    min_mean_intensity: float = 0.5,
    min_std_intensity: float = 0.1,
) -> TiledCells:
    """StarDist-backend segmentation + extraction over row-sharded tiles —
    the production `predict_instances` stack (U-Net -> candidates -> star
    NMS -> rasterize, models/stardist.py) on each haloed tile, followed by
    the same global-coordinate QC / centroid-ownership / CLAHE / resize tail
    as the threshold tiler (reference whole-frame stack:
    improved_detection.py:51-63; SURVEY.md section 2.4 spatial parallelism).

    Equivalence contract with the fused single-device path (tested on the
    virtual 8-device CPU mesh, tests/test_tiling_pipeline.py): exact given
    - halo >= U-Net receptive field / 2 + 2 * max polygon radius (halo
      pixels near the outer edge may carry slightly-off probs, but such
      candidates cannot overlap — hence cannot suppress or overwrite — any
      owned instance),
    - halo and rows-per-tile multiples of 2**depth (pooling-grid phase
      alignment: tile prob/dist values then equal the fused frame's), and
    - per-tile candidate counts below seg_cfg.max_candidates (the fused
      top-K and per-tile top-K then select identical candidate sets).
    Percentile normalization stays GLOBAL (computed on the sharded frame
    before tiling; XLA inserts the collectives).
    """
    from cell_image_analysis_tpu.config import SegConfig
    from cell_image_analysis_tpu.models.stardist import predict_instances
    from cell_image_analysis_tpu.models.unet import StarDistUNet

    if seg_cfg is None:
        seg_cfg = SegConfig()
    axis = "data"
    n_dev = mesh.shape[axis]
    H, W = seg_channel.shape
    rows = H // n_dev
    assert rows * n_dev == H, "H must divide evenly across the mesh"
    assert rows >= halo, "halo must not exceed rows per tile"
    align = 2 ** seg_cfg.unet_depth
    assert rows % align == 0 and halo % align == 0 and W % align == 0, (
        "rows/halo/W must align to the U-Net pooling grid for tiled == fused"
    )

    model = StarDistUNet(
        n_rays=seg_cfg.n_rays, depth=seg_cfg.unet_depth,
        base_filters=seg_cfg.base_filters, head_filters=seg_cfg.head_filters,
        grid=seg_cfg.grid, dtype=seg_cfg.unet_dtype,
        precision=seg_cfg.unet_precision,
        lvl0_precision=(seg_cfg.unet_lvl0_precision or None),
        lvl0_s2d=seg_cfg.unet_lvl0_s2d,
        winograd=getattr(seg_cfg, "unet_winograd", "off"),
        hilo=getattr(seg_cfg, "unet_hilo", "off"),
        # "auto" cannot be resolved here (variables are tracers under jit);
        # callers resolve via models/unet.resolve_wb16 (pipeline/screening.py)
        wb16=(lambda m: "off" if m == "auto" else m)(
            getattr(seg_cfg, "unet_wb16", "off")),
    )
    label_capacity = seg_cfg.raster_cap or seg_cfg.max_candidates

    # GLOBAL percentile normalization (csbdeep semantics) on the sharded
    # frame — the per-tile U-Net must see the same normalized values as the
    # fused whole-frame path
    norm = normalize_percentile(
        seg_channel.astype(jnp.float32),
        pmin=seg_cfg.norm_pmin, pmax=seg_cfg.norm_pmax,
    )

    def tile_fn(norm_tile, green_tile):
        t = _halo_exchange(norm_tile, halo, axis)
        g = _halo_exchange(green_tile, halo, axis)
        labels, details = predict_instances(
            t, unet_variables, seg_cfg, model=model, normalize=False
        )
        out = _cells_from_tile_labels(
            labels, g, axis=axis, halo=halo, rows=rows, H=H, W=W,
            cell_capacity=cell_capacity, crop_capacity=crop_capacity,
            label_capacity=label_capacity, out_size=out_size,
            border_margin=border_margin, min_area=min_area, max_area=max_area,
            max_eccentricity=max_eccentricity,
            min_mean_intensity=min_mean_intensity,
            min_std_intensity=min_std_intensity,
        )
        ovf = jax.lax.psum(
            (details.raster_overflow | details.nms_overflow
             | details.cand_overflow).astype(jnp.int32),
            axis) > 0
        return out + (ovf,)

    fn = _shard_map(
        tile_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                   P(), P(), P()),
        **_shard_map_kwargs(),
    )
    cells, valid, area, ecc, mean, std, n, cap_ovf, ovf = fn(
        norm, green.astype(jnp.float32))
    return TiledCells(
        cells=cells.reshape(-1, out_size, out_size),
        valid=valid.reshape(-1),
        area=area.reshape(-1),
        eccentricity=ecc.reshape(-1),
        mean_intensity=mean.reshape(-1),
        std_intensity=std.reshape(-1),
        n_cells=n,
        raster_overflow=ovf,
        cell_overflow=cap_ovf,
    )
