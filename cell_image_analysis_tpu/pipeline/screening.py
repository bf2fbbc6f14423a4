"""Screening entry point — `ProductionMutantScreening`, TPU-native + sharded.

Stage-for-stage port of the reference screening pipeline
(improved_detection.py:18-436): load the six-artifact contract, extract QC'd
cells per strain folder through the fused device graph, score every cell with
the single jitted scoring graph (CAE recon + encoder -> scaler -> PCA -> 2x
SVM + ensemble + FFT), and emit the reference's CSVs/figures/report.

Scoring batches are padded to a fixed chunk size so XLA compiles once; on a
multi-chip mesh the chunk's batch dim shards over 'data' and the anomaly
rates reduce with psum (parallel/sharding.py).
"""

from __future__ import annotations

import os
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.config import PipelineConfig
from cell_image_analysis_tpu.io import artifacts
from cell_image_analysis_tpu.io.ingest import FrameStream, list_tiffs
from cell_image_analysis_tpu.models.segmentation import segment_frame
from cell_image_analysis_tpu.ops.extract import extract_cells_chunked
from cell_image_analysis_tpu.pipeline import reports
from cell_image_analysis_tpu.pipeline.scoring import compute_anomaly_scores
from cell_image_analysis_tpu.utils.profiler import StageTimer, ThroughputMeter

_SCORE_CHUNK = 512  # fixed batch size -> one compilation


class ProductionMutantScreening:
    """Reference-equivalent screener (improved_detection.py:18)."""

    def __init__(self, model_dir: str, config: PipelineConfig = PipelineConfig(),
                 unet_variables=None, mesh=None):
        self.model_dir = model_dir
        self.config = config
        self.unet_variables = unet_variables
        self.mesh = mesh
        self.timer = StageTimer()
        self.meter = ThroughputMeter()
        # identity-stable segmentation callables: the scoring graphs jit-cache
        # on segment_fn identity, so a fresh lambda per batch would re-trace
        self._segment = lambda s: segment_frame(s, self.config.seg, self.unet_variables)
        self._segment_mask = None
        self._segment_fallback = None
        if config.seg.backend == "threshold" or unet_variables is None:
            # threshold backend: the production path stops at the boolean
            # mask and routes through the run-length CC/regionprops
            # (ops/runs.py), never materializing a label map; self._segment
            # stays the exact fallback for the (never-observed) run-table
            # overflow case
            from cell_image_analysis_tpu.models.segmentation import threshold_mask

            self._segment_mask = lambda s: threshold_mask(
                s, threshold_percentile=self.config.seg.threshold_percentile,
                pmin=self.config.seg.norm_pmin, pmax=self.config.seg.norm_pmax,
            )
            self._segment_mask.returns_mask = True
            self._segment_fallback = self._segment
        else:
            # StarDist backend: raster-capped predict_instances with the
            # run-length label regionprops stage A (BENCH.md: 1573 -> 330 ms
            # per 8x1024^2 batch); an exact-pixel-path twin handles the
            # run-table-overflow fallback
            from cell_image_analysis_tpu.models.segmentation import StarDistBackend

            import dataclasses

            seg_cfg = config.seg
            if not seg_cfg.raster_cap:
                seg_cfg = dataclasses.replace(
                    seg_cfg, raster_cap=config.extract.cell_capacity
                )
            # StarDistBackend resolves wb16 "auto" -> "pack"/"off" against
            # the loaded artifact and writes it back into its cfg; the tiled
            # route below reads self._segment.cfg so both paths run the same
            # conv formulation (seg_cfg is a static jit arg in the tiler,
            # where the host check couldn't run)
            self._segment = StarDistBackend(unet_variables, seg_cfg)
            # exact twin for overflow re-runs: pixel-path stats, scatter
            # rasterization (the tiled per-tile m_cap can drop cells on
            # dense plates) AND the exact K*K NMS pair set (the sparse pair
            # budget can miss suppressions on dense candidate packs) — all
            # three overflow flags route here
            self._segment_fallback = StarDistBackend(
                unet_variables,
                dataclasses.replace(
                    seg_cfg, raster_mode="scatter",
                    nms_max_pairs=seg_cfg.max_candidates ** 2),
                runs_props=False,
            )
        # plate-scale backends: capacity knobs scale with frame AREA (the
        # defaults are tuned for <=1024^2; max_candidates=256 top-K was
        # measured to silently drop ~95% of cells on 4096^2 plates before
        # InstanceDetails.cand_overflow existed — BENCH.md r4s3).  Keyed by
        # frame shape so segment_fn identity stays stable across batches
        # (the scoring graphs jit-cache on it).
        self._plate_backends: dict = {}
        self.load_trained_models()

    def _capacity_scale(self, h: int, w: int) -> int:
        """Frame-area multiple of the 1024^2 tuning baseline (>= 1)."""
        return max(1, -(-(h * w) // (1024 * 1024)))

    def _segment_for(self, h: int, w: int):
        """(segment_fn, fallback_fn) with area-scaled capacities."""
        scale = self._capacity_scale(h, w)
        if self._segment_mask is not None or scale == 1:
            return (self._segment_mask or self._segment,
                    self._segment_fallback)
        key = (h, w)
        if key not in self._plate_backends:
            import dataclasses

            from cell_image_analysis_tpu.models.segmentation import (
                StarDistBackend,
            )

            base = self._segment.cfg
            cfg = dataclasses.replace(
                base,
                max_candidates=base.max_candidates * scale,
                raster_cap=(base.raster_cap or base.max_candidates) * scale,
                nms_max_pairs=base.nms_max_pairs * scale,
            )
            primary = StarDistBackend(self.unet_variables, cfg)
            fb = StarDistBackend(
                self.unet_variables,
                dataclasses.replace(cfg, raster_mode="scatter",
                                    nms_max_pairs=cfg.max_candidates ** 2),
                runs_props=False,
            )
            self._plate_backends[key] = (primary, fb)
        return self._plate_backends[key]

    def load_trained_models(self):
        """improved_detection.py:23-46 — the artifact contract."""
        print("Loading trained models...")
        (self.model, self.variables, self.scaler, self.pca,
         self.detectors, self.ensemble) = artifacts.load_screening_artifacts(self.model_dir)
        self.scoring_params = artifacts.build_scoring_params(
            self.model, self.variables, self.scaler, self.pca, self.detectors, self.ensemble
        )
        if self.mesh is not None:
            from cell_image_analysis_tpu.parallel.sharding import replicate
            self.scoring_params = replicate(self.mesh, self.scoring_params)
        print("All models loaded successfully!")

    def extract_quality_cells(self, seg_channel: np.ndarray, green_channel: np.ndarray):
        """Same fused graph as training (improved_detection.py:48-115 parity)."""
        cfg = self.config
        labels = segment_frame(jnp.asarray(seg_channel.astype(np.float32)), cfg.seg, self.unet_variables)
        cells, st = extract_cells_chunked(
            labels, jnp.asarray(green_channel.astype(np.float32)),
            out_size=cfg.extract.out_size,
            label_capacity=max(cfg.extract.cell_capacity * 2, 1024),
            cell_capacity=cfg.extract.cell_capacity,
            crop_capacity=cfg.extract.crop_capacity,
            border_margin=cfg.qc.border_margin,
            min_area=cfg.qc.min_area,
            max_area=cfg.qc.max_area,
            max_eccentricity=cfg.qc.max_eccentricity,
            min_mean_intensity=cfg.qc.min_mean_intensity,
            min_std_intensity=cfg.qc.min_std_intensity,
        )
        stats = [
            dict(area=int(a), eccentricity=float(e),
                 mean_intensity=float(m), std_intensity=float(s))
            for a, e, m, s in zip(
                st["area"], st["eccentricity"], st["mean_intensity"], st["std_intensity"]
            )
        ]
        return cells, stats

    def compute_anomaly_scores(self, cell_images: np.ndarray) -> dict:
        """Chunked, padded, jitted scoring (improved_detection.py:117-153)."""
        n = len(cell_images)
        if n == 0:
            return {}
        out: dict = {}
        chunks = []
        for start in range(0, n, _SCORE_CHUNK):
            block = np.asarray(cell_images[start : start + _SCORE_CHUNK], np.float32)
            pad = _SCORE_CHUNK - len(block)
            valid = np.ones(_SCORE_CHUNK, bool)
            if pad:
                block = np.concatenate([block, np.zeros((pad,) + block.shape[1:], np.float32)])
                valid[len(valid) - pad :] = False
            if self.mesh is not None:
                from cell_image_analysis_tpu.parallel.sharding import shard_batch
                block = shard_batch(self.mesh, block)
            chunks.append(
                compute_anomaly_scores(self.model, self.scoring_params, block,
                                       valid=valid,
                                       min_votes=self.config.ensemble.min_votes)
            )
        keys_concat = [
            "reconstruction_mse", "reconstruction_mae",
            "conservative_predictions", "moderate_predictions",
            "conservative_scores", "moderate_scores", "ensemble_predictions",
            "fft_features",
        ]
        for k in keys_concat:
            out[k] = np.concatenate([c[k] for c in chunks], axis=0)
        for name in ("conservative", "moderate", "ensemble"):
            out[f"{name}_anomaly_rate"] = float(np.mean(out[f"{name}_predictions"] == -1))
        return out

    def _score_sample_frames(self, tif_files: list) -> tuple[dict, list, list]:
        """Device-resident screening of one sample: frames stream in, stack
        into same-shape batches, and run the fused segmentation->extraction->
        scoring path (pipeline/scoring.score_frames) — only per-cell score
        vectors cross the host<->device link.

        Returns (scores dict, per-file cell counts, per-file mean
        intensities)."""
        from cell_image_analysis_tpu.pipeline.scoring import (
            score_frames_fused_start,
            score_frames_fused_wait,
        )

        cfg = self.config
        # threshold backend provably bounds foreground at
        # (100 - threshold_percentile)% of the frame, so the regionprops
        # compaction capacity can shrink accordingly (BENCH.md)
        if cfg.seg.backend == "threshold":
            fg_fraction = min(0.25, (100.0 - cfg.seg.threshold_percentile) / 100.0 + 0.02)
        else:
            fg_fraction = 0.25
        batch_max = 16  # measured throughput sweet spot (BENCH.md)
        frame_names: list = []
        pend_frames: list = []
        pend_idx: list = []
        all_scores: list = []
        all_stats: list = []

        # One batch stays in flight: flush() only *dispatches* (JAX dispatch
        # is async), and the previous batch's host fetch happens while the
        # new one computes on device — hides the ~35 ms/batch fetch floor on
        # multi-batch samples.
        in_flight: list = []

        def drain():
            pend, idxs = in_flight.pop(0)
            with self.timer.stage("score_frames"):
                scores, stats = score_frames_fused_wait(pend)
            if scores:
                stats = dict(stats)
                stats["file_index"] = np.array(idxs)[stats["frame_index"]]
                all_scores.append(scores)
                all_stats.append(stats)

        def flush():
            if not pend_frames:
                return
            segs = jnp.asarray(np.stack([f[0] for f in pend_frames]).astype(np.float32))
            greens = jnp.asarray(np.stack([f[1] for f in pend_frames]).astype(np.float32))
            # plate frames: capacity knobs scale with frame area (r4s3)
            scale = self._capacity_scale(segs.shape[1], segs.shape[2])
            seg_fn, fb_fn = self._segment_for(segs.shape[1], segs.shape[2])
            with self.timer.stage("score_frames"):
                pend = score_frames_fused_start(
                    self.model, self.scoring_params, segs, greens,
                    seg_fn,
                    fallback_segment_fn=fb_fn,
                    mesh=self.mesh,
                    chunk=32, caps=(64, 96),
                    fg_fraction=fg_fraction,
                    rcap=32 * max(1, segs.shape[2] // 1024),
                    label_capacity=max(cfg.extract.cell_capacity * 2 * scale,
                                       1024),
                    cell_capacity=cfg.extract.cell_capacity * scale,
                    crop_capacity=cfg.extract.crop_capacity,
                    out_size=cfg.extract.out_size,
                    min_votes=cfg.ensemble.min_votes,
                    border_margin=cfg.qc.border_margin,
                    min_area=cfg.qc.min_area,
                    max_area=cfg.qc.max_area,
                    max_eccentricity=cfg.qc.max_eccentricity,
                    min_mean_intensity=cfg.qc.min_mean_intensity,
                    min_std_intensity=cfg.qc.min_std_intensity,
                )
            in_flight.append((pend, list(pend_idx)))
            pend_frames.clear()
            pend_idx.clear()
            while len(in_flight) > 1:
                drain()

        def tiled_route(seg):
            """Large plates go through the halo-exchanged spatial tiler when
            a mesh is attached (SURVEY.md section 2.4 'long context'): the
            frame's rows shard over the mesh instead of replicating a
            2048^2-4096^2 tensor into every device's fused batch graph.
            Both backends tile; StarDist additionally needs the rows-per-tile
            aligned to the U-Net pooling grid (parallel/tiling.py)."""
            if not (
                self.mesh is not None
                and min(seg.shape) >= cfg.extract.tile_min_side
                and seg.shape[0] % self.mesh.shape["data"] == 0
            ):
                return False
            if cfg.seg.backend == "threshold" or self.unet_variables is None:
                return True
            rows = seg.shape[0] // self.mesh.shape["data"]
            align = 2 ** cfg.seg.unet_depth
            return rows % align == 0 and seg.shape[1] % align == 0

        def score_tiled(seg, green, file_idx):
            from cell_image_analysis_tpu.parallel.tiling import (
                tiled_extract_cells,
                tiled_extract_cells_stardist,
            )
            from cell_image_analysis_tpu.pipeline.scoring import (
                compute_anomaly_scores as _score_cells_fn,
            )

            rows = seg.shape[0] // self.mesh.shape["data"]
            stardist = (cfg.seg.backend != "threshold"
                        and self.unet_variables is not None)
            align = 2 ** cfg.seg.unet_depth
            halo = (min(cfg.extract.crop_capacity, rows) // align * align
                    if stardist else min(cfg.extract.crop_capacity, rows))
            # per-TILE area scaling (the r4s3 rule applied to this route):
            # each device segments a (rows + 2*halo, W) tile, so the
            # capacity knobs must scale with THAT area, not the 1024^2
            # tuning baseline — the unscaled self._segment.cfg silently
            # candidate-capped large tiled plates (ADVICE r4 #1)
            tile_scale = self._capacity_scale(rows + 2 * halo, seg.shape[1])
            qc_kw = dict(
                cell_capacity=cfg.extract.cell_capacity * tile_scale,
                crop_capacity=cfg.extract.crop_capacity,
                out_size=cfg.extract.out_size,
                border_margin=cfg.qc.border_margin,
                min_area=cfg.qc.min_area,
                max_area=cfg.qc.max_area,
                max_eccentricity=cfg.qc.max_eccentricity,
                min_mean_intensity=cfg.qc.min_mean_intensity,
                min_std_intensity=cfg.qc.min_std_intensity,
            )
            with self.timer.stage("score_frames"):
                if stardist:
                    import dataclasses

                    base = self._segment.cfg  # raster_cap-replaced twin
                    seg_cfg = base if tile_scale == 1 else dataclasses.replace(
                        base,
                        max_candidates=base.max_candidates * tile_scale,
                        raster_cap=((base.raster_cap or base.max_candidates)
                                    * tile_scale),
                        nms_max_pairs=base.nms_max_pairs * tile_scale,
                    )
                    tiled = tiled_extract_cells_stardist(
                        jnp.asarray(seg.astype(np.float32)),
                        jnp.asarray(green.astype(np.float32)),
                        self.mesh, self.unet_variables, seg_cfg=seg_cfg,
                        halo=halo, **qc_kw,
                    )
                    if tiled.raster_overflow is not None and bool(tiled.raster_overflow):
                        # repo rule: capacity overflow -> exact fallback
                        # (per-tile m_cap dropped polygons / sparse-NMS pair
                        # budget; re-render with the scatter rasterizer and
                        # the exact K*K pair set)
                        print("  tiled raster m_cap overflow -> scatter re-run")
                        tiled = tiled_extract_cells_stardist(
                            jnp.asarray(seg.astype(np.float32)),
                            jnp.asarray(green.astype(np.float32)),
                            self.mesh, self.unet_variables,
                            seg_cfg=dataclasses.replace(
                                seg_cfg, raster_mode="scatter",
                                nms_max_pairs=seg_cfg.max_candidates ** 2),
                            halo=halo, **qc_kw,
                        )
                        if bool(tiled.raster_overflow):
                            # the scatter re-run clears raster/NMS overflow
                            # but cannot clear cand_overflow (same top-K);
                            # only a bigger max_candidates can
                            print(
                                "  WARNING: overflow persists after scatter "
                                "re-run — max_candidates "
                                f"({seg_cfg.max_candidates}) likely binds; "
                                "raise SegConfig.max_candidates"
                            )
                else:
                    tiled = tiled_extract_cells(
                        jnp.asarray(seg.astype(np.float32)),
                        jnp.asarray(green.astype(np.float32)),
                        self.mesh,
                        halo=halo,
                        threshold_percentile=cfg.seg.threshold_percentile,
                        norm_pmin=cfg.seg.norm_pmin,
                        norm_pmax=cfg.seg.norm_pmax,
                        **qc_kw,
                    )
                if (tiled.cell_overflow is not None
                        and bool(tiled.cell_overflow)):
                    # a tile had more QC-passing cells than cell_capacity —
                    # the selection truncated; re-run once at 4x capacity
                    # (one recompile), then warn if it still binds
                    print("  tiled cell_capacity overflow -> 4x re-run")
                    qc_kw = dict(qc_kw, cell_capacity=qc_kw["cell_capacity"] * 4)
                    if stardist:
                        tiled = tiled_extract_cells_stardist(
                            jnp.asarray(seg.astype(np.float32)),
                            jnp.asarray(green.astype(np.float32)),
                            self.mesh, self.unet_variables, seg_cfg=seg_cfg,
                            halo=halo, **qc_kw,
                        )
                    else:
                        tiled = tiled_extract_cells(
                            jnp.asarray(seg.astype(np.float32)),
                            jnp.asarray(green.astype(np.float32)),
                            self.mesh,
                            halo=halo,
                            threshold_percentile=cfg.seg.threshold_percentile,
                            norm_pmin=cfg.seg.norm_pmin,
                            norm_pmax=cfg.seg.norm_pmax,
                            **qc_kw,
                        )
                    if bool(tiled.cell_overflow):
                        print(
                            "  WARNING: cell_capacity still binds at "
                            f"{qc_kw['cell_capacity']}/tile — cells were "
                            "dropped; raise ExtractConfig.cell_capacity"
                        )
                valid = np.asarray(tiled.valid)
                scores = _score_cells_fn(
                    self.model, self.scoring_params, tiled.cells, valid=valid,
                    min_votes=cfg.ensemble.min_votes,
                )
            if scores:
                n = len(scores["reconstruction_mse"])
                all_scores.append(scores)
                all_stats.append(dict(
                    file_index=np.full(n, file_idx),
                    mean_intensity=np.asarray(tiled.mean_intensity)[valid],
                ))

        stream = FrameStream(tif_files)
        for path, seg, green in stream:
            frame_names.append(os.path.basename(path))
            if tiled_route(seg):
                score_tiled(seg, green, len(frame_names) - 1)
                continue
            if pend_frames and seg.shape != pend_frames[0][0].shape:
                flush()
            pend_frames.append((seg, green))
            pend_idx.append(len(frame_names) - 1)
            if len(pend_frames) >= batch_max:
                flush()
        flush()
        while in_flight:
            drain()
        for path, err in stream.errors:
            print(f"Error processing {path}: {err}")

        if not all_scores:
            return {}, [], []

        merged = {}
        for k in all_scores[0]:
            if k.endswith("_anomaly_rate"):
                continue
            merged[k] = np.concatenate([s[k] for s in all_scores])
        for name in ("conservative", "moderate", "ensemble", "fft"):
            merged[f"{name}_anomaly_rate"] = float(
                np.mean(merged[f"{name}_predictions"] == -1)
            )
        file_index = np.concatenate([s["file_index"] for s in all_stats])
        mean_int = np.concatenate([s["mean_intensity"] for s in all_stats])
        counts = [int((file_index == i).sum()) for i in range(len(frame_names))]
        means = [float(mean_int[file_index == i].mean()) if counts[i] else 0
                 for i in range(len(frame_names))]
        merged["_frame_names"] = frame_names
        return merged, counts, means

    def screen_mutant_samples(self, test_folders_dict: dict, output_dir: str):
        """improved_detection.py:155-244."""
        os.makedirs(output_dir, exist_ok=True)
        print("=== Starting Mutant Screening with Improved Model ===")
        reports.save_run_parameters(output_dir, self.config, {"samples": test_folders_dict})

        results: dict = {}
        detailed_results: list = []

        for sample_name, folder_path in test_folders_dict.items():
            print(f"\nProcessing {sample_name}...")
            tif_files = list_tiffs(folder_path)
            if not tif_files:
                print(f"  No .tif files found in {folder_path}")
                continue

            self.meter.start()
            scores, counts, _means = self._score_sample_frames(tif_files)
            n_cells = len(scores["reconstruction_mse"]) if scores else 0
            for fname, cnt in zip(scores.get("_frame_names", []), counts):
                print(f"  {fname}: {cnt} cells")
            print(f"  Total {sample_name} cells: {n_cells}")
            if n_cells == 0:
                print(f"  No quality cells extracted from {sample_name}")
                self.meter.stop(0)
                continue
            self.meter.stop(n_cells)

            results[sample_name] = dict(
                sample_name=sample_name,
                total_cells=n_cells,
                files_processed=len(tif_files),
                conservative_anomaly_rate=scores["conservative_anomaly_rate"],
                moderate_anomaly_rate=scores["moderate_anomaly_rate"],
                ensemble_anomaly_rate=scores["ensemble_anomaly_rate"],
                fft_anomaly_rate=scores.get("fft_anomaly_rate", 0.0),
                mean_mse=float(np.mean(scores["reconstruction_mse"])),
                std_mse=float(np.std(scores["reconstruction_mse"])),
                mean_mae=float(np.mean(scores["reconstruction_mae"])),
                std_mae=float(np.std(scores["reconstruction_mae"])),
            )

            for i in range(n_cells):
                detailed_results.append(dict(
                    sample_name=sample_name,
                    cell_id=i,
                    mse=float(scores["reconstruction_mse"][i]),
                    mae=float(scores["reconstruction_mae"][i]),
                    conservative_anomaly=bool(scores["conservative_predictions"][i] == -1),
                    moderate_anomaly=bool(scores["moderate_predictions"][i] == -1),
                    ensemble_anomaly=bool(scores["ensemble_predictions"][i] == -1),
                    fft_anomaly=bool(scores["fft_predictions"][i] == -1),
                    conservative_score=float(scores["conservative_scores"][i]),
                    moderate_score=float(scores["moderate_scores"][i]),
                ))

            print(f"    Conservative anomaly rate: {results[sample_name]['conservative_anomaly_rate'] * 100:.2f}%")
            print(f"    Moderate anomaly rate: {results[sample_name]['moderate_anomaly_rate'] * 100:.2f}%")
            print(f"    Mean MSE: {results[sample_name]['mean_mse']:.6f}")

        self.save_and_visualize_results(results, detailed_results, output_dir)
        if self.meter.items:
            print(f"\nThroughput: {self.meter.rate:.1f} cells/sec")
        print(self.timer.report())
        return results, detailed_results

    def save_and_visualize_results(self, results, detailed_results, output_dir):
        """improved_detection.py:246-261."""
        if not results:
            return
        results_df, detailed_df = reports.save_screening_csvs(output_dir, results, detailed_results)
        reports.create_screening_visualizations(output_dir, results_df, detailed_df, self.config.triage)
        reports.generate_screening_report(output_dir, results_df, self.config.triage)
