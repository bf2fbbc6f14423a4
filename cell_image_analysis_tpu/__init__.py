"""TPU-native cell-screening framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
Kmatsuo57/cell-image-analysis reference pipeline: TIFF ingest, StarDist-style
instance segmentation, QC'd per-cell extraction (CLAHE + anti-aliased 64x64
resize), convolutional-autoencoder anomaly training, encoder-feature ->
RobustScaler -> PCA -> one-class RBF-SVM detection, per-cell 2D-FFT spectral
features, ensemble scoring, and multi-strain screening — sharded over TPU
meshes with psum-reduced anomaly rates.

Heavy submodules are imported lazily; `import cell_image_analysis_tpu` does
not initialize JAX.
"""

__version__ = "0.1.0"

from cell_image_analysis_tpu.config import PipelineConfig  # noqa: F401 (lightweight)
