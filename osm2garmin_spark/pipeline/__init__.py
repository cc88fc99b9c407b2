from .synth import synth_images, attach_geo
from .tiling import run_tiling_pipeline

__all__ = ["synth_images", "attach_geo", "run_tiling_pipeline"]
