from .windows import event_count_windows, num_windows
from .rasterize import RasterSpec, rasterize_windows, rasterize_for_clip
from .preprocess import ClipPreprocess, preprocess_frames

__all__ = [
    "event_count_windows",
    "num_windows",
    "RasterSpec",
    "rasterize_windows",
    "rasterize_for_clip",
    "ClipPreprocess",
    "preprocess_frames",
]
