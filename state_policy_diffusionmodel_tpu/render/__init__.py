from . import camera
from .raster import Overlay, render, render_batch

__all__ = ["camera", "render", "render_batch", "Overlay"]
