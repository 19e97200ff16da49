from .binning import TileLists, bin_gaussians
from .composite import composite_tiles
from .projection import ProjectedGaussians, project_gaussians
from .render import (
    DepthRenderingMode,
    RenderSettings,
    render,
    render_depth,
    orthographic_frustum,
    render_orthographic,
)

__all__ = [
    "TileLists",
    "bin_gaussians",
    "composite_tiles",
    "ProjectedGaussians",
    "project_gaussians",
    "DepthRenderingMode",
    "RenderSettings",
    "render",
    "render_depth",
    "orthographic_frustum",
    "render_orthographic",
]
