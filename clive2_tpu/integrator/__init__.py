from .trace import generate_camera_rays, generate_light_rays, trace_subpaths  # noqa: F401
from .connect import connect_paths  # noqa: F401
from .render import render_sample  # noqa: F401
