from . import bsdf, filters, intersect, sampling  # noqa: F401
