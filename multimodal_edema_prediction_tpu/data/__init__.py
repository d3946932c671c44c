from . import meta, pipeline, synthetic  # noqa: F401
