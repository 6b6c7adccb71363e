from . import convops, pool, region, reorg  # noqa: F401
