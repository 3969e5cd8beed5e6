from . import config, dtypes, edm, mesh  # noqa: F401
