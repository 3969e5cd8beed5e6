from . import checkpoint, optim, state  # noqa: F401
