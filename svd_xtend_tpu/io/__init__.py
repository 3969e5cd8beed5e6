from . import convert, media  # noqa: F401
