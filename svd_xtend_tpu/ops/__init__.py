from . import attention, resize, video  # noqa: F401
