from .pipeline import SVDModels, generate  # noqa: F401
from .scheduler import EulerDiscreteScheduler  # noqa: F401
