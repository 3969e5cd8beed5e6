from .unet import UNetSpatioTemporalConditionModel  # noqa: F401
