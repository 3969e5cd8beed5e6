from .dataset import FrameFolderDataset, ShardedLoader  # noqa: F401
