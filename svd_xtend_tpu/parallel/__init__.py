from .sharding import (make_sharded_train_step, shard_batch, shard_train_state,
                       state_shardings)  # noqa: F401
