from .sharding import make_sharded_train_step, shard_state
