from .io import CheckpointManager, load_torch_network
