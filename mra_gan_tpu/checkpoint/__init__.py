from .io import CheckpointManager, load_torch_network, save_torch_network
