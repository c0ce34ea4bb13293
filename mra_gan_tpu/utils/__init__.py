from .visualizer import Visualizer
from .timers import StepTimer, count_params, print_networks
