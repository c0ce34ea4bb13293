from .visualizer import Visualizer
from .timers import StepTimer
