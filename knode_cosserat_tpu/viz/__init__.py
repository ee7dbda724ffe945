from .visualizer import (ContinuumRobotVisualizer, plot_2d,
                         plot_training_curves, visualize_2d)
from .mocap import MocapPlayback
