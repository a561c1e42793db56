from .frechet import FrechetDistance, InceptionScore, frechet_distance
from .functional import mse, psnr, ssim
from .i3d import I3D
from .registry import SharedMetricModelRegistry
from .video_metric import VideoMetric
from .vbench import VBenchQuality
