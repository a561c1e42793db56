from .frechet import FrechetDistance, InceptionScore, frechet_distance
from .functional import mse, psnr, ssim
from .i3d import I3D
from .inception import InceptionV3, import_inception_params
from .registry import SharedMetricModelRegistry
from .video_metric import VideoMetric
from .vbench import VBenchQuality
