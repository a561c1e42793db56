from . import geometry
from .logging import MetricsLogger, log_video
