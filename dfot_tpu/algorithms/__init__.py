from .dfot_video import DFoTVideoAlgo, DFoTVideoPoseAlgo, build_algorithm
