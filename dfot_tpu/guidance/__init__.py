from .history_guidance import (
    HGTable,
    HistoryGuidance,
    HistorySegment,
    hg_compose,
    hg_prepare,
)
from .visualizer import visualize_plan
