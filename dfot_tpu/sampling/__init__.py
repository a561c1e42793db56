from .planner import (
    SlidingWindow,
    interpolation_plan,
    keyframe_indices,
    pad_to_length,
    sliding_window_plan,
)
from .rollout import DFoTRollout, RolloutConfig
from .sampler import SamplingPlan, make_window_sampler, plan_sampling
from .scheduling import (
    CompiledSchedule,
    compile_sampling_schedule,
    generate_refine_scheduling_matrix,
    generate_scheduling_matrix,
)
