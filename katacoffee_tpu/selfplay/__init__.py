from katacoffee_tpu.selfplay.actor import (
    SelfplaySettings,
    SideState,
    Trajectory,
    TrainingBatch,
    finalize_targets,
    init_side_state,
    run_selfplay_segment,
    run_side_segment,
)
from katacoffee_tpu.selfplay.startposes import load_startposes
