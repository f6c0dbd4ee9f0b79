from katacoffee_tpu.selfplay.actor import (
    SelfplaySettings,
    Trajectory,
    TrainingBatch,
    run_selfplay_segment,
    finalize_targets,
)
from katacoffee_tpu.selfplay.startposes import load_startposes
