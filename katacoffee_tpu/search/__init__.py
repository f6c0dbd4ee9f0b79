from katacoffee_tpu.search.params import SearchParams
from katacoffee_tpu.search.mcts import (
    Tree,
    EvalResult,
    advance_root,
    init_tree,
    policy_target,
    run_search,
    root_visit_counts,
    root_values,
    select_moves,
    uniform_eval_fn,
    make_nn_eval_fn,
    make_cached_raw_forward_fn,
    make_raw_forward_fn,
)
from katacoffee_tpu.search.timecontrols import TimeControls, visits_for_time
