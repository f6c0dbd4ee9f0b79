from katacoffee_tpu.search.params import SearchParams
from katacoffee_tpu.search.mcts import (
    Tree,
    init_tree,
    run_search,
    root_visit_counts,
    root_values,
    select_moves,
    uniform_eval_fn,
    make_nn_eval_fn,
)
