from katacoffee_tpu.nn.features import (
    NUM_FEATURES_SPATIAL,
    NUM_FEATURES_GLOBAL,
    extract_features,
)
