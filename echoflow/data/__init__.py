"""Data layer: EchoNet-Dynamic loading, CAMUS transforms, synthetic fixtures."""

from echoflow.data.echonet import (  # noqa: F401
    BLUE_VIDEOS,
    EchoNetDynamicDataset,
    EchoNetIndex,
    get_mean_and_std,
    load_avi,
    load_fold_indices,
    random_start_and_end,
    rasterize_trace,
)
from echoflow.data.synthetic import (  # noqa: F401
    make_beating_video,
    make_training_sample,
    write_synthetic_avi,
)
