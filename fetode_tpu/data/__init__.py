"""Dataset loaders, window datasets, scalers, time features, metrics."""

from fetode_tpu.data.ecg200 import (  # noqa: F401
    batch_iterator,
    load_ecg200,
    synthetic_ecg200,
)
from fetode_tpu.data.informer import (  # noqa: F401
    WindowSplit,
    dataset_custom,
    dataset_ett_hour,
    dataset_ett_minute,
    dataset_pred,
)
from fetode_tpu.data.masking import (  # noqa: F401
    apply_mask,
    causal_mask,
    prob_mask,
)
from fetode_tpu.data.metrics import (  # noqa: F401
    corr,
    mae,
    mape,
    metric,
    mse,
    mspe,
    rmse,
    rse,
)
from fetode_tpu.data.multimodal import (  # noqa: F401
    assert_feature_dim,
    embed_text,
    fuse_features,
    merge_with_text,
)
from fetode_tpu.data.paths import locate  # noqa: F401
from fetode_tpu.data.timefeatures import time_features  # noqa: F401
from fetode_tpu.data.timeseries import (  # noqa: F401
    Standardizer,
    load_ett_csv,
    load_timemmd_csv,
    make_windows,
    split_time_series,
    standardize_fit,
    synthetic_series,
    window_batches,
)
