from saragan_tpu.data.normalize import (  # noqa: F401
    invert_normalize_numpy,
    normalize_numpy,
    stdnormal_to_8bit_numpy,
)
from saragan_tpu.data.dataset import NumpyPathDataset, Prefetcher, get_numpy_dataset  # noqa: F401
