"""Data pipeline: dataset catalogs, CPU augmentation, threaded prefetch loader."""

from arflow_tpu.data.datasets import (  # noqa: F401
    Chairs,
    Chairs2,
    ImgSeqDataset,
    KITTIFlow,
    KITTIFlowMV,
    Sintel,
    SintelRaw,
    Things3D,
    ConcatDataset,
)
from arflow_tpu.data.loader import DataLoader  # noqa: F401
from arflow_tpu.data.get_dataset import get_dataset  # noqa: F401
