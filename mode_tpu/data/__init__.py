"""Datasets, file listers, preprocessing, and the threaded/native loaders."""

from mode_tpu.data.deep360 import Deep360DatasetDisparity, Deep360DatasetFusion
from mode_tpu.data.file_lists import (
    list_deep360_disparity_all,
    list_deep360_disparity_test,
    list_deep360_disparity_train,
    list_deep360_fusion_test,
    list_deep360_fusion_train,
)
from mode_tpu.data.loader import DataLoader
from mode_tpu.data.three_d60 import Dataset3D60Disparity, Dataset3D60Fusion

__all__ = [
    "Deep360DatasetDisparity", "Deep360DatasetFusion",
    "Dataset3D60Disparity", "Dataset3D60Fusion", "DataLoader",
    "list_deep360_disparity_all", "list_deep360_disparity_test",
    "list_deep360_disparity_train", "list_deep360_fusion_test",
    "list_deep360_fusion_train",
]
