"""Evaluation: metrics, file-wise testing, SMR sweeps, fusion, streaming
segmentation."""

from .metrics import accuracy, get_performance  # noqa: F401
from .tester import FileWiseTester  # noqa: F401
