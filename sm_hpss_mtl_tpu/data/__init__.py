"""Data layer: audio IO, CV folds, featurization cache, balanced batcher,
device prefetch."""

from .audio import (load_and_preprocess_signal, make_toy_musan,  # noqa: F401
                    read_audio, read_wav, write_wav)
from .batcher import BalancedBatcher, BatcherConfig  # noqa: F401
from .featurize import FeatureConfig, Featurizer  # noqa: F401
from .folds import create_cv_folds, get_train_test_files, load_cv_folds, save_cv_folds  # noqa: F401
from .prefetch import DevicePrefetcher  # noqa: F401
from .balance import balance_data  # noqa: F401
