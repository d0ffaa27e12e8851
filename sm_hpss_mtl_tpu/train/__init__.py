"""Training harness: losses, optimizers, train state/steps, fit loop."""

from .losses import mtl_loss  # noqa: F401
from .optimizers import for_model  # noqa: F401
from .state import TrainState, make_eval_step, make_predict, make_train_step  # noqa: F401
from .checkpoint import checkpoint_exists, restore_checkpoint, save_checkpoint  # noqa: F401
from .config import MODEL_PRESETS, ExperimentConfig  # noqa: F401
from .loop import FitResult, fit  # noqa: F401
from .transfer import transfer_learn  # noqa: F401
from .endtoend import device_featurize_patches, make_audio_train_step  # noqa: F401
