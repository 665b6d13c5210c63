from .loop import (
    TrainResult,
    fit,
    make_fused_train_step,
    make_train_step,
    masked_optimizer,
    trainable_mask,
)
from .losses import (
    autoencoder_loss,
    committor_loss,
    cv_coordinate_gradients,
    eigenfunction_loss,
    fused_mse_loss,
    make_committor_loss,
    make_eigenfunction_loss,
    mse_loss,
    registry as loss_registry,
    timelagged_autoencoder_loss,
)
from .checkpoint import (
    latest_checkpoint,
    load_training_state,
    save_training_state,
)
from .data import (
    TrajectoryDataset,
    batch_iterator,
    lagged_pair_iterator,
    packed_batch_iterator,
    save_trajectory,
)
from .discriminant import HLDAResult, hlda
from .forces import coordinate_gradients, force_fn
from .timelagged import (
    TICAResult,
    make_vamp_loss,
    tica,
    vamp2_loss,
    vamp2_score,
)

__all__ = [
    "make_train_step",
    "make_fused_train_step",
    "masked_optimizer",
    "fit",
    "TrainResult",
    "trainable_mask",
    "mse_loss",
    "fused_mse_loss",
    "autoencoder_loss",
    "timelagged_autoencoder_loss",
    "cv_coordinate_gradients",
    "eigenfunction_loss",
    "make_eigenfunction_loss",
    "committor_loss",
    "make_committor_loss",
    "loss_registry",
    "TrajectoryDataset",
    "batch_iterator",
    "lagged_pair_iterator",
    "packed_batch_iterator",
    "save_trajectory",
    "coordinate_gradients",
    "force_fn",
    "save_training_state",
    "load_training_state",
    "latest_checkpoint",
    "HLDAResult",
    "hlda",
    "TICAResult",
    "tica",
    "vamp2_score",
    "vamp2_loss",
    "make_vamp_loss",
]
