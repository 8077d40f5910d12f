"""Model layer: MASt3R family (ViT encoders + twin decoders + heads),
retrieval model, preprocessing, checkpoint IO."""

from mast3r_slam_tpu.models.mast3r import (
    MASt3RConfig,
    MASt3RModel,
    MASt3RNet,
    load_mast3r,
)
from mast3r_slam_tpu.models.retrieval import RetrievalModel

# Import-surface parity with the reference's re-exports
# (mast3r_utils.py:30-38): the model families are configs of one
# implementation here.
Mast3rFull = MASt3RModel  # ViT-L family via MASt3RConfig.mast3r_full
DuneMast3r = MASt3RModel  # compact family via MASt3RConfig.dunemast3r

__all__ = [
    "MASt3RConfig",
    "MASt3RModel",
    "MASt3RNet",
    "load_mast3r",
    "RetrievalModel",
    "Mast3rFull",
    "DuneMast3r",
]
