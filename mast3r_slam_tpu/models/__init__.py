"""Model layer: MASt3R family (ViT encoders + twin decoders + heads),
retrieval model, preprocessing, checkpoint IO."""

from mast3r_slam_tpu.models.mast3r import (
    MASt3RConfig,
    MASt3RModel,
    MASt3RNet,
    load_mast3r,
)

__all__ = ["MASt3RConfig", "MASt3RModel", "MASt3RNet", "load_mast3r"]
