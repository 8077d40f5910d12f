"""TPU-native MASt3R-SLAM.

A brand-new real-time visual SLAM framework for TPU (JAX / XLA / Pallas),
with the capabilities of MASt3R-SLAM as realized in the Aedelon/MASt3R-SLAM
MLX/Metal reference:

- MASt3R two-view pointmap network (ViT-L encoder + twin decoder heads
  regressing per-pixel 3D points, confidences, descriptors) as JAX/XLA
  inference with a Pallas fused-attention kernel.
- Dense iterative projective matching + descriptor refinement as fused,
  device-resident kernels.
- Gauss-Newton Sim(3) frontend tracker and keyframe factor-graph backend
  (ray, point, and calibrated pixel+log-depth residual modes) solved fully
  on device (no host round trips in the solver loop).
- Retrieval-based loop closure and relocalization.
- TUM / EuRoC / folder / video dataset loaders with async host prefetch.
- TUM / KITTI trajectory and PLY point-cloud export.

See SURVEY.md at the repo root for the structural analysis of the reference
this build targets (reference: /root/reference, mlx-mast3r-slam).
"""

__version__ = "0.1.0"

from mast3r_slam_tpu.config import get_config, load_config, set_config, default_config

__all__ = [
    "get_config",
    "load_config",
    "set_config",
    "default_config",
    "SLAM",
    "load_mast3r",
    "__version__",
]

_LAZY = {
    "SLAM": ("mast3r_slam_tpu.slam", "SLAM"),
    "load_mast3r": ("mast3r_slam_tpu.models.mast3r", "load_mast3r"),
    "OfflineReconstructor": ("mast3r_slam_tpu.offline", "OfflineReconstructor"),
    "BatchTracker": ("mast3r_slam_tpu.serving", "BatchTracker"),
    "LiveViewer": ("mast3r_slam_tpu.viewer", "LiveViewer"),
}


def __getattr__(name):
    """Lazy top-level exports (importing the package stays light)."""
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
