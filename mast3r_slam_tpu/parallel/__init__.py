"""Multi-chip execution: device meshes, parameter shardings, training step.

The reference has NO distributed execution of any kind (SURVEY.md §2.9) —
its "communication backend" is Apple unified memory. This package is the
TPU-native scaling layer the reference couldn't have: a (dp, tp) mesh over
ICI with XLA-inserted collectives, Megatron-style tensor parallelism for
the ViT matmuls, data parallelism over view-pairs, GPipe pipeline
parallelism over encoder depth (pipeline.py), and sequence parallelism
over the token axis (sequence.py) — used for MASt3R
fine-tuning and for batch inference fan-out (backend edge batches).
"""

from mast3r_slam_tpu.parallel.mesh import make_mesh
from mast3r_slam_tpu.parallel.pipeline import (
    encoder_stage_params,
    jit_pipelined_encode,
    make_pipeline_mesh,
    pipelined_encode,
)
from mast3r_slam_tpu.parallel.sequence import (
    jit_sequence_parallel_encode,
    sequence_parallel_encode,
)
from mast3r_slam_tpu.parallel import multihost
from mast3r_slam_tpu.parallel.sharding import (
    infer_param_shardings,
    shard_params,
)
from mast3r_slam_tpu.parallel.train import (
    TrainState,
    make_train_step,
    mast3r_loss,
)

__all__ = [
    "make_mesh",
    "multihost",
    "make_pipeline_mesh",
    "encoder_stage_params",
    "pipelined_encode",
    "jit_pipelined_encode",
    "sequence_parallel_encode",
    "jit_sequence_parallel_encode",
    "infer_param_shardings",
    "shard_params",
    "TrainState",
    "make_train_step",
    "mast3r_loss",
]
