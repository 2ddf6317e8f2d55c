"""echoflow — TPU-native (JAX/XLA/Pallas) framework for fully automated
multi-heartbeat echocardiography video segmentation and motion tracking.

A from-scratch re-design of the CLAS-FV pipeline
(yc015/fully-automated-multi-heartbeat-echocardiography-video-segmentation-
and-motion-tracking) for TPU hardware: the R(2+1)D-18 motion/segmentation
network compiles to XLA, differentiable warps and label fusion run device-side
as batched transforms, and multi-clip / multi-shift inference is a single
jitted, mesh-shardable graph instead of Python loops.

Layer map (mirrors SURVEY.md §1 of the reference):
  echoflow.ops       - numerics substrate (resize, warp, normalize, fusion, peaks)
  echoflow.models    - R(2+1)D-18 MotionNet (flax) + torch weight converter
  echoflow.data      - EchoNet-Dynamic loader, synthetic fixtures, video IO
  echoflow.train     - CLAS-FV losses (lax.scan warp chains), DP train loop
  echoflow.infer     - full-video clip tiling + fusion inference engine
  echoflow.metrics   - clinical metrics (Simpson EF, Dice, ED/ES pairing)
  echoflow.parallel  - mesh construction and sharding helpers
"""

__version__ = "0.1.0"

from echoflow import ops, models, metrics  # noqa: F401


_API = {
    "segment_a_video_with_fusion": "echoflow.infer.pipeline",
    "divide_to_consecutive_clips": "echoflow.infer.pipeline",
    "VideoSegmenter": "echoflow.infer.pipeline",
    "compute_ef_using_putative_clips": "echoflow.infer.ef",
    "EDESpairs": "echoflow.infer.ef",
    "get2dPucks": "echoflow.infer.ef",
    "computeSimpsonVolume": "echoflow.metrics.simpson",
    "zeroone_normalizer": "echoflow.ops.normalize",
}


def __getattr__(name):
    """Lazily re-export the reference's contractual API at top level
    (SURVEY.md §7.4), so `from echoflow import segment_a_video_with_fusion`
    works for migrating users without importing the heavy inference/train
    stacks (and their first jax touch) at package-import time. The resolved
    object is cached into module globals, so only the first lookup pays the
    import (module `__getattr__` results are not memoized by Python)."""
    if name in _API:
        import importlib

        obj = getattr(importlib.import_module(_API[name]), name)
        globals()[name] = obj
        return obj
    raise AttributeError(f"module 'echoflow' has no attribute {name!r}")
