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
