"""Full-video inference: clip tiling, shift-ensemble fusion, EF computation."""

from echoflow.infer.pipeline import (
    VideoSegmenter,
    divide_to_consecutive_clips,
    segment_a_video_with_fusion,
)
from echoflow.infer.ef import (
    compute_ef_using_putative_clips,
    detect_ed_es_frames,
    lv_area_curve,
    simpson_ef,
)
