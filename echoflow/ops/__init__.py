"""Numerics substrate: exact reimplementations of the reference's hot ops.

Every op here documents the reference file:line whose semantics it matches.
"""

from echoflow.ops.resize import (
    linear_resize_matrix,
    resize_linear,
    trilinear_resize,
)
from echoflow.ops.warp import (
    set_warp_backend,
    warp_bilinear_border,
    warp_image_with_offsets,
)
from echoflow.ops.normalize import (
    zeroone_normalizer,
    zeroone_normalize,
    one_hot_channels,
)
from echoflow.ops.peaks import find_peaks_1d
