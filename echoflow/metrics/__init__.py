"""Clinical metrics: Simpson's method-of-disks EF, Dice, ED/ES pairing."""

from echoflow.metrics.simpson import (
    find_boundaries_thick,
    get2dPucks,
    computeSimpsonVolume,
    simpson_monoplane_volume,
)
from echoflow.metrics.pairs import EDESpairs
from echoflow.metrics.dice import categorical_dice, lv_dice
