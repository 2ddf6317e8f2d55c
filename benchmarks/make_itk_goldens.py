"""Generate ITK/LabelFusion golden outputs for the fusion parity tests.

echoflow's SIMPLE/STAPLE fusers (echoflow/ops/fusion.py) are reimplemented
from the published algorithms (Langerak et al. 2010; Warfield et al. 2004),
while the reference calls the ITK-backed `LabelFusion` package
(reference src/fuse_utils.py:2,95: `fuse_images(images, method,
class_list=[0, 1])`). This script, run in an environment where that stack
installs (`pip install SimpleITK LabelFusion` — both are CPU wheels),
records the EXACT outputs the reference's binary produces on the 20
committed deterministic rater stacks, so `tests/test_fusion.py` can diff
echoflow against them pixel by pixel:

    python benchmarks/make_itk_goldens.py \
        [--out tests/goldens/itk_fusion_goldens.npz]

Commit the resulting .npz; the consuming test skips while it is absent.
This environment has zero network egress (the install attempt and its log
are in docs/ITK_FUSION_FIDELITY.md), so the file cannot be generated here.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="tests/goldens/itk_fusion_goldens.npz")
    args = ap.parse_args(argv)

    try:
        import SimpleITK as itk
        from LabelFusion.wrapper import fuse_images
    except ImportError as exc:
        raise SystemExit(
            f"needs SimpleITK + LabelFusion ({exc}); run in an ITK-capable "
            "environment — see docs/ITK_FUSION_FIDELITY.md")

    from echoflow.data.fixtures import make_fusion_rater_stacks

    out = {}
    for name, stack in make_fusion_rater_stacks():
        images = [itk.GetImageFromArray(r.astype("uint8"), isVector=False)
                  for r in stack]
        for method in ("simple", "staple"):
            # Exactly the reference call (fuse_utils.py:95), including the
            # uint8 cast of the possibly-float SIMPLE output (:98).
            fused = fuse_images(images, method, class_list=[0, 1])
            out[f"{name}/{method}"] = (
                itk.GetArrayFromImage(fused).astype(np.uint8))
    # Environment fingerprint, so a golden mismatch can be traced to an
    # ITK/LabelFusion version change rather than an echoflow change.
    import LabelFusion

    out["__versions__"] = np.array([
        f"SimpleITK={itk.Version_VersionString()}",
        f"LabelFusion={getattr(LabelFusion, '__version__', 'unknown')}",
    ])

    path = Path(args.out)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {len(out) - 1} goldens -> {path}")


if __name__ == "__main__":
    main()
