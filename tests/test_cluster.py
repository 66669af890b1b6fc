"""Berger-Rigoutsos-style clustering (amr/regrid.cluster_tagged)."""
import numpy as np

from varden_tpu.amr.regrid import cluster_tagged


def test_two_blobs_two_boxes():
    tags = np.zeros((64, 64), bool)
    tags[6:14, 6:14] = True      # blob A
    tags[44:56, 46:58] = True    # blob B, far away
    boxes = cluster_tagged(tags)
    assert len(boxes) == 2
    covered = np.zeros_like(tags)
    cells = 0
    for lo, hi in boxes:
        covered[lo[0]:hi[0], lo[1]:hi[1]] = True
        cells += (hi[0] - lo[0]) * (hi[1] - lo[1])
    assert (covered | ~tags).all(), "a tagged cell escaped the boxes"
    # the two boxes cover far less than the single bounding box would
    assert cells < 0.25 * 52 * 52


def test_l_shape_efficiency():
    tags = np.zeros((64, 64), bool)
    tags[8:40, 8:16] = True      # vertical arm
    tags[8:16, 8:40] = True      # horizontal arm
    boxes = cluster_tagged(tags, min_eff=0.7)
    covered = np.zeros_like(tags)
    cells = 0
    for lo, hi in boxes:
        covered[lo[0]:hi[0], lo[1]:hi[1]] = True
        cells += (hi[0] - lo[0]) * (hi[1] - lo[1])
    assert (covered | ~tags).all()
    # bounding box would be 32x32=1024 for 448 tagged; require better
    assert tags.sum() / cells > 0.55, f"efficiency {tags.sum()/cells:.2f}"


def test_single_blob_single_box():
    tags = np.zeros((32, 32, 16), bool)
    tags[10:20, 12:22, 4:12] = True
    boxes = cluster_tagged(tags)
    assert len(boxes) == 1
    lo, hi = boxes[0]
    assert all(lo[d] <= (10, 12, 4)[d] and hi[d] >= (20, 22, 12)[d]
               for d in range(3))
