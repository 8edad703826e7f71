"""Eval subsystem tests: dice/HD95 vs brute force, CC removal, postprocess
decision logic, report writer format."""
import numpy as np
import pytest
from scipy import ndimage
from scipy.spatial.distance import cdist

from hybrid_ctunet_tpu.eval import (
    com_dice,
    determine_postprocessing,
    dice_score,
    hd95,
    per_organ_dice,
    remove_all_but_largest_component,
    write_dice_report,
)
from hybrid_ctunet_tpu.eval.report import REPORT_LABELS


def test_dice_reference_semantics():
    a = np.zeros((4, 4, 4), bool)
    b = np.zeros((4, 4, 4), bool)
    # empty ground truth -> 0.0 (reference utils/utils.py:16-22 guard)
    assert dice_score(a, b) == 0.0
    a[1:3, 1:3, 1:3] = True
    assert dice_score(a, b) == 0.0  # gt still empty
    b[1:3, 1:3, 1:3] = True
    assert dice_score(a, b) == 1.0
    b[:] = False
    b[0:2, 0:2, 0:2] = True
    inter = np.logical_and(a, b).sum()
    assert dice_score(a, b) == pytest.approx(2 * inter / (a.sum() + b.sum()))


def _brute_hd95(pred, gt):
    """medpy algorithm from first principles: connectivity-1 border voxels,
    pairwise euclidean distances, p95 of the stacked directed distances."""
    conn = ndimage.generate_binary_structure(3, 1)

    def border(m):
        return np.argwhere(m & ~ndimage.binary_erosion(m, conn))

    pb, gb = border(pred), border(gt)
    d_pg = cdist(pb, gb).min(1)
    d_gp = cdist(gb, pb).min(1)
    return np.percentile(np.hstack((d_pg, d_gp)), 95)


def test_hd95_matches_bruteforce(rng):
    pred = np.zeros((12, 12, 12), bool)
    gt = np.zeros((12, 12, 12), bool)
    pred[2:7, 3:8, 2:9] = True
    gt[4:10, 2:6, 3:10] = True
    assert hd95(pred, gt) == pytest.approx(_brute_hd95(pred, gt), abs=1e-6)

    blob = rng.random((16, 16, 16)) > 0.7
    blob2 = rng.random((16, 16, 16)) > 0.7
    assert hd95(blob, blob2) == pytest.approx(_brute_hd95(blob, blob2), abs=1e-6)


def test_hd95_empty_guard():
    z = np.zeros((4, 4, 4), bool)
    o = np.ones((4, 4, 4), bool)
    assert hd95(z, o) == 0.0
    assert hd95(o, z) == 0.0


def test_remove_all_but_largest_component():
    img = np.zeros((10, 10, 10), np.uint8)
    img[0:4, 0:4, 0:4] = 1          # big component of class 1
    img[7:9, 7:9, 7:9] = 1          # small component of class 1
    img[0:2, 7:10, 7:10] = 2        # single component of class 2
    out, removed, kept = remove_all_but_largest_component(img, [1, 2], 1.0)
    assert (out[7:9, 7:9, 7:9] == 0).all()     # small cc removed
    assert (out[0:4, 0:4, 0:4] == 1).all()     # largest kept
    assert (out == 2).sum() == (img == 2).sum()  # class 2 untouched
    assert removed[1] == 8.0 and kept[1] == 64.0
    assert removed[2] is None

    # joint-region semantics: classes together form one region
    out2, _, kept2 = remove_all_but_largest_component(img, [(1, 2)], 2.0)
    assert kept2[(1, 2)] == 64.0 * 2.0
    # min-valid-size protects small components
    out3, removed3, _ = remove_all_but_largest_component(
        img, [1], 1.0, minimum_valid_object_size={1: 4.0}
    )
    assert (out3 == img)[img == 1].all() and removed3[1] is None


def test_determine_postprocessing_keeps_helpful_removal():
    # gt: one clean blob of class 1; pred: same blob + a spurious island
    gt = np.zeros((12, 12, 12), np.uint8)
    gt[2:7, 2:7, 2:7] = 1
    pred = gt.copy()
    pred[9:11, 9:11, 9:11] = 1
    out = determine_postprocessing(
        [pred], [gt], [1.0], processes=2, advanced_postprocessing=False,
        classes=[1, 2], verbose=False,
    )
    assert (out[0] == gt).all()  # island removed because dice improved

    # removal that hurts must be rejected: two real gt components
    gt2 = np.zeros((12, 12, 12), np.uint8)
    gt2[0:3, 0:3, 0:3] = 1
    gt2[8:11, 8:11, 8:11] = 1
    pred2 = gt2.copy()
    out2 = determine_postprocessing(
        [pred2], [gt2], [1.0], processes=2, advanced_postprocessing=False,
        classes=[1, 2], verbose=False,
    )
    assert (out2[0] == pred2).all()  # keeping both components is better


def test_determine_postprocessing_advanced_runs():
    gt = np.zeros((10, 10, 10), np.uint8)
    gt[2:6, 2:6, 2:6] = 3
    pred = gt.copy()
    pred[8:10, 8:10, 8:10] = 3
    out = determine_postprocessing(
        [pred, gt.copy()], [gt, gt], [1.0, 1.0], processes=2,
        advanced_postprocessing=True, classes=[3, 5], verbose=False,
    )
    assert (out[0] == gt).all()


def test_per_organ_and_report(tmp_path):
    gt = np.zeros((8, 8, 8), np.uint8)
    gt[:4] = 1
    gt[4:, :4] = 2
    pred = gt.copy()
    d = per_organ_dice(pred, gt)
    assert d.shape == (13,) and d[0] == 1.0 and d[1] == 1.0 and d[2] == 0.0
    mean = com_dice([pred], [gt], verbose=False)
    np.testing.assert_allclose(mean, d)

    path = write_dice_report(str(tmp_path), ["case1.nii.gz"], [d])
    text = open(path).read()
    assert "case: case1.nii.gz" in text
    for lab in REPORT_LABELS:
        assert lab in text
    assert "Dice_spleen: 1.0000" in text
    assert "dsc:" in text


class TestHD95AnalyticGolden:
    """Hand-computed golden values (no medpy available in this environment:
    the expected numbers below were derived BY HAND from the published
    medpy.metric.binary.hd95 algorithm — surface = mask ^ binary_erosion(mask,
    generate_binary_structure(3, 1)); directed distances = EDT(~ref_surface,
    sampling=voxelspacing)[pred_surface]; hd95 = np.percentile(hstack(both
    directions), 95) with linear interpolation — NOT by running any code that
    shares an author with eval/metrics.py). Reference call site:
    /root/reference/test_CTUNet_final.py:99-104."""

    @staticmethod
    def _vol(coords, shape=(12, 12, 12)):
        m = np.zeros(shape, bool)
        for c in coords:
            m[c] = True
        return m

    def test_single_voxels_axis_distance(self):
        # Both masks are single voxels -> erosion empties them, the border is
        # the voxel itself; both directed distance lists are [3.0]; p95 = 3.
        a = self._vol([(0, 0, 0)])
        b = self._vol([(3, 0, 0)])
        assert hd95(a, b) == pytest.approx(3.0, abs=1e-12)

    def test_single_voxels_voxelspacing(self):
        # Same geometry under anisotropic spacing (2,1,1): EDT sampling makes
        # the x-gap 3 voxels * 2.0 = 6.0.
        a = self._vol([(0, 0, 0)])
        b = self._vol([(3, 0, 0)])
        assert hd95(a, b, voxelspacing=(2.0, 1.0, 1.0)) == pytest.approx(6.0, abs=1e-12)

    def test_shifted_cubes_percentile_interp(self):
        # 2x2x2 cubes offset by +5 in x. Every cube voxel is border (the
        # conn-1 erosion of a 2-cube is empty). Directed distances each way:
        # four voxels at dist 5, four at dist 4 -> combined sorted list is
        # eight 4s then eight 5s. p95 at linear interpolation: index
        # 0.95*(16-1)=14.25 lies between two 5s -> exactly 5.0.
        a = self._vol([(x, y, z) for x in (0, 1) for y in (0, 1) for z in (0, 1)])
        b = self._vol([(x, y, z) for x in (5, 6) for y in (0, 1) for z in (0, 1)])
        assert hd95(a, b) == pytest.approx(5.0, abs=1e-12)

    def test_point_vs_line_asymmetric(self):
        # pred = single voxel at the line's end; gt = 10-voxel line along x.
        # A 1-wide line has no conn-1 interior -> all 10 voxels are border.
        # pred->gt: [0]. gt->pred: [0,1,...,9]. Combined sorted:
        # [0,0,1,2,3,4,5,6,7,8,9]; p95 at index 0.95*10=9.5 interpolates
        # between 8 and 9 -> 8.5.
        a = self._vol([(0, 0, 0)])
        b = self._vol([(x, 0, 0) for x in range(10)])
        assert hd95(a, b) == pytest.approx(8.5, abs=1e-12)

    def test_hollow_vs_filled_cube_erosion_semantics(self):
        # gt = 4x4x4 filled cube, pred = same cube minus its single interior
        # 2x2x2 core... both have the SAME conn-1 border (the shell), so all
        # surface distances are 0 regardless of the differing interiors:
        # hd95 must be exactly 0 — this pins the erosion-border semantics
        # (a naive "all mask voxels" surface would see nonzero distances).
        filled = self._vol(
            [(x, y, z) for x in range(4) for y in range(4) for z in range(4)]
        )
        hollow = filled.copy()
        hollow[1:3, 1:3, 1:3] = False
        assert hd95(hollow, filled) == pytest.approx(0.0, abs=1e-12)
