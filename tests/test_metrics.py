"""KITTI AP metrics (numpy oracle) tests: rotated overlaps + AP behavior."""

import numpy as np
import pytest

from sparse_pooling_tpu.data.labels import ObjectLabel
from sparse_pooling_tpu.runtime import metrics as M


def _obj(cls="Car", x=0.0, y=1.65, z=20.0, l=4.0, w=2.0, h=1.5, ry=0.0,
         x1=100, y1=100, x2=200, y2=160, score=1.0, occ=0, trunc=0.0):
    return ObjectLabel(
        type=cls, truncation=trunc, occlusion=occ, alpha=0.0,
        x1=x1, y1=y1, x2=x2, y2=y2, h=h, w=w, l=l, t=(x, y, z), ry=ry,
        score=score,
    )


# ---------------------------------------------------------------- overlaps

def test_rotated_overlap_identical():
    b = np.array([0.0, 10.0, 4.0, 2.0, 0.3])
    assert M.bev_iou(b, b) == pytest.approx(1.0, abs=1e-6)


def test_rotated_overlap_disjoint():
    a = np.array([0.0, 10.0, 4.0, 2.0, 0.0])
    b = np.array([10.0, 10.0, 4.0, 2.0, 0.0])
    assert M.bev_iou(a, b) == 0.0


def test_rotated_overlap_half_shift():
    a = np.array([0.0, 0.0, 4.0, 2.0, 0.0])
    b = np.array([2.0, 0.0, 4.0, 2.0, 0.0])  # half-length shift
    inter = M.rotated_overlap_bev(a, b)
    assert inter == pytest.approx(2.0 * 2.0, abs=1e-6)


def test_rotated_overlap_90deg():
    """4x2 box crossed with its 90-degree rotation -> 2x2 intersection."""

    a = np.array([0.0, 0.0, 4.0, 2.0, 0.0])
    b = np.array([0.0, 0.0, 4.0, 2.0, np.pi / 2])
    inter = M.rotated_overlap_bev(a, b)
    assert inter == pytest.approx(4.0, abs=1e-5)


def test_rotated_overlap_45deg_symmetry():
    a = np.array([0.0, 0.0, 2.0, 2.0, 0.0])
    b = np.array([0.0, 0.0, 2.0, 2.0, np.pi / 4])
    inter = M.rotated_overlap_bev(a, b)
    # square vs rotated square: intersection is a regular octagon
    want = 8 * (np.sqrt(2) - 1)  # area for unit half-width squares
    assert inter == pytest.approx(want, rel=1e-4)


def test_iou_3d_height_overlap():
    a = np.array([0.0, 1.65, 20.0, 4.0, 2.0, 2.0, 0.0])
    b = a.copy()
    b[1] = 1.65 - 1.0  # shifted up by 1m -> height overlap 1 of 2
    got = M.iou_3d(a, b)
    assert got == pytest.approx(1.0 / 3.0, abs=1e-6)  # 8/(16+16-8)


# ---------------------------------------------------------------- AP

def _frames_perfect(n=5):
    frames = []
    for i in range(n):
        gt = [_obj(z=10.0 + i), _obj(x=5.0, z=30.0 + i, x1=300, x2=400, y1=100, y2=150)]
        det = [
            ObjectLabel(**{**g.__dict__, "score": 0.9 - 0.1 * j})
            for j, g in enumerate(gt)
        ]
        frames.append(M.FrameData(gt=gt, det=det))
    return frames


def test_ap_perfect_predictions():
    res = M.evaluate_frames(_frames_perfect(), ["Car"])
    for metric in ("2d", "bev", "3d"):
        assert res["Car"][metric]["moderate"] == pytest.approx(1.0, abs=1e-6)


def test_ap_no_detections():
    frames = [M.FrameData(gt=[_obj()], det=[])]
    res = M.evaluate_frames(frames, ["Car"])
    assert res["Car"]["3d"]["moderate"] == 0.0


def test_ap_false_positives_reduce_precision():
    frames = _frames_perfect(2)
    # add a high-scoring far-away FP in each frame
    for fr in frames:
        fr.det.append(_obj(x=-20.0, z=60.0, x1=0, x2=30, y1=0, y2=30, score=0.95))
    res = M.evaluate_frames(frames, ["Car"])
    assert res["Car"]["3d"]["moderate"] < 1.0


def test_ap_easy_band_excludes_small_boxes():
    # GT with bbox height 30px: excluded from easy (min 40), counted in mod
    gt = [_obj(y1=100, y2=130)]
    det = [ObjectLabel(**{**gt[0].__dict__, "score": 0.9})]
    res = M.evaluate_frames([M.FrameData(gt=gt, det=det)], ["Car"])
    assert res["Car"]["3d"]["moderate"] == pytest.approx(1.0, abs=1e-6)
    # easy: zero valid GT -> AP 0 and the matched det is IGNORED (no FP)
    assert res["Car"]["3d"]["easy"] == 0.0


def test_ap_van_gt_ignored_for_car():
    """A detection matching a Van must be neither TP nor FP for Car."""

    van = _obj(cls="Van")
    car_gt = _obj(x=5.0, z=30.0, x1=300, x2=400)
    det_on_van = ObjectLabel(**{**van.__dict__, "type": "Car", "score": 0.95})
    det_on_car = ObjectLabel(**{**car_gt.__dict__, "score": 0.9})
    frames = [M.FrameData(gt=[van, car_gt], det=[det_on_van, det_on_car])]
    res = M.evaluate_frames(frames, ["Car"])
    assert res["Car"]["3d"]["moderate"] == pytest.approx(1.0, abs=1e-6)


def test_ap_small_detection_not_fp_in_easy_band():
    """devkit ignored_det semantics: a valid detection of a far/hard object
    (bbox height < easy's 40 px) must NOT count as an FP when scoring the
    easy band — it is ignored, so easy AP stays 1.0."""

    gt_easy = _obj(y1=100, y2=160)  # 60 px tall -> counted in easy
    gt_hard = _obj(x=6.0, z=60.0, x1=500, x2=530, y1=100, y2=130)  # 30 px
    det_easy = ObjectLabel(**{**gt_easy.__dict__, "score": 0.9})
    det_hard = ObjectLabel(**{**gt_hard.__dict__, "score": 0.95})
    frames = [M.FrameData(gt=[gt_easy, gt_hard], det=[det_hard, det_easy])]
    res = M.evaluate_frames(frames, ["Car"])
    # easy: gt_hard is ignored GT, det_hard is ignored det -> AP 1.0
    assert res["Car"]["3d"]["easy"] == pytest.approx(1.0, abs=1e-6)
    # moderate counts both
    assert res["Car"]["3d"]["moderate"] == pytest.approx(1.0, abs=1e-6)


def test_ap_small_unmatched_detection_not_fp():
    """An unmatched small det is ignored (not FP) for bands it can't enter."""

    gt_easy = _obj(y1=100, y2=160)
    det_easy = ObjectLabel(**{**gt_easy.__dict__, "score": 0.9})
    spurious_small = _obj(x=7.0, z=65.0, x1=600, x2=620, y1=100, y2=120,
                          score=0.99)  # 20 px tall, matches nothing
    frames = [M.FrameData(gt=[gt_easy], det=[spurious_small, det_easy])]
    res = M.evaluate_frames(frames, ["Car"])
    assert res["Car"]["3d"]["easy"] == pytest.approx(1.0, abs=1e-6)
    # moderate band: 25 px min height still exceeds 20 px -> still ignored
    assert res["Car"]["3d"]["moderate"] == pytest.approx(1.0, abs=1e-6)


def test_ap_localization_threshold():
    """A det shifted beyond the 0.7 IoU bar is an FP for Car."""

    gt = [_obj()]
    shifted = _obj(x=1.5, score=0.9)  # large shift -> BEV IoU < 0.7
    frames = [M.FrameData(gt=gt, det=[shifted])]
    res = M.evaluate_frames(frames, ["Car"])
    assert res["Car"]["bev"]["moderate"] == 0.0


# ---------------------------------------------------------------- AOS

def test_aos_perfect_headings_equals_ap2d():
    """Exact alpha on every TP -> AOS == AP_2d (similarity 1 per match)."""

    res = M.evaluate_frames(_frames_perfect(), ["Car"])
    for diff in ("easy", "moderate", "hard"):
        assert res["Car"]["aos"][diff] == pytest.approx(
            res["Car"]["2d"][diff], abs=1e-12
        )


def test_aos_collapses_on_flipped_headings_while_3d_holds():
    """THE bite test (VERDICT round-3 item 4): a detector predicting every
    heading reversed (alpha + pi, ry + pi) keeps identical 2D/BEV/3D AP —
    the box footprint is pi-symmetric — but its AOS must collapse to ~0."""

    frames = []
    for fr in _frames_perfect():
        det = [
            ObjectLabel(**{
                **d.__dict__,
                "alpha": d.alpha + np.pi,
                "ry": d.ry + np.pi,
            })
            for d in fr.det
        ]
        frames.append(M.FrameData(gt=fr.gt, det=det))
    res = M.evaluate_frames(frames, ["Car"])
    for metric in ("2d", "bev", "3d"):
        assert res["Car"][metric]["moderate"] == pytest.approx(1.0, abs=1e-6)
    assert res["Car"]["aos"]["moderate"] == pytest.approx(0.0, abs=1e-9)


def test_aos_partial_heading_error():
    """A 90-degree alpha error on every TP gives similarity 0.5 per match,
    so AOS = 0.5 * AP_2d exactly (single-frame perfect matching)."""

    frames = []
    for fr in _frames_perfect():
        det = [
            ObjectLabel(**{**d.__dict__, "alpha": d.alpha + np.pi / 2})
            for d in fr.det
        ]
        frames.append(M.FrameData(gt=fr.gt, det=det))
    res = M.evaluate_frames(frames, ["Car"])
    assert res["Car"]["aos"]["moderate"] == pytest.approx(
        0.5 * res["Car"]["2d"]["moderate"], abs=1e-9
    )


def test_evaluate_dirs_round_trip(tmp_path):
    from sparse_pooling_tpu.data.labels import write_labels

    gt_dir = tmp_path / "gt"
    det_dir = tmp_path / "det"
    gt_dir.mkdir()
    det_dir.mkdir()
    for sid in ("000000", "000001"):
        gt = [_obj(z=10.0), _obj(x=5.0, z=30.0, x1=300, x2=400)]
        write_labels(str(gt_dir / f"{sid}.txt"), gt)
        write_labels(
            str(det_dir / f"{sid}.txt"),
            [ObjectLabel(**{**g.__dict__, "score": 0.8}) for g in gt],
        )
    res = M.evaluate_dirs(str(gt_dir), str(det_dir), ["Car"])
    assert res["Car"]["3d"]["moderate"] == pytest.approx(1.0, abs=1e-6)
