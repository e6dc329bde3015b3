"""DetectionMeter AP/mAP tests against hand-computed values."""

import numpy as np

from happypose_tpu.evaluation.detection_meters import (
    DetectionMeter,
    average_precision,
    box_iou,
)


class TestBoxIoU:
    def test_identical(self):
        b = np.asarray([[0, 0, 10, 10]])
        np.testing.assert_allclose(box_iou(b, b), [[1.0]])

    def test_half_overlap(self):
        a = np.asarray([[0, 0, 10, 10]])
        b = np.asarray([[5, 0, 15, 10]])
        np.testing.assert_allclose(box_iou(a, b), [[50 / 150]])

    def test_disjoint_and_empty(self):
        a = np.asarray([[0, 0, 1, 1]])
        b = np.asarray([[5, 5, 6, 6]])
        np.testing.assert_allclose(box_iou(a, b), [[0.0]])
        assert box_iou(np.zeros((0, 4)), b).shape == (0, 1)


class TestAP:
    def test_perfect(self):
        assert average_precision(np.ones(5), np.arange(5), 5) == 1.0

    def test_half_recall(self):
        # 2 TPs ranked first out of 4 GT: AP = 0.5 (prec 1 at rec .25/.5)
        ap = average_precision(
            np.asarray([1, 1, 0, 0]), np.asarray([0.9, 0.8, 0.7, 0.6]), 4
        )
        np.testing.assert_allclose(ap, 0.5)

    def test_interleaved(self):
        # ranks: TP FP TP -> prec at recalls (1/2): 1/1, 2/3
        ap = average_precision(
            np.asarray([1, 0, 1]), np.asarray([0.9, 0.8, 0.7]), 2
        )
        np.testing.assert_allclose(ap, 0.5 * (1.0 + 2.0 / 3.0))


class TestDetectionMeter:
    def test_perfect_detections(self):
        m = DetectionMeter()
        gt = np.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], float)
        m.add(gt, [0, 1], [0.9, 0.8], gt, [0, 1])
        s = m.summary()
        assert s["AP"] == 1.0 and s["mAP"] == 1.0
        assert s["matched_gt_ratio"] == 1.0

    def test_wrong_label_no_match(self):
        m = DetectionMeter()
        gt = np.asarray([[0, 0, 10, 10]], float)
        m.add(gt, [1], [0.9], gt, [0])
        s = m.summary()
        assert s["n_matched"] == 0
        assert s["mAP"] == 0.0

    def test_low_iou_no_match(self):
        m = DetectionMeter(iou_threshold=0.5)
        gt = np.asarray([[0, 0, 10, 10]], float)
        pred = np.asarray([[8, 8, 18, 18]], float)  # IoU ~ 0.02
        m.add(pred, [0], [0.9], gt, [0])
        assert m.summary()["n_matched"] == 0

    def test_duplicate_detections_penalized(self):
        m = DetectionMeter()
        gt = np.asarray([[0, 0, 10, 10]], float)
        pred = np.stack([gt[0], gt[0]])
        m.add(pred, [0, 0], [0.9, 0.8], gt, [0])
        s = m.summary()
        # second one is an FP after the first consumes the GT
        np.testing.assert_allclose(s["AP"], 1.0)  # TP ranked first
        assert s["n_matched"] == 1

    def test_invisible_gt_consumes_without_scoring(self):
        m = DetectionMeter(visib_gt_min=0.1)
        gt = np.asarray([[0, 0, 10, 10]], float)
        m.add(gt, [0], [0.9], gt, [0], gt_visib_fract=np.asarray([0.01]))
        s = m.summary()
        assert s["n_gt"] == 0
        assert s["n_matched"] == 0
        assert s["AP"] == 0.0  # nothing scoreable, nothing penalized

    def test_map_averages_labels(self):
        m = DetectionMeter()
        b1 = np.asarray([[0, 0, 10, 10]], float)
        b2 = np.asarray([[20, 20, 30, 30]], float)
        # label 0 perfect; label 1 missed + false positive elsewhere
        m.add(b1, [0], [0.9], b1, [0])
        m.add(
            np.asarray([[50, 50, 60, 60]], float), [1], [0.8], b2, [1]
        )
        s = m.summary()
        np.testing.assert_allclose(s["mAP"], 1.0)  # only label 0 has TPs
        assert s["AP"] < 1.0  # pooled AP sees the miss
