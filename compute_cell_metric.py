"""NeurIPS-CellSeg instance F1/Dice evaluation (reference:
`/compute_cell_metric.py`): per-image instance matching at IoU 0.5 via Hungarian
assignment, written as an nnU-Net-style ``test_summary.json``.

numpy/scipy implementation (the reference uses numba for the overlap histogram;
np.bincount over fused index pairs is equivalent and fast enough).
"""

import os
from argparse import ArgumentParser

import numpy as np
from scipy.ndimage import label as cc_label
from scipy.optimize import linear_sum_assignment


def label_overlap(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Overlap histogram: overlap[i, j] = #pixels with x==i and y==j
    (reference `_label_overlap:40`)."""
    x = x.ravel().astype(np.int64)
    y = y.ravel().astype(np.int64)
    nx = int(x.max()) + 1
    ny = int(y.max()) + 1
    fused = x * ny + y
    counts = np.bincount(fused, minlength=nx * ny)
    return counts.reshape(nx, ny)


def intersection_over_union(masks_true: np.ndarray, masks_pred: np.ndarray
                            ) -> np.ndarray:
    overlap = label_overlap(masks_true, masks_pred)
    n_pixels_pred = overlap.sum(0, keepdims=True)
    n_pixels_true = overlap.sum(1, keepdims=True)
    union = n_pixels_pred + n_pixels_true - overlap
    iou = np.where(union > 0, overlap / np.maximum(union, 1), 0.0)
    return iou


def true_positive(iou: np.ndarray, threshold: float = 0.5) -> int:
    """Hungarian-matched true positives at the IoU threshold
    (reference `_true_positive:86`)."""
    n_min = min(iou.shape[0], iou.shape[1])
    costs = -(iou >= threshold).astype(float) - iou / (2 * n_min + 1e-10)
    true_ind, pred_ind = linear_sum_assignment(costs)
    match_ok = iou[true_ind, pred_ind] >= threshold
    return int(match_ok.sum())


def eval_tp_fp_fn(masks_true: np.ndarray, masks_pred: np.ndarray,
                  threshold: float = 0.5):
    num_inst_true = int(masks_true.max())
    num_inst_pred = int(masks_pred.max())
    if num_inst_pred > 0 and num_inst_true > 0:
        iou = intersection_over_union(masks_true, masks_pred)[1:, 1:]
        tp = true_positive(iou, threshold)
    else:
        tp = 0
    fp = num_inst_pred - tp
    fn = num_inst_true - tp
    return tp, fp, fn


def to_instances(seg: np.ndarray) -> np.ndarray:
    """Binary/semantic segmentation -> connected-component instances."""
    if seg.max() > 1 and len(np.unique(seg)) > 10:
        return seg.astype(np.int64)  # already instance-labeled
    inst, _ = cc_label(seg > 0)
    return inst


def compute_cell_metrics(gt_path: str, seg_path: str, save_path: str,
                         threshold: float = 0.5) -> dict:
    from nnuzoo_tpu.imageio.registry import determine_reader_writer_from_file_ending
    from nnuzoo_tpu.utilities.io import save_json, subfiles

    seg_files = sorted(f for f in os.listdir(seg_path)
                       if not f.startswith("."))
    per_case = []
    f1s, dices = [], []
    for f in seg_files:
        gt_file = os.path.join(gt_path, f)
        if not os.path.isfile(gt_file):
            # NeurIPS-CellSeg gt naming: <case>_label.tiff etc -- try variants
            base = f.split(".")[0]
            candidates = [c for c in os.listdir(gt_path) if c.startswith(base)]
            if not candidates:
                continue
            gt_file = os.path.join(gt_path, candidates[0])
        ending = "." + f.split(".", 1)[1]
        rw = determine_reader_writer_from_file_ending(
            "." + f.rsplit(".", 1)[-1] if not f.endswith(".nii.gz") else ".nii.gz")()
        gt, _ = rw.read_seg(gt_file)
        pred, _ = rw.read_seg(os.path.join(seg_path, f))
        gt_inst = to_instances(np.squeeze(gt))
        pred_inst = to_instances(np.squeeze(pred))
        tp, fp, fn = eval_tp_fp_fn(gt_inst, pred_inst, threshold)
        f1 = 2 * tp / max(2 * tp + fp + fn, 1)
        inter = np.sum((gt_inst > 0) & (pred_inst > 0))
        dice = 2 * inter / max((gt_inst > 0).sum() + (pred_inst > 0).sum(), 1)
        per_case.append({"prediction_file": os.path.join(seg_path, f),
                         "reference_file": gt_file,
                         "metrics": {"F1": f1, "Dice": float(dice),
                                     "TP": tp, "FP": fp, "FN": fn}})
        f1s.append(f1)
        dices.append(dice)

    result = {
        "metric_per_case": per_case,
        "mean": {"F1": float(np.mean(f1s)) if f1s else 0.0,
                 "Dice": float(np.mean(dices)) if dices else 0.0},
        "foreground_mean": {"F1": float(np.mean(f1s)) if f1s else 0.0,
                            "Dice": float(np.mean(dices)) if dices else 0.0},
    }
    save_json(result, save_path)
    return result


def main():
    parser = ArgumentParser()
    parser.add_argument("--gt_path", required=True)
    parser.add_argument("--seg_path", required=True)
    parser.add_argument("--save_path", required=True)
    parser.add_argument("--threshold", type=float, default=0.5)
    args = parser.parse_args()
    result = compute_cell_metrics(args.gt_path, args.seg_path, args.save_path,
                                  args.threshold)
    print(f"mean F1: {result['mean']['F1']:.4f}  "
          f"mean Dice: {result['mean']['Dice']:.4f}")


if __name__ == "__main__":
    main()
