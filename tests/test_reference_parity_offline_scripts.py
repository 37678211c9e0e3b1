"""Offline line-eval SCRIPT parity: the reference's actual
evaluation/eval-sAP-glassrgbd.py and eval-fscore-glassrgbd.py drivers vs
our sap_score / fscore_score on identical npz directories.

The L-CNN metric functions (msTPFP/ap/fscore) already have function-level
reference parity (tests/test_reference_parity_eval.py); this covers the
driver glue around them that the scripts own: pred/GT pairing by sorted
filename, the duplicate-tail truncation (eval-sAP-glassrgbd.py:55-59),
cross-image TP/FP concatenation, global score sort, and the n_gt
normalization of the cumulative PR curve (:66-73).

The scripts hardcode GT globs as module constants (GT_val, :31) — the
test points them at the tmp GT dir, which is exactly how a reference user
runs them on a new dataset (editing the constant).
"""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pytest

from reference_harness import get_ref_eval

REF_EVAL = "/root/reference/evaluation"


@pytest.fixture(scope="module")
def refe():
    return get_ref_eval()  # installs stubs + sys.path for lcnn.*


def _import_script(fname: str):
    spec = importlib.util.spec_from_file_location(
        fname.replace("-", "_").removesuffix(".py"),
        os.path.join(REF_EVAL, fname))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_dumps(tmp_path, rng):
    """Synthesize pred/GT npz dirs in the offline-eval contract: preds
    {lines (N,3,2) yx on the 128 grid desc-sorted by score, score}, GT
    {lpos (M,3,2)}.  Pred endpoints are GT plus noise so every threshold
    in {5,10,15} separates differently; image 1 carries a duplicated
    tail (repeats of line 0) like the reference engine's fixed-Q dumps."""
    pred_dir = tmp_path / "pred_val"   # name: split('_')[1] != 'train'
    gt_dir = tmp_path / "gt"
    pred_dir.mkdir()
    gt_dir.mkdir()
    for i in range(3):
        m = int(rng.integers(3, 7))
        gt = rng.random((m, 3, 2)) * 128
        np.savez(gt_dir / f"img{i}.npz", lpos=gt)

        n = 20
        pred = np.concatenate(
            [gt + rng.normal(0, 1.0, gt.shape),
             rng.random((n - m, 3, 2)) * 128])
        score = -np.sort(-rng.random(n))
        if i == 1:  # duplicate tail: engine pads fixed-Q dumps this way
            pred[12:] = pred[0]
            # scores stay descending; the scripts truncate by LINE equality
        np.savez(pred_dir / f"img{i}.npz", lines=pred, score=score)
    return str(pred_dir), str(gt_dir)


def test_sap_script_vs_reference(refe, tmp_path):
    rng = np.random.default_rng(101)
    pred_dir, gt_dir = _write_dumps(tmp_path, rng)

    sap_mod = _import_script("eval-sAP-glassrgbd.py")
    sap_mod.GT_val = os.path.join(gt_dir, "*.npz")

    from gwdepth_tpu.evaluation import sap_score
    ours = sap_score(pred_dir, gt_dir)
    for t in (5, 10, 15):
        theirs = 100 * sap_mod.line_score(
            os.path.join(pred_dir, "*.npz"), threshold=t)
        np.testing.assert_allclose(ours[t], theirs, rtol=1e-12,
                                   err_msg=f"sAP{t}")
        assert theirs > 0  # the curve actually scored something


def test_fscore_script_vs_reference(refe, tmp_path):
    rng = np.random.default_rng(202)
    pred_dir, gt_dir = _write_dumps(tmp_path, rng)

    fs_mod = _import_script("eval-fscore-glassrgbd.py")
    fs_mod.GT_val = os.path.join(gt_dir, "*.npz")

    from gwdepth_tpu.evaluation import fscore_score
    ours = fscore_score(pred_dir, gt_dir)
    for t in (5, 10, 15):
        theirs = 100 * fs_mod.line_score(
            os.path.join(pred_dir, "*.npz"), threshold=t)
        # the script's local f_score (eval-fscore-glassrgbd.py:34-43) uses
        # a 1e-10 denominator fudge where the vendored lcnn.metric uses
        # 1e-9 — an O(1e-9) relative difference by construction
        np.testing.assert_allclose(ours[t], theirs, rtol=1e-6,
                                   err_msg=f"F{t}")
        assert theirs > 0
