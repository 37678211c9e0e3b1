from gwdepth_tpu.evaluation.line_metrics import (  # noqa: F401
    ap, fscore, ms_tp_fp, sap_score, fscore_score, aph_score, aph_pr_points,
    postprocess_lines, line_nms, dump_benchmark_npz, dump_gt_lines)
