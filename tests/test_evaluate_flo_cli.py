"""End-to-end test of the standalone .flo evaluation CLI.

Reference: evaluate_flo_files_sintel.py (offline EPE + sparsification AUC
over dumped .flo predictions and .npy entropies). Writes a synthetic
prediction/GT tree, runs the CLI, and checks the printed numbers against
direct metric calls.
"""

import re

import numpy as np

from arflow_tpu.cli import evaluate_flo_cli
from arflow_tpu.utils.flow_io import write_flo
from arflow_tpu.utils.metrics import evaluate_flow, evaluate_uncertainty


def test_evaluate_flo_cli_matches_direct(rng, tmp_path, capsys):
    h, w, n = 24, 32, 3
    gts, preds, ents = [], [], []
    for i in range(n):
        gt = (rng.randn(h, w, 2) * 3).astype(np.float32)
        pred = gt + (rng.randn(h, w, 2) * 0.5).astype(np.float32)
        # per-pixel 2-channel log-std maps (metrics.py convention)
        ent = rng.rand(h, w, 2).astype(np.float32)
        sub = tmp_path / "pred" / "scene"
        sub.mkdir(parents=True, exist_ok=True)
        gsub = tmp_path / "gt" / "scene"
        gsub.mkdir(parents=True, exist_ok=True)
        write_flo(str(sub / f"frame_{i:04d}.flo"), pred)
        np.save(sub / f"frame_{i:04d}.npy", ent)
        write_flo(str(gsub / f"frame_{i:04d}.flo"), gt)
        gts.append(gt)
        preds.append(pred)
        ents.append(ent)
    # A prediction with no GT counterpart must be skipped, not crash.
    write_flo(str(tmp_path / "pred" / "scene" / "orphan.flo"),
              preds[0])

    evaluate_flo_cli([
        "--pred_root", str(tmp_path / "pred"),
        "--gt_root", str(tmp_path / "gt"),
        "--sp_samples", "10",
    ])
    out = capsys.readouterr().out

    epe = evaluate_flow(gts, [p.copy() for p in preds])[0]
    auc = evaluate_uncertainty(
        gts, [p.copy() for p in preds], [e.copy() for e in ents], 10
    )[0]

    m = re.search(r"EPE: ([0-9.]+) over (\d+) files", out)
    assert m, out
    assert int(m.group(2)) == n
    np.testing.assert_allclose(float(m.group(1)), epe, atol=1e-3)
    m = re.search(r"AUC: ([0-9.]+) AUC_diff: (-?[0-9.]+)", out)
    assert m, out
    np.testing.assert_allclose(float(m.group(1)), auc[0], atol=1e-3)
    np.testing.assert_allclose(float(m.group(2)), auc[1], atol=1e-3)
