"""analysis.py vs the reference's OWN shipped eval dump (res.csv)."""

import os

import numpy as np
import pytest

from analysis import analyze_res
from ser_tpu.train.metrics import topk_accuracy

REF_RES = "/root/reference/res.csv"


@pytest.mark.skipif(not os.path.exists(REF_RES),
                    reason="reference res.csv not available")
def test_reference_res_csv_numbers(tmp_path):
    """SURVEY §6: the shipped dump recomputes to 66.36% weighted accuracy
    over 1,623 masked test utterances."""
    report = analyze_res(REF_RES, out_dir=str(tmp_path))
    assert report["n_valid"] == 1623
    assert report["weighted_accuracy"] == 66.36
    assert 60 < report["weighted_f1"] < 70
    assert os.path.exists(report["confusion_plot"])
    # test-set label distribution (SURVEY §6)
    import pandas as pd

    df = pd.read_csv(REF_RES)
    counts = df[df["masks"] > 0]["labels"].value_counts()
    assert counts[2] == 384 and counts[5] == 381  # neu, fru


def test_topk_accuracy_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    N, C = 50, 6
    output = rng.standard_normal((N, C)).astype(np.float32)
    target = rng.integers(0, C, N)

    # reference oracle (utils.py:107-120)
    out_t = torch.tensor(output)
    tgt_t = torch.tensor(target)
    maxk = 3
    _, pred = out_t.topk(maxk, 1, True, True)
    pred = pred.t()
    correct = pred.eq(tgt_t.view(1, -1).expand_as(pred))
    expected = [float(correct[:k].reshape(-1).float().sum(0) * 100.0 / N)
                for k in (1, 3)]

    got = topk_accuracy(output, target, topk=(1, 3))
    np.testing.assert_allclose(got, expected, rtol=1e-6)
