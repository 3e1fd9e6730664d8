"""Compaction-accuracy harness (scripts/compaction_accuracy.py) metrics."""

import importlib.util
import sys
from pathlib import Path

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "compaction_accuracy",
    Path(__file__).parent.parent / "scripts" / "compaction_accuracy.py",
)
ca = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ca)


def test_agreement_identical():
    m0 = np.asarray([[0, 1, -1, 3], [2, -1, -1, 0]])
    a = ca.agreement(m0, m0.copy())
    assert a == {"precision": 1.0, "recall": 1.0, "f1": 1.0}


def test_agreement_partial():
    ref = np.asarray([[0, 1, 2, 3]])  # 4 matches
    test = np.asarray([[0, 1, -1, 2]])  # 2 agree, 1 dropped, 1 different
    a = ca.agreement(test, ref)
    assert a["precision"] == round(2 / 3, 4)
    assert a["recall"] == 2 / 4


def test_gt_scores():
    gt = np.asarray([[5, -1, 2, 3]])
    m0 = np.asarray([[5, 0, 2, -1]])  # 2 correct, 1 spurious, 1 missed
    s = ca.gt_scores(m0, gt)
    assert s["gt_precision"] == round(2 / 3, 4)
    assert s["gt_recall"] == round(2 / 3, 4)
