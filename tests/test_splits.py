"""Offline split builders with a faked filesystem lister."""

import numpy as np

from hgr_tpu.data.splits import lowshot_splits, p21k_class_split, standard_splits

FS = {
    "1k/train": ["s0", "s1"],
    "1k/train/s0": [f"a{i}.jpg" for i in range(5)],
    "1k/train/s1": [f"b{i}.jpg" for i in range(4)],
    "1k/val/s0": ["va.jpg"],
    "1k/val/s1": ["vb.jpg", "vb2.jpg"],
    "21k": ["u0", "u1", "skipme"],
    "21k/u0": [f"u{i}.jpg" for i in range(60)],
    "21k/u1": [f"w{i}.jpg" for i in range(12)],
}


def lister(path):
    return FS[path.replace("\\", "/")]


CLASSES = {"train": ["s0", "s1"], "rest": ["u0", "u1"], "all": ["s0", "s1", "u0", "u1"]}


def test_standard_splits():
    train, val, test = standard_splits("1k", "21k", CLASSES, seed=0, lister=lister)
    assert len(train["s0"]) == 5 and val["s0"] == test["s0"]
    # big unseen class: 50 val, rest train, ALL in zsl_test
    assert len(val["u0"]) == 50
    assert len(train["u0"]) == 10
    assert len(test["u0"]) == 60
    assert set(val["u0"]).isdisjoint(train["u0"])
    # small unseen class: all val, no train
    assert len(val["u1"]) == 12 and train["u1"] == []
    # classes not in the split are skipped
    assert "skipme" not in train


def test_lowshot_splits():
    tr, va, te = lowshot_splits("1k", "21k", CLASSES, seed=0, lister=lister)
    assert len(tr["u0"]) == 10
    assert len(va["u0"]) == 50
    assert len(te["u0"]) == 50
    assert set(tr["u0"]).isdisjoint(te["u0"])
    assert set(va["u0"]) <= set(te["u0"])  # val drawn from the rest
    assert len(tr["u1"]) == 10 and len(te["u1"]) == 2


def test_determinism():
    a = standard_splits("1k", "21k", CLASSES, seed=3, lister=lister)
    b = standard_splits("1k", "21k", CLASSES, seed=3, lister=lister)
    assert a == b


def test_p21k_intersection():
    out = p21k_class_split(CLASSES, ["s1", "u1", "zzz"])
    assert out == {"train": ["s1"], "rest": ["u1"], "all": ["s1", "u1"]}
