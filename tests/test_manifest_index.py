"""Binary mmap manifest index: roundtrip + lazy grouped view + loader use."""

import json

import numpy as np

from hgr_tpu.data import GroupedTestLoader, SyntheticImageSource
from hgr_tpu.data.manifest_index import MmapManifest, build_index


def _manifest():
    return {
        "c0": [f"a/b/img_{i:04d}.jpg" for i in range(7)],
        "c1": ["x/únîcödé 北.jpg", "x/y.jpg"],
        "c2": [],
        "c3": [f"z/{i}.png" for i in range(3)],
    }


def test_roundtrip(tmp_path):
    src = _manifest()
    jp = tmp_path / "split.json"
    jp.write_text(json.dumps(src))
    idx = tmp_path / "idx"
    build_index(str(jp), str(idx))
    m = MmapManifest(str(idx))
    assert m.classes == list(src)
    assert m.num_images == sum(len(v) for v in src.values())
    for cls, paths in src.items():
        assert m.num_paths(cls) == len(paths)
        assert m.paths(cls) == paths
        for j, p in enumerate(paths):
            assert m.path(cls, j) == p


def test_lazy_grouped_feeds_loader(tmp_path):
    src = _manifest()
    jp = tmp_path / "split.json"
    jp.write_text(json.dumps(src))
    build_index(str(jp), str(tmp_path / "idx"))
    m = MmapManifest(str(tmp_path / "idx"))
    grouped = m.grouped(candidates=["c0", "c3"])
    loader = GroupedTestLoader(
        grouped, {"c0": 0, "c3": 3}, SyntheticImageSource(8), batch_size=4,
        num_threads=1,
    )
    total = sum(int(b.valid.sum()) for b in loader)
    assert total == 10
