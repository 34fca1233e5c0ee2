"""structure_release.xml parsing: misc-subtree drop + food re-attach +
DFS edge emission (reference data/hierarchical.py:5-45 semantics)."""

import textwrap

from hgr_tpu.hierarchy import Hierarchy, edges_from_structure_xml

XML = textwrap.dedent("""\
<ImageNetStructure>
  <releaseData>fall2011</releaseData>
  <synset wnid="fall11">
    <synset wnid="n1">
      <synset wnid="n2"/>
      <synset wnid="n3">
        <synset wnid="n4"/>
      </synset>
    </synset>
    <synset wnid="misc">
      <synset wnid="junk1"/>
      <synset wnid="n00021265">
        <synset wnid="food1"/>
      </synset>
      <synset wnid="junk2"/>
    </synset>
  </synset>
</ImageNetStructure>
""")


def test_xml_edges(tmp_path):
    p = tmp_path / "structure_release.xml"
    p.write_text(XML)
    edges = edges_from_structure_xml(str(p))
    nodes = {n for e in edges for n in e}
    # the misc subtree is dropped but its food child is re-attached at top
    assert "junk1" not in nodes and "junk2" not in nodes and "misc" not in nodes
    assert ("fall11", "n00021265") in edges
    assert ("n00021265", "food1") in edges
    assert ("fall11", "n1") in edges
    assert ("n3", "n4") in edges
    # dedup: every edge once
    assert len(edges) == len(set(edges))
    # the output builds into a valid hierarchy
    h = Hierarchy.from_edges(edges)
    assert set(h.names) == {"n1", "n2", "n3", "n4", "n00021265", "food1"}
    assert h.depth[h.name_to_id["n4"]] == 2
    assert h.depth[h.name_to_id["food1"]] == 1


def test_verify_reference_counts():
    from hgr_tpu.hierarchy.builder import (
        REFERENCE_COUNTS,
        verify_reference_counts,
    )

    ok_splits = {
        "train": ["x"] * REFERENCE_COUNTS["train"],
        "rest": ["y"] * REFERENCE_COUNTS["rest"],
    }
    assert verify_reference_counts(
        REFERENCE_COUNTS["nodes"], ok_splits, strict=True
    ) == []

    import pytest as _pytest

    bad = {"train": ["x"] * 10, "rest": ["y"] * REFERENCE_COUNTS["rest"]}
    with _pytest.raises(ValueError, match="train: got 10"):
        verify_reference_counts(REFERENCE_COUNTS["nodes"], bad, strict=True)
    problems = verify_reference_counts(
        REFERENCE_COUNTS["nodes"], bad, strict=False
    )
    assert len(problems) == 1


def test_builder_cli_end_to_end(tmp_path, capsys):
    """Regeneration CLI: XML -> contraction -> splits -> hops -> count report
    (no-strict so the toy scale passes)."""
    import json

    from hgr_tpu.hierarchy.builder import main

    xml = tmp_path / "structure_release.xml"
    xml.write_text(XML)
    testsets = {
        "train": ["n2"],
        "all": ["n2", "n4", "food1"],
        "2-hops": ["n4"],
        "3-hops": ["food1"],
        "3-hops-pure": [],
    }
    (tmp_path / "testsets.json").write_text(json.dumps(testsets))
    (tmp_path / "winter.txt").write_text("n2\nn4\nfood1\n")
    out = tmp_path / "out"
    main([
        "--testsets", str(tmp_path / "testsets.json"),
        "--winter", str(tmp_path / "winter.txt"),
        "--xml", str(xml), "--out", str(out), "--no-strict",
    ])
    edges = json.loads((out / "graph_edges_cls.json").read_text())
    splits = json.loads((out / "splits_for_tree.json").read_text())
    hops = json.loads((out / "splits_for_hops.json").read_text())
    h = Hierarchy.from_edges([tuple(e) for e in edges])
    assert set(h.names) == {"n2", "n4", "food1"}
    assert splits["train"] == ["n2"] and set(splits["rest"]) == {"n2", "n4", "food1"}
    assert hops["hop2"] == ["n4"]
    assert "WARNING" in capsys.readouterr().out
