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
