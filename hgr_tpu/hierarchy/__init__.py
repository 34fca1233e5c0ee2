from .tree import Hierarchy, profiled_hierarchy, synthetic_hierarchy, ROOT, PAD
from .builder import (
    edges_from_structure_xml,
    edges_from_wordnet,
    contract_graph,
    filter_splits,
    hops_splits,
    save_edges,
)

__all__ = [
    "Hierarchy",
    "profiled_hierarchy",
    "synthetic_hierarchy",
    "ROOT",
    "PAD",
    "edges_from_structure_xml",
    "edges_from_wordnet",
    "contract_graph",
    "filter_splits",
    "hops_splits",
    "save_edges",
]
