from .traversal import bounded_traversal
from .pagerank import pagerank, pagerank_exact, degree_centrality
from .lpa import lpa_communities

__all__ = [
    "bounded_traversal",
    "pagerank",
    "pagerank_exact",
    "degree_centrality",
    "lpa_communities",
]
