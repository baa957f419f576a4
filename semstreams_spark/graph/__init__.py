from .traversal import bounded_traversal
from .pagerank import pagerank, degree_centrality
from .lpa import lpa_communities

__all__ = ["bounded_traversal", "pagerank", "degree_centrality", "lpa_communities"]
