from tldr_ray.graph.partition import vhash, build_shards
from tldr_ray.graph.engine import GraphEngine, pagerank, connected_components, label_propagation
from tldr_ray.graph.triangles import triangle_counts

__all__ = [
    "vhash",
    "build_shards",
    "GraphEngine",
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_counts",
]
