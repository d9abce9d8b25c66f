from tpu_sage.graph.graph_data import DeviceGraph, GraphStore, build_padded_adjacency

__all__ = ["DeviceGraph", "GraphStore", "build_padded_adjacency"]
