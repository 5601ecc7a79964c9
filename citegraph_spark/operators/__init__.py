from .graph import (
    adjacency,
    bidirectional,
    canonical_pairs,
    density,
    effective_diameter,
    hop_plot,
    snapshot_edges,
)
from .relational import (
    anti_join_new,
    group_count,
    group_sum,
    running_total,
    sessionize,
    top_k_per_group,
)

__all__ = [
    "density",
    "snapshot_edges",
    "bidirectional",
    "canonical_pairs",
    "adjacency",
    "hop_plot",
    "effective_diameter",
    "group_count",
    "group_sum",
    "running_total",
    "top_k_per_group",
    "anti_join_new",
    "sessionize",
]
