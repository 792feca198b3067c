from tldr_ray.state.incremental import (incremental_exact_dedup,
                                        list_versions,
                                        read_aggregate_state,
                                        update_running_aggregate,
                                        vacuum_state)
from tldr_ray.state.checkpoint import (
    write_manifest,
    read_manifest,
    latest_checkpoint,
    fingerprint_input,
)

__all__ = [
    "incremental_exact_dedup",
    "list_versions",
    "vacuum_state",
    "read_aggregate_state",
    "update_running_aggregate",
    "write_manifest",
    "read_manifest",
    "latest_checkpoint",
    "fingerprint_input",
]
